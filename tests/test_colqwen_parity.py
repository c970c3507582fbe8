"""Golden numeric-parity tests: JAX ColQwen tower vs torch transformers
Qwen2.5-VL on a tiny random config (the fidelity gate of SURVEY.md §7;
the real 3B checkpoint is not downloadable in this environment, so
parity is established architecturally)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from morphik_core_tpu.models.colqwen.config import ColQwenConfig  # noqa: E402
from morphik_core_tpu.models.colqwen.convert import convert_state_dict  # noqa: E402
from morphik_core_tpu.models.colqwen.model import (  # noqa: E402
    colqwen_image_forward,
    colqwen_text_forward,
)
from morphik_core_tpu.models.colqwen.text import mrope_cos_sin, mrope_position_ids  # noqa: E402
from morphik_core_tpu.models.colqwen.vision import vision_forward, vision_rotary_cos_sin  # noqa: E402

pytestmark = pytest.mark.slow

CFG = ColQwenConfig.tiny()


@pytest.fixture(scope="module")
def torch_model():
    from transformers import Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration

    hf_cfg = Qwen2_5_VLConfig(
        vision_config=dict(
            depth=CFG.vision.depth,
            hidden_size=CFG.vision.hidden_size,
            intermediate_size=CFG.vision.intermediate_size,
            num_heads=CFG.vision.num_heads,
            patch_size=CFG.vision.patch_size,
            spatial_merge_size=CFG.vision.spatial_merge_size,
            temporal_patch_size=CFG.vision.temporal_patch_size,
            window_size=CFG.vision.window_size,
            out_hidden_size=CFG.vision.out_hidden_size,
            fullatt_block_indexes=list(CFG.vision.fullatt_block_indexes),
        ),
        text_config=dict(
            vocab_size=CFG.text.vocab_size,
            hidden_size=CFG.text.hidden_size,
            intermediate_size=CFG.text.intermediate_size,
            num_hidden_layers=CFG.text.num_hidden_layers,
            num_attention_heads=CFG.text.num_attention_heads,
            num_key_value_heads=CFG.text.num_key_value_heads,
            rms_norm_eps=CFG.text.rms_norm_eps,
            rope_theta=CFG.text.rope_theta,
            rope_scaling={"type": "mrope", "mrope_section": list(CFG.text.mrope_section)},
            max_position_embeddings=4096,
        ),
        image_token_id=CFG.image_token_id,
        vision_start_token_id=CFG.vision_start_token_id,
        vision_end_token_id=CFG.vision_end_token_id,
    )
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def jax_params(torch_model):
    state = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = convert_state_dict(state, CFG, dtype=jnp.float32, allow_missing_projection=True)
    # tiny random projection head standing in for custom_text_proj
    rng = np.random.default_rng(0)
    w = rng.standard_normal((CFG.text.hidden_size, CFG.embedding_dim)).astype(np.float32) * 0.05
    params["proj_w"] = jnp.asarray(w)
    params["proj_b"] = jnp.zeros((CFG.embedding_dim,), jnp.float32)
    return params, w


def _rand_patches(rng, h_units, w_units):
    s = h_units * w_units * 4
    return rng.standard_normal((s, CFG.vision.patch_input_dim)).astype(np.float32)


@pytest.mark.parametrize("grid", [(4, 4), (4, 8)])
def test_vision_tower_parity(torch_model, jax_params, grid):
    params, _ = jax_params
    h_units, w_units = grid
    rng = np.random.default_rng(1)
    patches = _rand_patches(rng, h_units, w_units)

    with torch.no_grad():
        want = torch_model.model.visual(
            torch.from_numpy(patches),
            grid_thw=torch.tensor([[1, h_units * 2, w_units * 2]]),
        ).numpy()

    cos, sin = vision_rotary_cos_sin(h_units, w_units, CFG.vision)
    got = np.asarray(
        vision_forward(
            params["visual"], jnp.asarray(patches)[None], jnp.asarray(cos), jnp.asarray(sin),
            h_units, w_units, CFG.vision,
        )
    )[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_mrope_position_ids_match_hf(torch_model):
    h_units, w_units = 4, 8
    n_img = h_units * w_units
    ids = np.array([[7, 9, CFG.vision_start_token_id] + [CFG.image_token_id] * n_img + [CFG.vision_end_token_id, 11, 12]])
    pos_hf, _ = torch_model.model.get_rope_index(
        torch.from_numpy(ids),
        image_grid_thw=torch.tensor([[1, h_units * 2, w_units * 2]]),
        attention_mask=torch.ones_like(torch.from_numpy(ids)),
    )
    pos = mrope_position_ids(ids, CFG.image_token_id, [(1, h_units, w_units)])
    np.testing.assert_array_equal(pos, pos_hf.numpy())


def test_full_image_forward_parity(torch_model, jax_params):
    params, proj_w = jax_params
    h_units, w_units = 4, 4
    n_img = h_units * w_units
    rng = np.random.default_rng(2)
    patches = _rand_patches(rng, h_units, w_units)
    prefix = [5, 6, CFG.vision_start_token_id]
    suffix = [CFG.vision_end_token_id, 8]
    ids = np.array([prefix + [CFG.image_token_id] * n_img + suffix], dtype=np.int64)

    with torch.no_grad():
        out = torch_model.model(
            input_ids=torch.from_numpy(ids),
            pixel_values=torch.from_numpy(patches),
            image_grid_thw=torch.tensor([[1, h_units * 2, w_units * 2]]),
            attention_mask=torch.ones_like(torch.from_numpy(ids)),
        )
        want_hidden = out.last_hidden_state[0].numpy()

    pos = mrope_position_ids(ids, CFG.image_token_id, [(1, h_units, w_units)])
    cos_t, sin_t = mrope_cos_sin(pos, CFG.text)
    cos_v, sin_v = vision_rotary_cos_sin(h_units, w_units, CFG.vision)
    got = np.asarray(
        colqwen_image_forward(
            params,
            CFG,
            patches=jnp.asarray(patches)[None],
            cos_v=jnp.asarray(cos_v),
            sin_v=jnp.asarray(sin_v),
            input_ids=jnp.asarray(ids.astype(np.int32)),
            cos_t=jnp.asarray(cos_t),
            sin_t=jnp.asarray(sin_t),
            h_units=h_units,
            w_units=w_units,
        )
    )[0]
    # reproduce projection + normalization on the torch side
    want = want_hidden @ proj_w
    want = want / np.maximum(np.linalg.norm(want, axis=-1, keepdims=True), 1e-12)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_text_only_forward_parity_with_padding(torch_model, jax_params):
    params, proj_w = jax_params
    rng = np.random.default_rng(3)
    b, s = 2, 12
    ids = rng.integers(1, 400, (b, s)).astype(np.int64)
    mask = np.ones((b, s), dtype=np.int64)
    mask[1, 8:] = 0
    ids[1, 8:] = 0

    with torch.no_grad():
        # HF expects left-or-right padding; use explicit position ids from
        # get_rope_index for exactness
        pos_hf, _ = torch_model.model.get_rope_index(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        )
        out = torch_model.model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            position_ids=pos_hf,
        )
        want_hidden = out.last_hidden_state.numpy()

    pos = mrope_position_ids(ids, -1, [None, None], attention_mask=mask)
    cos_t, sin_t = mrope_cos_sin(pos, CFG.text)
    got = np.asarray(
        colqwen_text_forward(
            params,
            CFG,
            input_ids=jnp.asarray(ids.astype(np.int32)),
            attention_mask=jnp.asarray(mask.astype(np.float32)),
            cos_t=jnp.asarray(cos_t),
            sin_t=jnp.asarray(sin_t),
        )
    )
    want = want_hidden @ proj_w
    want = want / np.maximum(np.linalg.norm(want, axis=-1, keepdims=True), 1e-12)
    want = want * mask[..., None]
    # compare only valid positions
    np.testing.assert_allclose(got[0], want[0], rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(got[1, :8], want[1, :8], rtol=5e-4, atol=5e-4)
