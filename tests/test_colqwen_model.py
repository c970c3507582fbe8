"""ColQwenModel wrapper smoke tests (random weights): shapes, masking,
normalization, preprocessing — mirrors the reference's real-model shape
test (SURVEY.md §4, test_colpali_embedding.py)."""

import numpy as np
import pytest
import jax

from PIL import Image

from morphik_core_tpu.models.colqwen.config import ColQwenConfig
from morphik_core_tpu.models.colqwen.model import ColQwenModel
from morphik_core_tpu.models.colqwen.preprocess import (
    bucket_images,
    preprocess_image,
    smart_resize,
)


@pytest.fixture(scope="module")
def model():
    return ColQwenModel.init_random(jax.random.PRNGKey(0), ColQwenConfig.tiny())


def test_smart_resize_multiples_of_112():
    h, w = smart_resize(793, 612)
    assert h % 112 == 0 and w % 112 == 0
    # aspect roughly preserved
    assert abs((h / w) - (793 / 612)) < 0.4


def test_preprocess_image_shapes():
    img = Image.new("RGB", (400, 300), (200, 30, 90))
    patches, (hu, wu) = preprocess_image(img)
    assert hu % 4 == 0 and wu % 4 == 0
    assert patches.shape == (hu * wu * 4, 1176)


def test_bucket_images():
    grids = [(4, 4), (4, 8), (8, 8)]
    assert bucket_images([(4, 4), (4, 6), (8, 8), (9, 9)], grids) == [0, 1, 2, -1]


def test_embed_image_batch_shape_and_norm(model):
    rng = np.random.default_rng(0)
    b, hu, wu = 2, 4, 4
    patches = rng.standard_normal((b, hu * wu * 4, 1176)).astype(np.float32)
    out = model.embed_image_batch(patches, hu, wu)
    assert out.ndim == 3 and out.shape[0] == b and out.shape[2] == model.cfg.embedding_dim
    norms = np.linalg.norm(out, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_embed_queries_ragged(model):
    outs = model.embed_queries(["what is revenue?", "a much longer query about the quarterly financial report"])
    assert len(outs) == 2
    for o in outs:
        assert o.ndim == 2 and o.shape[1] == model.cfg.embedding_dim
        np.testing.assert_allclose(np.linalg.norm(o, axis=-1), 1.0, atol=1e-4)
    assert outs[1].shape[0] > outs[0].shape[0]


def test_bf16_rotary_embedding_fidelity():
    """bf16 serving runs rotary in bf16 (layers.apply_rotary computes in
    the input dtype). Guard: bf16-path embeddings must stay directionally
    faithful to the fp32 path (MaxSim ranking stability floor)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from morphik_core_tpu.models.colqwen import ColQwenConfig, ColQwenModel

    cfg = ColQwenConfig.tiny()
    m32 = ColQwenModel.init_random(jax.random.PRNGKey(7), cfg, dtype=jnp.float32)
    m16 = ColQwenModel.init_random(jax.random.PRNGKey(7), cfg, dtype=jnp.bfloat16)
    q32 = m32.embed_queries(["the quarterly revenue grew by ten percent"])[0]
    q16 = m16.embed_queries(["the quarterly revenue grew by ten percent"])[0]
    assert q32.shape == q16.shape
    # rows are L2-normalized; per-token cosine similarity must stay high
    cos = np.sum(q32 * q16, axis=-1)
    assert float(np.min(cos)) > 0.99, f"min token cosine {float(np.min(cos))}"


def test_mesh_sharded_embed_matches_single_device(mesh8):
    """ColQwenModel(mesh=...): dp/tp-sharded image embed equals the
    unsharded result; odd batches pad to the data axis and slice back."""
    import jax
    import numpy as np

    from morphik_core_tpu.models.colqwen import ColQwenConfig, ColQwenModel

    cfg = ColQwenConfig.tiny()
    key = jax.random.PRNGKey(3)
    m_single = ColQwenModel.init_random(key, cfg, dtype=np.float32)
    m_mesh = ColQwenModel.init_random(key, cfg, dtype=np.float32, mesh=mesh8)
    rng = np.random.default_rng(0)
    b = 3  # not a multiple of data axis (2) -> exercises padding
    patches = rng.standard_normal(
        (b, 4 * 4 * cfg.vision.merge_unit, cfg.vision.patch_input_dim)
    ).astype(np.float32)
    out_single = m_single.embed_image_batch(patches, 4, 4)
    out_mesh = m_mesh.embed_image_batch(patches, 4, 4)
    assert out_mesh.shape == out_single.shape
    np.testing.assert_allclose(out_mesh, out_single, rtol=2e-5, atol=2e-5)


def test_embed_queries_groups_by_bucket(monkeypatch):
    """One long query must not re-bucket the short ones: each query runs
    in the smallest bucket that fits it, and results keep input order."""
    import jax
    import numpy as np

    from morphik_core_tpu.models.colqwen import ColQwenConfig, ColQwenModel

    model = ColQwenModel.init_random(jax.random.PRNGKey(0), ColQwenConfig.tiny(),
                                     query_buckets=(16, 32, 64, 128))
    seen_shapes = []
    orig = model._text_fn

    def spy(params, input_ids, attention_mask, cos_t, sin_t):
        seen_shapes.append(tuple(input_ids.shape))
        return orig(params, input_ids=input_ids, attention_mask=attention_mask,
                    cos_t=cos_t, sin_t=sin_t)

    model._text_fn = spy
    short = "hi"
    long = "x " * 90  # tokens > 64 -> 128 bucket
    out = model.embed_queries([short, long, short])
    assert len(out) == 3
    assert out[0].shape == out[2].shape and np.allclose(out[0], out[2])
    buckets = sorted(s[1] for s in seen_shapes)
    assert buckets[0] <= 32 and buckets[-1] >= 128  # two groups, not one big
    assert sorted(s[0] for s in seen_shapes) == [1, 2]  # 2 shorts + 1 long


def test_u8_patch_path_matches_f32(model):
    """The transfer-diet ingest path (uint8 patches + on-device
    normalize/temporal-expand, preprocess_image_u8 + expand_patches_u8)
    must produce the same embeddings as the classic host-normalized f32
    path to within float rounding."""
    from morphik_core_tpu.models.colqwen.preprocess import preprocess_image_u8

    rng = np.random.default_rng(3)
    img = Image.fromarray(rng.integers(0, 256, (300, 400, 3), dtype=np.uint8))
    pf, (hu, wu) = preprocess_image(img)
    pu, (hu2, wu2) = preprocess_image_u8(img)
    assert (hu, wu) == (hu2, wu2)
    assert pu.dtype == np.uint8 and pu.shape == (pf.shape[0], pf.shape[1] // 2)
    # the u8 layout drops the duplicated temporal frame; re-expanding on
    # host must reproduce the f32 patches exactly (same pixels)
    pp = 14 * 14
    re = np.repeat(pu.reshape(pu.shape[0], 3, 1, pp), 2, axis=2).astype(np.float32)
    from morphik_core_tpu.models.colqwen.preprocess import IMAGE_MEAN, IMAGE_STD

    re = (re / 255.0 - IMAGE_MEAN[None, :, None, None]) / IMAGE_STD[None, :, None, None]
    np.testing.assert_allclose(re.reshape(pf.shape), pf, atol=1e-5)

    out_f = model.embed_image_batch(pf[None], hu, wu)
    out_u = model.embed_image_batch(pu[None], hu, wu)
    np.testing.assert_allclose(out_u, out_f, atol=2e-3)


def test_attention_qk_int8_close_to_bf16():
    """int8 QK^T (per-token/head scales, int32 accumulate) must track
    the float score path closely — logit error ~0.5% relative stays
    inside softmax tolerance (round-4 attention-precision lever)."""
    import jax.numpy as jnp

    from morphik_core_tpu.models.colqwen.layers import attention

    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 24, 4, 16)).astype(np.float32)
    k = rng.standard_normal((2, 24, 2, 16)).astype(np.float32)  # GQA repeat
    v = rng.standard_normal((2, 24, 2, 16)).astype(np.float32)
    ref = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    q8 = np.asarray(
        attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), qk_int8=True)
    )
    assert q8.shape == ref.shape
    err = np.abs(q8 - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.05, f"int8 QK^T diverged: max rel err {err:.4f}"
    # bias path (text tower) too
    bias = np.zeros((1, 1, 24, 24), np.float32)
    bias[..., 12:] = -1e30  # mask the tail keys
    rb = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              bias=jnp.asarray(bias)))
    qb = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              bias=jnp.asarray(bias), qk_int8=True))
    err = np.abs(qb - rb).max() / (np.abs(rb).max() + 1e-9)
    assert err < 0.05


def test_model_attention_precision_int8_ranking_parity():
    """A tiny tower with attention_precision='int8' must produce
    embeddings whose self-retrieval ranking matches the bf16-attention
    twin (same weights) — the fidelity property the serving gate
    checks at 3B geometry."""
    cfg = ColQwenConfig.tiny()
    key = jax.random.PRNGKey(3)
    m_ref = ColQwenModel.init_random(key, cfg)
    m_q8 = ColQwenModel.init_random(key, cfg, attention_precision="int8")
    assert m_q8.cfg.vision.qk_int8 and m_q8.cfg.text.qk_int8

    imgs = []
    for i in range(4):
        im = Image.new("RGB", (448, 336), (255, 255, 255))
        px = im.load()
        for x in range(0, 448, 8 + i):
            for y in range(0, 336, 6 + i):
                px[x, y] = (20 * i, 120, 220)
        imgs.append(im)
    embs_ref, embs_q8 = [], []
    for im in imgs:
        patches, (hu, wu) = preprocess_image(im)
        embs_ref.append(np.asarray(m_ref.embed_image_batch(patches[None], hu, wu)[0]))
        embs_q8.append(np.asarray(m_q8.embed_image_batch(patches[None], hu, wu)[0]))
    # token-level drift bounded
    for a, b in zip(embs_ref, embs_q8):
        num = float((a * b).sum())
        den = float(np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert num / den > 0.99, "attention-int8 embeddings diverged"

    def maxsim(qm, dm):
        return float(np.einsum("qd,td->qt", qm, dm).max(axis=1).sum())

    for qi in range(4):
        s_ref = [maxsim(embs_ref[qi], d) for d in embs_ref]
        s_q8 = [maxsim(embs_q8[qi], d) for d in embs_q8]
        assert int(np.argmax(s_ref)) == int(np.argmax(s_q8)) == qi
