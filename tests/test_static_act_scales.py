"""Static activation-scale calibration for the int8 vision tower
(models/colqwen/calibrate.py — round-5 verdict item 2): the calibrated
"as" leaves must (a) capture one activation range per quantized site in
trace order, (b) replace the dynamic per-token max-abs passes without
materially moving the embeddings, (c) survive the model-level
calibrate + re-jit flow end to end.

Reference precision context: the reference serves bf16
(core/embedding/colpali_embedding_model.py:37-61); int8 is a gated
lever beyond it."""

import numpy as np
import pytest
from PIL import Image, ImageDraw

import jax

from morphik_core_tpu.models.colqwen import ColQwenConfig, ColQwenModel
from morphik_core_tpu.models.colqwen.calibrate import (
    _SITE_COLUMNS,
    attach_vision_act_scales,
    capture_vision_act_maxes,
)
from morphik_core_tpu.models.colqwen.preprocess import preprocess_image_u8


def _page(seed: int):
    rng = np.random.default_rng(seed)
    img = Image.new("RGB", (448, 336), "white")
    d = ImageDraw.Draw(img)
    for _ in range(30):
        x, y = int(rng.integers(0, 400)), int(rng.integers(0, 320))
        d.text((x, y), rng.choice(["torque", "flux", "rotor", "KELVIN-1234"]), fill="black")
    return img


@pytest.fixture(scope="module")
def int8_model():
    return ColQwenModel.init_random(
        jax.random.PRNGKey(0), ColQwenConfig.tiny(), matmul_precision="int8"
    )


@pytest.fixture(scope="module")
def batches():
    prepped = [preprocess_image_u8(_page(s)) for s in range(4)]
    grid = prepped[0][1]
    assert all(g == grid for _, g in prepped)
    u8 = np.stack([p for p, _ in prepped])
    return [u8[:2], u8[2:]], grid


def test_capture_shape_and_positivity(int8_model, batches):
    u8_batches, (hu, wu) = batches
    maxes, qk_maxes = capture_vision_act_maxes(
        int8_model.params["visual"], u8_batches, hu, wu, int8_model.cfg.vision
    )
    assert maxes.shape == (int8_model.cfg.vision.depth, len(_SITE_COLUMNS))
    assert (maxes > 0).all()
    assert qk_maxes.shape == (int8_model.cfg.vision.depth, 2)
    assert (qk_maxes > 0).all()


def test_capture_requires_quantized_params():
    bf16 = ColQwenModel.init_random(jax.random.PRNGKey(0), ColQwenConfig.tiny())
    with pytest.raises(ValueError, match="not int8-quantized"):
        capture_vision_act_maxes(bf16.params["visual"], [], 8, 8, bf16.cfg.vision)


def test_attach_and_embedding_parity(int8_model, batches):
    u8_batches, (hu, wu) = batches
    maxes, _ = capture_vision_act_maxes(
        int8_model.params["visual"], u8_batches, hu, wu, int8_model.cfg.vision
    )
    visual = attach_vision_act_scales(int8_model.params["visual"], maxes)
    depth = int8_model.cfg.vision.depth
    for names in _SITE_COLUMNS:
        for n in names:
            assert visual["blocks"][n]["as"].shape == (depth,)
    # q/k/v share the activation -> identical scales
    assert np.allclose(visual["blocks"]["q_w"]["as"], visual["blocks"]["k_w"]["as"])

    dyn = int8_model.embed_image_batch(u8_batches[0], hu, wu)

    static_model = ColQwenModel(
        int8_model.cfg, dict(int8_model.params), matmul_precision="bf16"
    )
    # params are already quantized; bypass re-quantization by swapping in
    # the calibrated visual tree and flipping the precision tag
    static_model.params["visual"] = visual
    static_model.matmul_precision = "int8"
    static_model._image_fn_cache.clear()
    stat = static_model.embed_image_batch(u8_batches[0], hu, wu)

    # static scales clip only out-of-calibration outliers: on the
    # calibration batch itself the embeddings must stay aligned
    for a, b in zip(np.asarray(dyn, np.float32), np.asarray(stat, np.float32)):
        cos = np.sum(a * b, -1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
        )
        assert float(np.mean(cos)) > 0.97, float(np.mean(cos))


def test_model_level_calibration_flow(batches):
    u8_batches, (hu, wu) = batches
    model = ColQwenModel.init_random(
        jax.random.PRNGKey(1), ColQwenConfig.tiny(), matmul_precision="int8"
    )
    before = np.asarray(model.embed_image_batch(u8_batches[0], hu, wu))
    model.calibrate_static_act_scales(u8_batches, hu, wu)
    assert model.params["visual"]["blocks"]["q_w"].get("as") is not None
    after = np.asarray(model.embed_image_batch(u8_batches[0], hu, wu))
    assert before.shape == after.shape
    cos = np.sum(before * after, -1) / (
        np.linalg.norm(before, axis=-1) * np.linalg.norm(after, axis=-1) + 1e-9
    )
    assert float(np.mean(cos)) > 0.97

    bf16 = ColQwenModel.init_random(jax.random.PRNGKey(1), ColQwenConfig.tiny())
    with pytest.raises(ValueError, match="require matmul_precision"):
        bf16.calibrate_static_act_scales(u8_batches, hu, wu)


def test_static_qk_attention_numerics():
    """int8 QK^T with calibrated static scales must track bf16 attention
    closely (the scalar-scale epilogue replaces the per-token passes
    without materially moving the output)."""
    from morphik_core_tpu.models.colqwen.layers import attention

    rng = np.random.default_rng(0)
    q = rng.normal(0, 1, (2, 64, 4, 16)).astype(np.float32)
    k = rng.normal(0, 1, (2, 64, 4, 16)).astype(np.float32)
    v = rng.normal(0, 1, (2, 64, 4, 16)).astype(np.float32)
    ref = np.asarray(attention(q, k, v))
    qs, ks = float(np.abs(q).max()) / 127.0, float(np.abs(k).max()) / 127.0
    out = np.asarray(attention(q, k, v, qk_int8=True, qk_static=(qs, ks)))
    cos = np.sum(ref * out, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1) + 1e-9
    )
    assert float(np.mean(cos)) > 0.999, float(np.mean(cos))


def test_calibrated_qk_scales_ride_the_unrolled_tower(batches):
    """End-to-end: calibrate with attention_precision=int8 — the
    attn_qk_as leaf is attached, the unrolled tower consumes it, and
    embeddings stay aligned with the bf16-attention int8 tower."""
    u8_batches, (hu, wu) = batches
    model = ColQwenModel.init_random(
        jax.random.PRNGKey(3), ColQwenConfig.tiny(), matmul_precision="int8"
    )
    base = np.asarray(model.embed_image_batch(u8_batches[0], hu, wu))
    model.calibrate_static_act_scales(u8_batches, hu, wu)
    assert model.params["visual"]["blocks"].get("attn_qk_as") is not None

    import dataclasses

    qk_cfg = dataclasses.replace(
        model.cfg, vision=dataclasses.replace(model.cfg.vision, qk_int8=True)
    )
    qk_model = ColQwenModel(qk_cfg, model.params, matmul_precision="bf16")
    qk_model.matmul_precision = "int8"  # params already quantized+calibrated
    qk_model._image_fn_cache.clear()
    out = np.asarray(qk_model.embed_image_batch(u8_batches[0], hu, wu))
    cos = np.sum(base * out, -1) / (
        np.linalg.norm(base, axis=-1) * np.linalg.norm(out, axis=-1) + 1e-9
    )
    assert float(np.mean(cos)) > 0.97, float(np.mean(cos))


def test_serving_startup_calibration_flow():
    """config model.static_act_scales=true calibrates the embedder's
    int8 vision tower at startup (the fidelity gate and serving share
    this exact path)."""
    from morphik_core_tpu.config import Settings
    from morphik_core_tpu.embedding.colpali_embedding_model import ColpaliEmbeddingModel

    settings = Settings.model_validate(
        {"model": {"matmul_precision": "int8", "static_act_scales": True}}
    )
    model = ColQwenModel.init_random(
        jax.random.PRNGKey(2), ColQwenConfig.tiny(), matmul_precision="int8"
    )
    emb = ColpaliEmbeddingModel(settings, model=model)
    assert emb.model.params["visual"]["blocks"]["q_w"].get("as") is not None
    # bf16 serving ignores the knob
    settings_bf16 = Settings.model_validate({"model": {"static_act_scales": True}})
    bf16 = ColQwenModel.init_random(jax.random.PRNGKey(2), ColQwenConfig.tiny())
    emb2 = ColpaliEmbeddingModel(settings_bf16, model=bf16)
    assert not isinstance(emb2.model.params["visual"]["blocks"]["q_w"], dict)
