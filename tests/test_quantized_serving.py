"""W8A8 int8 serving mode: machinery parity on the tiny config.

This validates the quantized-matmul plumbing (per-channel weight scales,
dynamic per-token activation scales, dispatch through layers.linear),
NOT end-checkpoint quality — that requires real weights and the
evaluations/ harness (documented in docs/ARCHITECTURE.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from morphik_core_tpu.models.colqwen import ColQwenConfig, ColQwenModel
from morphik_core_tpu.models.colqwen.layers import linear, q8_matmul, quantize_weight_int8
from morphik_core_tpu.models.colqwen.model import init_colqwen_params, quantize_colqwen_params


def test_q8_matmul_close_to_f32():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (16, 64), jnp.float32)
    w = jax.random.normal(k2, (64, 32), jnp.float32) * 0.05
    ref = x @ w
    q = quantize_weight_int8(w)
    out = q8_matmul(x, q["q8"], q["s"])
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_linear_dispatches_on_leaf_form():
    x = jnp.ones((4, 8), jnp.float32)
    w = jnp.eye(8, dtype=jnp.float32)
    b = jnp.arange(8, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(linear(x, w, b)), np.asarray(x + b))
    q = quantize_weight_int8(w)
    np.testing.assert_allclose(np.asarray(linear(x, q, b)), np.asarray(x + b), atol=1e-2)


def test_stacked_weight_quantization_matches_per_layer():
    """(L, K, N) stacked quantization == quantizing each layer alone."""
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 8), jnp.float32)
    stacked = quantize_weight_int8(w)
    for layer in range(3):
        solo = quantize_weight_int8(w[layer])
        np.testing.assert_array_equal(np.asarray(stacked["q8"][layer]), np.asarray(solo["q8"]))
        np.testing.assert_allclose(np.asarray(stacked["s"][layer]), np.asarray(solo["s"]))


def test_int8_model_embeddings_track_bf16():
    """Tiny-model image+query embeddings: int8 mode stays close (cosine)
    to the full-precision path and preserves nearest-neighbor order."""
    cfg = ColQwenConfig.tiny()
    params = init_colqwen_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    m_fp = ColQwenModel(cfg, params, dtype=jnp.float32)
    m_q8 = ColQwenModel(cfg, jax.tree_util.tree_map(lambda x: x, params),
                        dtype=jnp.float32, matmul_precision="int8")

    # query path
    queries = ["total revenue in 2024", "who is the author"]
    e_fp = m_fp.embed_queries(queries)
    e_q8 = m_q8.embed_queries(queries)
    for a, b in zip(e_fp, e_q8):
        cos = np.sum(a * b, -1)  # rows are L2-normalized
        assert float(cos.mean()) > 0.98, float(cos.mean())

    # image path
    rng = np.random.default_rng(0)
    patches = rng.standard_normal((1, 4 * 4 * 4, cfg.vision.patch_input_dim)).astype(np.float32)
    i_fp = m_fp.embed_image_batch(patches, 4, 4)[0]
    i_q8 = m_q8.embed_image_batch(patches, 4, 4)[0]
    cos = np.sum(i_fp * i_q8, -1)
    assert float(cos.mean()) > 0.98, float(cos.mean())


def test_int8_rejects_unknown_precision():
    cfg = ColQwenConfig.tiny()
    params = init_colqwen_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    import pytest

    with pytest.raises(ValueError):
        ColQwenModel(cfg, params, matmul_precision="fp8")


def test_quantize_params_structure():
    cfg = ColQwenConfig.tiny()
    params = init_colqwen_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qp = quantize_colqwen_params(params)
    assert set(qp["text"]["layers"]["q_w"].keys()) == {"q8", "s"}
    assert qp["text"]["layers"]["q_w"]["q8"].dtype == jnp.int8
    # norms / biases / embeddings stay full precision
    assert qp["text"]["layers"]["input_ln"].dtype != jnp.int8
    assert qp["text"]["embed"].dtype != jnp.int8
    assert qp["visual"]["blocks"]["down_w"]["q8"].dtype == jnp.int8
    assert qp["visual"]["merger"]["fc1_w"].dtype != jnp.int8


def test_int8_mesh_sharding(mesh8):
    """W8A8 leaves ({"q8","s"}) shard over the tp axis like their bf16
    counterparts; the mesh-sharded int8 embed matches the single-device
    int8 embed."""
    key = jax.random.PRNGKey(3)
    cfg = ColQwenConfig.tiny()
    m_single = ColQwenModel.init_random(key, cfg, dtype=jnp.float32)
    m_single_q8 = ColQwenModel(cfg, m_single.params, dtype=jnp.float32, matmul_precision="int8")
    m_mesh_q8 = ColQwenModel(cfg, m_single.params, dtype=jnp.float32,
                             matmul_precision="int8", mesh=mesh8)
    rng = np.random.default_rng(0)
    patches = rng.standard_normal(
        (3, 4 * 4 * cfg.vision.merge_unit, cfg.vision.patch_input_dim)
    ).astype(np.float32)
    out_a = m_single_q8.embed_image_batch(patches, 4, 4)
    out_b = m_mesh_q8.embed_image_batch(patches, 4, 4)
    # sharded-reduction ordering can flip values sitting on an int8
    # rounding boundary: allow a few 1e-3-scale outliers
    np.testing.assert_allclose(out_a, out_b, rtol=2e-2, atol=2e-3)
