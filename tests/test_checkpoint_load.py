"""HF-format checkpoint round-trip (the production model-load path:
ColQwenModel.from_checkpoint <- convert.load_hf_checkpoint). Builds a
synthetic tiny checkpoint (config.json + safetensors in torch layout,
colpali_engine key naming) and checks a forward through the loaded
weights matches the source params."""

import json

import numpy as np
import pytest

from morphik_core_tpu.models.colqwen import ColQwenConfig, ColQwenModel


def _write_checkpoint(tmp_path, cfg: ColQwenConfig, rng) -> dict:
    """Emit torch-convention tensors for the tiny geometry; returns the
    state dict for cross-checking."""
    from safetensors.numpy import save_file

    v, t = cfg.vision, cfg.text
    state = {}

    def lin(name, out_dim, in_dim, bias=True):
        state[f"{name}.weight"] = rng.standard_normal((out_dim, in_dim)).astype(np.float32) * 0.05
        if bias:
            state[f"{name}.bias"] = rng.standard_normal((out_dim,)).astype(np.float32) * 0.01

    # vision tower (flat legacy naming: visual.*)
    state["visual.patch_embed.proj.weight"] = (
        rng.standard_normal((v.hidden_size, v.in_channels, v.temporal_patch_size, v.patch_size, v.patch_size))
        .astype(np.float32) * 0.05
    )
    for i in range(v.depth):
        p = f"visual.blocks.{i}."
        state[p + "norm1.weight"] = np.ones(v.hidden_size, np.float32)
        state[p + "norm2.weight"] = np.ones(v.hidden_size, np.float32)
        lin(p + "attn.qkv", 3 * v.hidden_size, v.hidden_size)
        lin(p + "attn.proj", v.hidden_size, v.hidden_size)
        lin(p + "mlp.gate_proj", v.intermediate_size, v.hidden_size)
        lin(p + "mlp.up_proj", v.intermediate_size, v.hidden_size)
        lin(p + "mlp.down_proj", v.hidden_size, v.intermediate_size)
    mh = v.hidden_size * v.merge_unit
    state["visual.merger.ln_q.weight"] = np.ones(v.hidden_size, np.float32)
    lin("visual.merger.mlp.0", mh, mh)
    lin("visual.merger.mlp.2", v.out_hidden_size, mh)

    # text decoder (flat naming: model.*)
    state["model.embed_tokens.weight"] = rng.standard_normal((t.vocab_size, t.hidden_size)).astype(np.float32) * 0.05
    for i in range(t.num_hidden_layers):
        p = f"model.layers.{i}."
        state[p + "input_layernorm.weight"] = np.ones(t.hidden_size, np.float32)
        state[p + "post_attention_layernorm.weight"] = np.ones(t.hidden_size, np.float32)
        lin(p + "self_attn.q_proj", t.num_attention_heads * t.head_dim, t.hidden_size)
        lin(p + "self_attn.k_proj", t.num_key_value_heads * t.head_dim, t.hidden_size)
        lin(p + "self_attn.v_proj", t.num_key_value_heads * t.head_dim, t.hidden_size)
        lin(p + "self_attn.o_proj", t.hidden_size, t.num_attention_heads * t.head_dim, bias=False)
        lin(p + "mlp.gate_proj", t.intermediate_size, t.hidden_size, bias=False)
        lin(p + "mlp.up_proj", t.intermediate_size, t.hidden_size, bias=False)
        lin(p + "mlp.down_proj", t.hidden_size, t.intermediate_size, bias=False)
    state["model.norm.weight"] = np.ones(t.hidden_size, np.float32)
    lin("custom_text_proj", cfg.embedding_dim, t.hidden_size)

    save_file(state, str(tmp_path / "model.safetensors"))
    config = {
        "vision_config": {
            "depth": v.depth, "hidden_size": v.hidden_size,
            "intermediate_size": v.intermediate_size, "num_heads": v.num_heads,
            "out_hidden_size": v.out_hidden_size,
            "fullatt_block_indexes": list(v.fullatt_block_indexes),
        },
        "vocab_size": t.vocab_size,
        "hidden_size": t.hidden_size,
        "intermediate_size": t.intermediate_size,
        "num_hidden_layers": t.num_hidden_layers,
        "num_attention_heads": t.num_attention_heads,
        "num_key_value_heads": t.num_key_value_heads,
        "rope_scaling": {"mrope_section": list(t.mrope_section)},
        "image_token_id": cfg.image_token_id,
        "vision_start_token_id": cfg.vision_start_token_id,
        "vision_end_token_id": cfg.vision_end_token_id,
        "embedding_dim": cfg.embedding_dim,
    }
    (tmp_path / "config.json").write_text(json.dumps(config))
    return state


def test_from_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    cfg = ColQwenConfig.tiny()
    rng = np.random.default_rng(11)
    state = _write_checkpoint(tmp_path, cfg, rng)

    model = ColQwenModel.from_checkpoint(tmp_path, dtype=jnp.float32)
    assert model.cfg.text.num_hidden_layers == cfg.text.num_hidden_layers
    assert model.cfg.embedding_dim == cfg.embedding_dim

    # spot-check weight conversion: torch (out,in) -> jax (in,out), layer-stacked
    got_q0 = np.asarray(model.params["text"]["layers"]["q_w"][0])
    want_q0 = state["model.layers.0.self_attn.q_proj.weight"].T
    np.testing.assert_allclose(got_q0, want_q0, rtol=1e-6)
    # vision fused qkv split: k slice of layer 1
    h = cfg.vision.hidden_size
    got_k1 = np.asarray(model.params["visual"]["blocks"]["k_w"][1])
    want_k1 = state["visual.blocks.1.attn.qkv.weight"].T[:, h : 2 * h]
    np.testing.assert_allclose(got_k1, want_k1, rtol=1e-6)

    # forward runs and produces normalized multivectors
    q = model.embed_queries(["checkpoint roundtrip"])[0]
    assert q.shape[1] == cfg.embedding_dim
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-4)

    s = 4 * 4 * cfg.vision.merge_unit
    patches = rng.standard_normal((1, s, cfg.vision.patch_input_dim)).astype(np.float32)
    out = model.embed_image_batch(patches, 4, 4)
    assert out.shape[0] == 1 and out.shape[2] == cfg.embedding_dim


def test_from_checkpoint_missing_files(tmp_path):
    (tmp_path / "config.json").write_text("{}")
    with pytest.raises(FileNotFoundError):
        ColQwenModel.from_checkpoint(tmp_path)


def test_rehearsal_script_tiny(tmp_path):
    """scripts/rehearse_checkpoint.py end-to-end at tiny geometry:
    sharded HF-format write -> from_checkpoint boot -> serving step ->
    failure modes (missing custom_text_proj rejected, f32 converts)."""
    import json as _json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "scripts/rehearse_checkpoint.py", "--small", "--cpu",
         "--dir", str(tmp_path / "ck")],
        capture_output=True, text=True, timeout=300,
        cwd=str(__import__("pathlib").Path(__file__).resolve().parent.parent),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = _json.loads(out.stdout.strip().splitlines()[-1])
    assert report["failure_modes"] == {
        "missing_proj_rejected": True, "f32_checkpoint_converts": True}
    assert report["load"]["emb_shape"][0] == 2
