#!/usr/bin/env python3
"""Full-scale checkpoint load rehearsal (round-3 verdict item 6).

Writes a FULL-SIZE random ColQwen2.5-3B checkpoint in the exact HF
format the released `tsystems/colqwen2.5-3b-multilingual-v1.0` ships
(sharded bf16 safetensors with colpali_engine tensor names +
model.safetensors.index.json + config.json — reference load path:
core/embedding/colpali_embedding_model.py:47-56), then rehearses the
production boot: ColQwenModel.from_checkpoint -> one serving step on
the attached device, reporting per-phase timings and peak host RSS.

The serving-step timing doubles as the no-HLO-constants check: weights
ride as jit ARGUMENTS (closing 7.5 GB of device arrays into the traced
function bakes them into the lowered HLO as constants -> multi-minute
lowering; see CLAUDE.md). A compile that finishes in normal time is the
proof.

Also rehearses the two load failure modes: a checkpoint missing
custom_text_proj must be rejected (base Qwen2.5-VL, not ColPali), and a
float32-stored checkpoint must load (converted to the requested dtype).

Usage:
    python scripts/rehearse_checkpoint.py [--dir /tmp/ckpt_3b]
        [--small] [--keep] [--skip-write]

--small swaps in the tiny dev geometry (seconds, CI-friendly);
the default is the full 3B geometry (~7.5 GB on disk, minutes).
"""

from __future__ import annotations

import argparse
import json
import resource
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def hf_config_dict(cfg) -> dict:
    v, t = cfg.vision, cfg.text
    return {
        "architectures": ["ColQwen2_5"],
        "model_type": "qwen2_5_vl",
        "embedding_dim": cfg.embedding_dim,
        "image_token_id": cfg.image_token_id,
        "vision_start_token_id": cfg.vision_start_token_id,
        "vision_end_token_id": cfg.vision_end_token_id,
        "tie_word_embeddings": t.tie_word_embeddings,
        "rope_scaling": {"mrope_section": list(t.mrope_section), "type": "mrope"},
        "vision_config": {
            "depth": v.depth, "hidden_size": v.hidden_size,
            "intermediate_size": v.intermediate_size, "num_heads": v.num_heads,
            "in_channels": v.in_channels, "patch_size": v.patch_size,
            "spatial_merge_size": v.spatial_merge_size,
            "temporal_patch_size": v.temporal_patch_size,
            "window_size": v.window_size, "out_hidden_size": v.out_hidden_size,
            "fullatt_block_indexes": list(v.fullatt_block_indexes),
        },
        "text_config": {
            "vocab_size": t.vocab_size, "hidden_size": t.hidden_size,
            "intermediate_size": t.intermediate_size,
            "num_hidden_layers": t.num_hidden_layers,
            "num_attention_heads": t.num_attention_heads,
            "num_key_value_heads": t.num_key_value_heads,
            "rms_norm_eps": t.rms_norm_eps, "rope_theta": t.rope_theta,
        },
    }


def iter_tensors(cfg, rng):
    """Yield (name, shape, has_bias) tensor specs in colpali_engine's
    flat legacy naming (visual.* / model.* / custom_text_proj.*) —
    the naming the released ColQwen2.5 checkpoints use."""
    import ml_dtypes

    v, t = cfg.vision, cfg.text

    def w(name, *shape, scale=0.02):
        # float32 RNG then bf16 cast — exactly what the released
        # checkpoint stores (bf16 weights)
        arr = rng.standard_normal(shape, dtype=np.float32) * scale
        return name, arr.astype(ml_dtypes.bfloat16)

    def ones(name, *shape):
        return name, np.ones(shape, ml_dtypes.bfloat16)

    yield w("visual.patch_embed.proj.weight", v.hidden_size, v.in_channels,
            v.temporal_patch_size, v.patch_size, v.patch_size)
    for i in range(v.depth):
        p = f"visual.blocks.{i}."
        yield ones(p + "norm1.weight", v.hidden_size)
        yield ones(p + "norm2.weight", v.hidden_size)
        yield w(p + "attn.qkv.weight", 3 * v.hidden_size, v.hidden_size)
        yield w(p + "attn.qkv.bias", 3 * v.hidden_size, scale=0.0)
        yield w(p + "attn.proj.weight", v.hidden_size, v.hidden_size)
        yield w(p + "attn.proj.bias", v.hidden_size, scale=0.0)
        yield w(p + "mlp.gate_proj.weight", v.intermediate_size, v.hidden_size)
        yield w(p + "mlp.gate_proj.bias", v.intermediate_size, scale=0.0)
        yield w(p + "mlp.up_proj.weight", v.intermediate_size, v.hidden_size)
        yield w(p + "mlp.up_proj.bias", v.intermediate_size, scale=0.0)
        yield w(p + "mlp.down_proj.weight", v.hidden_size, v.intermediate_size)
        yield w(p + "mlp.down_proj.bias", v.hidden_size, scale=0.0)
    mh = v.hidden_size * v.merge_unit
    yield ones("visual.merger.ln_q.weight", v.hidden_size)
    yield w("visual.merger.mlp.0.weight", mh, mh)
    yield w("visual.merger.mlp.0.bias", mh, scale=0.0)
    yield w("visual.merger.mlp.2.weight", v.out_hidden_size, mh)
    yield w("visual.merger.mlp.2.bias", v.out_hidden_size, scale=0.0)

    yield w("model.embed_tokens.weight", t.vocab_size, t.hidden_size)
    for i in range(t.num_hidden_layers):
        p = f"model.layers.{i}."
        yield ones(p + "input_layernorm.weight", t.hidden_size)
        yield ones(p + "post_attention_layernorm.weight", t.hidden_size)
        yield w(p + "self_attn.q_proj.weight", t.num_attention_heads * t.head_dim, t.hidden_size)
        yield w(p + "self_attn.q_proj.bias", t.num_attention_heads * t.head_dim, scale=0.0)
        yield w(p + "self_attn.k_proj.weight", t.num_key_value_heads * t.head_dim, t.hidden_size)
        yield w(p + "self_attn.k_proj.bias", t.num_key_value_heads * t.head_dim, scale=0.0)
        yield w(p + "self_attn.v_proj.weight", t.num_key_value_heads * t.head_dim, t.hidden_size)
        yield w(p + "self_attn.v_proj.bias", t.num_key_value_heads * t.head_dim, scale=0.0)
        yield w(p + "self_attn.o_proj.weight", t.hidden_size, t.num_attention_heads * t.head_dim)
        yield w(p + "mlp.gate_proj.weight", t.intermediate_size, t.hidden_size)
        yield w(p + "mlp.up_proj.weight", t.intermediate_size, t.hidden_size)
        yield w(p + "mlp.down_proj.weight", t.hidden_size, t.intermediate_size)
    yield ones("model.norm.weight", t.hidden_size)
    yield w("custom_text_proj.weight", cfg.embedding_dim, t.hidden_size)
    yield w("custom_text_proj.bias", cfg.embedding_dim, scale=0.0)


def write_checkpoint(cfg, out_dir: Path, shard_budget_bytes: int = 2 * 1024**3) -> dict:
    """Sharded safetensors + index.json + config.json. Returns stats."""
    from safetensors.numpy import save_file

    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    shards, current, cur_bytes, total_bytes, weight_map = [], {}, 0, 0, {}
    t0 = time.time()
    for name, arr in iter_tensors(cfg, rng):
        current[name] = arr
        cur_bytes += arr.nbytes
        total_bytes += arr.nbytes
        if cur_bytes >= shard_budget_bytes:
            shards.append(current)
            current, cur_bytes = {}, 0
    if current:
        shards.append(current)
    n = len(shards)
    for i, shard in enumerate(shards):
        fname = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
        save_file(shard, str(out_dir / fname))
        for k in shard:
            weight_map[k] = fname
    with open(out_dir / "model.safetensors.index.json", "w") as fh:
        json.dump({"metadata": {"total_size": total_bytes}, "weight_map": weight_map}, fh)
    with open(out_dir / "config.json", "w") as fh:
        json.dump(hf_config_dict(cfg), fh, indent=1)
    return {
        "write_s": round(time.time() - t0, 1),
        "shards": n,
        "tensors": len(weight_map),
        "bytes": total_bytes,
        "gb": round(total_bytes / 1024**3, 2),
    }


def rehearse_load(cfg, ckpt_dir: Path, grid=(20, 28), batch=8) -> dict:
    import jax
    import jax.numpy as jnp

    from morphik_core_tpu.models.colqwen import ColQwenModel

    stats = {}
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    t0 = time.time()
    model = ColQwenModel.from_checkpoint(ckpt_dir)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(model.params))
    jax.block_until_ready(model.params)
    stats["load_s"] = round(time.time() - t0, 1)  # read + convert + device upload
    stats["n_params"] = n_params
    stats["backend"] = jax.default_backend()

    hu, wu = grid
    s_patches = hu * wu * cfg.vision.merge_unit
    patches = np.zeros((batch, s_patches, cfg.vision.patch_input_dim), np.float32)

    # First serving step: trace + lower + compile with params as jit
    # ARGUMENTS. If weights had leaked into the HLO as constants, this
    # stage alone would take many minutes and the program would be GBs.
    t0 = time.time()
    embs = model.embed_image_batch(patches, hu, wu)
    stats["first_step_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    embs = model.embed_image_batch(patches, hu, wu)
    stats["steady_step_ms"] = round((time.time() - t0) * 1e3, 1)
    stats["emb_shape"] = list(np.asarray(embs).shape)
    assert np.isfinite(np.asarray(embs, np.float32)).all(), "non-finite embeddings"

    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    stats["peak_rss_gb"] = round(rss1 / 1024**2, 2)  # linux ru_maxrss is KiB
    stats["rss_delta_gb"] = round((rss1 - rss0) / 1024**2, 2)
    del model
    return stats


def rehearse_failure_modes(cfg, tmp_dir: Path) -> dict:
    """Covered failure modes: (a) base Qwen2.5-VL checkpoint (no
    custom_text_proj) must be REJECTED; (b) float32-stored weights must
    load and come out in the requested dtype."""
    from safetensors.numpy import save_file

    from morphik_core_tpu.models.colqwen import ColQwenConfig
    from morphik_core_tpu.models.colqwen.convert import load_hf_checkpoint

    tiny = ColQwenConfig.tiny()
    rng = np.random.default_rng(1)

    # (a) missing projection head
    d = tmp_dir / "no_proj"
    d.mkdir(parents=True, exist_ok=True)
    state = {
        name: np.asarray(arr, np.float32)
        for name, arr in iter_tensors(tiny, rng)
        if not name.startswith("custom_text_proj")
    }
    save_file(state, str(d / "model.safetensors"))
    rejected = False
    try:
        load_hf_checkpoint(d, tiny)
    except KeyError as e:
        rejected = "custom_text_proj" in str(e)

    # (b) float32 storage converts to requested dtype
    d2 = tmp_dir / "f32"
    d2.mkdir(parents=True, exist_ok=True)
    state = {name: np.asarray(arr, np.float32) for name, arr in iter_tensors(tiny, rng)}
    save_file(state, str(d2 / "model.safetensors"))
    import jax.numpy as jnp

    params = load_hf_checkpoint(d2, tiny, dtype=jnp.bfloat16)
    f32_ok = str(params["proj_w"].dtype) == "bfloat16"
    return {"missing_proj_rejected": rejected, "f32_checkpoint_converts": f32_ok}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ckpt_rehearsal")
    ap.add_argument("--small", action="store_true", help="tiny geometry (CI)")
    ap.add_argument("--skip-write", action="store_true", help="reuse an existing dir")
    ap.add_argument("--keep", action="store_true", help="don't delete the checkpoint")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from morphik_core_tpu.models.colqwen import ColQwenConfig

    cfg = ColQwenConfig.tiny() if args.small else ColQwenConfig()
    out = Path(args.dir)
    report = {"geometry": "tiny" if args.small else "3b"}
    if not args.skip_write:
        report["write"] = write_checkpoint(
            cfg, out, shard_budget_bytes=(1 << 20) if args.small else 2 * 1024**3
        )
    grid, batch = ((4, 4), 2) if args.small else ((20, 28), 8)
    report["load"] = rehearse_load(cfg, out, grid=grid, batch=batch)
    report["failure_modes"] = rehearse_failure_modes(cfg, out / "_failures")
    print(json.dumps(report))
    ok = (
        report["failure_modes"]["missing_proj_rejected"]
        and report["failure_modes"]["f32_checkpoint_converts"]
    )
    if not args.keep:
        import shutil

        shutil.rmtree(out, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
