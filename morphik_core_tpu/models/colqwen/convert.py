"""HF checkpoint -> JAX pytree weight conversion.

The safetensors naming follows colpali_engine's ColQwen2_5 (a
Qwen2_5_VLForConditionalGeneration subclass + `custom_text_proj`); we
accept both the legacy flat names (`model.layers.*`, `visual.*`) and
the namespaced ones (`model.language_model.*`, `model.visual.*`).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict

import jax.numpy as jnp
import numpy as np

from morphik_core_tpu.models.colqwen.config import ColQwenConfig

logger = logging.getLogger(__name__)


def _find(state: Dict[str, np.ndarray], *names: str) -> np.ndarray:
    for n in names:
        if n in state:
            return state[n]
    raise KeyError(f"none of {names} found (have {len(state)} keys, e.g. {list(state)[:5]})")


def convert_state_dict(
    state: Dict[str, np.ndarray],
    cfg: ColQwenConfig,
    dtype=jnp.bfloat16,
    *,
    allow_missing_projection: bool = False,
) -> dict:
    """torch-layout state dict (numpy values) -> stacked-layer JAX pytree.

    All transposes/splits/stacks happen in HOST numpy; only the ~30
    final stacked tensors are transferred to the device (one transfer
    per leaf). Converting eagerly per torch tensor would make ~700
    separate device allocations — at 3B scale that fragments HBM badly
    enough that the first serving step can fail to find a contiguous
    activation block (observed on v5e)."""
    np_dtype = np.dtype(jnp.dtype(dtype).name) if jnp.dtype(dtype).name in (
        "float32", "float16") else None
    if np_dtype is None:
        import ml_dtypes

        np_dtype = np.dtype(getattr(ml_dtypes, jnp.dtype(dtype).name))

    def t(x):  # torch Linear weight (out, in) -> (in, out)
        return np.ascontiguousarray(x.T).astype(np_dtype)

    def a(x):
        return np.asarray(x).astype(np_dtype)

    v = cfg.vision
    vp = "visual."
    if f"{vp}patch_embed.proj.weight" not in state and "model.visual.patch_embed.proj.weight" in state:
        vp = "model.visual."

    pe = _find(state, f"{vp}patch_embed.proj.weight")  # (h, C, T, ps, ps)
    visual = {
        "patch_embed_w": t(pe.reshape(pe.shape[0], -1)),
        "blocks": {},
        "merger": {
            "ln_q": a(_find(state, f"{vp}merger.ln_q.weight")),
            "fc1_w": t(_find(state, f"{vp}merger.mlp.0.weight")),
            "fc1_b": a(_find(state, f"{vp}merger.mlp.0.bias")),
            "fc2_w": t(_find(state, f"{vp}merger.mlp.2.weight")),
            "fc2_b": a(_find(state, f"{vp}merger.mlp.2.bias")),
        },
    }
    stack = lambda xs: np.stack(xs)  # noqa: E731
    b = {k: [] for k in (
        "norm1", "norm2", "q_w", "q_b", "k_w", "k_b", "v_w", "v_b",
        "proj_w", "proj_b",
        "gate_w", "gate_b", "up_w", "up_b", "down_w", "down_b",
    )}
    hsz = v.hidden_size
    for i in range(v.depth):
        p = f"{vp}blocks.{i}."
        b["norm1"].append(a(_find(state, p + "norm1.weight")))
        b["norm2"].append(a(_find(state, p + "norm2.weight")))
        # HF fuses qkv as one (3h, h) projection; stored split here so the
        # forward runs three clean matmuls with no reshape/split copies.
        qkv_w = t(_find(state, p + "attn.qkv.weight"))  # (h, 3h)
        qkv_b = a(_find(state, p + "attn.qkv.bias"))  # (3h,)
        b["q_w"].append(qkv_w[:, :hsz])
        b["k_w"].append(qkv_w[:, hsz : 2 * hsz])
        b["v_w"].append(qkv_w[:, 2 * hsz :])
        b["q_b"].append(qkv_b[:hsz])
        b["k_b"].append(qkv_b[hsz : 2 * hsz])
        b["v_b"].append(qkv_b[2 * hsz :])
        b["proj_w"].append(t(_find(state, p + "attn.proj.weight")))
        b["proj_b"].append(a(_find(state, p + "attn.proj.bias")))
        b["gate_w"].append(t(_find(state, p + "mlp.gate_proj.weight")))
        b["gate_b"].append(a(_find(state, p + "mlp.gate_proj.bias")))
        b["up_w"].append(t(_find(state, p + "mlp.up_proj.weight")))
        b["up_b"].append(a(_find(state, p + "mlp.up_proj.bias")))
        b["down_w"].append(t(_find(state, p + "mlp.down_proj.weight")))
        b["down_b"].append(a(_find(state, p + "mlp.down_proj.bias")))
    visual["blocks"] = {k: stack(vv) for k, vv in b.items()}

    tp = "model."
    if "model.layers.0.self_attn.q_proj.weight" not in state:
        if "model.language_model.layers.0.self_attn.q_proj.weight" in state:
            tp = "model.language_model."
        elif "language_model.model.layers.0.self_attn.q_proj.weight" in state:
            tp = "language_model.model."

    tl = {k: [] for k in (
        "input_ln", "post_ln", "q_w", "q_b", "k_w", "k_b", "v_w", "v_b",
        "o_w", "gate_w", "up_w", "down_w",
    )}
    for i in range(cfg.text.num_hidden_layers):
        p = f"{tp}layers.{i}."
        tl["input_ln"].append(a(_find(state, p + "input_layernorm.weight")))
        tl["post_ln"].append(a(_find(state, p + "post_attention_layernorm.weight")))
        tl["q_w"].append(t(_find(state, p + "self_attn.q_proj.weight")))
        tl["q_b"].append(a(_find(state, p + "self_attn.q_proj.bias")))
        tl["k_w"].append(t(_find(state, p + "self_attn.k_proj.weight")))
        tl["k_b"].append(a(_find(state, p + "self_attn.k_proj.bias")))
        tl["v_w"].append(t(_find(state, p + "self_attn.v_proj.weight")))
        tl["v_b"].append(a(_find(state, p + "self_attn.v_proj.bias")))
        tl["o_w"].append(t(_find(state, p + "self_attn.o_proj.weight")))
        tl["gate_w"].append(t(_find(state, p + "mlp.gate_proj.weight")))
        tl["up_w"].append(t(_find(state, p + "mlp.up_proj.weight")))
        tl["down_w"].append(t(_find(state, p + "mlp.down_proj.weight")))

    text = {
        "embed": a(_find(state, f"{tp}embed_tokens.weight")),
        "layers": {k: stack(vv) for k, vv in tl.items()},
        "norm": a(_find(state, f"{tp}norm.weight")),
    }

    params = {"visual": visual, "text": text}
    try:
        params["proj_w"] = t(_find(state, "custom_text_proj.weight"))
        params["proj_b"] = a(_find(state, "custom_text_proj.bias"))
    except KeyError:
        # A checkpoint without the ColPali projection head is a base
        # Qwen2.5-VL (or mismatched) checkpoint: a random head would
        # silently produce meaningless embeddings, so fail loudly unless
        # a test explicitly opts into the random fallback.
        if not allow_missing_projection:
            raise KeyError(
                "checkpoint has no custom_text_proj — this is not a ColPali-family "
                "checkpoint (pass allow_missing_projection=True only for tests)"
            )
        logger.warning("checkpoint has no custom_text_proj — using random projection (test mode)")
        rng = np.random.default_rng(0)
        params["proj_w"] = (
            rng.standard_normal((cfg.text.hidden_size, cfg.embedding_dim)).astype(np.float32)
            * 0.02
        ).astype(np_dtype)
        params["proj_b"] = np.zeros((cfg.embedding_dim,), np_dtype)
    # single bulk transfer of the final stacked tensors
    import jax

    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


def load_hf_checkpoint(path: Path, cfg: ColQwenConfig, dtype=jnp.bfloat16) -> dict:
    """Read all *.safetensors under `path` and convert."""
    from safetensors import safe_open

    state: Dict[str, np.ndarray] = {}
    files = sorted(Path(path).glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors in {path}")
    for f in files:
        with safe_open(str(f), framework="np") as sf:
            for key in sf.keys():
                state[key] = sf.get_tensor(key)
    return convert_state_dict(state, cfg, dtype)
