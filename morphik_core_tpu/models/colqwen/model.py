"""ColQwen2.5 late-interaction embedder (vision tower + LM + projection).

Replaces the reference's torch/colpali_engine ColQwen2_5 stack
(reference core/embedding/colpali_embedding_model.py:25-338). Images
and queries map to per-token 128-d L2-normalized multivectors.

Execution model: one jitted program per (batch, grid-bucket) for images
and per (batch, length-bucket) for queries; programs are compiled
lazily and cached. Sharding: batch ("data") axis over the mesh via
explicit device_put of inputs; params replicated (3B params fit one
chip in bf16; tensor-parallel sharding hooks live in parallel/).
"""

from __future__ import annotations

import functools
import json
import logging
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from morphik_core_tpu.models.colqwen.config import ColQwenConfig
from morphik_core_tpu.models.colqwen.text import (
    init_text_params,
    mrope_cos_sin,
    mrope_position_ids,
    text_forward,
)
from morphik_core_tpu.models.colqwen.vision import (
    init_vision_params,
    vision_forward,
    vision_rotary_cos_sin,
)

logger = logging.getLogger(__name__)


#: weight leaves converted by `quantize_colqwen_params` (the big MXU
#: matmuls; norms/biases/embeddings/rotary stay high-precision)
_Q8_TEXT = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")
_Q8_VISION = ("q_w", "k_w", "v_w", "proj_w", "gate_w", "up_w", "down_w")


def quantize_colqwen_params(params: dict) -> dict:
    """W8A8 serving mode: convert the tower matmul weights to symmetric
    per-channel int8 ({"q8", "s"} leaves that `layers.linear` dispatches
    on). Halves weight HBM and runs the MXU at its int8 rate (2x bf16 on
    v5e). OPT-IN (config model.matmul_precision="int8"): validate
    retrieval quality on your checkpoint with evaluations/ first — the
    bf16 path is the parity-tested default."""
    from morphik_core_tpu.models.colqwen.layers import quantize_weight_int8

    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    out["text"] = dict(params["text"])
    out["text"]["layers"] = {
        k: (quantize_weight_int8(v) if k in _Q8_TEXT else v)
        for k, v in params["text"]["layers"].items()
    }
    out["visual"] = dict(params["visual"])
    out["visual"]["blocks"] = {
        k: (quantize_weight_int8(v) if k in _Q8_VISION else v)
        for k, v in params["visual"]["blocks"].items()
    }
    return out


def init_colqwen_params(key: jax.Array, cfg: ColQwenConfig, dtype=jnp.float32) -> dict:
    kv, kt, kp = jax.random.split(key, 3)
    h = cfg.text.hidden_size
    return {
        "visual": init_vision_params(kv, cfg.vision, dtype),
        "text": init_text_params(kt, cfg.text, dtype),
        "proj_w": (jax.random.normal(kp, (h, cfg.embedding_dim), jnp.float32) * 0.02).astype(dtype),
        "proj_b": jnp.zeros((cfg.embedding_dim,), dtype),
    }


def expand_patches_u8(u8: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(B, S, 588) raw uint8 patches -> (B, S, 1176) CLIP-normalized
    `dtype` patches, on device.

    The ingest transfer diet (preprocess.preprocess_image_u8): hosts ship
    un-normalized, un-duplicated uint8 pixels (4x fewer bytes than bf16
    with the temporal copy); the normalize (one per-channel FMA) and the
    temporal broadcast run here, where XLA fuses them into the
    patch-embed matmul's prologue — zero extra HBM round-trips."""
    from morphik_core_tpu.models.colqwen.preprocess import (
        IMAGE_MEAN,
        IMAGE_STD,
        PATCH_SIZE,
        TEMPORAL_PATCH_SIZE,
    )

    b, s, f = u8.shape
    pp = PATCH_SIZE * PATCH_SIZE
    c = f // pp
    # (u8/255 - mean)/std  ==  u8*scale + bias with the constants folded
    scale = jnp.asarray(1.0 / (255.0 * IMAGE_STD), jnp.float32)
    bias = jnp.asarray(-IMAGE_MEAN / IMAGE_STD, jnp.float32)
    x = u8.astype(jnp.float32).reshape(b, s, c, pp)
    x = x * scale[:, None] + bias[:, None]
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, s, c, TEMPORAL_PATCH_SIZE, pp))
    return x.reshape(b, s, f * TEMPORAL_PATCH_SIZE).astype(dtype)


def colqwen_image_forward_u8(
    params: dict,
    cfg: ColQwenConfig,
    patches: jax.Array,  # (B, S_patches, 588) uint8
    cos_v: jax.Array,
    sin_v: jax.Array,
    input_ids: jax.Array,
    cos_t: jax.Array,
    sin_t: jax.Array,
    h_units: int,
    w_units: int,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """uint8-ingest variant of `colqwen_image_forward` (transfer diet)."""
    return colqwen_image_forward(
        params, cfg, expand_patches_u8(patches, dtype), cos_v, sin_v,
        input_ids, cos_t, sin_t, h_units, w_units,
    )


def save_params_npz(path, params: dict, config: "ColQwenConfig | None" = None) -> None:
    """Flatten a params tree to one compressed npz (slash-joined keys).
    Used for the committed tiny trained FIXTURE checkpoint
    (scripts/train_tiny_fixture.py) — real deployments load HF
    safetensors via `ColQwenModel.from_checkpoint`. When `config` is
    given it is embedded as JSON under `__config__` so `from_fixture`
    can reconstruct non-default geometry (e.g. the 32-dim round-5
    fixture)."""
    import dataclasses as _dc
    import json as _json

    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    if config is not None:
        flat["__config__"] = np.asarray(_json.dumps(_dc.asdict(config)))
    np.savez_compressed(path, **flat)


def load_params_npz(path) -> dict:
    """Inverse of `save_params_npz` (metadata keys skipped)."""
    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            if key.startswith("__"):
                continue
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(z[key])
    return out


def load_config_npz(path) -> "ColQwenConfig | None":
    """Read the embedded `__config__` of a fixture npz (None when the
    file predates config embedding — callers then assume tiny())."""
    import json as _json

    with np.load(path) as z:
        if "__config__" not in z.files:
            return None
        d = _json.loads(str(z["__config__"]))
    from morphik_core_tpu.models.colqwen.config import TextConfig, VisionConfig

    vis = dict(d.pop("vision"))
    vis["fullatt_block_indexes"] = tuple(vis.get("fullatt_block_indexes", ()))
    txt = dict(d.pop("text"))
    txt["mrope_section"] = tuple(txt.get("mrope_section", ()))
    return ColQwenConfig(vision=VisionConfig(**vis), text=TextConfig(**txt), **d)


def colqwen_image_forward(
    params: dict,
    cfg: ColQwenConfig,
    patches: jax.Array,  # (B, S_patches, 1176)
    cos_v: jax.Array,
    sin_v: jax.Array,  # vision rotary (S_patches, hd_v)
    input_ids: jax.Array,  # (B, S_seq) with image-token placeholders
    cos_t: jax.Array,
    sin_t: jax.Array,  # (B or 1, S_seq, hd_t) mrope tables
    h_units: int,
    w_units: int,
) -> jax.Array:
    """-> (B, S_seq, embedding_dim) L2-normalized multivectors."""
    vis = vision_forward(params["visual"], patches, cos_v, sin_v, h_units, w_units, cfg.vision)
    embeds = params["text"]["embed"][input_ids]  # (B, S_seq, H)
    # scatter visual tokens into the image-pad positions: those positions
    # are contiguous and identical across the batch (static template), so
    # a boolean where() with a padded visual stream suffices.
    is_img = (input_ids == cfg.image_token_id)[..., None]
    # positions of image tokens are a contiguous run: build aligned visual
    # stream via cumsum index
    idx = jnp.cumsum(is_img.squeeze(-1).astype(jnp.int32), axis=1) - 1
    idx = jnp.clip(idx, 0, vis.shape[1] - 1)
    vis_aligned = jnp.take_along_axis(vis, idx[..., None], axis=1)
    embeds = jnp.where(is_img, vis_aligned.astype(embeds.dtype), embeds)

    mask = jnp.ones(input_ids.shape, dtype=jnp.float32)
    hidden = text_forward(params["text"], embeds, cos_t, sin_t, mask, cfg.text)
    return _project(params, hidden, mask)


def colqwen_text_forward(
    params: dict,
    cfg: ColQwenConfig,
    input_ids: jax.Array,  # (B, S)
    attention_mask: jax.Array,  # (B, S)
    cos_t: jax.Array,
    sin_t: jax.Array,
) -> jax.Array:
    embeds = params["text"]["embed"][input_ids]
    hidden = text_forward(params["text"], embeds, cos_t, sin_t, attention_mask, cfg.text)
    return _project(params, hidden, attention_mask)


def _project(params, hidden, mask):
    proj = hidden @ params["proj_w"] + params["proj_b"]
    proj = proj.astype(jnp.float32)
    norm = jnp.linalg.norm(proj, axis=-1, keepdims=True)
    proj = proj / jnp.maximum(norm, 1e-12)
    return proj * mask[..., None]


class ColQwenModel:
    """Stateful wrapper: params + tokenizer + compiled-program cache."""

    # Default prompt templates (colpali_engine ColQwen2.5 conventions:
    # image chat template + 'Query: ' prefix with <|endoftext|> query
    # augmentation suffix).
    IMAGE_PREFIX = "<|im_start|>user\n<|vision_start|>"
    IMAGE_SUFFIX = "<|vision_end|>Describe the image.<|im_end|>\n"
    QUERY_PREFIX = "Query: "
    QUERY_AUGMENTATION_TOKENS = 10

    def __init__(
        self,
        cfg: ColQwenConfig,
        params: dict,
        tokenizer=None,
        dtype=jnp.bfloat16,
        query_buckets: Sequence[int] = (32, 64, 128, 256),
        mesh=None,
        matmul_precision: str = "bf16",  # "bf16" (parity default) | "int8" (W8A8 serving)
        attention_precision: str = "bf16",  # "bf16" | "int8" (QK^T int8, fidelity-gated)
    ):
        """`mesh`: optional jax.sharding.Mesh ("data", "model"). When set,
        the text decoder is tensor-parallel over "model", image batches
        are data-parallel over "data" (batches padded to a multiple of
        the data axis), and XLA inserts the ICI collectives — the
        TPU-native replacement for the reference's GPU-endpoint fan-out
        (SURVEY.md §5 'distributed communication backend')."""
        if attention_precision == "int8":
            import dataclasses as _dc

            cfg = _dc.replace(
                cfg,
                vision=_dc.replace(cfg.vision, qk_int8=True),
                text=_dc.replace(cfg.text, qk_int8=True),
            )
        elif attention_precision != "bf16":
            raise ValueError(f"unknown attention_precision {attention_precision!r}")
        self.attention_precision = attention_precision
        self.cfg = cfg
        self.mesh = mesh
        self.matmul_precision = matmul_precision
        if matmul_precision == "int8":
            params = jax.jit(quantize_colqwen_params)(params)
        elif matmul_precision != "bf16":
            raise ValueError(f"unknown matmul_precision {matmul_precision!r}")
        if mesh is not None:
            from morphik_core_tpu.parallel.mesh import (
                colqwen_image_shardings,
                shard_colqwen_params,
            )

            params = shard_colqwen_params(params, mesh)
            self._shardings = colqwen_image_shardings(mesh)
            self._data_size = mesh.shape["data"]
        else:
            self._shardings = None
            self._data_size = 1
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.query_buckets = tuple(query_buckets)
        self._image_fn_cache: Dict[Tuple[int, int], object] = {}
        self._text_fn = jax.jit(
            functools.partial(colqwen_text_forward, cfg=cfg),
            static_argnames=(),
        )

    def calibrate_static_act_scales(
        self, u8_batches, h_units: int, w_units: int, margin: float = 1.05
    ) -> None:
        """Calibrate static per-(layer, site) activation scales for the
        int8 vision tower on representative page batches and serve with
        them (models/colqwen/calibrate.py) — the dynamic per-token
        max-abs passes disappear from the vision step. int8 mode only;
        invalidates compiled image programs (they bake the quantization
        structure). The fidelity gate (evaluations/fidelity_eval.py)
        must stay green with scales attached."""
        if self.matmul_precision != "int8":
            raise ValueError("static activation scales require matmul_precision='int8'")
        from morphik_core_tpu.models.colqwen.calibrate import (
            attach_vision_act_scales,
            capture_vision_act_maxes,
        )

        maxes, qk_maxes = capture_vision_act_maxes(
            self.params["visual"], u8_batches, h_units, w_units, self.cfg.vision
        )
        visual = attach_vision_act_scales(self.params["visual"], maxes, margin, qk_maxes)
        if self.mesh is not None:
            # the vision tower is replicated on the mesh (parallel/mesh.py)
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            visual = jax.tree.map(lambda x: jax.device_put(x, repl), visual)
        self.params = dict(self.params)
        self.params["visual"] = visual
        self._image_fn_cache.clear()

    # -- construction -----------------------------------------------------

    @classmethod
    def init_random(cls, key: jax.Array, cfg: Optional[ColQwenConfig] = None, dtype=jnp.float32, **kw):
        cfg = cfg or ColQwenConfig.tiny()
        return cls(cfg, init_colqwen_params(key, cfg, dtype), dtype=dtype, **kw)

    @classmethod
    def from_fixture(cls, path: str | Path, **kw):
        """Load the committed tiny TRAINED fixture (tiny geometry, npz —
        scripts/train_tiny_fixture.py). Gives dev/test deployments and
        the committed eval real (glyph-level) retrieval semantics where
        random weights measure at chance. Geometry comes from the npz's
        embedded `__config__` when present (round-5 fixtures are 32-dim);
        older fixtures fall back to tiny()."""
        path = Path(path)
        cfg = load_config_npz(path) or ColQwenConfig.tiny()
        return cls(cfg, load_params_npz(path), dtype=jnp.float32, **kw)

    @classmethod
    def from_checkpoint(cls, path: str | Path, dtype=jnp.bfloat16, **kw):
        """Load an HF-format ColQwen2.5 checkpoint directory
        (config.json + *.safetensors + tokenizer.json)."""
        from morphik_core_tpu.models.colqwen.convert import load_hf_checkpoint

        path = Path(path)
        cfg = ColQwenConfig.from_hf_config(path / "config.json")
        params = load_hf_checkpoint(path, cfg, dtype)
        tokenizer = None
        tok_file = path / "tokenizer.json"
        if tok_file.exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(tok_file))
        return cls(cfg, params, tokenizer=tokenizer, dtype=dtype, **kw)

    # -- image path --------------------------------------------------------

    def _image_fn(self, h_units: int, w_units: int, u8: bool = False):
        key = (h_units, w_units, u8)
        if key not in self._image_fn_cache:
            if u8:
                fn = functools.partial(
                    colqwen_image_forward_u8, cfg=self.cfg, h_units=h_units,
                    w_units=w_units, dtype=self.dtype,
                )
            else:
                fn = functools.partial(
                    colqwen_image_forward, cfg=self.cfg, h_units=h_units, w_units=w_units
                )
            if self._shardings is not None:
                self._image_fn_cache[key] = jax.jit(fn, out_shardings=self._shardings["out"])
            else:
                self._image_fn_cache[key] = jax.jit(fn)
        return self._image_fn_cache[key]

    def image_sequence_ids(self, n_units: int) -> np.ndarray:
        """Token id sequence for one image: prefix + n image pads + suffix."""
        prefix = self._encode(self.IMAGE_PREFIX)
        suffix = self._encode(self.IMAGE_SUFFIX)
        return np.array(
            list(prefix) + [self.cfg.image_token_id] * n_units + list(suffix), dtype=np.int32
        )

    def embed_image_batch(
        self, patches: np.ndarray, h_units: int, w_units: int, as_device: bool = False
    ) -> np.ndarray:
        """patches: (B, S, 1176) for one grid bucket -> (B, S_seq, dim) f32.
        All rows valid (no padding inside a bucket). On a mesh, the batch
        is padded to a multiple of the data axis and sharded over it.
        `as_device=True` returns (jax_array, valid_rows) WITHOUT blocking —
        jax's async dispatch lets callers pipeline host prep of the next
        batch against device compute of this one.

        uint8 patches (B, S, 588) from `preprocess_image_u8` take the
        transfer-diet path: normalize + temporal expand happen on device
        (expand_patches_u8) — 4x less host->device bandwidth."""
        is_u8 = patches.dtype == np.uint8
        b = patches.shape[0]
        pad = (-b) % self._data_size
        if pad:
            patches = np.concatenate([patches, np.repeat(patches[-1:], pad, axis=0)], axis=0)
        bp = patches.shape[0]
        cos_v, sin_v = vision_rotary_cos_sin(h_units, w_units, self.cfg.vision)
        n_units = h_units * w_units
        ids = self.image_sequence_ids(n_units)
        input_ids = np.tile(ids[None], (bp, 1))
        grids = [(1, h_units, w_units)] * bp
        pos = mrope_position_ids(input_ids, self.cfg.image_token_id, grids)
        cos_t, sin_t = mrope_cos_sin(pos, self.cfg.text)
        args = dict(
            patches=jnp.asarray(patches) if is_u8 else jnp.asarray(patches, self.dtype),
            cos_v=jnp.asarray(cos_v),
            sin_v=jnp.asarray(sin_v),
            input_ids=jnp.asarray(input_ids),
            cos_t=jnp.asarray(cos_t),
            sin_t=jnp.asarray(sin_t),
        )
        if self._shardings is not None:
            sh = self._shardings
            args = {k: jax.device_put(v, sh[k]) for k, v in args.items()}
        fn = self._image_fn(h_units, w_units, u8=is_u8)
        out = fn(self.params, **args)
        if as_device:
            return out, b  # jax array (padded batch) + valid row count
        return np.asarray(out, dtype=np.float32)[:b]

    # -- query path ---------------------------------------------------------

    def _encode(self, text: str) -> List[int]:
        if self.tokenizer is None:
            # deterministic fallback "tokenizer" for tests: bytes -> ids
            return [b % (self.cfg.text.vocab_size - 8) for b in text.encode()]
        return self.tokenizer.encode(text, add_special_tokens=False).ids

    def query_token_ids(self, query: str) -> List[int]:
        ids = self._encode(self.QUERY_PREFIX + query)
        # query augmentation tokens (endoftext padding the reference model
        # attends to as soft expansion slots)
        eot = self._encode("<|endoftext|>")
        aug = (eot if len(eot) == 1 else [self.cfg.text.vocab_size - 1]) * self.QUERY_AUGMENTATION_TOKENS
        return ids + aug

    def embed_queries(self, queries: Sequence[str]) -> List[np.ndarray]:
        """-> list of (n_tokens_i, dim) f32 multivectors.

        Queries are GROUPED by length bucket before batching: one long
        query must not re-bucket (re-pad + possibly re-compile) the
        whole batch — short queries run in their own small bucket and
        only the long ones pay for the big one."""
        if not queries:
            return []
        all_ids = [self.query_token_ids(q) for q in queries]

        def bucket_of(n: int) -> int:
            return next((b for b in self.query_buckets if b >= n), n)

        groups: Dict[int, List[int]] = {}
        for i, ids in enumerate(all_ids):
            groups.setdefault(bucket_of(len(ids)), []).append(i)

        out: List[Optional[np.ndarray]] = [None] * len(all_ids)
        for bucket, idxs in sorted(groups.items()):
            b = len(idxs)
            input_ids = np.zeros((b, bucket), dtype=np.int32)
            mask = np.zeros((b, bucket), dtype=np.float32)
            for j, i in enumerate(idxs):
                ids = all_ids[i]
                n = min(len(ids), bucket)
                input_ids[j, :n] = ids[:n]
                mask[j, :n] = 1.0
            pos = mrope_position_ids(input_ids, -1, [None] * b, attention_mask=mask)
            cos_t, sin_t = mrope_cos_sin(pos, self.cfg.text)
            emb = self._text_fn(
                self.params,
                input_ids=jnp.asarray(input_ids),
                attention_mask=jnp.asarray(mask),
                cos_t=jnp.asarray(cos_t),
                sin_t=jnp.asarray(sin_t),
            )
            emb = np.asarray(emb, dtype=np.float32)
            for j, i in enumerate(idxs):
                out[i] = emb[j, : min(len(all_ids[i]), bucket)]
        return out  # type: ignore[return-value]
