"""ColPali embedding service: chunks -> per-token multivectors on TPU.

The TPU-native replacement for both of the reference's embedding
deployments (SURVEY.md §2.2):
  - local torch model (reference core/embedding/colpali_embedding_model.py:25-338)
  - HTTP fan-out to N GPU endpoints with health tracking
    (reference core/embedding/colpali_api_embedding_model.py:38-390)

Scaling here is a device mesh, not an endpoint pool: batches are
grouped by static grid bucket and dispatched to pjit-compiled programs;
the "data" axis of the mesh data-parallelizes pages over ICI.

Behavioral parity kept from the reference:
  - chunks split into image vs text streams on metadata["is_image"]
    (ref :83-100), image decode failure falls back to text;
  - order-preserving result assembly;
  - per-phase timing metrics (ref :198-216);
  - batch size from settings (ref :61).
"""

from __future__ import annotations

import io
import logging
import time
from typing import Dict, List, Optional, Tuple, Union

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from morphik_core_tpu.config import Settings, get_settings
from morphik_core_tpu.embedding.base_embedding_model import BaseEmbeddingModel
from morphik_core_tpu.models.colqwen import ColQwenConfig, ColQwenModel
from morphik_core_tpu.models.colqwen.preprocess import preprocess_image_u8
from morphik_core_tpu.models.schemas import Chunk
from morphik_core_tpu.utils.fast_ops import data_uri_to_bytes

logger = logging.getLogger(__name__)


class ColpaliEmbeddingModel(BaseEmbeddingModel):
    def __init__(
        self,
        settings: Optional[Settings] = None,
        model: Optional[ColQwenModel] = None,
        mesh=None,
    ):
        self.settings = settings or get_settings()
        t0 = time.time()
        if model is not None:
            self.model = model
        elif self.settings.model.checkpoint_path:
            self.model = ColQwenModel.from_checkpoint(
                self.settings.model.checkpoint_path, mesh=mesh,
                matmul_precision=self.settings.model.matmul_precision,
                attention_precision=self.settings.model.attention_precision,
            )
        else:
            # Random weights serve garbage embeddings with HTTP 200 — only
            # acceptable in development. A production/staging server must
            # refuse to boot instead (reference always loads a real
            # checkpoint, colpali_embedding_model.py:47-56).
            if self.settings.service.environment != "development":
                raise RuntimeError(
                    "model.checkpoint_path is not configured and "
                    f"service.environment={self.settings.service.environment!r}: refusing "
                    "to serve random-weight embeddings outside development mode"
                )
            logger.warning(
                "No model.checkpoint_path configured — initializing a tiny random "
                "ColQwen (dev/test mode; retrieval quality is meaningless)"
            )
            self.model = ColQwenModel.init_random(
                jax.random.PRNGKey(0), ColQwenConfig.tiny(), mesh=mesh,
                # dev mode mirrors the configured serving precision so
                # the int8 path is what tests/evals exercise by default
                matmul_precision=self.settings.model.matmul_precision,
                attention_precision=self.settings.model.attention_precision,
            )
        if (
            self.settings.model.static_act_scales
            and getattr(self.model, "matmul_precision", "bf16") == "int8"
        ):
            # Startup calibration of static int8 activation scales for
            # the vision tower (config model.static_act_scales): one
            # extra capture compile + 2 batches now buys back the
            # dynamic per-token max-abs pass on every serving step. A
            # failure degrades to dynamic quantization (numerically the
            # safer mode), never blocks boot.
            from morphik_core_tpu.models.colqwen.calibrate import (
                calibrate_model_from_rendered_pages,
            )

            t_cal = time.time()
            try:
                calibrate_model_from_rendered_pages(self.model)
                logger.info("static activation scales calibrated in %.1fs", time.time() - t_cal)
            except Exception:  # noqa: BLE001
                logger.exception("static act-scale calibration failed; serving dynamic quant")
        self.batch_size = max(1, int(self.settings.tpu.embed_batch_size))
        self.min_pixels = self.settings.model.min_pixels
        self.max_pixels = self.settings.model.max_pixels
        self.last_metrics: Dict[str, float] = {}
        # Fused ingest FDE (round 4): when services wire the store's
        # FDEConfig here, the INGEST path (embed_images(with_fde=True))
        # computes image FDE vectors ON DEVICE right after the tower
        # forward — the multivector is already resident, so the store
        # skips re-uploading it for encode_documents. Through the
        # ~50 MB/s relay that re-upload (~1.3 MB/page f32) was the
        # dominant fde_store cost (INGEST_r04.json: 8 pages/s). The
        # fetch instead adds fde_dim f32 = 40 KB/page. Query-time embeds
        # never compute FDE; results flow through return values only.
        self.fde_config = None
        logger.info(
            "ColpaliEmbeddingModel ready in %.2fs (dim=%d, batch=%d, backend=%s)",
            time.time() - t0,
            self.embedding_dim,
            self.batch_size,
            jax.default_backend(),
        )

    @property
    def embedding_dim(self) -> int:
        return self.model.cfg.embedding_dim

    # ------------------------------------------------------------------

    def _decode_image(self, chunk: Chunk) -> Image.Image:
        raw = chunk.metadata.get("_image_bytes")
        if isinstance(raw, (bytes, bytearray, memoryview)):
            data = bytes(raw)
        else:
            data = data_uri_to_bytes(chunk.content)
        img = Image.open(io.BytesIO(data))
        chunk.metadata.pop("_image_bytes", None)
        return img

    def embed_images(self, images: List[Image.Image], with_fde: bool = False):
        """Preprocess -> bucket-group -> batched TPU forward. Order-preserving.
        Preprocessing (resize + uint8 patch reshape; normalization happens
        on device — the transfer-diet path, preprocess_image_u8) runs in a
        thread pool — PIL/numpy release the GIL, and a single-threaded
        prep loop can't feed the chip at the 10k pages/min target.

        with_fde=True (ingest path only) additionally returns per-image
        document FDE rows computed on device (fused ingest FDE) and the
        return becomes (embs, fdes). Query-time callers leave it False —
        a query must not pay the FDE dispatch+fetch, and results flow
        through return values only (no racy instance state)."""
        prep_start = time.perf_counter()
        prepped = self.prep_images(images)
        prep_s = time.perf_counter() - prep_start
        return self._embed_prepped(prepped, with_fde=with_fde, prep_s=prep_s)

    def prep_images(self, images: List[Image.Image]) -> List[Tuple[np.ndarray, Tuple[int, int]]]:
        """PIL -> (u8 patches, grid) pairs, thread-pooled (PIL/numpy
        release the GIL; a single-threaded prep loop can't feed the chip
        at the 10k pages/min target)."""
        if len(images) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(images))) as pool:
                return list(
                    pool.map(
                        lambda im: preprocess_image_u8(
                            im, min_pixels=self.min_pixels, max_pixels=self.max_pixels
                        ),
                        images,
                    )
                )
        return [
            preprocess_image_u8(im, min_pixels=self.min_pixels, max_pixels=self.max_pixels)
            for im in images
        ]

    def _embed_prepped(
        self,
        prepped: List[Tuple[np.ndarray, Tuple[int, int]]],
        with_fde: bool = False,
        prep_s: float = 0.0,
    ):
        """Bucket-group + batched TPU forward over pre-preprocessed
        (patches, grid) pairs. The ingest fast path feeds this directly
        with patches computed AT RASTER TIME (chunk metadata `_patches`)
        — the rendered page never round-trips through its JPEG payload
        (~70 ms/page of decode+re-preprocess on a 1-core host)."""
        images = prepped  # length/order contract below
        buckets: Dict[Tuple[int, int], List[Tuple[int, np.ndarray]]] = {}
        for i, (patches, grid) in enumerate(prepped):
            buckets.setdefault(tuple(grid), []).append((i, patches))

        model_start = time.perf_counter()
        out: List[Optional[np.ndarray]] = [None] * len(images)
        out_fde: List[Optional[np.ndarray]] = [None] * len(images)
        # Two-phase: dispatch every batch first (jax runs async), fetch
        # after — device compute of batch k overlaps host prep of k+1.
        # With fde_config set, the document FDE encode is dispatched on
        # the still-resident device multivector (tokens inside a grid
        # bucket are all valid, so the mask is ones) — no host roundtrip.
        fuse_fde = with_fde and self.fde_config is not None
        pending = []
        for (hu, wu), items in buckets.items():
            for s in range(0, len(items), self.batch_size):
                batch = items[s : s + self.batch_size]
                arr = np.stack([p for _, p in batch])
                dev, nvalid = self.model.embed_image_batch(arr, hu, wu, as_device=True)
                fde_dev = None
                if fuse_fde:
                    from morphik_core_tpu.ops.fde import fde_document_batch

                    fde_dev = fde_document_batch(
                        dev, jnp.ones(dev.shape[:2], jnp.float32), self.fde_config
                    )
                pending.append((batch, dev, nvalid, fde_dev))
        for batch, dev, nvalid, fde_dev in pending:
            embs = np.asarray(dev, dtype=np.float32)[:nvalid]
            fdes = (
                np.asarray(fde_dev, dtype=np.float32)[:nvalid]
                if fde_dev is not None else None
            )
            for j, (i, _) in enumerate(batch):
                out[i] = embs[j]
                if fdes is not None:
                    out_fde[i] = fdes[j]
        model_s = time.perf_counter() - model_start
        self.last_metrics.update(
            image_preprocess_s=prep_s, image_model_s=model_s, image_count=len(images), buckets=len(buckets)
        )
        if with_fde:
            return out, out_fde
        return out  # type: ignore[return-value]

    def embed_texts(self, texts: List[str]) -> List[np.ndarray]:
        t0 = time.perf_counter()
        out: List[np.ndarray] = []
        for s in range(0, len(texts), max(self.batch_size, 1)):
            out.extend(self.model.embed_queries(texts[s : s + self.batch_size]))
        self.last_metrics.update(text_model_s=time.perf_counter() - t0, text_count=len(texts))
        return out

    # ------------------------------------------------------------------

    async def embed_for_ingestion_with_fde(
        self, chunks: Union[Chunk, List[Chunk]]
    ) -> Tuple[List[np.ndarray], List[Optional[np.ndarray]]]:
        """embed_for_ingestion + the chunk-aligned fused FDE rows as an
        explicit return value. FDE rows flow through return values only
        (never instance state) — the ingest pipeline runs this in a
        worker thread while queries keep using the same model, and any
        shared attribute would race (round-4 review)."""
        return self.embed_for_ingestion_sync(chunks)

    async def embed_for_ingestion(self, chunks: Union[Chunk, List[Chunk]]) -> List[np.ndarray]:
        return self.embed_for_ingestion_sync(chunks)[0]

    def embed_for_ingestion_sync(
        self, chunks: Union[Chunk, List[Chunk]]
    ) -> Tuple[List[np.ndarray], List[Optional[np.ndarray]]]:
        """Synchronous core of the ingest embed (the async wrappers do no
        awaiting — the body is CPU/device-bound). The ingestion service
        runs THIS in worker threads, worker.ingest_embed_prefetch batches
        in flight at once, so the relay upload of batch k+1 overlaps the
        device compute / host store of batch k (numpy/PIL/jax release the
        GIL through the heavy parts; jax dispatch is thread-safe). All
        results flow through return values — instance state is limited to
        the informational last_metrics dict (last-writer-wins)."""
        if isinstance(chunks, Chunk):
            chunks = [chunks]
        if not chunks:
            return [], []
        job_start = time.perf_counter()

        # Ingest fast path: chunks rasterized in-process carry their
        # (patches, grid) in metadata["_patches"] — computed once from
        # the in-hand PIL page at raster time; everything else decodes
        # its payload and preprocesses here.
        image_prepped: List[Tuple[int, Tuple[np.ndarray, Tuple[int, int]]]] = []
        image_decode: List[Tuple[int, Chunk]] = []
        text_items: List[Tuple[int, str]] = []
        prep_start = time.perf_counter()
        for i, chunk in enumerate(chunks):
            if chunk.metadata.get("is_image"):
                pp = chunk.metadata.pop("_patches", None)
                if pp is not None:
                    image_prepped.append((i, (pp[0], tuple(pp[1]))))
                    chunk.metadata.pop("_image_bytes", None)
                    continue
                image_decode.append((i, chunk))
            else:
                text_items.append((i, chunk.content))
        if image_decode:
            decoded: List[Tuple[int, Image.Image]] = []
            for i, chunk in image_decode:
                try:
                    decoded.append((i, self._decode_image(chunk)))
                except Exception as e:  # noqa: BLE001
                    logger.error("image chunk %d decode failed (%s); falling back to text", i, e)
                    text_items.append((i, chunk.content))
            for (i, _), pp in zip(decoded, self.prep_images([im for _, im in decoded])):
                image_prepped.append((i, pp))
        image_prepped.sort(key=lambda t: t[0])
        prep_s = time.perf_counter() - prep_start

        results: List[Optional[np.ndarray]] = [None] * len(chunks)
        fde_out: List[Optional[np.ndarray]] = [None] * len(chunks)
        if image_prepped:
            embs, fdes = self._embed_prepped(
                [pp for _, pp in image_prepped], with_fde=True, prep_s=prep_s
            )
            for (i, _), e, f in zip(image_prepped, embs, fdes):
                results[i] = e
                fde_out[i] = f
        if text_items:
            embs = self.embed_texts([t for _, t in text_items])
            for (i, _), e in zip(text_items, embs):
                results[i] = e
        self.last_metrics["total_s"] = time.perf_counter() - job_start
        return results, fde_out  # type: ignore[return-value]

    async def embed_for_query(self, query: Union[str, Image.Image]) -> np.ndarray:
        """Text query or PIL image query -> (n_tokens, dim) f32."""
        if isinstance(query, Image.Image):
            return self.embed_images([query])[0]
        return self.embed_texts([query])[0]

    def warmup(self, grids: Optional[List[Tuple[int, int]]] = None) -> float:
        """Precompile the serving programs: query buckets (batch 1) and the
        page-grid forwards. First live requests then run at steady-state
        latency. Returns seconds spent. With the persistent compilation
        cache enabled, repeat warmups are near-free."""
        t0 = time.perf_counter()
        try:
            self.embed_texts(["warmup query"])
            for hu, wu in grids or [(20, 28)]:
                s = hu * wu * self.model.cfg.vision.merge_unit
                # the serving ingest path ships uint8 patches (588 = C*ph*pw)
                patches = np.zeros(
                    (1, s, self.model.cfg.vision.patch_input_dim // 2), np.uint8
                )
                self.model.embed_image_batch(patches, hu, wu)
        except Exception:  # noqa: BLE001 — warmup must never block serving
            logger.exception("warmup failed (continuing)")
        dt = time.perf_counter() - t0
        logger.info("warmup done in %.1fs", dt)
        return dt
