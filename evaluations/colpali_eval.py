#!/usr/bin/env python3
"""ColPali visual-retrieval evaluation through the FULL production stack
(round-3 verdict item 2).

What it measures
----------------
Ingests a generated multi-page PDF corpus with `use_colpali=true`
(hand-rolled PDF parse -> page raster -> preprocess -> vision tower ->
FDE -> int8 ANN -> pooled prefilter -> exact MaxSim rerank), then runs
PAGE-LEVEL retrieval with image queries and reports recall@{1,4,10} +
MRR per query set. Gold labels are (document, page) pairs.

Query sets
----------
- "visual:<rung>" — perturbed renders of a gold page (noise, JPEG
  recompression, rescale blur, occlusion). These measure the visual
  pipeline's STRUCTURAL fidelity end to end and work with ANY weights,
  including the random dev tower used when no checkpoint is configured
  (this environment cannot download the released ColQwen2.5 weights).
  The perturbation ladder unsaturates the benchmark: identity must stay
  ~1.0, heavier rungs sit well below it and regress if ANY stage of the
  stack (preprocess alignment, masking, FDE, quantization, rerank)
  degrades.
- "keyword" / "text" — keyword-image and text queries with gold facts
  planted on pages. Near chance with random weights (reported for
  completeness; they become semantic-retrieval metrics the moment
  model.checkpoint_path points at a real ColQwen checkpoint — reference
  flagship artifact: 95.56% accuracy, evaluations/custom_eval/README.md:113-124).

Usage:
    python evaluations/colpali_eval.py [--docs 20] [--pages 4]
        [--queries 40] [--out EVAL.json] [--cpu]
"""

from __future__ import annotations

import argparse
import asyncio
import io
import json
import sys
import tempfile
import time
import zlib
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VOCAB = (
    "alpha bridge casing dynamo ember flux gasket helix ion joule kelvin lumen "
    "motor nacelle orbit piston quartz rotor stator torque valve winding yoke zenith"
).split()


def make_pdf(pages_text: List[str]) -> bytes:
    """Minimal multi-page PDF with FlateDecode text content streams
    (same construction the parser tests use)."""
    objs = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(len(pages_text)))
    objs.append(b"1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n")
    objs.append(f"2 0 obj<</Type/Pages/Kids[{kids}]/Count {len(pages_text)}>>endobj\n".encode())
    for i, text in enumerate(pages_text):
        page_num, content_num = 3 + 2 * i, 4 + 2 * i
        objs.append(
            f"{page_num} 0 obj<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
            f"/Contents {content_num} 0 R>>endobj\n".encode()
        )
        ops = b"BT /F1 12 Tf 72 720 Td "
        for j, line in enumerate(text.split("\n")):
            esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            if j:
                ops += b"0 -14 Td "
            ops += b"(" + esc.encode("latin-1", "replace") + b") Tj "
        ops += b"ET"
        comp = zlib.compress(ops)
        objs.append(
            f"{content_num} 0 obj<</Length {len(comp)}/Filter/FlateDecode>>stream\n".encode()
            + comp + b"\nendstream endobj\n"
        )
    return b"%PDF-1.4\n" + b"".join(objs) + b"trailer<</Root 1 0 R>>\n%%EOF"


def gen_corpus(n_docs: int, pages_per_doc: int, seed: int = 0, n_templates: int = 0):
    """Returns (pdfs, facts): pdfs = [(filename, bytes)], facts = list of
    {doc, page, keyword, question, answer} — one planted fact per page.

    `n_templates` > 0 makes the corpus DISTRACTOR-HEAVY (round-3 verdict
    item 3): docs are drawn from a small pool of shared page layouts
    (same filler lines, same fact-slot position) so every gold page has
    n_docs/n_templates near-duplicate siblings differing only in the
    keyword/value glyphs — the perturbation ladder then measures how
    much pixel damage the stack can absorb before near-duplicates win."""
    rng = np.random.default_rng(seed)
    templates = []
    for _ in range(max(n_templates, 1)):
        filler = [" ".join(rng.choice(VOCAB, rng.integers(3, 9)).tolist())
                  for _ in range(int(rng.integers(10, 16)))]
        templates.append((filler, int(rng.integers(2, len(filler)))))
    pdfs, facts = [], []
    for d in range(n_docs):
        pages = []
        for p in range(pages_per_doc):
            kw = f"{rng.choice(VOCAB).upper()}-{rng.integers(1000, 9999)}"
            val = int(rng.integers(10, 990))
            if n_templates:
                filler, slot = templates[(d * pages_per_doc + p) % n_templates]
                lines = [f"UNIT SPEC {kw}", ""] + list(filler)
                lines.insert(slot, f"rated torque of {kw} is {val} Nm")
            else:
                lines = [f"UNIT SPEC {kw}", ""]
                for _ in range(int(rng.integers(8, 16))):
                    lines.append(" ".join(rng.choice(VOCAB, rng.integers(3, 9)).tolist()))
                lines.insert(int(rng.integers(2, len(lines))), f"rated torque of {kw} is {val} Nm")
            pages.append("\n".join(lines))
            facts.append(
                {
                    "doc": f"spec_{d:03d}.pdf", "page": p, "keyword": kw,
                    "question": f"What is the rated torque of {kw}?",
                    "answer": f"{val} Nm",
                }
            )
        pdfs.append((f"spec_{d:03d}.pdf", make_pdf(pages)))
    return pdfs, facts


# --------------------------------------------------------- perturbations

def _to_img(arr):
    from PIL import Image

    return Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))


def _occlude(a, frac, rng):
    """White rectangles until ~`frac` of the page area is covered."""
    h, w, _ = a.shape
    covered = np.zeros((h, w), bool)
    while covered.mean() < frac:
        bh, bw = int(h * 0.18), int(w * 0.18)
        y, x = int(rng.integers(0, h - bh)), int(rng.integers(0, w - bw))
        a[y : y + bh, x : x + bw] = 255.0
        covered[y : y + bh, x : x + bw] = True
    return a


def perturb(img, rung: str, rng):
    """Full-page perturbations (extent preserved — ColPali patch grids
    are position-sensitive, so difficulty comes from pixel damage, not
    crops). Parameterized rungs: "blur:S", "occ:F", "jpeg:Q",
    "rescale:F", "noise:S" — the ladder spans easy->hard so that at any
    tower geometry several rungs land in the measurable recall band
    (round-3 verdict item 3)."""
    from PIL import Image, ImageFilter

    a = np.asarray(img.convert("RGB"), np.float32)
    kind, *ps = rung.split(":")
    if kind == "identity":
        return img
    if kind == "blur":
        return img.convert("RGB").filter(ImageFilter.GaussianBlur(float(ps[0])))
    if kind == "noise":
        return _to_img(a + rng.normal(0, float(ps[0]), a.shape))
    if kind == "jpeg":
        buf = io.BytesIO()
        _to_img(a + rng.normal(0, 10, a.shape)).save(buf, "JPEG", quality=int(ps[0]))
        return Image.open(buf).convert("RGB")
    if kind == "rescale":
        f = int(ps[0])
        w, h = img.size
        return img.resize((max(1, w // f), max(1, h // f))).resize((w, h))
    if kind == "occ":
        a = _occlude(a.copy(), float(ps[0]), rng)
        return _to_img(a + rng.normal(0, 15, a.shape))
    if kind == "wreck":
        # compound damage: the deliberately-unsaturated top rung
        w, h = img.size
        img2 = img.resize((max(1, w // 5), max(1, h // 5))).resize((w, h))
        a2 = np.asarray(img2, np.float32)
        for _ in range(8):
            y, x = int(rng.integers(0, h * 3 // 4)), int(rng.integers(0, w * 3 // 4))
            a2[y : y + h // 4, x : x + w // 4] = 255.0
        buf = io.BytesIO()
        _to_img(a2 + rng.normal(0, 30, a2.shape)).save(buf, "JPEG", quality=15)
        return Image.open(buf).convert("RGB")
    raise ValueError(rung)


# easy -> hard; identity pins the sanity row near the top, wreck stays
# near the floor. Round-4 calibration on the TRAINED fixture at 440
# distractor-heavy pages (the shipped default run): identity 0.90,
# jpeg:4 0.50 (in band); blur 1/1.5/2 = 0.18/0.05/0.03, occ 0.45/0.65 =
# 0.13/0.03, rescale:5 = 0.0 (all floored — the trained tower is far
# less perturbation-tolerant than random weights, which match on global
# layout statistics). The sweep below shifts every floored family one
# notch lighter so most rungs sit in recall@1 (0.2, 0.9) and can
# measurably REGRESS; 3B real-weight runs shift everything up.
RUNGS = (
    "identity", "blur:0.5", "blur:1", "jpeg:4",
    "rescale:2", "rescale:3", "occ:0.25", "occ:0.45", "wreck",
)
RUNGS_SMALL = ("identity", "blur:1", "occ:0.45")


# --------------------------------------------------------------- harness

async def run_eval(args) -> Dict:
    from PIL import Image

    from morphik_core_tpu.config import Settings
    from morphik_core_tpu.models.schemas import AuthContext, EntityType
    from morphik_core_tpu.services_init import build_services
    from morphik_core_tpu.utils.fast_ops import bytes_to_data_uri, data_uri_to_bytes

    rng = np.random.default_rng(1)
    pdfs, facts = gen_corpus(args.docs, args.pages, seed=0, n_templates=args.templates)
    n_pages_total = args.docs * args.pages
    rungs = RUNGS_SMALL if args.small else RUNGS

    with tempfile.TemporaryDirectory() as tmp:
        settings = Settings.model_validate(
            {
                "storage": {"storage_path": f"{tmp}/storage"},
                "database": {"path": f"{tmp}/db.sqlite"},
                "vector_store": {"index_path": f"{tmp}/index"},
            }
        )
        colqwen_model = None
        if args.checkpoint:
            # real ColQwen2.5 weights (operator path — see
            # scripts/eval_checkpoint.sh): keyword/text rows become the
            # reference-comparable semantic metrics
            from morphik_core_tpu.models.colqwen import ColQwenModel

            settings.model.checkpoint_path = str(args.checkpoint)
            colqwen_model = ColQwenModel.from_checkpoint(
                args.checkpoint, matmul_precision=settings.model.matmul_precision
            )
        elif args.geometry == "fixture":
            # the committed tiny TRAINED checkpoint (scripts/
            # train_tiny_fixture.py): keyword-image and text rows become
            # real semantic metrics (well above chance) without the
            # undownloadable released weights
            from morphik_core_tpu.models.colqwen import ColQwenModel

            colqwen_model = ColQwenModel.from_fixture(args.fixture)
        elif args.geometry == "3b":
            # full 3B geometry with random bf16 weights at the CONFIGURED
            # serving precision — the shipped compute path end to end
            import jax
            import jax.numpy as jnp

            from morphik_core_tpu.models.colqwen import ColQwenConfig, ColQwenModel
            from morphik_core_tpu.models.colqwen.model import init_colqwen_params

            cfg3 = ColQwenConfig()
            params = jax.jit(lambda k: init_colqwen_params(k, cfg3, dtype=jnp.bfloat16))(
                jax.random.PRNGKey(0)
            )
            colqwen_model = ColQwenModel(
                cfg3, params, matmul_precision=settings.model.matmul_precision
            )
            # free the bf16 originals of the int8-quantized weights —
            # holding both OOMs the 3B tower next to the eval's index
            del params
        services = build_services(settings, colqwen_model=colqwen_model)
        await services.database.initialize()
        auth = AuthContext(
            entity_type=EntityType.DEVELOPER, entity_id="eval",
            permissions={"read", "write", "admin"}, user_id="eval",
        )

        t0 = time.time()
        name_to_id: Dict[str, str] = {}
        for fname, data in pdfs:
            doc = await services.ingestion_service.ingest_file_content(
                data, fname, {}, auth, use_colpali=True
            )
            await services.ingestion_service.process_ingestion_job(
                doc.external_id, auth, use_colpali=True
            )
            name_to_id[fname] = doc.external_id
        ingest_s = time.time() - t0

        # page images as STORED (the store's own payloads are the honest
        # source for perturbation queries)
        async def page_image(doc_name: str, page: int):
            chunks = await services.document_service.batch_retrieve_chunks(
                [(name_to_id[doc_name], page)], auth, use_colpali=True
            )
            assert chunks and chunks[0].metadata.get("is_image"), f"no page image {doc_name}:{page}"
            return Image.open(io.BytesIO(data_uri_to_bytes(chunks[0].content))).convert("RGB")

        async def retrieve_image(img) -> List[Tuple[str, int]]:
            buf = io.BytesIO()
            img.save(buf, "PNG")
            chunks = await services.document_service.retrieve_chunks(
                "", auth, k=10, use_colpali=True,
                query_image=bytes_to_data_uri(buf.getvalue(), "image/png"),
            )
            return [(c.document_id, c.chunk_number) for c in chunks]

        def metrics(ranks: List[int | None], n: int) -> Dict:
            return {
                "n": n,
                "recall_at_1": sum(1 for r in ranks if r and r <= 1) / n,
                "recall_at_4": sum(1 for r in ranks if r and r <= 4) / n,
                "recall_at_10": sum(1 for r in ranks if r and r <= 10) / n,
                "mrr": sum(1.0 / r for r in ranks if r) / n,
            }

        # ---- visual perturbation ladder (page-level gold) ----
        probe_facts = [facts[i] for i in rng.choice(len(facts), min(args.queries, len(facts)), replace=False)]
        by_rung = {}
        t0 = time.time()
        if args.skip_ladder:
            rungs = ()
        for rung in rungs:
            ranks = []
            for f in probe_facts:
                img = await page_image(f["doc"], f["page"])
                got = await retrieve_image(perturb(img, rung, rng))
                gold = (name_to_id[f["doc"]], f["page"])
                rank = next((i + 1 for i, g in enumerate(got) if g == gold), None)
                ranks.append(rank)
            by_rung[rung] = metrics(ranks, len(probe_facts))
        visual_s = time.time() - t0

        # ---- keyword-image + text queries (semantic; chance-level with
        # random weights, real metrics with a real checkpoint) ----
        def render_keyword(kw: str):
            from PIL import ImageDraw

            img = Image.new("RGB", (280, 40), "white")
            ImageDraw.Draw(img).text((8, 12), f"rated torque of {kw}", fill="black")
            return img

        def render_keyword_page(kw: str):
            # page-GEOMETRY keyword query: the production text-page raster
            # renders only the fact lines (same scale/positions as gold
            # pages, none of the template filler) — retrieval must match
            # the keyword GLYPHS among near-duplicate distractors. This is
            # the semantic row the trained tiny fixture can pass (the
            # 280x40 crop above needs cross-scale generalization a 16-dim
            # tower doesn't have; it stays as the real-checkpoint metric).
            from morphik_core_tpu.parser.pdf import _render_text_page

            return _render_text_page(
                f"UNIT SPEC {kw}\n\nrated torque of {kw}", dpi=150
            )

        # semantic rows use ALL probe facts (n = --queries, default 40):
        # at the round-4 n=20, recall@1 0.05 was 1 hit — a 2x regression
        # was statistically invisible (round-5 verdict item 3)
        kw_ranks, kwp_ranks, txt_ranks = [], [], []
        for f in probe_facts:
            gold = (name_to_id[f["doc"]], f["page"])
            got = await retrieve_image(render_keyword(f["keyword"]))
            kw_ranks.append(next((i + 1 for i, g in enumerate(got) if g == gold), None))
            got = await retrieve_image(render_keyword_page(f["keyword"]))
            kwp_ranks.append(next((i + 1 for i, g in enumerate(got) if g == gold), None))
            chunks = await services.document_service.retrieve_chunks(
                f["question"], auth, k=10, use_colpali=True
            )
            got = [(c.document_id, c.chunk_number) for c in chunks]
            txt_ranks.append(next((i + 1 for i, g in enumerate(got) if g == gold), None))

        checkpoint = settings.model.checkpoint_path
        if not checkpoint and args.geometry == "fixture":
            checkpoint = f"trained tiny fixture ({args.fixture.name})"
        return {
            "corpus": {"docs": args.docs, "pages_per_doc": args.pages,
                       "total_pages": n_pages_total, "templates": args.templates,
                       "ingest_s": round(ingest_s, 1)},
            "geometry": args.geometry,
            "serving_precision": settings.model.matmul_precision,
            "weights": checkpoint or "random (no checkpoint in env — structural fidelity mode)",
            "gold_granularity": "(document, page)",
            "visual_ladder": by_rung,
            "visual_ladder_s": round(visual_s, 1),
            "keyword_image_queries": metrics(kw_ranks, len(kw_ranks)),
            "keyword_page_queries": metrics(kwp_ranks, len(kwp_ranks)),
            "text_queries": metrics(txt_ranks, len(txt_ranks)),
            "chance_recall_at_10": round(10 / n_pages_total, 4),
        }


def main() -> int:
    default_fixture = Path(__file__).resolve().parent.parent / "tests/fixtures/tiny_colqwen.npz"
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=55)
    ap.add_argument("--pages", type=int, default=8)
    ap.add_argument("--queries", type=int, default=40)
    ap.add_argument("--templates", type=int, default=11,
                    help="page-layout templates shared across docs (0 = every page unique)")
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="CI smoke: tiny corpus + 3-rung ladder")
    ap.add_argument("--skip-ladder", action="store_true",
                    help="keyword/text rows only (semantic-row focus runs)")
    ap.add_argument("--geometry", choices=("dev", "3b", "fixture"),
                    default="fixture" if default_fixture.exists() else "dev",
                    help="dev = tiny random tower; 3b = full geometry, random "
                         "weights; fixture = committed tiny TRAINED checkpoint")
    ap.add_argument("--fixture", type=Path, default=default_fixture)
    ap.add_argument("--checkpoint", type=Path, default=None,
                    help="local HF-format ColQwen2.5 dir — overrides --geometry "
                         "with real weights (scripts/eval_checkpoint.sh)")
    args = ap.parse_args()
    if args.small:
        args.docs, args.pages, args.queries, args.templates = 5, 4, 8, 2
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    out = asyncio.run(run_eval(args))
    print(json.dumps(out))
    if args.out:
        args.out.write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
