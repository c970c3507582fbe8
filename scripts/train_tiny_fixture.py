#!/usr/bin/env python3
"""Train the tiny ColQwen FIXTURE checkpoint (round-3 verdict item 6).

Why this exists: this environment cannot download the released
ColQwen2.5 weights, and random weights do perfect structural
self-retrieval but CHANCE-level keyword/text matching (measured, round
3) — so the committed eval had no semantic signal that could regress.
This script trains, in-env, a tiny ColQwen-architecture checkpoint by
contrastive alignment on synthetic rendered pages:

  - page images (the production raster + preprocess path, dpi 150,
    production max_pixels) containing planted "rated torque of <KW> is
    <N> Nm" lines;
  - keyword-image queries (the eval's own render_keyword style snippet);
  - text queries through the byte-fallback tokenizer.

Loss: bidirectional InfoNCE over the late-interaction MaxSim score
matrix — the exact scoring the serving stack uses (reference exact
rerank semantics: fast_multivector_store.py:553-557). Glyph/keyword
matching is the goal, not language understanding; the model must
generalize to UNSEEN keyword strings (eval keywords come from a
different RNG stream).

Writes tests/fixtures/tiny_colqwen.npz (params + config marker).
Run (TPU, ~10 min): python scripts/train_tiny_fixture.py
CPU smoke: python scripts/train_tiny_fixture.py --steps 3 --cpu --pool 16
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VOCAB = (
    "alpha bridge casing dynamo ember flux gasket helix ion joule kelvin lumen "
    "motor nacelle orbit piston quartz rotor stator torque valve winding yoke zenith"
).split()


def render_page(kw: str, val: int, rng) -> "PIL.Image.Image":
    """One synthetic spec page through the production text renderer."""
    from morphik_core_tpu.parser.pdf import _render_text_page

    lines = [f"UNIT SPEC {kw}", ""]
    for _ in range(int(rng.integers(8, 16))):
        lines.append(" ".join(rng.choice(VOCAB, rng.integers(3, 9)).tolist()))
    lines.insert(int(rng.integers(2, len(lines))), f"rated torque of {kw} is {val} Nm")
    return _render_text_page("\n".join(lines), dpi=150)


def render_query_snippet(kw: str, rng) -> "PIL.Image.Image":
    """The eval's keyword-image query: small white strip, black text."""
    from PIL import Image, ImageDraw, ImageFont

    img = Image.new("RGB", (280, 40), "white")
    draw = ImageDraw.Draw(img)
    font = None
    if rng.random() < 0.5:
        try:  # vary the font between the page font and PIL default for
            # scale/shape robustness (page glyphs are ~10 px after resize)
            from PIL import ImageFont as _IF

            font = _IF.truetype("DejaVuSans.ttf", size=int(rng.integers(10, 15)))
        except OSError:
            font = None
    draw.text((8, 12), f"rated torque of {kw}", fill="black", font=font)
    return img


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--pool", type=int, default=384, help="pregenerated page pool size")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=Path,
                    default=Path(__file__).resolve().parent.parent / "tests/fixtures/tiny_colqwen.npz")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from morphik_core_tpu.models.colqwen.config import ColQwenConfig
    from morphik_core_tpu.models.colqwen.model import (
        ColQwenModel,
        colqwen_image_forward,
        colqwen_text_forward,
        init_colqwen_params,
    )
    from morphik_core_tpu.models.colqwen.preprocess import preprocess_image_u8
    from morphik_core_tpu.models.colqwen.text import mrope_cos_sin, mrope_position_ids
    from morphik_core_tpu.models.colqwen.vision import vision_rotary_cos_sin

    cfg = ColQwenConfig.tiny()
    rng = np.random.default_rng(args.seed)
    model_for_tok = ColQwenModel(cfg, init_colqwen_params(jax.random.PRNGKey(0), cfg))

    # ---- pregenerate the page pool (host) --------------------------------
    t0 = time.time()
    kws = [f"{rng.choice(VOCAB).upper()}-{rng.integers(1000, 9999)}" for _ in range(args.pool)]
    pages, page_grid = [], None
    for kw in kws:
        img = render_page(kw, int(rng.integers(10, 990)), rng)
        patches, grid = preprocess_image_u8(img)
        if page_grid is None:
            page_grid = grid
        assert grid == page_grid, "all pages must share one grid bucket"
        pages.append(patches)
    pages = np.stack(pages)  # (P, S, 588) u8
    print(f"pool: {args.pool} pages, grid {page_grid}, {time.time()-t0:.0f}s", flush=True)

    # query snippets share one grid too
    snip_patches, snip_grid = [], None
    for kw in kws:
        patches, grid = preprocess_image_u8(render_query_snippet(kw, rng))
        if snip_grid is None:
            snip_grid = grid
        assert grid == snip_grid
        snip_patches.append(patches)
    snips = np.stack(snip_patches)

    # text queries (byte tokenizer), one bucket
    T_BUCKET = 64
    txt_ids = np.zeros((args.pool, T_BUCKET), np.int32)
    txt_mask = np.zeros((args.pool, T_BUCKET), np.float32)
    for i, kw in enumerate(kws):
        ids = model_for_tok.query_token_ids(f"What is the rated torque of {kw}?")
        n = min(len(ids), T_BUCKET)
        txt_ids[i, :n] = ids[:n]
        txt_mask[i, :n] = 1.0

    # ---- static per-grid tables ------------------------------------------
    def image_args(grid, batch):
        hu, wu = grid
        n_units = hu * wu
        ids = model_for_tok.image_sequence_ids(n_units)
        input_ids = np.tile(ids[None], (batch, 1))
        pos = mrope_position_ids(input_ids, cfg.image_token_id, [(1, hu, wu)] * batch)
        cos_t, sin_t = mrope_cos_sin(pos, cfg.text)
        cos_v, sin_v = vision_rotary_cos_sin(hu, wu, cfg.vision)
        # loss masks score only the IMAGE-CONTENT positions — the chat-
        # template tokens are identical across all pages/queries and
        # drown the contrastive signal (round-4 collapse lesson)
        img_mask = (ids == cfg.image_token_id).astype(np.float32)
        return dict(
            cos_v=jnp.asarray(cos_v), sin_v=jnp.asarray(sin_v),
            input_ids=jnp.asarray(input_ids), cos_t=jnp.asarray(cos_t),
            sin_t=jnp.asarray(sin_t), h_units=hu, w_units=wu,
        ), jnp.asarray(np.tile(img_mask[None], (batch, 1)))

    B = args.batch
    page_const, page_imask = image_args(page_grid, B)
    snip_const, snip_imask = image_args(snip_grid, B)

    from morphik_core_tpu.models.colqwen.model import expand_patches_u8

    def embed_pages(params, u8):
        return colqwen_image_forward(
            params, cfg, expand_patches_u8(u8, jnp.float32), **page_const
        )

    def embed_snips(params, u8):
        return colqwen_image_forward(
            params, cfg, expand_patches_u8(u8, jnp.float32), **snip_const
        )

    def maxsim_matrix(q, qm, p, pm):
        # (Bq,Tq,D)x(Bp,Tp,D) -> (Bq,Bp) MEAN-pooled late-interaction:
        # logits live in [-1, 1] regardless of token counts, scaled by
        # the learnable CLIP-style temperature below
        sim = jnp.einsum("qtd,pkd->qptk", q, p)
        sim = sim - 1e30 * (1.0 - pm)[None, :, None, :]
        best = jnp.max(sim, axis=-1)
        return jnp.sum(best * qm[:, None, :], axis=-1) / jnp.maximum(
            jnp.sum(qm, axis=-1)[:, None], 1.0
        )

    def loss_fn(tparams, page_u8, snip_u8, tids, tmask, tcos, tsin):
        params, logit_scale = tparams
        scale = jnp.exp(jnp.clip(logit_scale, 0.0, jnp.log(100.0)))
        p = embed_pages(params, page_u8)  # (B, Sp, D) L2-normalized
        qi = embed_snips(params, snip_u8)
        qt = colqwen_text_forward(params, cfg, tids, tmask, tcos, tsin)
        labels = jnp.arange(p.shape[0])

        def nce(scores):
            s = scores * scale
            return 0.5 * (
                optax.softmax_cross_entropy_with_integer_labels(s, labels).mean()
                + optax.softmax_cross_entropy_with_integer_labels(s.T, labels).mean()
            )

        li = nce(maxsim_matrix(qi, snip_imask, p, page_imask))
        lt = nce(maxsim_matrix(qt, tmask, p, page_imask))
        return li + lt, (li, lt)

    params = init_colqwen_params(jax.random.PRNGKey(args.seed), cfg, dtype=jnp.float32)
    tparams = (params, jnp.asarray(np.log(10.0), jnp.float32))
    opt = optax.adamw(
        optax.warmup_cosine_decay_schedule(0.0, args.lr, 50, args.steps, args.lr * 0.05),
        weight_decay=1e-4,
    )
    opt_state = opt.init(tparams)

    @jax.jit
    def train_step(tparams, opt_state, page_u8, snip_u8, tids, tmask, tcos, tsin):
        (loss, (li, lt)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            tparams, page_u8, snip_u8, tids, tmask, tcos, tsin
        )
        updates, opt_state = opt.update(grads, opt_state, tparams)
        return optax.apply_updates(tparams, updates), opt_state, loss, li, lt

    t0 = time.time()
    for step in range(args.steps):
        idx = rng.choice(args.pool, B, replace=False)
        tb_ids, tb_mask = txt_ids[idx], txt_mask[idx]
        pos = mrope_position_ids(tb_ids, -1, [None] * B, attention_mask=tb_mask)
        tcos, tsin = mrope_cos_sin(pos, cfg.text)
        tparams, opt_state, loss, li, lt = train_step(
            tparams, opt_state, jnp.asarray(pages[idx]), jnp.asarray(snips[idx]),
            jnp.asarray(tb_ids), jnp.asarray(tb_mask), jnp.asarray(tcos), jnp.asarray(tsin),
        )
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f} (img {float(li):.4f} txt {float(lt):.4f}) "
                  f"scale {float(jnp.exp(tparams[1])):.1f} {time.time()-t0:.0f}s", flush=True)
    params = tparams[0]

    # ---- held-out eval: UNSEEN keywords ----------------------------------
    ev_rng = np.random.default_rng(args.seed + 1000)
    n_ev = 64
    ev_kws = [f"{ev_rng.choice(VOCAB).upper()}-{ev_rng.integers(1000, 9999)}" for _ in range(n_ev)]
    ev_pages = np.stack([
        preprocess_image_u8(render_page(kw, int(ev_rng.integers(10, 990)), ev_rng))[0]
        for kw in ev_kws
    ])
    ev_snips = np.stack([
        preprocess_image_u8(render_query_snippet(kw, ev_rng))[0] for kw in ev_kws
    ])
    pe = jax.jit(embed_pages)
    se = jax.jit(embed_snips)
    page_emb, snip_emb = [], []
    for s in range(0, n_ev, B):
        page_emb.append(np.asarray(pe(params, jnp.asarray(ev_pages[s:s + B]))))
        snip_emb.append(np.asarray(se(params, jnp.asarray(ev_snips[s:s + B]))))
    page_emb = np.concatenate(page_emb)
    snip_emb = np.concatenate(snip_emb)
    scores = np.einsum("qtd,pkd->qptk", snip_emb, page_emb).max(-1).sum(-1)
    ranks = (-scores).argsort(1)
    r1 = float((ranks[:, 0] == np.arange(n_ev)).mean())
    r10 = float(np.mean([np.where(ranks[i] == i)[0][0] < 10 for i in range(n_ev)]))
    print(f"held-out (unseen keywords, {n_ev} pages): recall@1 {r1:.3f} recall@10 {r10:.3f} "
          f"(chance@10 {10/n_ev:.3f})", flush=True)

    # ---- save -------------------------------------------------------------
    from morphik_core_tpu.models.colqwen.model import save_params_npz

    args.out.parent.mkdir(parents=True, exist_ok=True)
    save_params_npz(args.out, params)
    print(f"saved {args.out} ({args.out.stat().st_size/1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
