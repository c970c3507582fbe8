"""Semantic (glyph-matching) regression gate on the committed TRAINED
fixture checkpoint.

Random weights do perfect structural self-retrieval but CHANCE-level
keyword matching (measured, round 3) — so before this test, no in-suite
signal could catch a change that preserves self-similarity but breaks
cross-render alignment (e.g. a preprocess or rotary change). The tiny
fixture (scripts/train_tiny_fixture.py, dense codebook supervision) does
real glyph matching: two INDEPENDENT renders of "rated torque of <KW>"
(different fonts half the time) must retrieve each other well above
chance. The discriminative signal is ONLY the keyword glyphs — the long
shared prefix is common to every corpus item.

Reference semantics at stake: exact MaxSim rerank,
fast_multivector_store.py:553-557; measured margins (CPU, fixed seeds):
top1 0.333 / top3 0.417 vs chance 0.083 — thresholds sit well below.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "tiny_colqwen.npz"

VOCAB = (
    "alpha bridge casing dynamo ember flux gasket helix ion joule kelvin lumen "
    "motor nacelle orbit piston quartz rotor stator torque valve winding yoke zenith"
).split()


def _render_snippet(kw: str, rng):
    """Small white strip with black text — the eval's keyword-image
    query style (evaluations/colpali_eval.py)."""
    from PIL import Image, ImageDraw, ImageFont

    img = Image.new("RGB", (280, 40), "white")
    draw = ImageDraw.Draw(img)
    font = None
    if rng.random() < 0.5:
        try:
            font = ImageFont.truetype("DejaVuSans.ttf", size=int(rng.integers(10, 15)))
        except OSError:
            font = None
    draw.text((8, 12), f"rated torque of {kw}", fill="black", font=font)
    return img


@pytest.mark.skipif(not FIXTURE.exists(), reason="trained fixture not present")
def test_fixture_glyph_matching_above_chance():
    from morphik_core_tpu.models.colqwen.model import ColQwenModel
    from morphik_core_tpu.models.colqwen.preprocess import preprocess_image_u8

    model = ColQwenModel.from_fixture(FIXTURE)

    rng = np.random.default_rng(123)
    base = rng.choice(VOCAB, 12, replace=False)
    kws = [f"{b.upper()}-{rng.integers(1000, 9999)}" for b in base]
    rng_a, rng_b = np.random.default_rng(31337), np.random.default_rng(4242)
    corpus = [_render_snippet(k, rng_a) for k in kws]
    queries = [_render_snippet(k, rng_b) for k in kws]

    def embed(imgs):
        pre = [preprocess_image_u8(im) for im in imgs]
        grid = pre[0][1]
        assert all(p[1] == grid for p in pre)
        return np.asarray(model.embed_image_batch(np.stack([p[0] for p in pre]), *grid))

    ec, eq = embed(corpus), embed(queries)
    # exact MaxSim late interaction (the serving rerank's scoring)
    scores = np.einsum("qtd,pkd->qptk", eq, ec).max(-1).sum(-1)
    ranks = (-scores).argsort(1)
    n = len(kws)
    top1 = float((ranks[:, 0] == np.arange(n)).mean())
    top3 = float(np.mean([np.where(ranks[i] == i)[0][0] < 3 for i in range(n)]))

    # chance: top1 1/12 = 0.083, top3 = 0.25. Measured with this fixture:
    # 0.333 / 0.417. Thresholds leave room for numeric drift, not for a
    # semantic regression to chance.
    assert top1 >= 0.25, f"fixture glyph matching regressed: top1 {top1}"
    assert top3 >= 1 / 3, f"fixture glyph matching regressed: top3 {top3}"
