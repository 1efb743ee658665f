"""Hard synthetic mode (VERDICT r3 weak 5): the task must be genuinely
non-saturating — the reachable ceiling should land meaningfully below
100% — while staying learnable, so a 2-3 point model regression moves
sweep scores instead of hiding under a ceiling or drowning in
optimization noise."""

import numpy as np

from cova_tpu.data.synthetic import (
    _CONFUSABLE_P,
    _HARD_WIDEN,
    _PALETTE,
    _TRUE_JITTER,
    _box_colors,
    _hard_mimic_class,
    _hard_prior_draw,
    _hard_prior_ranges,
    synth_image,
    synth_record,
)


def _page(i, ih, **kw):
    rng = np.random.default_rng((99, i))
    rec = synth_record(str(i), ih, rng,
                       kw.pop("min_boxes", 60), kw.pop("max_boxes", 120),
                       hard=True)
    return rec, rng


def _in_tight_region(cls, bx, by, bw, bh, ih):
    rngs = _hard_prior_ranges(cls, ih, 1.0)
    if cls == 3:
        vals = (bx, by, bh, bw / max(bh, 1e-6))
        tol = (0.5, 0.5, 0.5, 0.01)
    else:
        vals = (bx, by, bw, bh)
        tol = (0.5, 0.5, 0.5, 0.5)
    return all(lo - t <= v <= hi + t
               for v, (lo, hi), t in zip(vals, rngs, tol))


def _optimal_rule_accuracy(ih: int, n_pages: int) -> dict:
    """Accuracy of the geometry-only optimal rule (uniform pick among
    boxes whose geometry lies in the class's TIGHT prior region — members
    are exchangeable by construction, so no geometry rule can beat
    this)."""
    correct = {1: 0.0, 2: 0.0, 3: 0.0}
    for i in range(n_pages):
        rec, _ = _page(i, ih)
        for cls in (1, 2, 3):
            true_idx = int(np.where(rec.labels == cls)[0][0])
            inside = [j for j in range(rec.n_boxes)
                      if _in_tight_region(cls, *rec.boxes_xywh[j], ih)]
            if true_idx in inside:
                correct[cls] += 1.0 / len(inside)
    return {c: correct[c] / n_pages for c in correct}


def test_hard_mode_geometry_bayes_ceiling_in_band():
    acc = _optimal_rule_accuracy(ih=320, n_pages=120)
    for cls, a in acc.items():
        # Below saturation (mimics really do confuse the optimal rule)
        # but well above chance (the tight prior really does separate).
        assert 0.70 <= a <= 0.95, (cls, a)


def test_hard_mode_color_rule_ceiling_in_band():
    """The LEARNABLE ceiling: rank by color typicality (is the fill
    inside the class's true +-_TRUE_JITTER cube?), break ties uniformly.
    This is the rule the CNN branch actually reaches in a couple of
    epochs, so the sweep's expected score must sit in the non-saturated
    80s-low-90s band; geometry typicality can only add on top."""
    ih = 320
    correct = {1: 0.0, 2: 0.0, 3: 0.0}
    n_pages = 120
    for i in range(n_pages):
        rec, rng = _page(i, ih)
        colors = _box_colors(rec, ih, rng, hard=True).astype(np.int32)
        for cls in (1, 2, 3):
            true_idx = int(np.where(rec.labels == cls)[0][0])
            center = _PALETTE[cls].astype(np.int32)
            match = (np.abs(colors - center) <= _TRUE_JITTER).all(axis=1)
            assert match[true_idx]
            correct[cls] += 1.0 / match.sum()
    for cls in correct:
        a = correct[cls] / n_pages
        assert 0.78 <= a <= 0.96, (cls, a)


def test_oracle_band_pins_ceiling(tmp_path):
    """The Bayes-oracle scorer (VERDICT r4 item 2) produces the ceiling
    BAND the sweeps calibrate against: the latent oracle (reads assigned
    colors — joint geometry+color LLR) sits near 100 because a mimic must
    pass BOTH the tight-geometry filter (~(1/2)^4) and the confusable-
    color filter (~0.06); the visible oracle (colors re-estimated from
    rendered pixels) collapses for Image — large true Image boxes get
    painted over by their own smaller-area mimics — which is exactly the
    occlusion headroom the trained model's RoI features can exploit but a
    per-box color rule cannot."""
    from cova_tpu.data.synthetic import (
        InMemoryWebDataset,
        oracle_retrieval_correct,
    )

    ds = InMemoryWebDataset(150, 256, seed=123, max_boxes=120, hard=True)
    lat = oracle_retrieval_correct(ds).mean(axis=0) * 100
    vis = oracle_retrieval_correct(ds, visible=True).mean(axis=0) * 100
    # Latent (information ceiling): near-saturated for all classes.
    assert np.all(lat >= 95.0), lat
    # Visible pixels-only rule: Price/Title stay high (small boxes rarely
    # occluded)...
    assert vis[0] >= 90.0 and vis[1] >= 90.0, vis
    # ...but Image drops hard under mimic-on-true occlusion. Band not a
    # point: the exact value moves with seed/page-count.
    assert 35.0 <= vis[2] <= 75.0, vis
    # Oracle never scores ABOVE perfect information.
    assert np.all(vis <= lat + 1e-9), (lat, vis)


def test_oracle_rejects_easy_mode():
    from cova_tpu.data.synthetic import (
        InMemoryWebDataset,
        oracle_retrieval_correct,
    )
    import pytest

    ds = InMemoryWebDataset(3, 64, seed=0, max_boxes=16, hard=False)
    with pytest.raises(ValueError):
        oracle_retrieval_correct(ds)


def test_hard_mode_color_cue_is_bimodal():
    """Colored mimics split into ~_CONFUSABLE_P color-indistinguishable
    (inside the true jitter cube) vs clearly-separable (>= 25/channel
    margin outside it) — no in-between, so a plain color threshold is
    learnable AND capped below 100%."""
    ih = 320
    confusable = separable = 0
    for i in range(60):
        rec, rng = _page(i, ih)
        colors = _box_colors(rec, ih, rng, hard=True).astype(np.int32)
        for j in range(rec.n_boxes):
            if rec.labels[j] != 0:
                continue
            if np.array_equal(colors[j],
                              _PALETTE[0].astype(np.int32)):
                continue
            dists = [np.abs(colors[j] - _PALETTE[c].astype(np.int32))
                     for c in (1, 2, 3)]
            if any((d <= _TRUE_JITTER).all() for d in dists):
                confusable += 1
            else:
                # Outside EVERY class's cube with a real margin.
                assert all((d > _TRUE_JITTER).any() for d in dists)
                separable += 1
    total = confusable + separable
    assert total >= 100  # mimics are actually being planted + colored
    frac = confusable / total
    assert abs(frac - _CONFUSABLE_P) < 0.04, (confusable, separable)


def test_hard_mode_mimics_are_planted_and_colored():
    """Each page plants BG mimics inside the widened class regions, and
    synth_image paints (most of) them with non-gray fills — the page
    background (245ish) and plain-gray BG boxes (200ish) must not cover
    them."""
    ih = 320
    rng = np.random.default_rng(5)
    rec = synth_record("0", ih, rng, min_boxes=60, max_boxes=120, hard=True)
    bg_mimics = [
        j for j in range(rec.n_boxes)
        if rec.labels[j] == 0
        and _hard_mimic_class(*rec.boxes_xywh[j], float(ih))
    ]
    assert len(bg_mimics) >= 4  # 6 planted minus clip/overlap losses
    img = synth_image(rec, ih, np.random.default_rng(5), hard=True)
    colored = 0
    for j in bg_mimics:
        x, y, w, h = rec.boxes_xywh[j]
        cx, cy = int(x + w / 2), int(y + h / 2)
        px = img[min(cy, ih - 1), min(cx, ih - 1)].astype(np.int32)
        # Every colored fill (confusable OR separable mode) ends >= 40
        # away per the worst channel from both the gray BG palette (200)
        # and the page background (245), even after the <=8 darkening
        # noise. Overdraw by a later box can hide a mimic — hence
        # "most", not "all".
        if (np.abs(px - 200).max() > 40) and (np.abs(px - 245).max() > 40):
            colored += 1
    assert colored >= max(2, len(bg_mimics) // 2)


def test_hard_mode_boxes_respect_min_size_at_smoke_geometry():
    """Priors scale with img_h: at the 64 px smoke geometry every box —
    class, mimic, BG — must still be >= 2 px (sub-pixel boxes collapse
    class accuracy for reasons unrelated to task hardness)."""
    for i in range(8):
        rng = np.random.default_rng((7, i))
        rec = synth_record(str(i), 64, rng, min_boxes=11, max_boxes=40,
                           hard=True)
        assert (rec.boxes_xywh[:, 2:] >= 2.0 - 1e-6).all()


def test_hard_mode_additional_feat0_is_noisy_indicator():
    """CoVA++ stand-in: hard-mode feature 0 = 1{class box} + 0.6*N(0,1) —
    informative (AUC well above chance) but not decisive (overlap exists),
    so --use_additional_feat lifts sweep scores without trivializing the
    task. Easy mode keeps pure-noise features (unchanged contract)."""
    pos, neg = [], []
    for i in range(40):
        rng = np.random.default_rng((13, i))
        rec = synth_record(str(i), 320, rng, 60, 120, 4, hard=True)
        f0 = rec.additional_feats[:, 0]
        pos.extend(f0[rec.labels != 0])
        neg.extend(f0[rec.labels == 0])
    pos, neg = np.array(pos), np.array(neg)
    auc = (pos[:, None] > neg[None, :]).mean()
    assert 0.80 <= auc <= 0.95, auc
    # Remaining columns stay ~N(0,1) noise.
    rng = np.random.default_rng((13, 0))
    rec = synth_record("0", 320, rng, 60, 120, 4, hard=True)
    assert abs(rec.additional_feats[:, 1:].mean()) < 0.3

    easy = synth_record("0", 320, np.random.default_rng((13, 0)), 60, 120,
                        4, hard=False)
    assert abs(easy.additional_feats[:, 0].mean()) < 0.3  # no indicator


def test_hard_prior_draw_matches_membership():
    """A tight-prior draw must always be classified back to its own class
    by the widened membership test (the coloring rule covers the true
    boxes' statistics.)"""
    ih = 1280
    rng = np.random.default_rng(11)
    for cls in (1, 2, 3):
        for _ in range(50):
            x, y, w, h = _hard_prior_draw(cls, ih, rng, widen=1.0)
            got = _hard_mimic_class(x, y, w, h, float(ih))
            assert got == cls, (cls, got, (x, y, w, h))
    assert _HARD_WIDEN > 1.0
