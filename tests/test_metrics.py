"""Eval metric: vectorized retrieval-style top-1 vs a loop oracle that
transcribes the reference scoring (train.py:131-154)."""

import jax.numpy as jnp
import numpy as np

from cova_tpu.train.steps import masked_ce_sum, retrieval_metric


def oracle_metric(logits, labels, mask, n_classes=4):
    B = logits.shape[0]
    correct = np.zeros((B, n_classes - 1), bool)
    present = np.zeros((B, n_classes - 1), bool)
    for b in range(B):
        idx = np.where(mask[b])[0]
        lg = logits[b][idx]
        lb = labels[b][idx]
        for c in range(1, n_classes):
            where_c = np.where(lb == c)[0]
            present[b, c - 1] = len(where_c) > 0
            if not len(where_c):
                continue
            true_local = where_c[0]
            pred_local = int(np.argmax(lg[:, c]))
            correct[b, c - 1] = pred_local == true_local
    return correct, present


def test_matches_oracle(rng):
    B, P, C = 4, 20, 4
    logits = rng.normal(size=(B, P, C)).astype(np.float32)
    labels = np.zeros((B, P), np.int32)
    mask = np.zeros((B, P), bool)
    for b in range(B):
        n = rng.integers(6, P)
        mask[b, :n] = True
        pos = rng.choice(n, 3, replace=False)
        labels[b, pos] = [1, 2, 3]
    got_c, got_p = retrieval_metric(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask), C
    )
    want_c, want_p = oracle_metric(logits, labels, mask, C)
    np.testing.assert_array_equal(np.asarray(got_c), want_c)
    np.testing.assert_array_equal(np.asarray(got_p), want_p)


def test_padding_cannot_win(rng):
    """A padded box with a huge logit must not beat real boxes."""
    logits = np.zeros((1, 5, 4), np.float32)
    logits[0, 4, 1] = 100.0  # padded box
    logits[0, 1, 1] = 1.0  # real class-1 box
    labels = np.array([[0, 1, 2, 3, 0]], np.int32)
    mask = np.array([[True, True, True, True, False]])
    c, p = retrieval_metric(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask), 4
    )
    assert bool(np.asarray(c)[0, 0])


def test_absent_class_is_incorrect(rng):
    logits = rng.normal(size=(1, 4, 4)).astype(np.float32)
    labels = np.array([[0, 1, 0, 0]], np.int32)  # no class 2 or 3
    mask = np.ones((1, 4), bool)
    c, p = retrieval_metric(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask), 4
    )
    assert not np.asarray(p)[0, 1] and not np.asarray(p)[0, 2]
    assert not np.asarray(c)[0, 1] and not np.asarray(c)[0, 2]


def torch_topk_oracle(logits, labels, mask, n_classes, k):
    """Direct transcription of the reference top-k scoring
    (train.py:144-153): ascending per-column argsort over the page's real
    boxes, keep the last k rows, class-c correct iff the (first) true
    class-c row index is among column c's top-k entries."""
    import torch

    B = logits.shape[0]
    correct = np.zeros((B, n_classes - 1), bool)
    for b in range(B):
        idx = np.where(mask[b])[0]
        output_img = torch.from_numpy(logits[b][idx])
        labels_img = torch.from_numpy(labels[b][idx]).view(-1, 1)
        label_indices = torch.arange(labels_img.shape[0]).view(-1, 1)
        indexed_labels = torch.cat((label_indices, labels_img), dim=1)
        indexed_labels = indexed_labels[indexed_labels[:, -1] != 0]
        top_k_predictions = torch.argsort(output_img, dim=0)[
            output_img.shape[0] - k:
        ]
        for c in range(1, n_classes):
            rows_c = indexed_labels[indexed_labels[:, -1] == c]
            if rows_c.shape[0] == 0:
                continue
            true_bbox = rows_c[0, 0]
            pred_bboxes = top_k_predictions[:, c]
            correct[b, c - 1] = bool((true_bbox == pred_bboxes).any())
    return correct


def test_topk_matches_torch_oracle(rng):
    """retrieval_metric(k) vs the reference transcription for k in 1,2,5."""
    B, P, C = 6, 24, 4
    logits = rng.normal(size=(B, P, C)).astype(np.float32)
    labels = np.zeros((B, P), np.int32)
    mask = np.zeros((B, P), bool)
    for b in range(B):
        n = int(rng.integers(8, P))
        mask[b, :n] = True
        pos = rng.choice(n, 3, replace=False)
        labels[b, pos] = [1, 2, 3]
    for k in (1, 2, 5):
        got_c, _ = retrieval_metric(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask),
            C, k=k,
        )
        want_c = torch_topk_oracle(logits, labels, mask, C, k)
        np.testing.assert_array_equal(np.asarray(got_c), want_c)


def test_topk_monotone(rng):
    """Correctness at k must imply correctness at every k' > k."""
    B, P, C = 8, 30, 4
    logits = rng.normal(size=(B, P, C)).astype(np.float32)
    labels = np.zeros((B, P), np.int32)
    mask = np.ones((B, P), bool)
    for b in range(B):
        pos = rng.choice(P, 3, replace=False)
        labels[b, pos] = [1, 2, 3]
    prev = None
    for k in (1, 2, 4, 8):
        c, _ = retrieval_metric(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask),
            C, k=k,
        )
        c = np.asarray(c)
        if prev is not None:
            assert np.all(c >= prev)
        prev = c


def test_masked_ce_sum_matches_torch(rng):
    import torch

    B, P, C = 2, 7, 4
    logits = rng.normal(size=(B, P, C)).astype(np.float32)
    labels = rng.integers(0, C, (B, P)).astype(np.int32)
    mask = rng.random((B, P)) > 0.3
    got = float(
        masked_ce_sum(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask)
        )
    )
    crit = torch.nn.CrossEntropyLoss(reduction="sum")
    want = float(
        crit(
            torch.from_numpy(logits[mask]),
            torch.from_numpy(labels[mask]).long(),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_run_eval_chunk_invariance(tiny_cfg, monkeypatch):
    """run_eval's chunked dispatch (eval_chunk_step) must be a pure
    performance change: identical img_acc for any COVA_EVAL_CHUNK."""
    import jax

    from cova_tpu.data.pipeline import DataPipeline
    from cova_tpu.data.synthetic import InMemoryWebDataset
    from cova_tpu.models.cova import build_model
    from cova_tpu.train.steps import create_train_state
    from cova_tpu.train.trainer import run_eval

    cfg = tiny_cfg
    ds = InMemoryWebDataset(7, cfg.img_height, seed=5,
                            max_boxes=cfg.max_boxes)
    pipe = DataPipeline(ds, batch_size=2, pad_boxes=cfg.pad_boxes,
                        context_size=cfg.context_size, shuffle=False,
                        num_threads=2)
    model = build_model(cfg)
    _, ex = next(iter(pipe.epoch(0)))
    state = create_train_state(model, cfg, ex, jax.random.PRNGKey(0))

    results = []
    for chunk in ("1", "3", "8"):
        monkeypatch.setenv("COVA_EVAL_CHUNK", chunk)
        img_acc, class_acc = run_eval(
            state, pipe, cfg.n_classes, ("BG", "Price", "Title", "Image")
        )
        results.append((img_acc, class_acc))
    for img_acc, class_acc in results[1:]:
        np.testing.assert_array_equal(img_acc, results[0][0])
        np.testing.assert_array_equal(class_acc, results[0][1])


def test_default_eval_chunk_backend_aware(monkeypatch):
    """The COVA_EVAL_CHUNK default is measured (VERDICT r2 item 9, re-
    measured round 4): 1 everywhere — chunking lost 1.8x on CPU and the
    r4 tunnel re-measurement flipped TPU too (artifacts/tpu_r4/
    eval_chunk.out). An explicit env value always wins (the chunked path
    stays for high-RTT links)."""
    from cova_tpu.train.trainer import default_eval_chunk

    monkeypatch.delenv("COVA_EVAL_CHUNK", raising=False)
    assert default_eval_chunk() == 1  # tests run on the CPU backend
    monkeypatch.setenv("COVA_EVAL_CHUNK", "5")
    assert default_eval_chunk() == 5
    monkeypatch.setenv("COVA_EVAL_CHUNK", "0")
    assert default_eval_chunk() == 1  # clamped


def test_retrieval_tie_breaking_documented_divergence():
    """Tie-breaking note (VERDICT r3 weak 6): the reference takes the last
    k rows of an ascending argsort — HIGHEST index wins a tie at the
    k-boundary (train.py:144-146) — while jax.lax.top_k prefers the LOWEST
    index. Measure-zero on float logits; this test pins the one observable
    divergence (a 2-way exact tie at k=1 where the true box is the higher
    index) and the agreement everywhere else."""
    # Page of 4 valid boxes; class-1 logit column has an exact tie between
    # boxes 1 and 3; box 3 is the true class-1 box.
    logits = np.zeros((1, 4, 4), np.float32)
    logits[0, :, 1] = [0.1, 0.9, 0.2, 0.9]
    labels = np.array([[0, 0, 0, 1]], np.int32)
    mask = np.ones((1, 4), bool)
    correct, present = retrieval_metric(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask), 4, k=1
    )
    assert bool(present[0, 0])
    # top_k picks the LOWEST tied index (1) -> miss; the reference's
    # argsort-last-k would pick the HIGHEST (3) -> hit. This is the
    # documented divergence; anything else here is a regression.
    assert not bool(correct[0, 0])
    # Off the tie: same logits with the true box strictly ahead agree with
    # the reference under both rules.
    logits[0, 3, 1] = 1.0
    correct, _ = retrieval_metric(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask), 4, k=1
    )
    assert bool(correct[0, 0])
