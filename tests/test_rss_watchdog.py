"""RSS watchdog (utils/rss.py + trainer hook): the remote-tunnel transfer
path retains ~payload bytes of host RSS per dispatch (measured,
artifacts/tpu_r5/dispatch_leak.out), so long runs recycle the process at
an epoch boundary via the just-saved "last" checkpoint + --resume."""

import jax
import numpy as np
import pytest

from cova_tpu.config import Config
from cova_tpu.data.batching import Batch
from cova_tpu.models.cova import build_model
from cova_tpu.train import trainer as tr
from cova_tpu.train.steps import create_train_state
from cova_tpu.utils import rss
from cova_tpu.utils.checkpoint import CheckpointManager


def _batch(cfg, b, rng):
    P, K = cfg.pad_boxes, cfg.n_context
    imgs = rng.integers(0, 255, (b, cfg.img_height, cfg.img_height, 3),
                        dtype=np.uint8)
    boxes = rng.uniform(1, 20, (b, P, 4)).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2]
    mask = np.zeros((b, P), bool)
    mask[:, :8] = True
    labels = np.zeros((b, P), np.int32)
    labels[:, :3] = [1, 2, 3]
    ctx = np.full((b, P, K), -1, np.int32)
    ctx[:, :8, :2] = rng.integers(0, 8, (b, 8, 2))
    return Batch(
        images=imgs, boxes=boxes, labels=labels, box_mask=mask,
        context_indices=ctx,
        additional_feats=np.zeros((b, P, 0), np.float32),
    )


class FakePipeline:
    def __init__(self, cfg, n_batches=2, bs=2, seed=0):
        self.batch_size = bs
        rng = np.random.default_rng(seed)
        self._batches = [_batch(cfg, bs, rng) for _ in range(n_batches)]
        self.ds = list(range(n_batches * bs))

    def epoch(self, epoch):
        for i, b in enumerate(self._batches):
            yield list(range(i * self.batch_size,
                             (i + 1) * self.batch_size)), b


@pytest.fixture(scope="module")
def tiny():
    cfg = Config(
        img_height=32, max_boxes=16, context_size=2, hidden_dim=16,
        bbox_hidden_dim=8, batch_size=2, compute_dtype="float32",
        n_epochs=2,
    )
    model = build_model(cfg)
    pipe = FakePipeline(cfg)
    _, ex = next(iter(pipe.epoch(0)))
    state0 = jax.device_get(
        create_train_state(model, cfg, ex, jax.random.PRNGKey(0))
    )
    # fit's train_step donates the state buffers — hand each test a
    # fresh device copy of the host-side template.
    return cfg, (lambda: jax.device_put(state0)), pipe


def test_rss_readings():
    assert rss.rss_gb() > 0.01  # a live CPython is tens of MB minimum
    assert rss.mem_total_gb() > rss.rss_gb()


def test_limit_env_override(monkeypatch):
    monkeypatch.setenv("COVA_RSS_LIMIT_GB", "12.5")
    assert rss.rss_limit_gb() == 12.5
    monkeypatch.setenv("COVA_RSS_LIMIT_GB", "0")  # <=0 disables
    assert rss.rss_limit_gb() == float("inf")
    assert not rss.over_limit()
    monkeypatch.delenv("COVA_RSS_LIMIT_GB")
    assert rss.rss_limit_gb() == pytest.approx(
        0.75 * rss.mem_total_gb()
    )


class _Restart(Exception):
    pass


def test_watchdog_fires_after_checkpoint(tiny, tmp_path, monkeypatch):
    """Past the limit, the callback fires at the FIRST epoch boundary —
    after "last" is saved (so an exec'd --resume continues exactly)."""
    cfg, mk_state, pipe = tiny
    state = mk_state()
    monkeypatch.setenv("COVA_RSS_LIMIT_GB", "0.001")
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    fired = []

    def boom(epoch):
        fired.append(epoch)
        raise _Restart  # a real callback os.execv's and never returns

    with pytest.raises(_Restart):
        tr.fit(state, cfg, pipe, FakePipeline(cfg, seed=1), ckpt,
               on_rss_limit=boom)
    assert fired == [1]
    assert ckpt.exists("last")  # saved BEFORE the callback ran


def test_watchdog_disabled_and_warn_only(tiny, tmp_path, monkeypatch):
    """<=0 disables; a callback that returns lets training finish."""
    cfg, mk_state, pipe = tiny
    monkeypatch.setenv("COVA_RSS_LIMIT_GB", "0")
    fired = []
    _, best = tr.fit(mk_state(), cfg, pipe, FakePipeline(cfg, seed=1),
                     CheckpointManager(str(tmp_path / "c1")),
                     on_rss_limit=fired.append)
    assert fired == [] and np.isfinite(best)

    monkeypatch.setenv("COVA_RSS_LIMIT_GB", "0.001")
    fired2 = []
    _, best2 = tr.fit(mk_state(), cfg, pipe, FakePipeline(cfg, seed=1),
                      CheckpointManager(str(tmp_path / "c2")),
                      on_rss_limit=fired2.append)
    # fires at each non-final epoch boundary only (restarting after the
    # final epoch would be a wasted exec — the run completes anyway)
    assert fired2 == [1] and np.isfinite(best2)
