"""Metric zoo vs sklearn (the reference backs everything with sklearn,
metricszoo.py:17-292)."""

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")
from sklearn import metrics as skm

from fedcola_tpu.utils.metrics import METRICS, MetricManager


def _fixture(n=200, c=7, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(n, c).astype(np.float32)
    y = rng.randint(0, c, n)
    return logits, y


def test_acc1_acc5():
    logits, y = _fixture()
    m = METRICS["Acc1"](); m.collect(logits, y)
    assert m.summarize() == pytest.approx(
        skm.accuracy_score(y, logits.argmax(-1)))
    m = METRICS["Acc5"](); m.collect(logits, y)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    assert m.summarize() == pytest.approx(
        skm.top_k_accuracy_score(y, probs, k=5, labels=np.arange(7)))


def test_f1_precision_recall():
    logits, y = _fixture()
    pred = logits.argmax(-1)
    m = METRICS["F1"](); m.collect(logits, y)
    assert m.summarize() == pytest.approx(
        skm.f1_score(y, pred, average="macro", zero_division=0))
    m = METRICS["Precision"](); m.collect(logits, y)
    assert m.summarize() == pytest.approx(
        skm.precision_score(y, pred, average="weighted", zero_division=0))
    m = METRICS["Recall"](); m.collect(logits, y)
    assert m.summarize() == pytest.approx(
        skm.recall_score(y, pred, average="weighted", zero_division=0))


def test_regression_metrics():
    rng = np.random.RandomState(1)
    y = rng.randn(100)
    p = y + rng.randn(100) * 0.1
    for name, fn in [("Mse", skm.mean_squared_error),
                     ("Mae", skm.mean_absolute_error),
                     ("R2", skm.r2_score)]:
        m = METRICS[name](); m.collect(p, y)
        assert m.summarize() == pytest.approx(fn(y, p), rel=1e-6)


def test_metric_manager_loss_math():
    """track weights loss by len(pred), aggregate divides by dataset length
    (src/utils.py:337-347)."""
    mm = MetricManager(["acc1"])
    logits, y = _fixture(n=10, c=3)
    mm.track(2.0, logits[:6], y[:6])
    mm.track(1.0, logits[6:], y[6:])
    mm.aggregate(total_len=10)
    assert mm.results["loss"] == pytest.approx((2.0 * 6 + 1.0 * 4) / 10)
    assert 0 <= mm.results["metrics"]["acc1"] <= 1


def test_dispatch_window_bounds_inflight():
    """DispatchWindow drains FIFO and never holds more than `inflight`
    dispatched-but-unread items (the documented HBM backpressure bound)."""
    from fedcola_tpu.utils.dispatch import DispatchWindow
    drained = []
    win = DispatchWindow(lambda a, b: drained.append((a, b)), inflight=3)
    max_pending = 0
    for i in range(10):
        win.push(i, i * 10)
        max_pending = max(max_pending, len(win._q))
    assert max_pending <= 3
    win.flush()
    assert drained == [(i, i * 10) for i in range(10)]
    # degenerate knob values clamp to a window of 1, never 0 (an empty
    # window would deadlock push)
    win1 = DispatchWindow(lambda x: drained.append(x), inflight=0)
    win1.push(99)
    win1.flush()
    assert drained[-1] == 99


def test_json_sanitize_nonfinite():
    """Non-finite floats must not reach the metrics JSONL / results JSON:
    json.dumps would emit bare Infinity/NaN (invalid strict JSON)."""
    import json
    from fedcola_tpu.utils.logging import json_sanitize
    obj = {"a": float("inf"), "b": [1, float("nan"), 2.5],
           "c": {"d": np.float32("-inf"), "e": "txt", "f": True, "g": 7}}
    out = json_sanitize(obj)
    s = json.dumps(out, allow_nan=False)   # raises if any slipped through
    assert out["a"] is None and out["b"] == [1, None, 2.5]
    assert out["c"]["d"] is None and out["c"]["e"] == "txt"
    assert out["c"]["f"] is True and out["c"]["g"] == 7
