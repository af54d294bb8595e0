"""Golden tests of the metric zoo against the ACTUAL reference code.

`/root/reference/src/metrics/metricszoo.py` depends only on torch, numpy,
einops and sklearn — all present in this image — so like the split golden
(`test_splits_golden.py`) we import the real upstream module (with its
relative `.basemetric` import satisfied as a synthetic package) and drive
both implementations with identical synthetic predictions, asserting the
summarized numbers match.  This replaces simulation-goldens with the actual
upstream code for the second surface where that is possible offline.

Input shapes follow what the reference training loop actually produces:
multi-class heads give [N, C] logits, binary (painless-BCE) heads a single
logit column, Seqacc [B, T, C] with -1 padding, regression 1-D floats.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

from fedcola_tpu.utils import metrics as ours

REF_DIR = "/root/reference/src/metrics"


@pytest.fixture(scope="module")
def ref_zoo():
    if not os.path.exists(os.path.join(REF_DIR, "metricszoo.py")):
        pytest.skip("reference tree not mounted")
    pkg = types.ModuleType("refmetrics")
    pkg.__path__ = [REF_DIR]
    saved = {k: sys.modules.get(k) for k in
             ("refmetrics", "refmetrics.basemetric", "refmetrics.metricszoo")}
    sys.modules["refmetrics"] = pkg
    try:
        for sub in ("basemetric", "metricszoo"):
            spec = importlib.util.spec_from_file_location(
                f"refmetrics.{sub}", os.path.join(REF_DIR, f"{sub}.py"))
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"refmetrics.{sub}"] = mod
            spec.loader.exec_module(mod)
        return sys.modules["refmetrics.metricszoo"]
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _run_pair(ref_cls, our_cls, batches, use_youdenj=False):
    """Feed identical batches to both implementations; return both
    summaries.  The reference collects torch tensors, ours numpy."""
    ref_m, our_m = ref_cls(), our_cls()
    if use_youdenj:
        ref_m._use_youdenj = True
        our_m._use_youdenj = True
    for pred, true in batches:
        ref_m.collect(torch.tensor(pred), torch.tensor(true))
        our_m.collect(pred, true)
    return float(ref_m.summarize()), float(our_m.summarize())


def _mc_batches(rng, n=96, c=7, k=2):
    """Multi-class [n, c] logit batches + integer labels."""
    return [(rng.randn(n, c).astype(np.float32),
             rng.randint(0, c, n).astype(np.int64)) for _ in range(k)]


def _bin_col_batches(rng, n=160, k=2):
    """Binary single-logit-column [n, 1] batches (painless-BCE head)."""
    return [(rng.randn(n, 1).astype(np.float32),
             rng.randint(0, 2, (n, 1)).astype(np.int64)) for _ in range(k)]


def _bin_flat_batches(rng, n=160, k=2):
    """Binary 1-D score batches (Auprc/Youdenj collect raw scores)."""
    return [(rng.randn(n).astype(np.float32),
             rng.randint(0, 2, n).astype(np.int64)) for _ in range(k)]


def _reg_batches(rng, n=128, k=2):
    return [((rng.randn(n) * 2 + 0.5).astype(np.float32),
             (rng.randn(n) * 2 + 1.0).astype(np.float32)) for _ in range(k)]


@pytest.mark.parametrize("name", ["Acc1", "Acc5", "F1", "Precision",
                                  "Recall", "Auroc"])
def test_multiclass_metrics_match_reference(ref_zoo, name):
    rng = np.random.RandomState(11)
    got_ref, got_ours = _run_pair(getattr(ref_zoo, name),
                                  ours.METRICS[name], _mc_batches(rng))
    np.testing.assert_allclose(got_ours, got_ref, rtol=1e-6, atol=1e-9,
                               err_msg=name)


@pytest.mark.parametrize("name", ["Acc1", "F1", "Precision", "Recall"])
@pytest.mark.parametrize("use_youdenj", [False, True])
def test_binary_metrics_match_reference(ref_zoo, name, use_youdenj):
    """Binary heads emit a single logit column; the reference sigmoids and
    thresholds at 0.5 or the Youden-J cutoff (metricszoo.py:34-42)."""
    rng = np.random.RandomState(13)
    got_ref, got_ours = _run_pair(getattr(ref_zoo, name),
                                  ours.METRICS[name],
                                  _bin_col_batches(rng),
                                  use_youdenj=use_youdenj)
    np.testing.assert_allclose(got_ours, got_ref, rtol=1e-6, atol=1e-9,
                               err_msg=f"{name} youdenj={use_youdenj}")


@pytest.mark.parametrize("name", ["Auprc", "Youdenj"])
def test_binary_score_metrics_match_reference(ref_zoo, name):
    rng = np.random.RandomState(17)
    got_ref, got_ours = _run_pair(getattr(ref_zoo, name),
                                  ours.METRICS[name], _bin_flat_batches(rng))
    np.testing.assert_allclose(got_ours, got_ref, rtol=1e-6, atol=1e-9,
                               err_msg=name)


def test_seqacc_matches_reference(ref_zoo):
    """[B, T, C] logits with -1 special-token padding ignored
    (metricszoo.py:190-210)."""
    rng = np.random.RandomState(19)
    batches = []
    for _ in range(2):
        pred = rng.randn(8, 12, 30).astype(np.float32)
        true = rng.randint(0, 30, (8, 12)).astype(np.int64)
        true[rng.rand(8, 12) < 0.3] = -1
        batches.append((pred, true))
    got_ref, got_ours = _run_pair(ref_zoo.Seqacc, ours.Seqacc, batches)
    np.testing.assert_allclose(got_ours, got_ref, rtol=1e-6, err_msg="Seqacc")


@pytest.mark.parametrize("name", ["Mse", "Mae", "Mape", "R2", "D2"])
def test_regression_metrics_match_reference(ref_zoo, name):
    rng = np.random.RandomState(23)
    got_ref, got_ours = _run_pair(getattr(ref_zoo, name),
                                  ours.METRICS[name], _reg_batches(rng))
    np.testing.assert_allclose(got_ours, got_ref, rtol=1e-5, atol=1e-9,
                               err_msg=name)


def test_rmse_matches_reference_semantics(ref_zoo):
    """The reference Rmse calls mean_squared_error(..., squared=False)
    (metricszoo.py:231) — a kwarg REMOVED in the sklearn shipped here, so
    the upstream class cannot execute on this image.  Its semantics are
    sqrt(Mse); golden against the upstream Mse run through sqrt."""
    rng = np.random.RandomState(23)
    batches = _reg_batches(rng)
    ref_mse, _ = _run_pair(ref_zoo.Mse, ours.Mse, batches)
    _, our_rmse = _run_pair(ref_zoo.Mse, ours.Rmse, batches)
    np.testing.assert_allclose(our_rmse, np.sqrt(ref_mse), rtol=1e-6)


@pytest.fixture(scope="module")
def ref_mm(ref_zoo):
    """The real src/utils.py MetricManager, with its
    import_module('.metrics') satisfied by a synthetic package whose
    __path__ points at the reference tree (src/__init__.py never runs,
    so its transformers import is not pulled in)."""
    pkg = types.ModuleType("refsrc")
    pkg.__path__ = ["/root/reference/src"]
    keys = ("refsrc", "refsrc.utils", "refsrc.metrics",
            "refsrc.metrics.metricszoo", "refsrc.metrics.basemetric")
    saved = {k: sys.modules.get(k) for k in keys}
    sys.modules["refsrc"] = pkg
    try:
        spec = importlib.util.spec_from_file_location(
            "refsrc.utils", "/root/reference/src/utils.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["refsrc.utils"] = mod
        spec.loader.exec_module(mod)
        # the package must stay installed: MetricManager resolves
        # import_module('.metrics', 'refsrc') lazily at construction
        yield mod.MetricManager
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_metric_manager_matches_reference(ref_mm):
    """Running-loss math (loss * len(pred), / total_len on aggregate) and
    per-metric delegation (src/utils.py:337-358), including the youdenj
    broadcast flag and the curr_step-keyed results variant."""
    from fedcola_tpu.utils.metrics import MetricManager
    rng = np.random.RandomState(29)
    ref = ref_mm(["acc1", "f1"])
    our = MetricManager(["acc1", "f1"])
    total = 0
    for i, n in enumerate((32, 48, 16)):
        pred = rng.randn(n, 5).astype(np.float32)
        true = rng.randint(0, 5, n).astype(np.int64)
        loss = float(rng.rand() * 3)
        ref.track(loss, torch.tensor(pred), torch.tensor(true))
        our.track(loss, pred, true)
        total += n
    ref.aggregate(total)
    our.aggregate(total)
    np.testing.assert_allclose(our.results["loss"], ref.results["loss"],
                               rtol=1e-6)
    for k in ("acc1", "f1"):
        np.testing.assert_allclose(our.results["metrics"][k],
                                   ref.results["metrics"][k], rtol=1e-6,
                                   err_msg=k)

    # curr_step-keyed epoch results + figures reset between epochs
    ref2, our2 = ref_mm(["acc1"]), MetricManager(["acc1"])
    for step in (1, 2):
        pred = rng.randn(24, 5).astype(np.float32)
        true = rng.randint(0, 5, 24).astype(np.int64)
        ref2.track(0.5 * step, torch.tensor(pred), torch.tensor(true))
        our2.track(0.5 * step, pred, true)
        ref2.aggregate(24, curr_step=step)
        our2.aggregate(24, curr_step=step)
        # the reference metric objects keep collecting across epochs
        # (they are never re-instantiated inside an epoch loop)
    for step in (1, 2):
        np.testing.assert_allclose(our2.results[step]["loss"],
                                   ref2.results[step]["loss"], rtol=1e-6)
        np.testing.assert_allclose(
            our2.results[step]["metrics"]["acc1"],
            ref2.results[step]["metrics"]["acc1"], rtol=1e-6)

    # youdenj flag broadcast: tracking youdenj flips _use_youdenj on
    # every metric in BOTH implementations
    ref3, our3 = ref_mm(["acc1", "youdenj"]), MetricManager(
        ["acc1", "youdenj"])
    pred = rng.randn(64, 1).astype(np.float32)
    true = rng.randint(0, 2, (64, 1)).astype(np.int64)
    ref3.track(1.0, torch.tensor(pred), torch.tensor(true))
    our3.track(1.0, pred, true)
    ref3.aggregate(64)
    our3.aggregate(64)
    for k in ("acc1", "youdenj"):
        np.testing.assert_allclose(our3.results["metrics"][k],
                                   ref3.results["metrics"][k], rtol=1e-6,
                                   err_msg=k)
