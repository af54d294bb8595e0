"""Metric zoo + MetricManager (reference src/metrics/metricszoo.py:17-292,
src/utils.py:320-362).

Pure-numpy implementations of the classification/regression metrics the
reference backs with sklearn; sklearn is used opportunistically when
importable (for AUROC's weighted-OVR averaging), with numpy fallbacks so
the framework has zero hard dependency on it.

MetricManager parity notes (src/utils.py:337-347): ``track`` accumulates
``loss * len(pred)`` and ``aggregate(total_len)`` divides by the dataset
length — an effective per-sample average.  We accept precomputed counts so
device-side batched training can feed scalar summaries instead of logits.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np


def _try_sklearn():
    try:
        import sklearn.metrics as skm
        return skm
    except Exception:
        return None


def _to_labels(scores: np.ndarray, answers: Optional[np.ndarray] = None,
               use_youdenj: bool = False) -> np.ndarray:
    if scores.ndim > 1 and scores.shape[-1] > 1:
        return scores.argmax(-1)
    s = 1.0 / (1.0 + np.exp(-scores.reshape(-1)))
    cutoff = 0.5
    if use_youdenj and answers is not None:
        # binary: threshold at the Youden-J optimal cutoff when the
        # youdenj metric is tracked (reference metricszoo.py:36-41)
        skm = _try_sklearn()
        if skm is not None:
            fpr, tpr, th = skm.roc_curve(answers.reshape(-1), s)
            cutoff = float(th[np.argmax(tpr - fpr)])
    return (s >= cutoff).astype(np.int64)


class BaseMetric:
    def __init__(self):
        self.scores: List[np.ndarray] = []
        self.answers: List[np.ndarray] = []
        self._use_youdenj = False

    def collect(self, pred, true):
        self.scores.append(np.asarray(pred))
        self.answers.append(np.asarray(true))

    def _cat(self):
        return np.concatenate(self.scores), np.concatenate(self.answers)


class Acc1(BaseMetric):
    def summarize(self):
        scores, answers = self._cat()
        labels = _to_labels(scores, answers, self._use_youdenj)
        # binary heads give [N, 1] targets while _to_labels flattens the
        # sigmoid path; flatten both (sklearn's accuracy_score compares the
        # reference's [N, 1] columns elementwise — a raw == here would
        # broadcast [N] against [N, 1])
        return float((labels.reshape(-1) == answers.reshape(-1)).mean())


class Acc5(BaseMetric):
    def summarize(self):
        scores, answers = self._cat()
        top5 = np.argsort(scores, axis=-1)[:, -5:]
        return float(np.mean([a in t for a, t in zip(answers, top5)]))


class F1(BaseMetric):
    average = "macro"  # f1_score(average='macro', zero_division=0)

    def summarize(self):
        scores, answers = self._cat()
        labels = _to_labels(scores, answers, self._use_youdenj).reshape(-1)
        answers = answers.reshape(-1)
        return _prf(answers, labels, "f1", self.average)


class Precision(BaseMetric):
    def summarize(self):
        scores, answers = self._cat()
        labels = _to_labels(scores, answers, self._use_youdenj)
        return _prf(answers.reshape(-1), labels.reshape(-1),
                    "precision", "weighted")


class Recall(BaseMetric):
    def summarize(self):
        scores, answers = self._cat()
        labels = _to_labels(scores, answers, self._use_youdenj)
        return _prf(answers.reshape(-1), labels.reshape(-1),
                    "recall", "weighted")


def _prf(true, pred, kind, average):
    classes = np.unique(np.concatenate([true, pred]))
    ps, rs, f1s, support = [], [], [], []
    for c in classes:
        tp = np.sum((pred == c) & (true == c))
        fp = np.sum((pred == c) & (true != c))
        fn = np.sum((pred != c) & (true == c))
        p = tp / (tp + fp) if (tp + fp) else 0.0
        r = tp / (tp + fn) if (tp + fn) else 0.0
        f = 2 * p * r / (p + r) if (p + r) else 0.0
        ps.append(p); rs.append(r); f1s.append(f)
        support.append(np.sum(true == c))
    vals = {"precision": ps, "recall": rs, "f1": f1s}[kind]
    support = np.asarray(support, np.float64)
    if average == "macro":
        return float(np.mean(vals))
    return float(np.average(vals, weights=np.maximum(support, 1e-12)))


class Auroc(BaseMetric):
    def summarize(self):
        skm = _try_sklearn()
        scores, answers = self._cat()
        e = np.exp(scores - scores.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        if probs.ndim > 1 and probs.shape[-1] == 2:
            # binary with [N, 2] logits: sklearn wants the positive-class
            # score 1-D (the reference's Auroc assumes a single-logit
            # head and would raise here)
            probs = probs[:, 1]
        if skm is not None:
            try:
                if probs.ndim == 1:
                    return float(skm.roc_auc_score(answers, probs))
                return float(skm.roc_auc_score(
                    answers, probs, average="weighted", multi_class="ovr",
                    labels=np.arange(probs.shape[-1])))
            except Exception:
                return float("nan")
        return float("nan")


class Auprc(BaseMetric):
    def summarize(self):
        skm = _try_sklearn()
        scores, answers = self._cat()
        if scores.ndim > 1 and scores.shape[-1] == 2:
            # binary with [N, 2] logits -> positive-class score (the
            # reference's Auprc assumes a single-logit head, sigmoid on
            # [N, 2] would make sklearn raise -> nan)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            s = (e / e.sum(-1, keepdims=True))[:, 1]
        else:
            s = 1.0 / (1.0 + np.exp(-scores))
        if skm is not None:
            try:
                return float(skm.average_precision_score(answers, s,
                                                         average="weighted"))
            except Exception:
                return float("nan")
        return float("nan")


class Youdenj(BaseMetric):
    def summarize(self):
        skm = _try_sklearn()
        scores, answers = self._cat()
        s = 1.0 / (1.0 + np.exp(-scores.reshape(-1)))
        if skm is not None:
            fpr, tpr, th = skm.roc_curve(answers.reshape(-1), s)
            return float(th[np.argmax(tpr - fpr)])
        return float("nan")


class Seqacc(BaseMetric):
    def collect(self, pred, true):
        pred = np.asarray(pred)
        nc = pred.shape[-1]
        self.scores.append(pred.reshape(-1, nc))
        self.answers.append(np.asarray(true).reshape(-1))

    def summarize(self):
        scores, answers = self._cat()
        keep = answers != -1
        if keep.sum() == 0:
            return 0.0
        return float((scores.argmax(-1)[keep] == answers[keep]).mean())


class Mse(BaseMetric):
    def summarize(self):
        s, a = self._cat()
        return float(np.mean((s.reshape(-1) - a.reshape(-1)) ** 2))


class Rmse(Mse):
    def summarize(self):
        return float(np.sqrt(super().summarize()))


class Mae(BaseMetric):
    def summarize(self):
        s, a = self._cat()
        return float(np.mean(np.abs(s.reshape(-1) - a.reshape(-1))))


class Mape(BaseMetric):
    def summarize(self):
        s, a = self._cat()
        a = a.reshape(-1)
        return float(np.mean(np.abs((s.reshape(-1) - a)
                                    / np.maximum(np.abs(a), 1e-12))))


class R2(BaseMetric):
    def summarize(self):
        s, a = self._cat()
        a = a.reshape(-1); s = s.reshape(-1)
        ss_res = np.sum((a - s) ** 2)
        ss_tot = np.sum((a - a.mean()) ** 2)
        return float(1 - ss_res / max(ss_tot, 1e-12))


class D2(BaseMetric):
    def summarize(self):
        skm = _try_sklearn()
        s, a = self._cat()
        if skm is not None and hasattr(skm, "d2_pinball_score"):
            return float(skm.d2_pinball_score(a.reshape(-1), s.reshape(-1)))
        return float("nan")


METRICS = {c.__name__: c for c in
           (Acc1, Acc5, Auroc, Auprc, Youdenj, F1, Precision, Recall,
            Seqacc, Mse, Rmse, Mae, Mape, R2, D2)}


class MetricManager:
    """Running loss + metric collection (src/utils.py:320-362)."""

    def __init__(self, eval_metrics):
        self.metric_funcs = {name: METRICS[name.title()]()
                             for name in eval_metrics}
        self.figures = defaultdict(float)
        self._results: Dict = {}
        if "youdenj" in self.metric_funcs:
            for f in self.metric_funcs.values():
                f._use_youdenj = True

    def track(self, loss, pred=None, true=None, count: Optional[int] = None):
        n = count if count is not None else (len(pred) if pred is not None else 1)
        self.figures["loss"] += float(loss) * n
        if pred is not None:
            for m in self.metric_funcs.values():
                m.collect(pred, true)

    def track_scalars(self, loss_sum: float, correct: int, count: int):
        """Device-side batched path: per-chunk scalar summaries."""
        self.figures["loss"] += float(loss_sum)
        self.figures["_correct"] += int(correct)
        self.figures["_count"] += int(count)

    def aggregate(self, total_len, curr_step=None):
        # scalar-tracked metrics (track_scalars) have no collected
        # score arrays — summarize() would raise on the empty
        # concatenate, so substitute the scalar ratio (acc1) / nan first
        running = {}
        for name, m in self.metric_funcs.items():
            if m.scores:
                running[name] = m.summarize()
            elif name == "acc1" and self.figures.get("_count"):
                running[name] = self.figures["_correct"] / self.figures["_count"]
            else:
                running[name] = float("nan")
        running["loss"] = self.figures["loss"] / max(total_len, 1)
        payload = {"loss": running["loss"],
                   "metrics": {n: running[n] for n in self.metric_funcs}}
        if curr_step is not None:
            self._results[curr_step] = payload
        else:
            self._results = payload
        self.figures = defaultdict(float)

    @property
    def results(self):
        return self._results
