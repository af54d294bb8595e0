"""Golden tests of the client update loop against the ACTUAL reference
client classes.

`src/client/fedavgclient.py` / `fedproxclient.py` need only torch +
`src.criterions.segmentation_loss` (torch-only) + `src.{MetricManager,
TqdmToLogger}` (torch/sklearn/tqdm) — all available offline.  We assemble a
synthetic `src` package exposing the REAL utils/criterion modules (without
executing `src/__init__.py`, whose loader re-exports pull timm-dependent
model code), instantiate the real client classes around the torch twin
model from test_training_parity, and run their literal `update()` loop —
fresh optimizer built by `_refine_optim_args`, per-batch criterion
re-instantiation, epoch-loop DataLoader semantics, FedProx's deepcopy
anchor — against our vmapped-scan client update.

This upgrades the hand-written `_train_twin` loop to the reference's own
orchestration code for the paths whose dependencies exist here (the model
itself still needs a twin: upstream `mome.py` imports timm, which is not
installed)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax

from test_training_parity import (B, L, NC, V, TorchTwinMAT, _copy_from_jax,
                                  _assert_trees_close, _make_cfg, _run_ours,
                                  _twin_tree)
from fedcola_tpu.models.mat import init_mat
from fedcola_tpu.parallel.client_update import GroupSpec

REF_SRC = "/root/reference/src"
LR = 1e-3


def _load_as(modname, path):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_clients():
    if not os.path.exists(os.path.join(REF_SRC, "client/fedavgclient.py")):
        pytest.skip("reference tree not mounted")
    keys = ("src", "src.utils", "src.criterions",
            "src.criterions.segmentation_loss", "src.client",
            "src.client.baseclient", "src.client.fedavgclient",
            "src.client.fedproxclient", "src.metrics",
            "src.metrics.metricszoo", "src.metrics.basemetric")
    saved = {k: sys.modules.get(k) for k in keys}
    try:
        # synthetic `src` package: real utils + criterions, NO src/__init__
        pkg = types.ModuleType("src")
        pkg.__path__ = [REF_SRC]
        sys.modules["src"] = pkg
        utils = _load_as("src.utils", os.path.join(REF_SRC, "utils.py"))
        pkg.MetricManager = utils.MetricManager
        pkg.TqdmToLogger = utils.TqdmToLogger
        crit_pkg = types.ModuleType("src.criterions")
        crit_pkg.__path__ = [os.path.join(REF_SRC, "criterions")]
        sys.modules["src.criterions"] = crit_pkg
        _load_as("src.criterions.segmentation_loss",
                 os.path.join(REF_SRC, "criterions/segmentation_loss.py"))
        cl_pkg = types.ModuleType("src.client")
        cl_pkg.__path__ = [os.path.join(REF_SRC, "client")]
        sys.modules["src.client"] = cl_pkg
        _load_as("src.client.baseclient",
                 os.path.join(REF_SRC, "client/baseclient.py"))
        favg = _load_as("src.client.fedavgclient",
                        os.path.join(REF_SRC, "client/fedavgclient.py"))
        fprox = _load_as("src.client.fedproxclient",
                         os.path.join(REF_SRC, "client/fedproxclient.py"))
        yield favg.FedavgClient, fprox.FedproxClient
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


class _Args:
    """The argparse surface `update()` reads (reference main.py flags)."""
    def __init__(self, **kw):
        self.optimizer = "AdamW"
        self.lr = LR
        self.weight_decay = 0.0   # reference --weight_decay default 0
        self.B = B
        self.E = 2
        self.no_shuffle = True    # deterministic DataLoader order
        self.debug = False
        self.distributed = False
        self.mm_distributed = False
        self.max_grad_norm = 0
        self.train_only = False
        self.__dict__.update(kw)


def _make_client(cls, ids, ys, **args_kw):
    train = torch.utils.data.TensorDataset(torch.tensor(ids).long(),
                                           torch.tensor(ys).long())
    client = cls(args=_Args(**args_kw), training_set=train, test_set=train,
                 task="cls", eval_metrics=["acc1"], modality="txt",
                 criterion="CrossEntropyLoss")
    client.id = 0
    client.device = torch.device("cpu")
    return client


def _golden_case(seed, depth):
    cfg = _make_cfg(modalities=(None, "txt"), tasks=(None, "cls"),
                    num_classes=(None, NC), depth=depth)
    params = init_mat(cfg, jax.random.PRNGKey(seed))
    twin = TorchTwinMAT(cfg.modalities, cfg.tasks, depth=depth)
    _copy_from_jax(twin, cfg, params)
    rng = np.random.RandomState(seed)
    n = 2 * B                     # 2 batches/epoch
    ids = rng.randint(0, V, (n, L)).astype(np.int64)
    ys = rng.randint(0, NC, n).astype(np.int64)
    # our step stream = the client's epoch loop unrolled: E passes over
    # the (unshuffled) batches in dataset order
    bx = ids.reshape(2, B, L)
    by = ys.reshape(2, B)
    chunk = {"x": np.concatenate([bx, bx])[None].astype(np.int32),
             "y": np.concatenate([by, by])[None].astype(np.int32)}
    return cfg, params, twin, ids, ys, chunk


def test_real_fedavgclient_update_matches_ours(ref_clients):
    """The real FedavgClient.update() (fedavgclient.py:55-116) drives the
    twin for E=2 epochs x 2 batches; our vmapped scan must land on the
    same parameters."""
    FedavgClient, _ = ref_clients
    cfg, params, twin, ids, ys, chunk = _golden_case(seed=47, depth=2)
    client = _make_client(FedavgClient, ids, ys)
    client.model = twin
    results = client.update()
    assert set(results.keys()) == {1, 2}          # per-epoch MetricManager

    spec = GroupSpec(modality="txt", criterion="CrossEntropyLoss",
                     txt_slot=1)
    stacked = _run_ours(cfg, spec, params, chunk, steps=4)
    _assert_trees_close(stacked, _twin_tree(twin, cfg))


def test_real_fedproxclient_update_matches_ours(ref_clients):
    """The real FedproxClient.update() (fedproxclient.py:17-94): deepcopy
    prox anchor at update start, per-named-parameter L2 norms at mu."""
    _, FedproxClient = ref_clients
    mu = 0.05
    cfg, params, twin, ids, ys, chunk = _golden_case(seed=53, depth=2)
    client = _make_client(FedproxClient, ids, ys, mu=mu)
    client.model = twin
    client.update()

    spec = GroupSpec(modality="txt", criterion="CrossEntropyLoss",
                     txt_slot=1, mu=mu, algorithm="fedprox")
    stacked = _run_ours(cfg, spec, params, chunk, steps=4)
    _assert_trees_close(stacked, _twin_tree(twin, cfg))
