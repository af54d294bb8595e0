"""Golden test of the FULL federated round against the ACTUAL reference
server orchestration.

`FedavgServer.update()` (fedavgserver.py:784-857) composes the whole round
recipe: `_sample_clients` (with the warmup-modality filter), `_request`'s
ThreadPool client updates (each setting `client.args.lr = self.curr_lr` and
applying the freeze window via `_freeze_shared_params`, fedavgserver.py:
488-505,422-429), `_log_results`, the per-dataset `_aggregate` streaming
EMA, and the lr decay.  Each leg is goldened separately elsewhere; this
drives the literal `update()` method for THREE rounds over real
`FedavgClient`s wrapping reference-named torch twins — two datasets
(uni-modal img + uni-modal txt), cross-dataset block sharing, a txt warmup
round and an img freeze round — and requires our production composition
(`build_group_update` + `plan_aggregation`/`apply_aggregation` + the same
freeze/warmup windows + lr decay) to land on the same global models.

The twin re-houses each block's layers under the reference mome.py names
(`blockses.i.l.attn.qkv`, `.mlp.fc1`, `.norm1`) because `get_name_type`
(fedavgserver.py:94-104) classifies attn params by the '.attn.' substring
BEFORE the 'blocks' fallback — with `shared_param=blocks, share_scope=all`
the qkv/proj kernels stay per-dataset while norms+mlp (type 'blocks',
including '.mlp.' names, which the elif chain never reaches) share across
datasets, and the freeze window freezes exactly the scope-'all' set.
"""

import importlib.util
import os
import sys
import types
from collections import defaultdict

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from test_training_parity import (B, IMG, L, NC, V, TorchTwinMAT, TorchBlock,
                                  _assert_trees_close, _copy_from_jax,
                                  _make_cfg, _twin_tree)
from fedcola_tpu.federation import aggregate as agg
from fedcola_tpu.models import naming
from fedcola_tpu.models.mat import init_mat
from fedcola_tpu.parallel.client_update import GroupSpec, build_group_update
from fedcola_tpu.parallel.optim import OptimizerSpec, init_opt_state

REF_SRC = "/root/reference/src"
LR = 1e-3
LR_DECAY = 0.9
S_IMG, S_TXT = 3, 2          # steps (= batches) per epoch per modality
ROUNDS = 3


def _load_as(modname, path):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_stack():
    """The real FedavgServer + FedavgClient classes, loaded with timm/wandb/
    mome/datasets stubbed (none are touched by the round recipe) and the
    real utils/metrics/criterions satisfied from the reference tree."""
    if not os.path.exists(os.path.join(REF_SRC, "server/fedavgserver.py")):
        pytest.skip("reference tree not mounted")
    keys = ("src", "src.utils", "src.criterions",
            "src.criterions.segmentation_loss", "src.metrics",
            "src.metrics.metricszoo", "src.metrics.basemetric",
            "src.metrics.eval_coco", "src.models", "src.models.mome",
            "src.datasets", "src.datasets.coco", "src.client",
            "src.client.baseclient", "src.client.fedavgclient",
            "src.server", "src.server.baseserver",
            "src.server.fedavgserver", "timm", "wandb")
    saved = {k: sys.modules.get(k) for k in keys}
    try:
        pkg = types.ModuleType("src")
        # real __path__: import_module('.metrics', 'src') resolves the real
        # metrics package lazily (src/__init__.py itself never executes)
        pkg.__path__ = [REF_SRC]
        sys.modules["src"] = pkg
        utils = _load_as("src.utils", os.path.join(REF_SRC, "utils.py"))
        pkg.MetricManager = utils.MetricManager
        pkg.TqdmToLogger = utils.TqdmToLogger
        pkg.init_weights = utils.init_weights
        # synthetic criterions pkg: the real __init__ pulls torchmultimodal
        crit_pkg = types.ModuleType("src.criterions")
        crit_pkg.__path__ = [os.path.join(REF_SRC, "criterions")]
        sys.modules["src.criterions"] = crit_pkg
        _load_as("src.criterions.segmentation_loss",
                 os.path.join(REF_SRC, "criterions/segmentation_loss.py"))
        sys.modules["timm"] = types.ModuleType("timm")
        sys.modules["wandb"] = types.ModuleType("wandb")
        models_pkg = types.ModuleType("src.models")
        models_pkg.__path__ = []
        sys.modules["src.models"] = models_pkg
        mome_stub = types.ModuleType("src.models.mome")
        sys.modules["src.models.mome"] = mome_stub
        models_pkg.mome = mome_stub
        ds_pkg = types.ModuleType("src.datasets")
        ds_pkg.__path__ = []
        sys.modules["src.datasets"] = ds_pkg
        coco_stub = types.ModuleType("src.datasets.coco")
        coco_stub.CocoCaptionsCap = object
        coco_stub.img_transform = None
        coco_stub.txt_transform = None
        sys.modules["src.datasets.coco"] = coco_stub
        ds_pkg.coco = coco_stub
        cl_pkg = types.ModuleType("src.client")
        cl_pkg.__path__ = [os.path.join(REF_SRC, "client")]
        sys.modules["src.client"] = cl_pkg
        _load_as("src.client.baseclient",
                 os.path.join(REF_SRC, "client/baseclient.py"))
        favg = _load_as("src.client.fedavgclient",
                        os.path.join(REF_SRC, "client/fedavgclient.py"))
        sv_pkg = types.ModuleType("src.server")
        sv_pkg.__path__ = [os.path.join(REF_SRC, "server")]
        sys.modules["src.server"] = sv_pkg
        _load_as("src.server.baseserver",
                 os.path.join(REF_SRC, "server/baseserver.py"))
        favs = _load_as("src.server.fedavgserver",
                        os.path.join(REF_SRC, "server/fedavgserver.py"))
        yield favs.FedavgServer, favg.FedavgClient
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


# -------------------------------------------------- reference-named twin --

class _RefBlock(torch.nn.Module):
    """A TorchBlock whose layers are registered under the reference mome.py
    state_dict names (norm1 / attn.qkv / attn.proj / norm2 / mlp.fc1 /
    mlp.fc2).  The math lives in the wrapped (unregistered) TorchBlock;
    the registered modules ARE the wrapped block's layers, so training,
    state_dict and load_state_dict all see one set of tensors."""

    def __init__(self):
        super().__init__()
        inner = TorchBlock()
        object.__setattr__(self, "_inner", inner)   # unregistered
        self.norm1 = inner.n1
        self.attn = torch.nn.Module()
        self.attn.qkv = inner.qkv
        self.attn.proj = inner.proj
        self.norm2 = inner.n2
        self.mlp = torch.nn.Module()
        self.mlp.fc1 = inner.fc1
        self.mlp.fc2 = inner.fc2
        # unregistered aliases so _copy_from_jax/_twin_tree keep working
        for name in ("n1", "n2", "qkv", "proj", "fc1", "fc2"):
            object.__setattr__(self, name, getattr(inner, name))
        object.__setattr__(self, "reparam", inner.reparam)

    def forward(self, x):
        return self._inner(x)


class RefNamedTwin(TorchTwinMAT):
    """TorchTwinMAT with reference-named blocks + the mome.py aggregation
    surface (required_params, mome.py:844-856; with_aux=False here)."""

    def __init__(self, modalities, tasks, depth):
        super().__init__(modalities, tasks, depth)
        self.blockses = torch.nn.ModuleList([
            torch.nn.ModuleList([_RefBlock() for _ in range(len(blocks))])
            for blocks in self.blockses])

    def required_params(self):
        none_idx = [i for i, m in enumerate(self.modalities) if m is None]
        return {k: v for k, v in self.state_dict().items()
                if not any(f"blockses.{i}" in k for i in none_idx)}


# ------------------------------------------------------------ the fixture --

DSETS = ("CIFAR100", "AG_NEWS")          # img slot 0, txt slot 1
MODALITIES = ("img", "txt")              # args.modalities (per dataset)
SIZES = {0: S_IMG * B, 1: S_IMG * B, 2: S_TXT * B, 3: S_TXT * B}
CLIENT_DS = {0: "CIFAR100", 1: "CIFAR100", 2: "AG_NEWS", 3: "AG_NEWS"}


class _Writer:
    def log(self, *a, **k):
        pass


class _Args:
    """The args surface update()/_request/_aggregate/_sample_clients read."""

    def __init__(self):
        self.algorithm = "fedavg"
        self.dataset = "MULTI"
        self.datasets = list(DSETS)
        self.modalities = list(MODALITIES)
        self.K = 4
        self.C = 1.0
        self.Cs = [1.0, 1.0]
        self.E = 1
        self.B = B
        self.lr = LR
        self.weight_decay = 0.0
        self.optimizer = "AdamW"
        self.no_shuffle = True
        self.debug = False
        self.distributed = False
        self.mm_distributed = False
        self.mp = False
        self.max_grad_norm = 0
        self.num_thread = 2
        self.train_only = True
        self.equal_sampled = False
        self.eval_fraction = 1.0
        self.warmup_modality = "txt"
        self.warmup_rounds = 1
        self.freeze_modality = "img"
        self.freeze_rounds = 1
        self.shared_param = "blocks"
        self.share_scope = "all"
        self.compensation = False
        self.out_modality_scales = [1, 1]
        self.with_aux = False
        self.aux_attn_only = False
        self.aux_mlp_only = False
        self.fedavg_eval = False
        self.lr_decay = LR_DECAY
        self.lr_decay_step = 1


def _world(seed=71):
    """Two datasets, four clients, deterministic data (E=1, no_shuffle)."""
    rng = np.random.RandomState(seed)
    cfg_img = _make_cfg(modalities=("img", None), tasks=("cls", None),
                        num_classes=(NC, None), depth=2)
    cfg_txt = _make_cfg(modalities=(None, "txt"), tasks=(None, "cls"),
                        num_classes=(None, NC), depth=2)
    g_img = init_mat(cfg_img, jax.random.PRNGKey(seed))
    g_txt = init_mat(cfg_txt, jax.random.PRNGKey(seed + 1))
    data = {}
    for c in (0, 1):
        data[c] = {
            "x": rng.randint(0, 256, (S_IMG, B, IMG, IMG, 3)).astype(np.uint8),
            "y": rng.randint(0, NC, (S_IMG, B)).astype(np.int32)}
    for c in (2, 3):
        data[c] = {
            "x": rng.randint(0, V, (S_TXT, B, L)).astype(np.int32),
            "y": rng.randint(0, NC, (S_TXT, B)).astype(np.int32)}
    return {"CIFAR100": cfg_img, "AG_NEWS": cfg_txt}, \
           {"CIFAR100": g_img, "AG_NEWS": g_txt}, data


def _sampled(r):
    """C=1.0 samples everyone (sorted); round<=warmup keeps only the
    warmup_modality ('txt') clients (fedavgserver.py:307-308)."""
    return [2, 3] if r <= 1 else [0, 1, 2, 3]


def test_real_server_update_rounds_match_ours(ref_stack):
    FedavgServer, FedavgClient = ref_stack
    cfgs, globals_j, data = _world()
    args = _Args()

    # ---------------- the real server, literal update() x ROUNDS
    twins = {ds: RefNamedTwin(cfgs[ds].modalities, cfgs[ds].tasks, depth=2)
             for ds in DSETS}
    for ds in DSETS:
        _copy_from_jax(twins[ds], cfgs[ds], globals_j[ds])

    clients = []
    for c in range(4):
        if CLIENT_DS[c] == "CIFAR100":
            xs = torch.tensor(data[c]["x"].reshape(-1, IMG, IMG, 3)) \
                .float().permute(0, 3, 1, 2) / 255.0
        else:
            xs = torch.tensor(data[c]["x"].reshape(-1, L)).long()
        ys = torch.tensor(data[c]["y"].reshape(-1)).long()
        train = torch.utils.data.TensorDataset(xs, ys)
        cl = FedavgClient(args=args, training_set=train, test_set=train,
                          task="cls", eval_metrics=["acc1"],
                          modality=MODALITIES[0 if c < 2 else 1],
                          criterion="CrossEntropyLoss")
        cl.id = c
        cl.dataset = CLIENT_DS[c]
        cl.device = torch.device("cpu")
        clients.append(cl)

    srv = FedavgServer.__new__(FedavgServer)
    srv.args = args
    srv.writer = _Writer()
    srv.round = 0
    srv.global_models = dict(twins)
    srv._init_param_scope(args.shared_param, args.share_scope)
    srv.curr_lr = args.lr
    srv.clients = clients
    srv.results = defaultdict(dict)

    import random as _random
    _random.seed(99)           # irrelevant at C=1.0, but pin it anyway
    selected = []
    for r in range(1, ROUNDS + 1):
        srv.round = r
        selected.append(sorted(srv.update()))
    assert selected == [_sampled(r) for r in range(1, ROUNDS + 1)]

    # ---------------- ours: the production builders, same recipe
    names = sorted({n for ds in DSETS
                    for _, n in naming.param_names(cfgs[ds])})
    param_scope = naming.build_param_scope(names, args.shared_param,
                                           args.share_scope)
    frozen_img = tuple(sorted({p for p, n in naming.param_names(
        cfgs["CIFAR100"]) if param_scope[n] == "all"}))
    assert frozen_img, "scope-'all' params must exist for the freeze window"
    meta = {c: agg.ClientMeta(id=c, dataset=CLIENT_DS[c],
                              modality=MODALITIES[0 if c < 2 else 1],
                              task="cls", n_train=SIZES[c])
            for c in range(4)}
    ospec = OptimizerSpec(name="AdamW", weight_decay=0.0)
    specs = {"CIFAR100": GroupSpec(modality="img",
                                   criterion="CrossEntropyLoss"),
             "AG_NEWS": GroupSpec(modality="txt",
                                  criterion="CrossEntropyLoss", txt_slot=1)}

    g = dict(globals_j)
    curr_lr = LR
    for r in range(1, ROUNDS + 1):
        ids_r = _sampled(r)
        members = {ds: [c for c in ids_r if CLIENT_DS[c] == ds]
                   for ds in DSETS}
        members = {ds: m for ds, m in members.items() if m}
        uploads = {}
        for ds, mem in members.items():
            steps = S_IMG if ds == "CIFAR100" else S_TXT
            # freeze window: rounds in (warmup, warmup+freeze] for clients
            # whose modality flag == freeze_modality (fedavgserver.py:493-498)
            frozen = frozen_img if (ds == "CIFAR100"
                                    and args.warmup_rounds < r
                                    <= args.warmup_rounds
                                    + args.freeze_rounds) else None
            update_fn = build_group_update(cfgs[ds], specs[ds], ospec,
                                           frozen)
            stacked = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None],
                                           (len(mem),) + x.shape) + 0,
                g[ds])
            ostate = init_opt_state(ospec, stacked, n_clients=len(mem))
            chunk = {
                "x": np.stack([data[c]["x"] for c in mem]),
                "y": np.stack([data[c]["y"] for c in mem]),
                "valid": np.ones((len(mem), steps, B), bool),
                "step_valid": np.ones((len(mem), steps), bool)}
            rngs = jax.random.split(jax.random.PRNGKey(1000 * r), len(mem))
            uploads[ds], _, _ = update_fn(stacked, ostate, chunk, rngs,
                                          jnp.float32(curr_lr), g[ds])
        sizes_r = {c: SIZES[c] for c in ids_r}
        new_g = {}
        for i, ds in enumerate(DSETS):
            jobs, weights = agg.plan_aggregation(
                ds, cfgs[ds], cfgs, meta, ids_r, sizes_r, param_scope,
                list(MODALITIES), members,
                out_modality_scale=args.out_modality_scales[i],
                compensation=False, share_scope=args.share_scope,
                model_modality=MODALITIES[i], model_task="cls")
            new_g[ds] = agg.apply_aggregation(jobs, weights, g[ds], uploads)
        g = new_g
        if r % args.lr_decay_step == 0:
            curr_lr *= args.lr_decay

    assert abs(srv.curr_lr - curr_lr) < 1e-12

    for ds in DSETS:
        ours = jax.tree_util.tree_map(lambda x: np.asarray(x)[None], g[ds])
        _assert_trees_close(ours, _twin_tree(srv.global_models[ds],
                                             cfgs[ds]))
