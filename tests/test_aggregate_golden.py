"""Golden tests of aggregation against the ACTUAL reference `_aggregate`.

`fedavgserver.py` imports timm/wandb/src.models.mome at module level, but
`_aggregate` (fedavgserver.py:591-668) touches none of them — stub those
three imports with empty modules, expose the real `src.utils` /
`src.metrics.eval_coco` via a synthetic package, load the real class, and
invoke the UNMODIFIED upstream method on a duck-typed server: a dict-backed
global model (`required_params`/`load_state_dict`), clients whose
`upload()` returns named tensors, and the literal args surface.

This replaces the numpy simulation golden (test_aggregate.py) with the
reference's own code for every scope/compensation combination, including
the `identifier` loop-variable leak in the compensation modality_exact
branch (fedavgserver.py:648) and the fedavg=True pre-eval variant.
"""

import importlib.util
import os
import sys
import types
from collections import OrderedDict

import jax
import numpy as np
import pytest
import torch

from fedcola_tpu.models import naming
from fedcola_tpu.models.mat import init_mat
from fedcola_tpu.federation import aggregate as agg

from test_aggregate import (EXP_MODALITIES, MODALITY, TASK, make_world,
                            named_upload, toy_cfgs)

REF_SRC = "/root/reference/src"


def _load_as(modname, path):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_servers():
    if not os.path.exists(os.path.join(REF_SRC, "server/fedavgserver.py")):
        pytest.skip("reference tree not mounted")
    keys = ("src", "src.utils", "src.metrics", "src.metrics.metricszoo",
            "src.metrics.basemetric", "src.metrics.eval_coco", "src.models",
            "src.models.mome", "src.datasets", "src.datasets.coco",
            "src.server", "src.server.baseserver", "src.server.fedavgserver",
            "src.server.creamflserver", "timm", "wandb")
    saved = {k: sys.modules.get(k) for k in keys}
    try:
        pkg = types.ModuleType("src")
        pkg.__path__ = [REF_SRC]
        sys.modules["src"] = pkg
        utils = _load_as("src.utils", os.path.join(REF_SRC, "utils.py"))
        pkg.MetricManager = utils.MetricManager
        pkg.TqdmToLogger = utils.TqdmToLogger
        pkg.init_weights = utils.init_weights
        met_pkg = types.ModuleType("src.metrics")
        met_pkg.__path__ = [os.path.join(REF_SRC, "metrics")]
        sys.modules["src.metrics"] = met_pkg
        _load_as("src.metrics.eval_coco",
                 os.path.join(REF_SRC, "metrics/eval_coco.py"))
        # module-level imports _aggregate never touches: timm/wandb, the
        # mome model, and the torchvision-dependent coco dataset module
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
        srv_pkg = types.ModuleType("src.server")
        srv_pkg.__path__ = [os.path.join(REF_SRC, "server")]
        sys.modules["src.server"] = srv_pkg
        _load_as("src.server.baseserver",
                 os.path.join(REF_SRC, "server/baseserver.py"))
        favs = _load_as("src.server.fedavgserver",
                        os.path.join(REF_SRC, "server/fedavgserver.py"))
        crml = _load_as("src.server.creamflserver",
                        os.path.join(REF_SRC, "server/creamflserver.py"))
        yield favs.FedavgServer, crml.CreamflServer
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def ref_server_cls(ref_servers):
    return ref_servers[0]


class _Model:
    """Duck global model: required_params() hands out the live tensors,
    exactly like state_dict() + shallow copy(sd) upstream (mome.py:844-860
    + fedavgserver.py:597), so _aggregate's in-place `final_sd[p] +=`
    mutates them; load_state_dict re-binds."""

    def __init__(self, named):
        self._named = OrderedDict(
            (k, torch.tensor(np.array(v))) for k, v in named.items())

    def cpu(self):
        return self

    def required_params(self):
        return OrderedDict(self._named)

    def load_state_dict(self, sd, strict=False):
        self._named = OrderedDict(sd)


class _Client:
    def __init__(self, meta, upload_named):
        self.dataset = meta.dataset
        self.task = meta.task
        self.modality = meta.modality
        self._up = OrderedDict(
            (k, torch.tensor(np.array(v))) for k, v in upload_named.items())

    def upload(self):
        return list(self._up.items())


class _Args:
    def __init__(self, **kw):
        self.algorithm = "fedavg"
        self.modalities = list(EXP_MODALITIES)
        self.__dict__.update(kw)


@pytest.mark.parametrize("shared_param,share_scope,compensation,oms", [
    ("none", "dataset", False, 1.0),            # FedAVG
    ("attn", "modality", True, 1.0),            # FedCola
    ("attn", "modality", True, 0.5),            # FedCola + out-modality scale
    ("blocks", "modality_exact", False, 1.0),   # FedIoT sharing
    ("blocks", "modality_exact", True, 1.0),    # compensation leak branch
    ("attn", "all", False, 1.0),
    ("attn", "modality", False, 1.0),
])
@pytest.mark.parametrize("fedavg", [False, True])
def test_real_aggregate_matches_ours(ref_server_cls, shared_param,
                                     share_scope, compensation, oms, fedavg):
    cfgs = toy_cfgs(shared_param, share_scope)
    clients = make_world(cfgs)
    sorted_ids = [0, 1, 2, 3, 4]
    updated_sizes = {c.id: c.n_train for c in clients.values()}

    key = jax.random.PRNGKey(7)
    client_params = {}
    for cid, c in clients.items():
        key, k = jax.random.split(key)
        client_params[cid] = init_mat(cfgs[c.dataset], k)
    group_members = {}
    for cid, c in clients.items():
        group_members.setdefault(c.dataset, []).append(cid)
    stacked = {
        ds: jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]),
            *[client_params[cid] for cid in ids])
        for ds, ids in group_members.items()
    }

    all_names = []
    for cfg in cfgs.values():
        for _, n in naming.param_names(cfg):
            if n not in all_names:
                all_names.append(n)
    param_scope = naming.build_param_scope(all_names, shared_param,
                                           share_scope)

    ref_clients = {cid: _Client(c, named_upload(cfgs[c.dataset],
                                                client_params[cid]))
                   for cid, c in clients.items()}

    key2 = jax.random.PRNGKey(13)
    for model_ds, cfg in cfgs.items():
        key2, k = jax.random.split(key2)
        gparams = init_mat(cfg, k)

        # ---- the REAL upstream method on a duck server
        required = naming.required_param_names(cfg)
        srv = ref_server_cls.__new__(ref_server_cls)
        srv.args = _Args(compensation=compensation, share_scope=share_scope)
        srv.clients = ref_clients
        srv.param_scope = param_scope
        srv.dataset = model_ds
        srv.task = TASK[model_ds]
        srv.modality = MODALITY[model_ds]
        srv.out_modality_scale = oms
        srv.round = 1
        model = _Model({n: naming.get_by_path(gparams, p)
                        for p, n in required})
        srv.global_model = model
        if fedavg and share_scope == "modality_exact":
            # the upstream fedavg=True branch never assigns numerators for
            # modality_exact-scoped params, so coefficients[param] is {}
            # and the accumulate loop KeyErrors (fedavgserver.py:602-614,
            # 658) — the dead combination our aggregate.py:130-143
            # documents.  Verify the crash is real, then verify our
            # documented fallback: those params keep the global value.
            with pytest.raises(KeyError):
                ref_server_cls._aggregate(srv, sorted_ids, updated_sizes,
                                          fedavg=True)
            jobs, weights = agg.plan_aggregation(
                model_ds, cfg, {d: cfgs[d] for d in group_members},
                clients, sorted_ids, updated_sizes, param_scope,
                EXP_MODALITIES, group_members,
                out_modality_scale=oms, compensation=compensation,
                share_scope=share_scope, fedavg=True,
                model_modality=MODALITY[model_ds], model_task=TASK[model_ds])
            new_params = agg.apply_aggregation(jobs, weights, gparams,
                                               stacked)
            for path, name in required:
                if param_scope[name] != "modality_exact":
                    continue
                np.testing.assert_array_equal(
                    np.asarray(naming.get_by_path(new_params, path)),
                    np.asarray(naming.get_by_path(gparams, path)),
                    err_msg=f"{model_ds}:{name} should keep global value")
            continue
        ref_server_cls._aggregate(srv, sorted_ids, updated_sizes,
                                  fedavg=fedavg)
        golden = {k_: v.numpy() for k_, v in model._named.items()}

        # ---- ours
        jobs, weights = agg.plan_aggregation(
            model_ds, cfg, {d: cfgs[d] for d in group_members},
            clients, sorted_ids, updated_sizes, param_scope,
            EXP_MODALITIES, group_members,
            out_modality_scale=oms, compensation=compensation,
            share_scope=share_scope, fedavg=fedavg,
            model_modality=MODALITY[model_ds], model_task=TASK[model_ds])
        new_params = agg.apply_aggregation(jobs, weights, gparams, stacked)

        for path, name in required:
            got = np.asarray(naming.get_by_path(new_params, path))
            np.testing.assert_allclose(
                got, golden[name], rtol=2e-5, atol=2e-6,
                err_msg=(f"{model_ds}:{name} ({shared_param}/{share_scope}"
                         f"/comp={compensation}/oms={oms}/fedavg={fedavg})"))


class _CreamflModel(_Model):
    """CreamflServer._aggregate additionally calls state_dict(), train(),
    to(device), and builds an AdamW over parameters() for the distill
    phase (skipped here via an empty pub_loader)."""

    def state_dict(self):
        return OrderedDict(self._named)

    def parameters(self):
        if not hasattr(self, "_dummy"):
            self._dummy = torch.zeros(1, requires_grad=True)
        return [self._dummy]

    def train(self):
        return self

    def to(self, device):
        return self

    def load_state_dict(self, sd, strict=True):
        self._named = OrderedDict(sd)


@pytest.mark.parametrize("shared_param,share_scope,compensation", [
    ("none", "dataset", False),
    ("attn", "modality", True),
    ("attn", "modality", False),
    ("attn", "all", False),
])
def test_real_creamfl_aggregate_matches_ours(ref_servers, shared_param,
                                             share_scope, compensation):
    """The mm dataset's CreamFL aggregation: zero-initialized accumulate
    final += local * c_i (NOT the fedavg EMA), exact-equality 'modality'
    scope, compensation dividing by the UNFILTERED total
    (creamflserver.py:251-291).  The distill phase after the accumulate is
    skipped with an empty pub_loader/distill_index — it is trajectory-
    tested against a torch twin in test_creamfl_parity.py."""
    _, CreamflServer = ref_servers
    cfgs = toy_cfgs(shared_param, share_scope)
    clients = make_world(cfgs)
    sorted_ids = [0, 1, 2, 3, 4]
    updated_sizes = {c.id: c.n_train for c in clients.values()}

    key = jax.random.PRNGKey(7)
    client_params = {}
    for cid, c in clients.items():
        key, k = jax.random.split(key)
        client_params[cid] = init_mat(cfgs[c.dataset], k)
    group_members = {}
    for cid, c in clients.items():
        group_members.setdefault(c.dataset, []).append(cid)
    stacked = {
        ds: jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]),
            *[client_params[cid] for cid in ids])
        for ds, ids in group_members.items()
    }
    all_names = []
    for cfg in cfgs.values():
        for _, n in naming.param_names(cfg):
            if n not in all_names:
                all_names.append(n)
    param_scope = naming.build_param_scope(all_names, shared_param,
                                           share_scope)
    ref_clients = {cid: _Client(c, named_upload(cfgs[c.dataset],
                                                client_params[cid]))
                   for cid, c in clients.items()}

    model_ds, cfg = "Coco", cfgs["Coco"]
    gparams = init_mat(cfg, jax.random.PRNGKey(13))
    required = naming.required_param_names(cfg)

    srv = CreamflServer.__new__(CreamflServer)
    srv.args = _Args(compensation=compensation, share_scope=share_scope,
                     algorithm="creamfl", p_lr=1e-4, kd_weight=0.0)
    srv.clients = ref_clients
    srv.param_scope = param_scope
    srv.dataset = model_ds
    srv.task = TASK[model_ds]
    srv.modality = MODALITY[model_ds]
    srv.round = 1
    srv.device = torch.device("cpu")
    srv.distill_index = []
    srv.pub_loader = []
    model = _CreamflModel({n: naming.get_by_path(gparams, p)
                           for p, n in required})
    srv.global_model = model
    CreamflServer._aggregate(srv, sorted_ids, updated_sizes)
    golden = {k_: v.numpy() for k_, v in model._named.items()}

    jobs, weights = agg.plan_aggregation(
        model_ds, cfg, {d: cfgs[d] for d in group_members},
        clients, sorted_ids, updated_sizes, param_scope,
        EXP_MODALITIES, group_members,
        compensation=compensation, share_scope=share_scope,
        fedavg=False, creamfl=True, zero_init=True,
        model_modality=MODALITY[model_ds], model_task=TASK[model_ds])
    new_params = agg.apply_aggregation(jobs, weights, gparams, stacked)

    for path, name in required:
        got = np.asarray(naming.get_by_path(new_params, path))
        np.testing.assert_allclose(
            got, golden[name], rtol=2e-5, atol=2e-6,
            err_msg=f"creamfl {name} ({shared_param}/{share_scope}"
                    f"/comp={compensation})")


class _SamplingClient:
    def __init__(self, cid, dataset, modality):
        self.id = cid
        self.dataset = dataset
        self.modality = modality


def _sampling_world():
    datasets = ["CIFAR100"] * 4 + ["AG_NEWS"] * 4 + ["Coco"] * 2
    modality = {"CIFAR100": "img", "AG_NEWS": "txt", "Coco": "img+txt"}
    return [_SamplingClient(i, ds, modality[ds])
            for i, ds in enumerate(datasets)]


def test_real_sample_clients_matches_ours(ref_servers):
    """Our stateless sampler derives random.Random((seed, round)-mix); the
    reference draws from the globally-seeded random module
    (fedavgserver.py:282-312).  Seeding the global stream with the same
    mix must give identical cohorts — same sample() call order per branch:
    equal_sampled per-dataset loops, the global C branch, eval sampling
    over unparticipated ids, and the warmup modality filter."""
    import random as _random
    from fedcola_tpu.data.sampling import sample_clients
    FedavgServer, _ = ref_servers
    world = _sampling_world()
    client_dataset_of = [c.dataset for c in world]
    client_modality_of = [c.modality for c in world]
    Cs = {"CIFAR100": 0.5, "AG_NEWS": 0.75, "Coco": 1.0}
    seed = 9

    def make_srv(**args_kw):
        srv = FedavgServer.__new__(FedavgServer)
        base = dict(K=len(world), eval_fraction=1.0, C=0.5,
                    datasets=["CIFAR100", "AG_NEWS", "Coco"],
                    equal_sampled=True, warmup_modality="none",
                    warmup_rounds=0)
        base.update(args_kw)
        srv.args = _Args(**base)
        srv.clients = world
        srv.Cs = Cs
        return srv

    def mix(round_idx, eval_mode=False):
        return int(seed) * 1_000_003 + int(round_idx) * 2 + (
            1 if eval_mode else 0)

    # equal_sampled across rounds
    srv = make_srv()
    for r in (1, 2, 7):
        srv.round = r
        _random.seed(mix(r))
        theirs = FedavgServer._sample_clients(srv)
        ours = sample_clients(seed, client_dataset_of, client_modality_of,
                              srv.args.datasets, Cs, srv.args.C,
                              equal_sampled=True, round_idx=r)
        assert ours == theirs, f"equal_sampled round {r}"

    # global C branch
    srv = make_srv(equal_sampled=False)
    srv.round = 3
    _random.seed(mix(3))
    theirs = FedavgServer._sample_clients(srv)
    ours = sample_clients(seed, client_dataset_of, client_modality_of,
                          srv.args.datasets, Cs, srv.args.C,
                          equal_sampled=False, round_idx=3)
    assert ours == theirs, "global C branch"

    # eval sampling over unparticipated clients
    srv = make_srv(equal_sampled=False, eval_fraction=0.5)
    srv.round = 3
    exclude = [0, 1, 2, 5]
    _random.seed(mix(3, eval_mode=True))
    theirs = FedavgServer._sample_clients(srv, exclude=exclude)
    ours = sample_clients(seed, client_dataset_of, client_modality_of,
                          srv.args.datasets, Cs, srv.args.C,
                          equal_sampled=False, round_idx=3, exclude=exclude,
                          eval_fraction=0.5, eval_mode=True)
    assert ours == theirs, "eval sampling"

    # warmup filter keeps only the warmup modality
    srv = make_srv(warmup_modality="img", warmup_rounds=5)
    srv.round = 2
    _random.seed(mix(2))
    theirs = FedavgServer._sample_clients(srv)
    ours = sample_clients(seed, client_dataset_of, client_modality_of,
                          srv.args.datasets, Cs, srv.args.C,
                          equal_sampled=True, round_idx=2,
                          warmup_modality="img", warmup_rounds=5)
    assert ours == theirs and all(
        client_modality_of[i] == "img" for i in ours), "warmup filter"


@pytest.mark.parametrize("shared_param", ["none", "attn", "blocks", "mlp"])
@pytest.mark.parametrize("share_scope", ["modality", "all",
                                         "modality_exact", "dataset"])
def test_real_param_scope_table_matches_ours(ref_servers, shared_param,
                                             share_scope):
    """The real _init_param_scope (fedavgserver.py:182-238) over the union
    of all models' names vs naming.build_param_scope, plus the
    get_name_modality module function on every name."""
    FedavgServer, _ = ref_servers
    import src.server.fedavgserver as favs_mod
    cfgs = toy_cfgs(shared_param if shared_param != "mlp" else "attn",
                    share_scope)
    all_names = []
    for cfg in cfgs.values():
        for _, n in naming.param_names(cfg):
            if n not in all_names:
                all_names.append(n)

    srv = FedavgServer.__new__(FedavgServer)
    srv.global_models = {
        ds: _CreamflModel({n: np.zeros(1, np.float32)
                           for _, n in naming.param_names(cfg)})
        for ds, cfg in cfgs.items()}
    FedavgServer._init_param_scope(srv, shared_param, share_scope)
    ours = naming.build_param_scope(all_names, shared_param, share_scope)
    assert set(srv.param_scope) == set(all_names)
    for name in all_names:
        assert ours[name] == srv.param_scope[name], (
            f"{name}: ours={ours[name]} ref={srv.param_scope[name]} "
            f"({shared_param}/{share_scope})")

    for name in all_names:
        assert (naming.get_name_modality(name, EXP_MODALITIES)
                == favs_mod.get_name_modality(name, EXP_MODALITIES)), name
