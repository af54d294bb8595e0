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
            "src.client.fedproxclient", "src.client.creamflclient",
            "src.datasets", "src.datasets.coco", "src.metrics",
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
        pkg.init_weights = utils.init_weights
        crit_pkg = types.ModuleType("src.criterions")
        crit_pkg.__path__ = [os.path.join(REF_SRC, "criterions")]
        sys.modules["src.criterions"] = crit_pkg
        _load_as("src.criterions.segmentation_loss",
                 os.path.join(REF_SRC, "criterions/segmentation_loss.py"))
        # creamflclient imports the torchvision-dependent coco dataset
        # module at top level but its update()/update_pub_feature() never
        # touch it — stub the names
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
        fprox = _load_as("src.client.fedproxclient",
                         os.path.join(REF_SRC, "client/fedproxclient.py"))
        crml = _load_as("src.client.creamflclient",
                        os.path.join(REF_SRC, "client/creamflclient.py"))
        yield favg.FedavgClient, fprox.FedproxClient, crml.CreamflClient
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
    FedavgClient, _, _ = ref_clients
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
    _, FedproxClient, _ = ref_clients
    mu = 0.05
    cfg, params, twin, ids, ys, chunk = _golden_case(seed=53, depth=2)
    client = _make_client(FedproxClient, ids, ys, mu=mu)
    client.model = twin
    client.update()

    spec = GroupSpec(modality="txt", criterion="CrossEntropyLoss",
                     txt_slot=1, mu=mu, algorithm="fedprox")
    stacked = _run_ours(cfg, spec, params, chunk, steps=4)
    _assert_trees_close(stacked, _twin_tree(twin, cfg))


def test_real_client_evaluate_is_broken_upstream(ref_clients):
    """Pin the documented 'broken per-client local eval' quirk (PARITY
    'Replicate vs fix'): the real FedavgClient.evaluate()
    (fedavgclient.py:140) calls ``self.model(inputs, task=self.task)``,
    but the reference's own model forward is ``forward(x, feat_out=False)``
    (mome.py:881) — the eval_type=local path upstream crashes on the task
    kwarg, which is why our _local_evaluate is a fix-directive rebuild
    (evaluating the downloaded global on the holdout), not a port."""
    FedavgClient, _, _ = ref_clients
    cfg, params, twin, ids, ys, chunk = _golden_case(seed=67, depth=1)
    client = _make_client(FedavgClient, ids, ys)
    client.model = twin            # same forward signature as mome.py:881
    with pytest.raises(TypeError, match="task"):
        client.evaluate()
    # and the train_only short-circuit (fedavgclient.py:120-121) survives
    client.args.train_only = True
    assert client.evaluate() == {"loss": -1, "metrics": {"none": -1}}


def test_real_creamflclient_update_matches_ours(ref_clients):
    """The real CreamflClient.update() (creamflclient.py:73-246): E=2 task
    epochs each followed by a public contrastive pass over the pub loader
    (MOON pos/neg vs the deepcopied round-start model + inter CE at temp
    0.5, clip 2), ONE AdamW whose moments flow through both phases — then
    update_pub_feature() (creamflclient.py:38-68) on the trained model.
    Our interleaved update_fn/pub_fn composition with a shared opt_state
    must land on the same parameters AND the same public features."""
    import jax.numpy as jnp
    from test_creamfl_parity import _mini_server, PUB_TEMPERATURE  # noqa: F401
    from fedcola_tpu.parallel.client_update import build_group_update
    from fedcola_tpu.parallel.optim import OptimizerSpec, init_opt_state
    _, _, CreamflClient = ref_clients

    W, P, PUB_B, E = 0.7, 10, 4, 2
    cfg, params, twin, ids, ys, chunk = _golden_case(seed=59, depth=2)
    rng = np.random.RandomState(61)
    pub_txt = rng.randint(0, V, (P, L)).astype(np.int64)
    g_img = rng.randn(P, 8).astype(np.float32)
    g_txt = rng.randn(P, 8).astype(np.float32)
    g_img /= np.linalg.norm(g_img, axis=-1, keepdims=True)
    g_txt /= np.linalg.norm(g_txt, axis=-1, keepdims=True)

    # ---- the real client
    client = _make_client(CreamflClient, ids, ys, E=E, interintra_weight=W,
                          no_mm_contrastive=False, pub_batch_size=PUB_B)
    client.model = twin
    client.pub_dataset = torch.utils.data.TensorDataset(
        torch.zeros(P, 1), torch.tensor(pub_txt), torch.zeros(P),
        torch.zeros(P), torch.arange(P))
    client.global_img_feature = torch.tensor(g_img)
    client.global_txt_feature = torch.tensor(g_txt)
    client.distill_index = list(range(P))   # server order (creamflserver
    # assigns it before update(), _request/__update_clients)
    client.update()
    client.update_pub_feature()
    ref_feats = client.pub_features.numpy()

    # ---- ours: same interleave through the production builders
    spec = GroupSpec(modality="txt", criterion="CrossEntropyLoss",
                     txt_slot=1)
    srv = _mini_server({"AG_NEWS": cfg}, {"AG_NEWS": spec},
                       interintra_weight=W, no_mm_contrastive=False)
    pub_fn = srv._build_pub_update("AG_NEWS")
    update_fn = build_group_update(cfg, spec,
                                   OptimizerSpec(name="AdamW",
                                                 weight_decay=0.0), None)
    pub_batches = []
    imgs = np.zeros((P, 16, 16, 3), np.uint8)
    for s in range(0, P, PUB_B):
        e = min(s + PUB_B, P)
        sel = np.concatenate([np.arange(s, e),
                              np.full((PUB_B - (e - s),), s)]).astype(int)
        valid = np.zeros((PUB_B,), bool)
        valid[:e - s] = True
        pub_batches.append({"img": imgs[sel],
                            "txt": pub_txt[sel].astype(np.int32),
                            "didx": sel.astype(np.int32), "valid": valid})

    import jax as _jax
    stacked = _jax.tree_util.tree_map(lambda x: x[None] + 0, params)
    ostate = init_opt_state(OptimizerSpec(name="AdamW", weight_decay=0.0),
                            stacked, n_clients=1)
    nb = chunk["x"].shape[1] // E   # task batches per epoch
    for ep in range(E):
        full = {"x": chunk["x"][:, ep * nb:(ep + 1) * nb],
                "y": chunk["y"][:, ep * nb:(ep + 1) * nb],
                "valid": np.ones((1, nb, B), bool),
                "step_valid": np.ones((1, nb), bool)}
        rngs = _jax.random.split(_jax.random.PRNGKey(100 + ep), 1)
        stacked, ostate, _ = update_fn(stacked, ostate, full, rngs,
                                       jnp.float32(LR), params)
        for j, b in enumerate(pub_batches):
            rngs = _jax.random.split(_jax.random.PRNGKey(200 + ep * 10 + j),
                                     1)
            stacked, ostate, _ = pub_fn(
                stacked, ostate, params, _jax.device_put(b),
                jnp.asarray(g_img), jnp.asarray(g_txt), rngs,
                jnp.float32(LR))

    _assert_trees_close(stacked, _twin_tree(twin, cfg))

    extract = srv._build_pub_extract("AG_NEWS")
    fs = [np.asarray(extract(stacked, b["img"],
                             b["txt"]))[:, :int(b["valid"].sum())]
          for b in pub_batches]
    our_feats = np.concatenate([f[0] for f in fs], 0)
    np.testing.assert_allclose(our_feats, ref_feats, rtol=5e-4, atol=5e-5)
