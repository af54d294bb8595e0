"""Golden tests of the FedOpt server-optimizer recurrences against the
ACTUAL reference ``src/algorithm`` classes (fedavg.py, fedavgm.py,
fedadam.py, fedyogi.py, fedadagrad.py — torch-only, importable offline).

Upstream these classes are DORMANT: ``_get_algorithm`` exists
(fedavgserver.py:241-246) but ``update()`` aggregates inline, and the
kwargs the server would pass carry no ``v0``/``tau`` — invoking ``step()``
then crashes on ``None`` arithmetic.  ``federation/fedopt.py`` therefore
implements the FedOpt-paper recurrence from zero moments and documents
every divergence in its module docstring; these tests pin each of those
claims against the literal upstream code:

* steps >= 2 (moment state already present): the real recurrences equal
  our ``_fedopt_step`` exactly from aligned ``(m, v)`` state — so the
  only divergence is the first-step init;
* step 1: the real classes double-apply the v-init expression
  (fedadam ``v1 = b2*(v0*b2 + (1-b2)*d^2) + (1-b2)*d^2``, fedadam.py:38-42;
  fedadagrad ``v1 = v0 + 2*d^2``, fedadagrad.py:36-40; fedyogi's init even
  signs on ``v0 - delta`` where the update signs on ``v - delta^2``,
  fedyogi.py:38-43);
* ``v0=None`` crashes — there is no runnable upstream zero-state behavior
  to match;
* ``FedavgmOptimizer`` adds NO momentum code (fedavgm.py:7-9 is an empty
  subclass of ``FedavgOptimizer``), so our paper-recurrence fedavgm is
  additive capability, not a divergence from runnable behavior;
* ``FedavgOptimizer.accumulate`` + ``step`` equals the closed-form
  weighted aggregate, which equals our fedavgm at ``b1=0, lr=1`` (the
  docstring's sanity anchor).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from fedcola_tpu.federation.fedopt import _fedopt_step

REF_ALG = "/root/reference/src/algorithm"


def _load_as(modname, path):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_opts():
    if not os.path.exists(os.path.join(REF_ALG, "fedadam.py")):
        pytest.skip("reference tree not mounted")
    keys = ("src", "src.algorithm", "src.algorithm.basealgorithm",
            "src.algorithm.fedavg", "src.algorithm.fedavgm",
            "src.algorithm.fedadam", "src.algorithm.fedyogi",
            "src.algorithm.fedadagrad")
    saved = {k: sys.modules.get(k) for k in keys}
    try:
        pkg = types.ModuleType("src")
        pkg.__path__ = []
        sys.modules["src"] = pkg
        alg = types.ModuleType("src.algorithm")
        alg.__path__ = [REF_ALG]
        sys.modules["src.algorithm"] = alg
        _load_as("src.algorithm.basealgorithm",
                 os.path.join(REF_ALG, "basealgorithm.py"))
        mods = {name: _load_as(f"src.algorithm.{name}",
                               os.path.join(REF_ALG, f"{name}.py"))
                for name in ("fedavg", "fedavgm", "fedadam", "fedyogi",
                             "fedadagrad")}
        yield mods
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _mk(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


LR, B1, B2, TAU = 0.1, 0.9, 0.99, 1e-3
SHAPE = (3, 5)


def _real_opt(mods, flavor, params):
    cls = {"fedadam": mods["fedadam"].FedadamOptimizer,
           "fedyogi": mods["fedyogi"].FedyogiOptimizer,
           "fedadagrad": mods["fedadagrad"].FedadagradOptimizer}[flavor]
    # fedadagrad reads kwargs['beta'] (a scalar), the others
    # kwargs['betas'] (a pair) — upstream kwarg quirk (fedadagrad.py:13)
    kw = dict(lr=LR, v0=0.0, tau=TAU)
    if flavor == "fedadagrad":
        kw["beta"] = B1
    else:
        kw["betas"] = (B1, B2)
    return cls([{"params": params}], **kw)


@pytest.mark.parametrize("flavor", ["fedadam", "fedyogi", "fedadagrad"])
def test_real_recurrence_matches_ours_from_aligned_state(ref_opts, flavor):
    """With moment buffers already present (every step after the first),
    the real step() recurrence must equal our _fedopt_step exactly —
    param, m and v — across a 3-step trajectory of distinct deltas."""
    g0 = _mk(SHAPE, 1)
    m0 = _mk(SHAPE, 2) * 0.1
    v0 = np.abs(_mk(SHAPE, 3)) * 0.1 + 0.05   # keep sqrt real for yogi
    deltas = [_mk(SHAPE, 10 + t) * 0.01 for t in range(3)]

    p = torch.nn.Parameter(torch.tensor(g0))
    opt = _real_opt(ref_opts, flavor, [p])
    opt.state[p]["momentum_buffer1"] = torch.tensor(m0)
    opt.state[p]["momentum_buffer2"] = torch.tensor(v0)

    ours_g = {"w": jnp.asarray(g0)}
    ours_m = {"w": jnp.asarray(m0)}
    ours_v = {"w": jnp.asarray(v0)}
    for t, d in enumerate(deltas):
        p.grad = torch.tensor(-d)            # delta = -grad (fedadam.py:30)
        opt.step()
        agg = {"w": ours_g["w"] + jnp.asarray(d)}   # delta = agg - global
        ours_g, ours_m, ours_v = _fedopt_step(
            ours_g, agg, ours_m, ours_v, jnp.float32(LR),
            flavor=flavor, b1=B1, b2=B2, tau=TAU)
        np.testing.assert_allclose(
            p.detach().numpy(), np.asarray(ours_g["w"]),
            rtol=1e-6, atol=1e-7, err_msg=f"{flavor} param step {t}")
        np.testing.assert_allclose(
            opt.state[p]["momentum_buffer1"].numpy(),
            np.asarray(ours_m["w"]), rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(
            opt.state[p]["momentum_buffer2"].numpy(),
            np.asarray(ours_v["w"]), rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("flavor", ["fedadam", "fedyogi", "fedadagrad"])
def test_real_first_step_double_applies_v_init(ref_opts, flavor):
    """The upstream first step initializes momentum_buffer2 with the
    update expression and then applies the update AGAIN in the same step
    (fedadam.py:38-42, fedyogi.py:38-43, fedadagrad.py:36-40) — the
    documented reason fedopt.py starts from zero moments instead."""
    g0, d = _mk(SHAPE, 4), _mk(SHAPE, 5) * 0.01
    v0 = 0.25
    p = torch.nn.Parameter(torch.tensor(g0))
    opt = _real_opt(ref_opts, flavor, [p])
    for grp in opt.param_groups:
        grp["v0"] = v0
    p.grad = torch.tensor(-d)
    opt.step()
    d2 = d.astype(np.float64) ** 2
    if flavor == "fedadam":
        expect = B2 * (v0 * B2 + (1 - B2) * d2) + (1 - B2) * d2
    elif flavor == "fedadagrad":
        expect = v0 + 2.0 * d2
    else:  # fedyogi: init signs on (v0 - delta), update on (v - delta^2)
        v_init = v0 - (1 - B2) * d2 * np.sign(v0 - d.astype(np.float64))
        expect = v_init - (1 - B2) * d2 * np.sign(v_init - d2)
    np.testing.assert_allclose(opt.state[p]["momentum_buffer2"].numpy(),
                               expect.astype(np.float32),
                               rtol=1e-5, atol=1e-8)
    # and the paper recurrence from zero moments (ours) is NOT that number
    if flavor == "fedadam":
        paper = (1 - B2) * d2
    elif flavor == "fedadagrad":
        paper = d2
    else:
        paper = 0.0 - (1 - B2) * d2 * np.sign(0.0 - d2)
    assert not np.allclose(expect, paper)


def test_real_classes_crash_without_v0(ref_opts):
    """The server's _refine_optim_args-style kwargs carry no v0/tau, so
    the dormant classes crash if ever constructed and stepped — pinning
    fedopt.py's 'no runnable upstream zero-state behavior' claim."""
    p = torch.nn.Parameter(torch.zeros(3))
    opt = ref_opts["fedadam"].FedadamOptimizer(
        [{"params": [p]}], lr=LR, betas=(B1, B2))   # v0/tau absent -> None
    p.grad = torch.zeros(3)
    with pytest.raises(TypeError):
        opt.step()


def test_real_fedavgm_is_momentumless_alias(ref_opts):
    """fedavgm.py:7-9 subclasses FedavgOptimizer and adds nothing — the
    upstream 'fedavgm' has no momentum recurrence, so ours (the FedOpt
    paper's) is additive capability, not a behavioral divergence."""
    FedavgOptimizer = ref_opts["fedavg"].FedavgOptimizer
    FedavgmOptimizer = ref_opts["fedavgm"].FedavgmOptimizer
    assert issubclass(FedavgmOptimizer, FedavgOptimizer)
    assert FedavgmOptimizer.step is FedavgOptimizer.step
    assert FedavgmOptimizer.accumulate is FedavgOptimizer.accumulate
    assert "momentum_buffer" not in (FedavgmOptimizer.__init__.__code__
                                     .co_consts.__repr__())


def test_real_fedavg_step_is_plain_aggregate_and_our_anchor(ref_opts):
    """FedavgOptimizer.accumulate (fedavg.py:40-55: per-name coefficient
    dict, zero-coefficient and absent-name skips) + step (param -= grad)
    lands on the closed-form weighted aggregate, which equals our
    fedavgm at b1=0, server_lr=1 — the docstring's sanity anchor."""
    g0 = _mk(SHAPE, 6)
    locals_ = [_mk(SHAPE, 7), _mk(SHAPE, 8), _mk(SHAPE, 9)]
    coefs = [0.5, 0.3, 0.2]

    p = torch.nn.Parameter(torch.tensor(g0))
    opt = ref_opts["fedavg"].FedavgOptimizer({"w": p})
    for li, ci in zip(locals_, coefs):
        opt.accumulate({"w": ci}, [("w", torch.tensor(li))])
    opt.step()

    agg = sum(c * l for c, l in zip(coefs, locals_))
    np.testing.assert_allclose(p.detach().numpy(), agg, rtol=1e-6,
                               atol=1e-7)

    zeros = {"w": jnp.zeros(SHAPE)}
    ours_g, _, _ = _fedopt_step({"w": jnp.asarray(g0)},
                                {"w": jnp.asarray(agg)}, zeros, zeros,
                                jnp.float32(1.0), flavor="fedavgm",
                                b1=0.0, b2=B2, tau=TAU)
    np.testing.assert_allclose(np.asarray(ours_g["w"]), agg, rtol=1e-6,
                               atol=1e-7)

    # absent-name and zero-coefficient skips leave the param untouched
    q = torch.nn.Parameter(torch.tensor(g0))
    opt2 = ref_opts["fedavg"].FedavgOptimizer({"w": q})
    opt2.accumulate({}, [("w", torch.tensor(locals_[0]))])       # absent
    opt2.accumulate({"w": 0.0}, [("w", torch.tensor(locals_[0]))])  # zero
    opt2.step()
    np.testing.assert_allclose(q.detach().numpy(), g0, rtol=0, atol=0)


def test_upstream_cli_cannot_reach_fedopt_family():
    """The upstream CLI literally cannot run fedadam/fedyogi/fedadagrad:
    ``check_args`` demands ``beta1 > 0`` (src/utils.py:206-209) but with
    any positive beta1 immediately dereferences ``args.beta2`` — a flag
    ``main.py`` never defines (main.py:265 is the only beta flag) — and
    crashes with AttributeError (src/utils.py:211).  This is why
    ``--server_lr``/``--server_tau`` + literal ``--beta1`` are framework
    extensions rather than divergences from runnable upstream behavior."""
    path = "/root/reference/src/utils.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not mounted")
    saved = {k: sys.modules.get(k) for k in ("src", "src.criterions")}
    try:
        pkg = types.ModuleType("src")
        pkg.__path__ = []
        sys.modules["src"] = pkg
        # check_args does `import src.criterions`, whose real __init__
        # needs torchmultimodal (absent here); the algorithm check under
        # test runs after it either way
        sys.modules["src.criterions"] = types.ModuleType("src.criterions")
        ref_utils = _load_as("ref_utils_check", path)
        base = dict(server_device="cpu", optimizer="AdamW",
                    criterion="CrossEntropyLoss", algorithm="fedadam")

        args = types.SimpleNamespace(**base, beta1=0.0)
        with pytest.raises(AssertionError, match="server momentum"):
            ref_utils.check_args(args)

        args = types.SimpleNamespace(**base, beta1=0.9)   # no beta2 attr
        with pytest.raises(AttributeError, match="beta2"):
            ref_utils.check_args(args)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
