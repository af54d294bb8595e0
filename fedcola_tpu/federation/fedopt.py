"""Server-side FL optimizers: FedAvgM / FedAdam / FedYogi / FedAdagrad.

The reference ships these as the ``src/algorithm/*`` family
(fedavg.py:7-55, fedadam.py:7-62, fedyogi.py:7-63, fedadagrad.py:7-61) but
its multimodal path never invokes them — ``_get_algorithm`` exists
(fedavgserver.py:241-246) yet ``update()`` aggregates inline (SURVEY.md
§2.7).  Per the rebuild plan they are supported here as *server-delta
optimizers*: each round the plain-FedAvg aggregate defines a pseudo-gradient

    delta[name] = sum_i c_i * (local_i[name] - global[name])

(the reference's grad-buffer accumulation with the sign flipped back,
fedavg.py:44-55) and the server state update follows the FedOpt family
(Reddi et al. 2021), matching the reference's buffer recurrences:

* fedavgm:   m = b1*m + (1-b1)*delta;              g += lr * m
* fedadam:   m as above; v = b2*v + (1-b2)*delta^2; g += lr*m/(sqrt(v)+tau)
* fedyogi:   v = v - (1-b2)*delta^2*sign(v - delta^2)
* fedadagrad: v = v + delta^2

Defaults: b1 = ``--beta1`` taken literally (server momentum flag,
main.py:265; the CLI default 0.0 means *no* server momentum — pass
``--beta1 0.9`` for the FedOpt-paper setting), b2 = 0.99, tau = 1e-3,
server lr = ``--server_lr`` when given (the paper tunes it separately,
~0.1-1) else ``--lr`` at this round's value (the decay applies after
the step, like the client schedule; the reference's dormant classes
read the one shared lr kwarg — their unset v0/tau would crash, a
documented quirk).  Sanity anchor: ``fedavgm --beta1 0 --server_lr 1``
is exactly the plain FedAvg aggregate.

First-step moment init: moments start at ZERO (the FedOpt paper's
m_0 = 0, v_0 = tau^2-ish convention with v_0 = 0 here), which is a
deliberate divergence from the dormant upstream classes — those
initialize ``momentum_buffer2`` from a ``v0`` kwarg and then
immediately apply the recurrence AGAIN in the same step (first
fedadam v = b2*(v0*b2 + (1-b2)*d^2) + (1-b2)*d^2, fedadagrad
v = v0 + 2*d^2; fedadam.py:38-42, fedadagrad.py:36-40), a
double-apply that only exists because the init expression duplicates
the update line.  Since the upstream server never constructs these
classes (and ``kwargs.get('v0')`` returns None, so invoking them
crashes), there is no runnable upstream behavior to match; the paper
recurrence from zero moments is the spec here.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from fedcola_tpu.federation.server import FedAvgServer
from fedcola_tpu.models import naming

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("flavor", "b1", "b2", "tau"))
def _fedopt_step(global_params, agg_params, m, v, lr,
                 flavor: str, b1: float, b2: float, tau: float):
    def upd(g, a, m_, v_):
        delta = a - g
        m_new = b1 * m_ + (1 - b1) * delta
        if flavor == "fedavgm":
            return g + lr * m_new, m_new, v_
        d2 = jnp.square(delta)
        if flavor == "fedadam":
            v_new = b2 * v_ + (1 - b2) * d2
        elif flavor == "fedyogi":
            v_new = v_ - (1 - b2) * d2 * jnp.sign(v_ - d2)
        elif flavor == "fedadagrad":
            v_new = v_ + d2
        else:
            raise ValueError(flavor)
        return g + lr * m_new / (jnp.sqrt(v_new) + tau), m_new, v_new

    flat_g, treedef = jax.tree_util.tree_flatten(global_params)
    flat_a = treedef.flatten_up_to(agg_params)
    flat_m = treedef.flatten_up_to(m)
    flat_v = treedef.flatten_up_to(v)
    out_g, out_m, out_v = [], [], []
    for g, a, m_, v_ in zip(flat_g, flat_a, flat_m, flat_v):
        ng, nm, nv = upd(g, a, m_, v_)
        out_g.append(ng); out_m.append(nm); out_v.append(nv)
    return (jax.tree_util.tree_unflatten(treedef, out_g),
            jax.tree_util.tree_unflatten(treedef, out_m),
            jax.tree_util.tree_unflatten(treedef, out_v))


class FedOptServer(FedAvgServer):
    def __init__(self, cfg, data, writer=None):
        super().__init__(cfg, data, writer)
        self.flavor = cfg.algorithm
        self.b1 = float(cfg.beta1)   # 0.0 (the CLI default) = no momentum
        self.b2 = 0.99
        # adaptivity floor (Reddi et al. 2021 tunes tau per workload); the
        # upstream classes read kwargs.get('tau') that no caller supplies
        # (fedadam.py:11 -> None -> crash), and the upstream CLI cannot
        # even reach them: check_args demands beta1>0 then dereferences a
        # --beta2 flag main.py never defines (src/utils.py:206-214) — so
        # --server_tau is a framework extension, like --server_lr
        self.tau = float(getattr(cfg, "server_tau", 1e-3))
        zeros = lambda tree: jax.tree_util.tree_map(jnp.zeros_like, tree)
        self.server_m = {ds: zeros(p) for ds, p in self.global_params.items()}
        self.server_v = {ds: zeros(p) for ds, p in self.global_params.items()}

    def save_checkpoint(self, path: str):
        # server optimizer moments are round-to-round state: without them
        # a resumed fedadam/fedyogi run silently restarts from zero
        # moments while params continue — not the run that was saved
        super().save_checkpoint(path)
        for ds in self.global_params:
            flat = {}
            for p, name in naming.param_names(self.model_cfgs[ds]):
                flat[f"m {name}"] = np.asarray(
                    naming.get_by_path(self.server_m[ds], p))
                flat[f"v {name}"] = np.asarray(
                    naming.get_by_path(self.server_v[ds], p))
            np.savez(os.path.join(path, f"__fedopt_{ds}.npz"), **flat)

    def load_checkpoint(self, path: str):
        super().load_checkpoint(path)
        for ds in self.global_params:
            f = os.path.join(path, f"__fedopt_{ds}.npz")
            if not os.path.exists(f):
                continue
            z = np.load(f)
            for p, name in naming.param_names(self.model_cfgs[ds]):
                has_m, has_v = f"m {name}" in z, f"v {name}" in z
                if has_m and has_v:
                    naming.set_by_path(self.server_m[ds], p,
                                       jnp.asarray(z[f"m {name}"]))
                    naming.set_by_path(self.server_v[ds], p,
                                       jnp.asarray(z[f"v {name}"]))
                elif has_m or has_v:
                    # save_checkpoint always writes the pair; an asymmetric
                    # npz means a corrupt/mismatched checkpoint — restart
                    # this param's moments from zero, but say so
                    logger.warning(
                        "[FEDOPT] checkpoint %s has only one of the m/v "
                        "moment pair for %r (%s present) — moments for this "
                        "param restart from zero", f, name,
                        "m" if has_m else "v")

    def update(self):
        old_globals = {ds: p for ds, p in self.global_params.items()}
        # server step size: --server_lr when given (the FedOpt paper
        # tunes it separately, ~0.1-1), else this round's client lr
        # (super().update() decays curr_lr at its end, so capture now)
        round_lr = (self.cfg.server_lr if self.cfg.server_lr is not None
                    else self.curr_lr)
        sampled = super().update()
        if not sampled:
            return sampled
        # super() set global_params to the plain aggregate; re-express it as
        # a server-optimizer step from the old globals.
        for ds in self.global_params:
            new_g, m, v = _fedopt_step(
                old_globals[ds], self.global_params[ds],
                self.server_m[ds], self.server_v[ds],
                jnp.float32(round_lr), flavor=self.flavor,
                b1=self.b1, b2=self.b2, tau=self.tau)
            # multi-process: keep params AND moments replicated so the
            # process-0-gated checkpoint can serialize them (no-op
            # single-process)
            self.global_params[ds] = self.mesh_plan.ensure_addressable(new_g)
            self.server_m[ds] = self.mesh_plan.ensure_addressable(m)
            self.server_v[ds] = self.mesh_plan.ensure_addressable(v)
        # super() exchanged aux weights against the PRE-step aggregate;
        # re-sync them from the post-step kernels so --with_aux still
        # means "aux = exact copy of the other modality's current
        # kernels" (otherwise the fedopt step would reduce the copy to a
        # tiny optimizer move and silently disable the exchange)
        if self.cfg.with_aux:
            from fedcola_tpu.config import DATASET_2_MODALITY
            from fedcola_tpu.federation.aux import exchange_aux_weights
            self.global_params = exchange_aux_weights(
                self.global_params, self.model_cfgs,
                {ds: DATASET_2_MODALITY[ds] for ds in self.global_params})
        # the base guard ran before the fedopt step rewrote the globals;
        # re-check so a non-finite server step cannot become permanent
        self._assert_global_finite()
        return sampled
