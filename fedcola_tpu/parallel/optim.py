"""Local optimizers with torch.optim-parity update rules.

The reference builds a fresh ``torch.optim.__dict__[args.optimizer]`` per
client per round (fedavgclient.py:63) passing only the args attributes whose
names match the optimizer signature (``_refine_optim_args``,
fedavgclient.py:34-42): in practice ``lr``/``weight_decay`` for AdamW/Adam
and ``lr``/``momentum``/``weight_decay``/``nesterov`` for SGD; betas/eps are
torch defaults.

Implemented directly (not via optax) so that:
* a boolean ``step_valid`` can skip a padded step *atomically* (params,
  moments, and step counter all untouched) — this is how heterogeneous
  per-client step counts ride one vmapped program;
* a static per-leaf ``frozen`` mask reproduces ``requires_grad=False``
  (the freeze-window feature, fedavgserver.py:422-429): frozen leaves are
  skipped entirely, including weight decay, exactly like torch leaves with
  ``p.grad is None``.
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class OptimizerSpec:
    name: str = "AdamW"          # SGD | Adam | AdamW (torch names)
    weight_decay: float = 0.0
    momentum: float = 0.0
    nesterov: bool = False
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    max_grad_norm: float = 0.0   # 0 = no clipping (main.py:270)
    # Adam moment storage dtype.  float32 matches torch bit-for-bit;
    # bfloat16 halves optimizer-state HBM traffic and footprint (the math
    # still runs f32 per step) at a small accuracy cost -- opt-in.
    moment_dtype: str = "float32"


def init_opt_state(spec: OptimizerSpec, params, n_clients=None):
    """Optimizer state for ``params``.  ``n_clients``: when params are a
    stacked [n, ...] client tree, the step counters become per-client
    [n] vectors (vmap in_axes=0 over the state needs a mapped leaf; a
    scalar ``t`` would either fail to map or silently share one step
    count across clients).

    ``t`` is a PYTREE of per-leaf counters, not one shared scalar: torch
    keeps ``state['step']`` per parameter and skips params whose grad is
    None, so a param outside one phase's graph (e.g. the cls head during
    CreamFL's feat_out public pass) must neither move nor age while the
    rest of the model steps — a shared counter would wrongly advance its
    bias correction for the next phase."""
    mdt = jnp.dtype(spec.moment_dtype)
    t = jax.tree_util.tree_map(
        lambda _: jnp.zeros((n_clients,) if n_clients else (), jnp.int32),
        params)
    # zeros_like (not jnp.zeros) so moments inherit the params' sharding:
    # params arrive stacked and mesh-sharded over the clients axis, and
    # fresh default-device moments would pile the whole optimizer state
    # onto device 0 until the first jitted step reshards it
    moments = lambda: jax.tree_util.tree_map(
        lambda x: jnp.zeros_like(x, dtype=mdt), params)
    if spec.name in ("Adam", "AdamW"):
        return {"m": moments(), "v": moments(), "t": t}
    if spec.name == "SGD":
        return {"b": jax.tree_util.tree_map(jnp.zeros_like, params),
                "t": t}
    raise ValueError(spec.name)


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b)


def clip_global_norm(grads, max_norm: float, frozen=None):
    """torch.nn.utils.clip_grad_norm_ semantics (fedavgclient.py:98-99):
    scale all grads by max_norm / (total_l2 + 1e-6) when that is < 1.
    Frozen leaves are excluded (their torch grads are None)."""
    leaves = jax.tree_util.tree_leaves(grads)
    if frozen is not None:
        fl = jax.tree_util.tree_leaves(frozen)
        leaves = [g for g, f in zip(leaves, fl) if not f]
    total = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                         for g in leaves))
    coef = jnp.minimum(max_norm / (total + 1e-6), 1.0)
    return jax.tree_util.tree_map(lambda g: g * coef.astype(g.dtype), grads)


def opt_update(spec: OptimizerSpec, params, grads, state, lr,
               frozen=None, step_valid=None):
    """One optimizer step.  ``frozen``: static pytree of python bools (same
    structure as params) — those leaves are returned untouched.
    ``step_valid``: traced bool; when False the whole step is a no-op."""
    if spec.max_grad_norm > 0:
        grads = clip_global_norm(grads, spec.max_grad_norm, frozen)

    def leaf_update(p, g, t, extra):
        # per-leaf step count (torch state['step']) — frozen leaves are
        # handled by the caller and never reach here
        tf = t.astype(jnp.float32)
        g = g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        if spec.name == "AdamW":
            m, v = extra
            mdt = m.dtype
            m = spec.beta1 * m.astype(jnp.float32) + (1 - spec.beta1) * g
            v = spec.beta2 * v.astype(jnp.float32) + (1 - spec.beta2) * g * g
            mh = m / (1 - spec.beta1 ** tf)
            vh = v / (1 - spec.beta2 ** tf)
            p32 = p32 * (1 - lr * spec.weight_decay)
            p32 = p32 - lr * mh / (jnp.sqrt(vh) + spec.eps)
            return p32.astype(p.dtype), (m.astype(mdt), v.astype(mdt))
        if spec.name == "Adam":
            m, v = extra
            mdt = m.dtype
            g = g + spec.weight_decay * p32
            m = spec.beta1 * m.astype(jnp.float32) + (1 - spec.beta1) * g
            v = spec.beta2 * v.astype(jnp.float32) + (1 - spec.beta2) * g * g
            mh = m / (1 - spec.beta1 ** tf)
            vh = v / (1 - spec.beta2 ** tf)
            p32 = p32 - lr * mh / (jnp.sqrt(vh) + spec.eps)
            return p32.astype(p.dtype), (m.astype(mdt), v.astype(mdt))
        if spec.name == "SGD":
            (b,) = extra
            g = g + spec.weight_decay * p32
            if spec.momentum > 0:
                # torch: buffer starts as g on first step
                b = jnp.where(t == 1, g, spec.momentum * b + g)
                d = g + spec.momentum * b if spec.nesterov else b
            else:
                d = g
            p32 = p32 - lr * d
            return p32.astype(p.dtype), (b,)
        raise ValueError(spec.name)

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_t = treedef.flatten_up_to(state["t"])
    flat_frozen = treedef.flatten_up_to(frozen) if frozen is not None \
        else [False] * len(flat_p)

    if spec.name in ("Adam", "AdamW"):
        flat_m = treedef.flatten_up_to(state["m"])
        flat_v = treedef.flatten_up_to(state["v"])
        extras = list(zip(flat_m, flat_v))
    else:
        flat_b = treedef.flatten_up_to(state["b"])
        extras = [(b,) for b in flat_b]

    new_p, new_t, new_extras = [], [], []
    for p, g, t, fz, ex in zip(flat_p, flat_g, flat_t, flat_frozen, extras):
        if fz:
            # torch skips grad-None params entirely: no update, no moment
            # decay, and state['step'] does not advance
            new_p.append(p)
            new_t.append(t)
            new_extras.append(ex)
        else:
            np_, ex_ = leaf_update(p, g, t + 1, ex)
            new_p.append(np_)
            new_t.append(t + 1)
            new_extras.append(ex_)

    new_params = jax.tree_util.tree_unflatten(treedef, new_p)
    t_tree = jax.tree_util.tree_unflatten(treedef, new_t)
    if spec.name in ("Adam", "AdamW"):
        new_state = {
            "m": jax.tree_util.tree_unflatten(treedef, [e[0] for e in new_extras]),
            "v": jax.tree_util.tree_unflatten(treedef, [e[1] for e in new_extras]),
            "t": t_tree,
        }
    else:
        new_state = {
            "b": jax.tree_util.tree_unflatten(treedef, [e[0] for e in new_extras]),
            "t": t_tree,
        }

    if step_valid is not None:
        new_params = _tree_where(step_valid, new_params, params)
        new_state = _tree_where(step_valid, new_state, state)
    return new_params, new_state


def make_optimizer_spec(cfg) -> OptimizerSpec:
    """From an ExperimentConfig, mirroring ``_refine_optim_args``
    (fedavgclient.py:34-42): only args attributes that exist are forwarded."""
    return OptimizerSpec(
        name=cfg.optimizer,
        weight_decay=cfg.weight_decay,
        momentum=cfg.momentum,
        nesterov=cfg.nesterov,
        max_grad_norm=cfg.max_grad_norm,
        moment_dtype=getattr(cfg, "moment_dtype", "float32"),
    )
