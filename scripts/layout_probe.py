"""A/B probe: does XLA AUTO layout for the carried params/opt-state remove
the 56MB stacked-kernel relayout copies the profiler found around the
unrolled layer stack?  (BENCH_NOTES round-3 'XLA rest' item.)

Usage: python scripts/layout_probe.py [control|auto] ...
Runs each named variant in-process sequentially; prints samples/s.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(auto_layout: bool):
    import jax
    import jax.numpy as jnp
    from fedcola_tpu.models.mat import MATConfig, init_mat
    from fedcola_tpu.parallel.client_update import GroupSpec, _local_loss
    from fedcola_tpu.parallel.optim import OptimizerSpec, init_opt_state, opt_update

    n, S, B = 2, 4, 96
    on_tpu = jax.default_backend() == "tpu"
    kw = dict(modalities=("img", "txt"), tasks=("rtv", "rtv"),
              num_classes=(None, None), img_size=224, patch_size=16,
              embed_dim=384, depth=12, num_heads=6,
              vocab_size=30522, max_text_len=40,
              use_pallas=True, use_fused_mlp=True,
              compute_dtype="bfloat16", scan_unroll=12)
    if not on_tpu:
        n, S, B = 2, 2, 4
        kw.update(img_size=32, embed_dim=16, depth=2, num_heads=2,
                  vocab_size=64, max_text_len=8, use_pallas=False,
                  use_fused_mlp=False, compute_dtype="float32",
                  scan_unroll=1)
    cfg = MATConfig(**kw)
    spec = GroupSpec(modality="img+txt", criterion="ContrastiveLoss",
                     imnorm=True)
    opt = OptimizerSpec(name="AdamW")

    def chunk_fn(params, opt_state, chunk, rng, lr, gp):
        Sx = chunk["step_valid"].shape[0]
        rngs = jax.random.split(rng, Sx)

        def body(carry, xs):
            p, st = carry
            batch, sv, r = xs
            grad_fn = jax.value_and_grad(
                lambda pp: _local_loss(cfg, spec, pp, batch, r, gp),
                has_aux=True)
            (loss, aux), grads = grad_fn(p)
            p2, st2 = opt_update(opt, p, grads, st, lr, step_valid=sv)
            return (p2, st2), loss

        batches = {k: v for k, v in chunk.items() if k != "step_valid"}
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (batches, chunk["step_valid"], rngs))
        return params, opt_state, losses

    vmapped = jax.vmap(chunk_fn, in_axes=(0, 0, 0, 0, None, None))
    if auto_layout:
        from jax.experimental.layout import Format, Layout
        auto = Format(Layout.AUTO)
        update = jax.jit(vmapped, donate_argnums=(0, 1),
                         in_shardings=(auto, auto, auto, auto, auto, auto),
                         out_shardings=(auto, auto, auto))
    else:
        update = jax.jit(vmapped, donate_argnums=(0, 1))

    rng = np.random.RandomState(0)
    IMG, L, V = kw["img_size"], kw["max_text_len"], kw["vocab_size"]
    chunk = {
        "x": rng.randint(0, 255, (n, S, B, IMG, IMG, 3)).astype(np.uint8),
        "y": rng.randint(5, V, (n, S, B, L)).astype(np.int32),
        "valid": np.ones((n, S, B), bool),
        "step_valid": np.ones((n, S), bool),
    }
    params = init_mat(cfg, jax.random.PRNGKey(0))
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n,) + x.shape) + 0, params)
    opt_state = init_opt_state(opt, stacked, n)
    rngs = jax.random.split(jax.random.PRNGKey(1), n)
    lr = jnp.float32(1e-4)

    if auto_layout:
        # compile for the preferred layouts, then relay the inputs into
        # them so the first call already matches (AUTO resolves at
        # compile time; the donated carry then round-trips copy-free)
        lowered = update.lower(stacked, opt_state, chunk, rngs, lr, params)
        compiled = lowered.compile()
        fmts, _ = compiled.input_formats

        def put(x, f):
            if getattr(f, "layout", None) is None:
                return jax.device_put(x)
            return jax.device_put(x, f)

        args = jax.tree_util.tree_map(
            put, (stacked, opt_state, chunk, rngs, lr, params), fmts)
        stacked, opt_state, chunk, rngs, lr, params = args
        update = compiled
    else:
        chunk = __import__("jax").device_put(chunk)

    return update, stacked, opt_state, chunk, rngs, lr, params, n * S * B


def measure(auto_layout: bool, min_s: float = 20.0):
    import jax
    import jax.numpy as jnp
    update, stacked, opt_state, chunk, rngs, lr, params, spc = build(
        auto_layout)

    def sync(o):
        # the axon relay cannot fetch custom-layout arrays; reduce to a
        # default-layout scalar first (true host sync either way)
        return np.asarray(jax.jit(jnp.sum)(o[0]))

    stacked, opt_state, out = update(stacked, opt_state, chunk, rngs, lr,
                                     params)
    sync(out)
    t0 = time.perf_counter()
    stacked, opt_state, out = update(stacked, opt_state, chunk, rngs, lr,
                                     params)
    sync(out)
    per = time.perf_counter() - t0
    reps = max(int(min_s / max(per, 1e-6)), 2)
    t0 = time.perf_counter()
    for _ in range(reps):
        stacked, opt_state, out = update(stacked, opt_state, chunk, rngs,
                                         lr, params)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    return spc / dt


if __name__ == "__main__":
    import jax
    from fedcola_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    variants = sys.argv[1:] or ["control", "auto"]
    for v in variants:
        sps = measure(v == "auto")
        print(f"{v:10s} {sps:9.1f} samples/s", flush=True)
