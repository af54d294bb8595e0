"""Probe 3: correct timing methodology for the D=768 fused-MLP backward.

Probe 2's eager per-call dispatch through the axon relay costs seconds
per call regardless of kernel speed (D=384 no-limit read 3.6 s/call for
a kernel that takes ~8 ms inside the production jitted step).  Here K
kernel calls are CHAINED inside one jit (each consumes the previous dx)
so one dispatch covers K kernel executions and the chain can't be
elided.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from fedcola_tpu.ops import fused_mlp as fm  # noqa: E402

B, N, K = 96, 197, 12
print("backend:", jax.devices()[0].device_kind, flush=True)

_orig = pl.pallas_call


def run(D, limit_mb, reps=4):
    Hd = 4 * D
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(1, B, N, D) * 0.02, dt)
    do = jnp.asarray(rng.randn(1, B, N, D) * 0.02, dt)
    lns = jnp.asarray(rng.randn(1, 1, D) * 0.02 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.randn(1, 1, D) * 0.02, jnp.float32)
    w1 = jnp.asarray(rng.randn(1, D, Hd) * 0.02, dt)
    b1 = jnp.asarray(rng.randn(1, 1, Hd) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.randn(1, Hd, D) * 0.02, dt)

    if limit_mb:
        def patched(*a, **kw):
            # OVERWRITE (production call sites now pass compiler_params
            # explicitly via wide_compiler_params, so setdefault would be
            # a silent no-op and every row would measure the 96 MB
            # production limit)
            kw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=limit_mb * 1024 * 1024)
            return _orig(*a, **kw)
        fm.pl.pallas_call = patched
    try:
        @jax.jit
        def chain(x, do):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(K):
                outs = fm._ln_item_bwd_call(x, lns, lnb, w1, b1, w2, do)
                do = outs[0]          # feed dx back in: serial dependence
                acc = acc + outs[3].sum()
            return do, acc

        t0 = time.time()
        out, a = chain(x, do)
        np.asarray(a)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out, a = chain(x, do)
        np.asarray(a)                  # one scalar readback
        np.asarray(out[0, 0, 0, :1])
        dtm = (time.time() - t0) / (reps * K)
        tf = 12 * B * N * D * Hd / dtm / 1e12
        print(f"D={D} limit={limit_mb}MB: compile {compile_s:.1f}s, "
              f"{dtm*1e3:.2f} ms/kernel-call, {tf:.1f} TF/s incl-recompute",
              flush=True)
    except Exception as e:
        print(f"D={D} limit={limit_mb}MB: FAILED "
              f"{type(e).__name__}: {str(e).splitlines()[0][:160]}",
              flush=True)
    finally:
        fm.pl.pallas_call = _orig


run(384, None)
run(768, 32)
run(768, 96)
