"""Measure the ceiling of the 'consolidate the per-leaf AdamW fusions'
lever (VERDICT round-3 item 4 / BENCH_NOTES 'Where the FLOPs are' item 3)
WITHOUT touching production code: time the production per-leaf update
against a single-flat-buffer variant over the real ViT-small stacked
client tree shapes.

Both variants scan STEPS updates inside ONE jit (per-call dispatch through
the axon relay costs more than the kernels; see BENCH_NOTES measurement
methodology) and force a host readback before stopping the clock.

Run on the real chip:  python scripts/adamw_fusion_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from fedcola_tpu.models.mat import MATConfig, init_mat
from fedcola_tpu.parallel.optim import OptimizerSpec, init_opt_state, opt_update

N_CLIENTS = 2
STEPS = 20
REPS = 5


def tree_size(t):
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(t))


def main():
    cfg = MATConfig(modalities=("img", "txt"), tasks=("rtv", "rtv"),
                    num_classes=(None, None), embed_dim=384, depth=12,
                    num_heads=6, vocab_size=30522, max_text_len=40,
                    img_size=224, patch_size=16, drop_path_rate=0.0,
                    use_pallas=False, compute_dtype="float32")
    params = init_mat(cfg, jax.random.PRNGKey(0))
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (N_CLIENTS,) + x.shape) + 0,
        params)
    n_leaves = len(jax.tree_util.tree_leaves(stacked))
    n_params = tree_size(stacked)
    print(f"tree: {n_leaves} leaves, {n_params/1e6:.1f} M params "
          f"({N_CLIENTS} clients)")
    spec = OptimizerSpec(name="AdamW", weight_decay=0.0)

    # ---------------------------------------- production per-leaf update --
    state = init_opt_state(spec, stacked, n_clients=None)
    state["t"] = jnp.zeros((), jnp.int32)
    grads = jax.tree_util.tree_map(lambda x: x * 1e-3, stacked)

    # Each jit returns ONE device-reduced scalar touching every carry
    # leaf: reading back a large array over the axon tunnel (~35 MB/s)
    # would swamp the clock (the first probe version read the whole
    # 437 MB flat buffer and measured the wire, not the kernel), and a
    # scalar that ignored leaves would let scan DCE their updates.
    @jax.jit
    def run_tree(p, st, g):
        def body(carry, _):
            p, st = carry
            p, st = opt_update(spec, p, g, st, jnp.float32(1e-4))
            return (p, st), ()
        (p, st), _ = jax.lax.scan(body, (p, st), None, length=STEPS)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves((p, st))
                   if jnp.issubdtype(l.dtype, jnp.floating))

    # ---------------------------------------------------- flat variant --
    flat = jnp.concatenate([l.reshape(-1) for l in
                            jax.tree_util.tree_leaves(stacked)])
    gflat = flat * 1e-3
    mflat = jnp.zeros_like(flat)
    vflat = jnp.zeros_like(flat)

    @jax.jit
    def run_flat(p, m, v, g):
        def body(carry, t):
            p, m, v = carry
            tf = (t + 1).astype(jnp.float32)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mh = m / (1 - 0.9 ** tf)
            vh = v / (1 - 0.999 ** tf)
            p = p - 1e-4 * mh / (jnp.sqrt(vh) + 1e-8)
            return (p, m, v), ()
        (p, m, v), _ = jax.lax.scan(body, (p, m, v), jnp.arange(STEPS))
        return jnp.sum(p) + jnp.sum(m) + jnp.sum(v)

    def clock(fn, *args):
        out = fn(*args)                       # compile
        float(np.asarray(out))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(*args)
            float(np.asarray(out))
            best = min(best, time.perf_counter() - t0)
        return best / STEPS

    t_tree = clock(run_tree, stacked, state, grads)
    t_flat = clock(run_flat, flat, mflat, vflat, gflat)
    bw = 7 * n_params * 4  # p,m,v read+write + g read, f32 bytes/step
    print(f"per-leaf tree update: {t_tree*1e3:.2f} ms/step "
          f"({bw/t_tree/1e9:.0f} GB/s effective)")
    print(f"flat-buffer update:   {t_flat*1e3:.2f} ms/step "
          f"({bw/t_flat/1e9:.0f} GB/s effective)")
    print(f"consolidation ceiling: {(t_tree-t_flat)*1e3:.2f} ms/step "
          f"({100*(t_tree-t_flat)/t_tree:.1f}% of optimizer time)")


if __name__ == "__main__":
    main()
