"""Sweep perf-relevant config variants of the client-update hot path on the
real TPU and print samples/s for each.  Experiment harness for kernel and
remat tuning — not part of the framework API.

Usage: python scripts/perf_sweep.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(cfg_kw, n=2, S=4, B=96, chunks=3):
    import jax
    import jax.numpy as jnp
    from fedcola_tpu.models.mat import MATConfig, init_mat
    from fedcola_tpu.parallel.client_update import GroupSpec, build_group_update
    from fedcola_tpu.parallel.optim import OptimizerSpec, init_opt_state

    base = dict(modalities=("img", "txt"), tasks=("rtv", "rtv"),
                num_classes=(None, None), img_size=224, patch_size=16,
                embed_dim=384, depth=12, num_heads=6,
                vocab_size=30522, max_text_len=40,
                use_pallas=True, use_fused_mlp=True,
                compute_dtype="bfloat16")
    opt_kw = {k[4:]: v for k, v in cfg_kw.items() if k.startswith("opt_")}
    base.update({k: v for k, v in cfg_kw.items() if not k.startswith("opt_")})
    cfg = MATConfig(**base)
    spec = GroupSpec(modality="img+txt", criterion="ContrastiveLoss",
                     imnorm=True)
    opt = OptimizerSpec(name="AdamW", **opt_kw)
    rng = np.random.RandomState(0)
    mk = lambda: {
        "x": rng.randint(0, 255, (n, S, B, 224, 224, 3)).astype(np.uint8),
        "y": rng.randint(5, 30522, (n, S, B, 40)).astype(np.int32),
        "valid": np.ones((n, S, B), bool),
        "step_valid": np.ones((n, S), bool),
    }
    data = [jax.device_put(mk()) for _ in range(chunks + 1)]
    jax.block_until_ready(data)
    params = init_mat(cfg, jax.random.PRNGKey(0))
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n,) + x.shape) + 0, params)
    opt_state = init_opt_state(opt, stacked, n)
    update = build_group_update(cfg, spec, opt, None)
    rngs = jax.random.split(jax.random.PRNGKey(1), n)
    lr = jnp.float32(1e-4)
    stacked, opt_state, out = update(stacked, opt_state, data[0], rngs, lr,
                                     params)
    np.asarray(out[0])
    t0 = time.perf_counter()
    for ch in data[1:]:
        stacked, opt_state, out = update(stacked, opt_state, ch, rngs, lr,
                                         params)
    np.asarray(out[0])
    dt = time.perf_counter() - t0
    return n * S * B * chunks / dt


VARIANTS = {
    "base": {},
    "save_attn": {"remat_policy": "save_attn"},
    "noremat": {"remat": False},
    "nofuse_attn": {"use_pallas": False},
    "nofuse_mlp": {"use_fused_mlp": False},
    "bf16_moments": {"remat_policy": "save_attn", "opt_moment_dtype": "bfloat16"},
    "txt_xla_attn": {"remat_policy": "save_attn", "fused_attn_min_seq": 128},
    "unroll12": {"scan_unroll": 12},
    "unroll12_noremat": {"scan_unroll": 12, "remat": False},
    "unroll12_kernel": {"scan_unroll": 12, "remat_policy": "kernel"},
    "unroll12_lnmlp": {"scan_unroll": 12},  # LN-fused MLP now default in-code
    "unroll4": {"scan_unroll": 4},
    # scale-up probe: ViT-base tower (86M params; hd stays 64).  Runs the
    # FUSED kernels since round 3 (wide_compiler_params raises Mosaic's
    # scoped-VMEM check for D>512: 768.7 samples/s vs 486 on the old XLA
    # fallback).  n=1 — two stacked base clients OOM HBM at B=96 under
    # save_attn remat.  Run: perf_sweep.py vitbase
    "vitbase": {"embed_dim": 768, "num_heads": 12, "scan_unroll": 12,
                "drop_path_rate": 0.1},
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        if name.startswith("n="):            # client-stacking scaling probe
            n = int(name[2:])
            sps = measure({"scan_unroll": 12}, n=n)
            print(f"{name:16s} {sps:9.1f} samples/s ({sps/n:.1f}/client)",
                  flush=True)
            continue
        sps = measure(VARIANTS[name],
                      n=1 if name.startswith("vitbase") else 2)
        print(f"{name:16s} {sps:9.1f} samples/s", flush=True)
