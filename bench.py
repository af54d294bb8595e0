"""Benchmark: client-update throughput on the flagship config.

Measures samples/sec/chip for the hot path of a FedCola round — multimodal
(img+txt) client local updates on the ViT-small MAT with the scripts/coco.sh
shape (B=96, 224px images, 40-token captions, AdamW, contrastive loss).

Two execution models on identical hardware:
* **ours**: batched clients (vmapped+scanned local updates), bf16 compute,
  fused Pallas attention, remat — the TPU-native architecture;
* **baseline**: a faithful JAX re-creation of the reference's execution
  model — clients trained one-at-a-time (thread-pool semantics,
  fedavgserver.py:536-589), fp32 end-to-end, unfused XLA attention.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "samples/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _make_chunk(rng, n, S, B, img=224, L=40, V=30522):
    return {
        "x": rng.randint(0, 255, (n, S, B, img, img, 3)).astype(np.uint8),
        "y": rng.randint(5, V, (n, S, B, L)).astype(np.int32),
        "valid": np.ones((n, S, B), bool),
        "step_valid": np.ones((n, S), bool),
    }


def _time_chunks(update_fn, stacked, opt_state, chunks, rngs, lr, gp):
    """Times steady-state device execution: chunks are staged into HBM
    before the clock starts (the production feeder overlaps staging with
    compute via its prefetch thread)."""
    import jax
    import numpy as np
    chunks = [jax.device_put(c) for c in chunks]
    jax.block_until_ready(chunks)
    # warmup/compile; the scalar host readback forces true synchronization
    # (the axon relay's buffer-ready events are optimistic, so
    # block_until_ready alone under-measures)
    stacked, opt_state, out = update_fn(stacked, opt_state, chunks[0], rngs,
                                        lr, gp)
    np.asarray(out[0])
    t0 = time.perf_counter()
    for ch in chunks[1:]:
        stacked, opt_state, out = update_fn(stacked, opt_state, ch, rngs,
                                            lr, gp)
    np.asarray(out[0])
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp
    from fedcola_tpu.models.mat import MATConfig, init_mat
    from fedcola_tpu.parallel.client_update import GroupSpec, build_group_update
    from fedcola_tpu.parallel.optim import OptimizerSpec, init_opt_state

    on_tpu = jax.default_backend() == "tpu"
    n_clients, S, B = 2, 4, 96
    n_timed_chunks = 3
    if not on_tpu:  # CPU smoke: shrink everything
        n_clients, S, B, n_timed_chunks = 2, 2, 4, 1

    base = dict(modalities=("img", "txt"), tasks=("rtv", "rtv"),
                num_classes=(None, None), img_size=224, patch_size=16,
                embed_dim=384, depth=12, num_heads=6,
                vocab_size=30522, max_text_len=40)
    if not on_tpu:
        base.update(img_size=32, embed_dim=16, depth=2, num_heads=2,
                    vocab_size=64, max_text_len=8)

    # measured on v5e (n=2, B=96): the fused attention-sublayer
    # (LN1+qkv+attn+proj) + fused MLP Pallas kernels reach 1629 samples/s
    # vs 1031 pure-XLA bf16 and 1047 reference-style fp32 (full remat
    # beats dots_saveable / save_attn policies in this HBM-bound regime).
    cfg_fast = MATConfig(use_pallas=on_tpu, use_fused_mlp=on_tpu,
                         compute_dtype="bfloat16", **base)
    cfg_ref = MATConfig(use_pallas=False, compute_dtype="float32",
                        remat_policy="full", **base)
    spec = GroupSpec(modality="img+txt", criterion="ContrastiveLoss",
                     imnorm=True)
    opt = OptimizerSpec(name="AdamW")
    lr = jnp.float32(1e-4)
    rng = np.random.RandomState(0)
    L = base["max_text_len"]; V = base["vocab_size"]; IMG = base["img_size"]

    chunks = [_make_chunk(rng, n_clients, S, B, IMG, L, V)
              for _ in range(n_timed_chunks + 1)]

    # ---- ours: batched clients, bf16 + pallas ----
    params = init_mat(cfg_fast, jax.random.PRNGKey(0))
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_clients,) + x.shape) + 0, params)
    opt_state = init_opt_state(opt, stacked)
    opt_state["t"] = jnp.zeros((n_clients,), jnp.int32)
    update_fast = build_group_update(cfg_fast, spec, opt, None)
    rngs = jax.random.split(jax.random.PRNGKey(1), n_clients)
    t_fast = _time_chunks(update_fast, stacked, opt_state, chunks, rngs,
                          lr, params)
    samples = n_clients * S * B * n_timed_chunks
    ours = samples / t_fast

    # ---- baseline: sequential clients, fp32, unfused ----
    params_ref = init_mat(cfg_ref, jax.random.PRNGKey(0))
    update_ref = build_group_update(cfg_ref, spec, opt, None)
    t_ref_total = 0.0
    for c in range(n_clients):
        p1 = jax.tree_util.tree_map(lambda x: x[None] + 0, params_ref)
        o1 = init_opt_state(opt, p1)
        o1["t"] = jnp.zeros((1,), jnp.int32)
        sub_chunks = [{k: v[c:c + 1] for k, v in ch.items()} for ch in chunks]
        r1 = jax.random.split(jax.random.PRNGKey(2 + c), 1)
        t_ref_total += _time_chunks(update_ref, p1, o1, sub_chunks, r1,
                                    lr, params_ref)
    ref = samples / t_ref_total

    print(json.dumps({
        "metric": "mm client-update samples/sec/chip "
                  "(ViT-small MAT, COCO shape B=96, batched+bf16+pallas "
                  "vs reference-style sequential fp32)",
        "value": round(ours, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(ours / ref, 3),
    }))
    print(f"[bench] ours={ours:.2f} baseline={ref:.2f} samples/s "
          f"(backend={jax.default_backend()}, n={n_clients}, B={B}, S={S})",
          file=sys.stderr)


if __name__ == "__main__":
    main()
