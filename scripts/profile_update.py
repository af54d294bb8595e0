"""Profile the batched client-update hot path on the real TPU.

Captures a jax.profiler trace of a few steady-state update steps at the
bench shape and prints the top device ops by self-time, so kernel tuning
targets facts instead of guesses.

Usage: python scripts/profile_update.py [outdir]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_trace(outdir: str):
    import jax
    import jax.numpy as jnp
    # persistent compile cache shared with bench.py (the unrolled
    # production program takes minutes to compile cold)
    from fedcola_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from fedcola_tpu.models.mat import MATConfig, init_mat
    from fedcola_tpu.parallel.client_update import GroupSpec, build_group_update
    from fedcola_tpu.parallel.optim import OptimizerSpec, init_opt_state

    n, S, B = 2, 4, 96
    cfg = MATConfig(modalities=("img", "txt"), tasks=("rtv", "rtv"),
                    num_classes=(None, None), img_size=224, patch_size=16,
                    embed_dim=384, depth=12, num_heads=6,
                    vocab_size=30522, max_text_len=40,
                    use_pallas=True, use_fused_mlp=True,
                    compute_dtype="bfloat16", scan_unroll=12)
    spec = GroupSpec(modality="img+txt", criterion="ContrastiveLoss",
                     imnorm=True)
    opt = OptimizerSpec(name="AdamW")
    rng = np.random.RandomState(0)
    chunk = {
        "x": rng.randint(0, 255, (n, S, B, 224, 224, 3)).astype(np.uint8),
        "y": rng.randint(5, 30522, (n, S, B, 40)).astype(np.int32),
        "valid": np.ones((n, S, B), bool),
        "step_valid": np.ones((n, S), bool),
    }
    params = init_mat(cfg, jax.random.PRNGKey(0))
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n,) + x.shape) + 0, params)
    opt_state = init_opt_state(opt, stacked, n)
    update = build_group_update(cfg, spec, opt, None)
    rngs = jax.random.split(jax.random.PRNGKey(1), n)
    lr = jnp.float32(1e-4)
    chunk = jax.device_put(chunk)

    # compile + warmup
    stacked, opt_state, out = update(stacked, opt_state, chunk, rngs, lr, params)
    np.asarray(out[0])
    import time
    t0 = time.perf_counter()
    jax.profiler.start_trace(outdir)
    for _ in range(2):
        stacked, opt_state, out = update(stacked, opt_state, chunk, rngs,
                                         lr, params)
    np.asarray(out[0])
    jax.profiler.stop_trace()
    dt = time.perf_counter() - t0
    print(f"traced 2 chunks ({2*n*S*B} samples) in {dt:.3f}s "
          f"= {2*n*S*B/dt:.1f} samples/s", file=sys.stderr)


def analyze(outdir: str, top: int = 40):
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace found under", outdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find TPU device-op track(s): pids whose process_name mentions TPU
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, nm in pid_name.items()
                if "TPU" in nm or "/device:" in nm}
    import re as _re
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_name.get((e["pid"], e["tid"]), "")
        if "step" in tname.lower():
            continue  # step track duplicates op track
        name = e["name"]
        if name.startswith(("jit_", "while")):
            continue  # outer program frames double-count their children
        dur = e.get("dur", 0) / 1e6
        # aggregate instances: strip trailing .N / _N suffixes so the 12
        # per-layer copies of each named pallas kernel sum into one row
        name = _re.sub(r"[._]\d+$", "", name)
        by_op[name] += dur
        total += dur
    print(f"trace: {path}")
    print(f"total device op time: {total:.4f}s across {len(by_op)} op names")
    for name, t in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{t*1e3:10.2f} ms  {100*t/max(total,1e-9):5.1f}%  {name[:120]}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    if os.environ.get("ANALYZE_ONLY") != "1":
        run_trace(outdir)
    analyze(outdir)
