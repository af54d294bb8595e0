"""CLI round driver — flag-compatible with the reference's ``main.py``
(reference main.py:17-53, 59-284): same flags, same round recipe
(R rounds of ``server.update()`` + ``server.evaluate`` every
``eval_every``), so the reference's ``scripts/coco.sh`` / ``scripts/
flickr.sh`` invocations run unmodified on this framework.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


class WandbWriter:
    """wandb-backed metrics writer (reference main.py:305, writer.log calls
    throughout fedavgserver.py).  Falls back to a JSONL file when wandb is
    unavailable or offline."""

    def __init__(self, cfg):
        self.cfg = cfg
        self._wandb = None
        if cfg.wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project="fedcola_tpu", name=cfg.exp_name,
                           config=vars(cfg) if not hasattr(cfg, "to_json")
                           else None)
            except Exception:
                self._wandb = None
        os.makedirs(cfg.result_path, exist_ok=True)
        self._jsonl = open(os.path.join(cfg.result_path,
                                        f"{cfg.exp_name}_metrics.jsonl"), "a")

    def log(self, payload, step):
        import json
        from fedcola_tpu.utils.logging import json_sanitize
        self._jsonl.write(json.dumps({"round": step, **{
            k: json_sanitize(float(v)) for k, v in payload.items()}}) + "\n")
        self._jsonl.flush()
        if self._wandb:
            self._wandb.log(payload, step=step)

    def finish(self):
        self._jsonl.close()
        if self._wandb:
            self._wandb.finish()


def main(argv=None):
    from fedcola_tpu.config import parse_args
    from fedcola_tpu.data.loaders import load_federated_data
    from fedcola_tpu.federation.server import create_server
    from fedcola_tpu.utils import set_logger, set_seed

    cfg = parse_args(argv)
    import jax
    if cfg.dist_coordinator is not None:
        # multi-host (DCN) scale-out: after this, jax.devices() spans
        # every participating host's chips and MeshPlan builds one global
        # mesh over them — the ICI/DCN collectives replace the host-side
        # exchange entirely (SURVEY.md §5; absent upstream).  Every host
        # runs this same driver with its own --dist_process_id.
        jax.distributed.initialize(
            coordinator_address=cfg.dist_coordinator,
            num_processes=cfg.dist_num_processes,
            process_id=cfg.dist_process_id)
    is_proc0 = jax.process_index() == 0
    if jax.process_count() > 1:
        # Multi-process topology (PARITY.md C1): every process runs this
        # same deterministic host program; batches stage via cross-process
        # device_put from identical host copies, sharded readbacks gather
        # through MeshPlan.to_host, and global params re-replicate after
        # aggregation so the process-0-gated side effects (metrics JSONL,
        # wandb, checkpoints, result JSON) can serialize locally.
        # Integration-tested at 2 processes x 2 CPU devices
        # (tests/test_multiprocess.py) — real pod-slice DCN runs remain
        # unexercised on this single-chip infrastructure.
        print("NOTE: multi-host mode verified at 2-process/CPU-mesh scale "
              "(tests/test_multiprocess.py); real DCN pod slices are "
              "untested on this infra (see PARITY.md)", file=sys.stderr)
    # persistent compile cache: the fully-unrolled production programs
    # take minutes to compile cold; repeat runs on the same machine reuse
    # them (config.update, not env — jax may already be imported)
    from fedcola_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    if cfg.detect_anomaly:
        # op-level NaN tracing, the jax analog of the reference's
        # torch.autograd.set_detect_anomaly(True) (main.py:307); the
        # always-on round-level loss-finiteness guard lives in
        # FedAvgServer._train_group
        jax.config.update("jax_debug_nans", True)
    os.makedirs(cfg.log_path, exist_ok=True)
    logger = set_logger(os.path.join(
        cfg.log_path, f"{cfg.exp_name}_{time.strftime('%y%m%d_%H%M%S')}.log"))
    logger.info("fedcola_tpu starting: %s", " ".join(sys.argv[1:]))
    set_seed(cfg.seed)

    data = load_federated_data(cfg, np.random.RandomState(cfg.seed))
    writer = WandbWriter(cfg) if is_proc0 else None
    server = create_server(cfg, data, writer)

    ckpt_dir = os.path.join(cfg.result_path, cfg.exp_name, "ckpt")
    if os.path.isdir(ckpt_dir):
        server.load_checkpoint(ckpt_dir)
        logger.info("resumed from checkpoint at round %d", server.round)
    if jax.process_count() > 1:
        # checkpoints are written by process 0 only; a restart where the
        # other hosts can't see them (result_path on host-local disk)
        # would silently resume process 0 at round N while the rest start
        # at round 1 — mismatched collective programs hang or corrupt.
        # Fail loudly instead.
        from jax.experimental import multihost_utils
        rounds = multihost_utils.process_allgather(
            np.int32(server.round))
        if int(rounds.min()) != int(rounds.max()):
            raise RuntimeError(
                f"multi-host resume mismatch: processes see checkpoints "
                f"at rounds {sorted(set(int(r) for r in rounds))} — "
                f"--result_path must be shared storage visible to every "
                f"host (each process loads {ckpt_dir})")

    from fedcola_tpu.utils.profiling import round_trace

    start = server.round + 1
    for r in range(start, cfg.R + 1):
        server.round = r
        do_trace = cfg.profile_every > 0 and r % cfg.profile_every == 0
        with round_trace(do_trace, cfg.log_path, r):
            server.update()
        if (cfg.eval_every > 0 and r % cfg.eval_every == 0) or (r == cfg.R):
            server.evaluate([])
        if cfg.checkpoint_every and r % cfg.checkpoint_every == 0 \
                and is_proc0:
            server.save_checkpoint(ckpt_dir)
    if is_proc0:
        server.finalize()


if __name__ == "__main__":
    main()
