"""FedOpt tuning grid (VERDICT r4 item 4): find a CONVERGING datapoint.

Round 4 showed the FedOpt family executing the exact upstream recurrences
but only *failing* as evidence: ``--server_lr 0.1`` diverges and 0.01 is
stable-but-chance at 10 rounds (BENCH_NOTES "Round-4 FedOpt evidence
runs").  The FedOpt paper (Reddi et al. 2021) resolves exactly this with
a per-workload grid over (server lr, tau, beta1) — reference semantics
src/algorithm/fedadam.py:7-62.  This script runs that grid on the
path-backed 1000-image COCO fixture (the round-3/4 evidence workload,
where plain fedavg reaches r@1sum 0.61 by round 5): fedadam x
server_lr {0.3, 0.1, 0.03, 0.01} x tau {1e-3, 1e-2} x beta1 {0, 0.9},
10 rounds each, one process (shared jit cache), recording r@1sum at
rounds 5/10 plus the uni-modal eval trajectories.

Writes docs/evidence/fedcola_fedopt_grid_v5e.json (see docs/evidence/
README.md) and prints one summary line per combo.

Usage: python scripts/fedopt_grid.py [--rounds 10] [--out PATH]
"""

import argparse
import gc
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fedcola_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from fedcola_tpu.config import ExperimentConfig, check_args
from fedcola_tpu.data.fixtures import (agnews_fixture, cifar100_fixture,
                                       coco_fixture)
from fedcola_tpu.data.loaders import load_federated_data
from fedcola_tpu.federation.server import create_server

logging.basicConfig(level=logging.WARNING)


def base_kwargs(croot, iroot, troot, R, **over):
    kw = dict(
        exp_name="fedopt_grid", seed=1, multi_task=True,
        datasets=["CIFAR100", "AG_NEWS", "Coco", "Coco"],
        modalities=["img", "txt", "img+txt", "img+txt"],
        data_paths=[iroot, troot, croot, croot],
        Ks=[12, 12, 8], Cs=[0.25], K=32, test_size=-1,
        split_type="diri", cncntrtn=0.5,
        model_name="mome_small_patch16", resize=224, imnorm=True,
        eval_type="global", eval_every=5, eval_metrics=["acc1"],
        R=R, E=5, B=96, optimizer="AdamW", lr=1e-4, lr_decay=0.99,
        lr_decay_step=1, criterion="CrossEntropyLoss",
        use_bert_tokenizer=True, seq_len=40,
        shared_param="attn", share_scope="modality", colearn_param="none",
        compensation=True, with_aux=True, aux_trained=True,
        equal_sampled=True, eval_batch_size=512,
        result_path="/tmp/fedopt_grid/result",
        log_path="/tmp/fedopt_grid/log")
    kw.update(over)
    return kw


def run_combo(data, kw):
    cfg = check_args(ExperimentConfig(**kw))
    server = create_server(cfg, data)
    t0 = time.time()
    evals = {}
    for r in range(1, cfg.R + 1):
        server.round = r
        server.update()
        if r % cfg.eval_every == 0 or r == cfg.R:
            server.evaluate([])
            res = server.results[r]
            rec = {}
            mm = res.get("server_evaluated_Coco")
            if mm:
                rec["r@1sum"] = mm.get("Coco r@1sum")
            for ds in ("CIFAR100", "AG_NEWS"):
                u = res.get(f"server_evaluated_{ds}")
                if u:
                    rec[f"{ds}_acc1"] = u["metrics"].get("acc1")
                    rec[f"{ds}_loss"] = u.get("loss")
            evals[r] = rec
    wall = time.time() - t0
    del server
    gc.collect()
    return evals, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--out", type=str,
                    default="docs/evidence/fedcola_fedopt_grid_v5e.json")
    ap.add_argument("--smoke", action="store_true",
                    help="CPU smoke: toy model/fixtures, 2-combo grid")
    ap.add_argument("--fedavg-baseline", action="store_true",
                    help="run ONE plain-fedavg combo on the identical "
                         "workload and append it to --out as the "
                         "apples-to-apples baseline row")
    ap.add_argument("--combo", nargs=3, type=float, metavar=("SLR", "TAU", "B1"),
                    help="run ONE combo (e.g. --combo 0.01 1e-2 0 "
                         "--rounds 30) and append it to --out under "
                         "'extended_runs'")
    ap.add_argument("--combo-algorithm", default="fedadam",
                    choices=["fedadam", "fedyogi", "fedadagrad", "fedavgm"],
                    help="server optimizer for --combo (default fedadam)")
    args = ap.parse_args()

    smoke = {}
    if args.smoke:
        croot = coco_fixture("/tmp/fedopt_smoke/coco", 50, 20, 32)
        iroot = cifar100_fixture("/tmp/fedopt_smoke/cifar", 400, 100)
        troot = agnews_fixture("/tmp/fedopt_smoke/agnews", 400, 100)
        smoke = dict(model_name="mome_test_patch16_32", resize=32,
                     imnorm=False, B=16, E=1, seq_len=12,
                     eval_batch_size=64, use_pallas=False,
                     compute_dtype="float32", Ks=[2, 2, 2], K=6,
                     Cs=[1.0], eval_every=2)
    else:
        croot = coco_fixture("/tmp/fedcola_bench_coco/1000_250_224",
                             1000, 250, 224)
        iroot = cifar100_fixture("/tmp/fedcola_cifar_fx_small", 4800, 1000)
        troot = agnews_fixture("/tmp/fedcola_agnews_fx_small", 4800, 1000)

    kw0 = base_kwargs(croot, iroot, troot, args.rounds, **smoke)
    data = load_federated_data(check_args(ExperimentConfig(**kw0)),
                               np.random.RandomState(1))

    if args.combo:
        slr, tau, b1 = args.combo
        algo = args.combo_algorithm
        kw = base_kwargs(croot, iroot, troot, args.rounds, **smoke,
                         algorithm=algo, server_lr=slr,
                         server_tau=tau, beta1=b1,
                         exp_name=f"grid_ext_{algo}_slr{slr}_tau{tau}_b1{b1}")
        evals, wall = run_combo(data, kw)
        with open(args.out) as f:
            out = json.load(f)
        out.setdefault("extended_runs", []).append(
            {"algorithm": algo, "server_lr": slr, "tau": tau, "beta1": b1,
             "rounds": args.rounds, "wall_s": round(wall, 1),
             "evals": evals})
        last = evals.get(args.rounds, {})
        print(f"[grid] extended {algo} slr={slr} tau={tau} b1={b1} "
              f"R={args.rounds}: r@1sum@r{args.rounds}="
              f"{last.get('r@1sum')} cifar={last.get('CIFAR100_acc1')} "
              f"agnews={last.get('AG_NEWS_acc1')} ({wall:.0f}s)",
              flush=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        return

    if args.fedavg_baseline:
        # Same fixtures, same rounds, plain fedavg — the comparison row
        # the fedadam grid is judged against.  Appends into --out.
        kw = base_kwargs(croot, iroot, troot, args.rounds, **smoke,
                         exp_name="grid_fedavg_baseline")
        evals, wall = run_combo(data, kw)
        with open(args.out) as f:
            out = json.load(f)
        rec = {"wall_s": round(wall, 1), "evals": evals}
        if "fedavg_baseline" in out:   # keep the first; extras keyed by R
            out.setdefault("extended_runs", []).append(
                dict(algorithm="fedavg", rounds=args.rounds, **rec))
        else:
            out["fedavg_baseline"] = rec
        last = evals.get(args.rounds, {})
        print(f"[grid] fedavg baseline: "
              f"r@1sum@r{args.rounds}={last.get('r@1sum')} "
              f"cifar={last.get('CIFAR100_acc1')} "
              f"agnews={last.get('AG_NEWS_acc1')} ({wall:.0f}s)",
              flush=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        return

    out = {"workload": "coco.sh FedCola line, 1000-image path-backed "
                       "fixture + grid-sized learnable cls fixtures",
           "grid": "fedadam x server_lr {0.3,0.1,0.03,0.01} x "
                   "tau {1e-3,1e-2} x beta1 {0,0.9}",
           "reference_point": "plain fedavg r@1sum 0.61 @ r5 on this "
                              "fixture (BENCH_NOTES round-3)",
           "runs": []}
    combos = [(slr, tau, b1)
              for slr in (0.3, 0.1, 0.03, 0.01)
              for tau in (1e-3, 1e-2)
              for b1 in (0.0, 0.9)]
    if args.smoke:
        combos = combos[:2]
    for slr, tau, b1 in combos:
                kw = base_kwargs(
                    croot, iroot, troot, args.rounds,
                    algorithm="fedadam", server_lr=slr, server_tau=tau,
                    beta1=b1, **smoke,
                    exp_name=f"grid_slr{slr}_tau{tau}_b1{b1}")
                evals, wall = run_combo(data, kw)
                rec = {"server_lr": slr, "tau": tau, "beta1": b1,
                       "wall_s": round(wall, 1), "evals": evals}
                out["runs"].append(rec)
                last = evals.get(args.rounds, {})
                print(f"[grid] slr={slr} tau={tau} b1={b1}: "
                      f"r@1sum@r{args.rounds}={last.get('r@1sum')} "
                      f"cifar={last.get('CIFAR100_acc1')} "
                      f"agnews={last.get('AG_NEWS_acc1')} "
                      f"({wall:.0f}s)", flush=True)
                with open(args.out, "w") as f:     # checkpoint as we go
                    json.dump(out, f, indent=1)
    print(f"[grid] wrote {args.out}")


if __name__ == "__main__":
    main()
