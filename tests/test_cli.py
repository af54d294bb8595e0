"""CLI driver smoke tests: main.py end-to-end with synthetic data,
checkpoint/resume, results JSON."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

ARGS = [
    "--exp_name", "cli_smoke", "--multi-task", "--seed", "3",
    "--datasets", "MedicalAbstracts", "MedicalAbstracts",
    "--modalities", "txt", "txt",
    "--Ks", "3", "--Cs", "1.0", "--test_size", "-1",
    "--split_type", "iid", "--model_name", "mome_test_patch16_32",
    "--algorithm", "fedavg", "--eval_type", "global",
    "--eval_every", "2", "--eval_metrics", "acc1",
    "--R", "2", "--E", "1", "--B", "16", "--optimizer", "AdamW",
    "--lr", "1e-3", "--criterion", "CrossEntropyLoss",
    "--seq_len", "12", "--vocab_size", "80", "--resize", "32",
    "--synthetic_data", "--no_pallas", "--compute_dtype", "float32",
    "--equal_sampled", "--eval_batch_size", "32",
    "--checkpoint_every", "1", "--mesh_shape", "1",
]


def _run(tmpdir, extra=()):
    env = dict(os.environ)
    env.update(PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    return subprocess.run(
        [sys.executable, "/root/repo/main.py", *ARGS,
         "--result_path", str(tmpdir / "result"),
         "--log_path", str(tmpdir / "log"), *extra],
        capture_output=True, text=True, env=env, timeout=600)


def test_main_cli_end_to_end(tmp_path):
    r = _run(tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    res = json.load(open(tmp_path / "result" / "cli_smoke.json"))
    assert "2" in res
    assert any(k.startswith("server_evaluated") for k in res["2"])
    # final checkpoint written
    ckpt = tmp_path / "result" / "cli_smoke" / "MedicalAbstracts.npz"
    assert ckpt.exists()
    z = np.load(ckpt)
    assert int(z["__round__"]) == 2
    # reference-format .pt state_dict alongside (fedavgserver.py:884-898)
    import torch
    sd = torch.load(tmp_path / "result" / "cli_smoke" /
                    "MedicalAbstracts.pt", weights_only=True)
    assert any(k.startswith("blockses.1.") for k in sd)
    assert any(k.startswith("embeddings.1.") for k in sd)

    # resume: a second invocation finds the per-round checkpoint at round 2
    # and has nothing left to do -> still exits cleanly and rewrites results
    r2 = _run(tmp_path)
    assert r2.returncode == 0, r2.stderr[-3000:]


def test_compensation_dataset_scope_rejected():
    """--compensation with share_scope dataset/task aggregates NOTHING in
    the reference (its compensation branch only assigns coefficients for
    all/modality/modality_exact, fedavgserver.py:640-651, and the
    accumulate loop skips unassigned names) — reject loudly.  CreamFL has
    its own all-scope compensation normaliser and is exempt."""
    import pytest
    from fedcola_tpu.config import parse_args

    base = ["--exp_name", "t", "--multi-task", "--datasets",
            "MedicalAbstracts", "MedicalAbstracts", "--modalities", "txt",
            "txt", "--Ks", "2", "--model_name", "mome_test_patch16_32",
            "--compensation"]
    with pytest.raises(ValueError, match="aggregates NOTHING"):
        parse_args(base + ["--share_scope", "dataset"])
    with pytest.raises(ValueError, match="aggregates NOTHING"):
        parse_args(base + ["--share_scope", "task"])
    parse_args(base + ["--share_scope", "modality"])          # fine
    parse_args(base + ["--share_scope", "dataset",
                       "--algorithm", "creamfl"])             # exempt


def test_fediot_applies_documented_sharing_alias():
    """FedIoT is defined by its sharing rule (reference README.md:70:
    shared_param=blocks, share_scope=modality_exact; the upstream fediot
    modules are missing so the name alone carries no behavior).  A bare
    --algorithm fediot must not silently run plain-FedAvg sharing;
    explicit non-default choices win over the alias."""
    from fedcola_tpu.config import parse_args

    base = ["--exp_name", "t", "--multi-task", "--datasets",
            "MedicalAbstracts", "MedicalAbstracts", "--modalities", "txt",
            "txt", "--Ks", "2", "--model_name", "mome_test_patch16_32",
            "--algorithm", "fediot"]
    cfg = parse_args(list(base))
    assert cfg.shared_param == "blocks"
    assert cfg.share_scope == "modality_exact"
    # explicit flags are honored (the canonical scripts pass them)
    cfg = parse_args(base + ["--shared_param", "attn",
                             "--share_scope", "modality"])
    assert cfg.shared_param == "attn"
    assert cfg.share_scope == "modality"
    # non-fediot algorithms keep their defaults
    cfg = parse_args([*base[:-1], "fedavg"])
    assert cfg.shared_param == "none"
    assert cfg.share_scope == "dataset"


def test_creamfl_requires_multimodal_dataset():
    """CreamFL's public plane trains the img+txt global model; a config
    without one must fail with a named error, not a StopIteration deep in
    server construction."""
    import pytest

    from fedcola_tpu.config import parse_args
    from fedcola_tpu.data.loaders import load_federated_data
    from fedcola_tpu.federation.server import create_server

    cfg = parse_args(
        ["--exp_name", "t", "--multi-task", "--datasets",
         "MedicalAbstracts", "MedicalAbstracts", "--modalities", "txt",
         "txt", "--Ks", "2", "--Cs", "1.0", "--model_name",
         "mome_test_patch16_32", "--algorithm", "creamfl",
         "--synthetic_data", "--no_pallas", "--compute_dtype", "float32",
         "--seq_len", "12", "--vocab_size", "80", "--R", "1",
         "--num_pub_samples", "10", "--pub_batch_size", "5"])
    data = load_federated_data(cfg, np.random.RandomState(cfg.seed))
    with pytest.raises(ValueError, match="img\\+txt client dataset"):
        create_server(cfg, data)
