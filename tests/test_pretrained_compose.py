"""--pretrained composed END-TO-END (VERDICT r4 missing item 2): the
canonical script lines all pass ``--pretrained`` (reference
scripts/coco.sh:13-17, applied via ``pretrain_vit``, mome.py:788-816).
The import machinery is bit-exact-tested in ``test_pretrained.py``; this
file runs it as a SYSTEM — a fixed local timm-layout checkpoint (env
hook) feeding server init, aux build, freeze windows, aggregation, aux
exchange, and checkpointing over real federated rounds."""

import numpy as np
import pytest

from fedcola_tpu.config import ExperimentConfig, check_args
from fedcola_tpu.data.loaders import load_federated_data
from fedcola_tpu.federation.server import create_server
from fedcola_tpu.models.pretrained import write_timm_vit_checkpoint


@pytest.fixture()
def ckpt(tmp_path, monkeypatch):
    path = write_timm_vit_checkpoint(
        str(tmp_path / "vit_test_patch16_32.npz"), embed_dim=8, depth=2,
        img_size=32, patch_size=16, seed=5)
    monkeypatch.setenv("FEDCOLA_PRETRAIN_VIT_TEST_PATCH16_32", path)
    return path


def _flagship_cfg(**kw):
    base = dict(
        exp_name="pretrain_e2e", seed=7, multi_task=True,
        datasets=["CIFAR100", "Coco", "Coco"],
        modalities=["img", "img+txt", "img+txt"],
        Ks=[2, 2], Cs=[1.0], K=4, R=2, E=1, B=8, eval_batch_size=32,
        optimizer="AdamW", lr=1e-3, criterion="CrossEntropyLoss",
        eval_type="global", eval_every=2, split_type="iid", test_size=-1,
        model_name="mome_test_patch16_32", resize=32, seq_len=8,
        vocab_size=80, synthetic_data=True, use_pallas=False,
        compute_dtype="float32", equal_sampled=True, mesh_shape=[1],
        pretrained=True, shared_param="attn", share_scope="modality",
        colearn_param="none", compensation=True, with_aux=True,
        aux_trained=True,
        # exercise the freeze window alongside the pretrained init
        freeze_modality="txt", freeze_rounds=1)
    base.update(kw)
    return check_args(ExperimentConfig(**base))


def test_pretrained_init_lands_in_every_model(ckpt):
    """Server init under --pretrained: every dataset model's img tower
    holds the checkpoint weights; uni-modal img models re-sync their aux
    slots from the loaded kernels (build_aux semantics, mome.py:768-786
    composed with pretrain_vit overwrite order)."""
    cfg = _flagship_cfg()
    data = load_federated_data(cfg, np.random.RandomState(0))
    server = create_server(cfg, data)
    sd = dict(np.load(ckpt))
    want_qkv = np.stack([sd[f"blocks.{j}.attn.qkv.weight"].T
                         for j in range(2)])
    for ds in ("CIFAR100", "Coco"):
        got = np.asarray(server.global_params[ds]["blk"]["0"]["qkv_kernel"])
        np.testing.assert_array_equal(got, want_qkv)
        emb = server.global_params[ds]["emb"]["0"]
        np.testing.assert_array_equal(np.asarray(emb["cls"]),
                                      sd["cls_token"])
    # CIFAR100 is uni-modal img with_aux: its aux kernels must equal the
    # PRETRAINED kernels (not the random init they were first copied from)
    aux = server.global_params["CIFAR100"]["aux"]
    np.testing.assert_array_equal(np.asarray(aux["qkv_aux"]), want_qkv)


def test_pretrained_flagship_rounds_run_and_train(ckpt, tmp_path):
    """Two full FedCola rounds from pretrained init: warm start composes
    with aux exchange, the txt freeze window, aggregation, eval, and the
    round checkpoint; losses stay finite and the img tower moves off the
    checkpoint (training actually updates the loaded weights)."""
    cfg = _flagship_cfg(result_path=str(tmp_path / "res"),
                        log_path=str(tmp_path / "log"))
    data = load_federated_data(cfg, np.random.RandomState(0))
    server = create_server(cfg, data)
    sd = dict(np.load(ckpt))
    want_qkv = np.stack([sd[f"blocks.{j}.attn.qkv.weight"].T
                         for j in range(2)])
    for r in range(1, cfg.R + 1):
        server.round = r
        server.update()
    server.evaluate([])
    res = server.results[cfg.R]
    for ds in ("CIFAR100", "Coco"):
        got = np.asarray(server.global_params[ds]["blk"]["0"]["qkv_kernel"])
        assert np.isfinite(got).all()
        assert not np.array_equal(got, want_qkv), \
            f"{ds} img tower never moved off the pretrained checkpoint"
    assert any(k.startswith("server_evaluated_") for k in res)
