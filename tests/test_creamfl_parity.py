"""CreamFL numerics parity vs independently-written torch twins.

Covers the three CreamFL-specific compute paths end-to-end at the
optimizer-trajectory level (the FedAvg-side task epochs are covered by
test_training_parity.py):

* the uni-modal public contrastive pass — MOON pos/neg term + inter-modal
  CE at temperature 0.5, grad-clip 2 (creamflclient.py:146-237);
* the multimodal public contrastive pass — intra pos/neg over both
  modalities + both-direction inter CE (creamflclient.py:191-233);
* the server KD distillation — fresh AdamW(p_lr) every round with torch's
  DEFAULT weight_decay 0.01 (creamflserver.py:303), MSE of the
  ``code_sim`` token-summed rtv sequence features (creamflserver.py:
  306-336), grad-clip 2;
* the contrastive-weighted public feature aggregation
  (creamflserver.py:369-402).

A parity note on the public-embed representation: the reference's
``_generate_public_logit`` (creamflserver.py:140-156) calls the mm model
WITHOUT ``feat_out``, whose rtv head L2-normalises the FULL sequence
(mome.py:651-659) — a 3D [N_pub, N_tok, D] tensor that every downstream
client matmul (``im_feature @ global_txt_feature.T``,
creamflclient.py:163) and the server aggregation matmul
(creamflserver.py:373) would crash on (torch.matmul of [B, D] with the
reversed-dim [D, N_tok, N_pub] has no valid contraction).  The only
runnable reading — and the one implemented — is ``feat_out=True``
(2D CLS features) for the global pub embed, while the distillation keeps
the literal 3D-token-sum semantics its ``code_sim`` explicitly handles.
The twins here implement that runnable reading.
"""

import copy
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fedcola_tpu.federation.creamfl import CreamflServer, PUB_TEMPERATURE
from fedcola_tpu.models.mat import init_mat
from fedcola_tpu.parallel.client_update import GroupSpec
from fedcola_tpu.parallel.optim import OptimizerSpec, init_opt_state

from test_training_parity import (D, IMG, L, NC, V, TorchTwinMAT,
                                  _assert_trees_close, _copy_from_jax,
                                  _make_cfg, _twin_tree)

P = 20            # public-set size
PUB_B = 8         # pub batch size -> batches of 8, 8, 4 (last one padded)
LR = 1e-3
W = 1.0           # --interintra_weight
KD = 0.1          # --kd_weight
P_LR = 1e-3       # --p_lr
PASSES = 2        # two passes over the pub set (2 epochs' pub phases)


class SeqTwin(TorchTwinMAT):
    """Adds the rtv head's literal no-feat_out output: the full sequence
    with every token L2-normalised (RetrievalHead over ``feats[i]``,
    mome.py:651-659)."""

    def forward_seq(self, inputs):
        outs = [None] * len(self.modalities)
        for i, m in enumerate(self.modalities):
            if m is None or inputs[i] is None:
                continue
            h = self._embed(i, inputs[i])
            for blk in self.blockses[i]:
                h = blk(h)
            h = self.norm(h)
            outs[i] = h / h.norm(dim=-1, keepdim=True)
        return outs


def _mini_server(model_cfgs, specs, mm_dataset=None, **cfg_kw):
    """A CreamflServer stand-in carrying exactly what the jitted-program
    builders read (cfg knobs, model cfgs, group specs, opt spec) — the
    builders themselves are the production methods."""
    srv = object.__new__(CreamflServer)
    base = dict(interintra_weight=W, no_mm_contrastive=False,
                kd_weight=KD, p_lr=P_LR)
    base.update(cfg_kw)
    srv.cfg = types.SimpleNamespace(**base)
    srv.model_cfgs = model_cfgs
    srv.opt_spec = OptimizerSpec(name="AdamW", weight_decay=0.0)
    srv._group_spec = lambda ds: specs[ds]
    if mm_dataset is not None:
        srv.mm_dataset = mm_dataset
    return srv


def _pub_fixture(seed=0, with_img=True):
    """Shared inputs: global pub features + pub batches (last one short)."""
    rng = np.random.RandomState(seed)
    g_img = rng.randn(P, D).astype(np.float32)
    g_txt = rng.randn(P, D).astype(np.float32)
    g_img /= np.linalg.norm(g_img, axis=-1, keepdims=True)
    g_txt /= np.linalg.norm(g_txt, axis=-1, keepdims=True)
    imgs = rng.randint(0, 256, (P, IMG, IMG, 3)).astype(np.uint8) \
        if with_img else np.zeros((P, IMG, IMG, 3), np.uint8)
    txts = rng.randint(0, V, (P, L)).astype(np.int32)
    batches = []
    for s in range(0, P, PUB_B):
        e = min(s + PUB_B, P)
        sel = np.concatenate([np.arange(s, e),
                              np.full((PUB_B - (e - s),), s)]).astype(int)
        valid = np.zeros((PUB_B,), bool)
        valid[:e - s] = True
        batches.append({"img": imgs[sel], "txt": txts[sel],
                        "didx": sel.astype(np.int32), "valid": valid})
    return g_img, g_txt, batches


def _run_pub_ours(srv, ds, cfg, params, batches, g_img, g_txt):
    """Drive the production vmapped pub step for a 1-client stack."""
    pub_fn = srv._build_pub_update(ds)
    stacked = jax.tree_util.tree_map(lambda x: x[None] + 0, params)
    ostate = init_opt_state(srv.opt_spec, stacked, n_clients=1)
    for p in range(PASSES):
        for j, b in enumerate(batches):
            rngs = jax.random.split(jax.random.PRNGKey(100 + p * 10 + j), 1)
            stacked, ostate, _ = pub_fn(
                stacked, ostate, params, jax.device_put(b),
                jnp.asarray(g_img), jnp.asarray(g_txt), rngs,
                jnp.float32(LR))
    return stacked


def _torch_pub_batches(batches):
    for b in batches:
        n = int(b["valid"].sum())
        yield (torch.tensor(b["img"][:n].astype(np.float32) / 255.0
                            ).permute(0, 3, 1, 2),
               torch.tensor(b["txt"][:n].astype(np.int64)),
               torch.tensor(b["didx"][:n].astype(np.int64)))


def test_unimodal_pub_contrastive_matches_torch():
    """txt client public pass: MOON + inter CE, temp 0.5, clip 2, shared
    optimizer moments across steps (creamflclient.py:146-190)."""
    cfg = _make_cfg(modalities=(None, "txt"), tasks=(None, "cls"),
                    num_classes=(None, NC), depth=2)
    params = init_mat(cfg, jax.random.PRNGKey(5))
    g_img, g_txt, batches = _pub_fixture(seed=1, with_img=False)
    spec = GroupSpec(modality="txt", criterion="CrossEntropyLoss")
    srv = _mini_server({"AG_NEWS": cfg}, {"AG_NEWS": spec})
    ours = _run_pub_ours(srv, "AG_NEWS", cfg, params, batches, g_img, g_txt)

    twin = SeqTwin(cfg.modalities, cfg.tasks, depth=2)
    _copy_from_jax(twin, cfg, params)
    old = copy.deepcopy(twin)
    old.eval()
    gi, gt = torch.tensor(g_img), torch.tensor(g_txt)
    opt = torch.optim.AdamW([p for p in twin.parameters()
                             if p.requires_grad], lr=LR, weight_decay=0.0)
    ce = torch.nn.CrossEntropyLoss()
    for _ in range(PASSES):
        for _, txt, didx in _torch_pub_batches(batches):
            opt.zero_grad()
            f = twin([None, txt], feat_out=True)[1]
            with torch.no_grad():
                f_old = old([None, txt], feat_out=True)[1]
            target = gt[didx]
            loss_inter = ce(f @ gi.T / PUB_TEMPERATURE, didx)
            pos = (f * target).sum(-1, keepdim=True)
            neg = (f * f_old).sum(-1, keepdim=True)
            logits = torch.cat([pos, neg], 1) / PUB_TEMPERATURE
            loss_moon = ce(logits, torch.zeros(f.shape[0], dtype=torch.long))
            loss = (loss_moon + loss_inter) * W
            loss.backward()
            torch.nn.utils.clip_grad_norm_(twin.parameters(), 2)
            opt.step()
    _assert_trees_close(ours, _twin_tree(twin, cfg))


def test_mm_pub_contrastive_matches_torch():
    """img+txt client public pass: two-modality intra pos/neg +
    both-direction inter CE (creamflclient.py:191-233)."""
    cfg = _make_cfg(modalities=("img", "txt"), tasks=("rtv", "rtv"),
                    num_classes=(None, None), depth=2)
    params = init_mat(cfg, jax.random.PRNGKey(6))
    g_img, g_txt, batches = _pub_fixture(seed=2)
    spec = GroupSpec(modality="img+txt", criterion="ContrastiveLoss")
    srv = _mini_server({"Coco": cfg}, {"Coco": spec})
    ours = _run_pub_ours(srv, "Coco", cfg, params, batches, g_img, g_txt)

    twin = SeqTwin(cfg.modalities, cfg.tasks, depth=2)
    _copy_from_jax(twin, cfg, params)
    old = copy.deepcopy(twin)
    old.eval()
    gi, gt = torch.tensor(g_img), torch.tensor(g_txt)
    opt = torch.optim.AdamW([p for p in twin.parameters()
                             if p.requires_grad], lr=LR, weight_decay=0.0)
    ce = torch.nn.CrossEntropyLoss()
    for _ in range(PASSES):
        for img, txt, didx in _torch_pub_batches(batches):
            opt.zero_grad()
            fi, ft = twin([img, txt], feat_out=True)
            with torch.no_grad():
                oi, ot = old([img, txt], feat_out=True)
            pos_i = (fi * gi[didx]).sum(-1, keepdim=True)
            pos_t = (ft * gt[didx]).sum(-1, keepdim=True)
            neg_i = (fi * oi).sum(-1, keepdim=True)
            neg_t = (ft * ot).sum(-1, keepdim=True)
            logits = torch.cat([torch.cat([pos_i, neg_i], 1),
                                torch.cat([pos_t, neg_t], 1)], 0) \
                / PUB_TEMPERATURE
            loss_intra = ce(logits,
                            torch.zeros(logits.shape[0], dtype=torch.long))
            loss_inter = ce(fi @ gt.T / PUB_TEMPERATURE, didx) \
                + ce(ft @ gi.T / PUB_TEMPERATURE, didx)
            loss = (loss_intra + loss_inter) * W
            loss.backward()
            torch.nn.utils.clip_grad_norm_(twin.parameters(), 2)
            opt.step()
    _assert_trees_close(ours, _twin_tree(twin, cfg))


def test_distill_matches_torch():
    """Server KD: fresh AdamW at --p_lr with torch's default
    weight_decay=0.01 (creamflserver.py:303), code_sim = MSE of the
    token-summed per-token-normalised rtv sequence features
    (creamflserver.py:306-336), clip 2."""
    cfg = _make_cfg(modalities=("img", "txt"), tasks=("rtv", "rtv"),
                    num_classes=(None, None), depth=2)
    params = init_mat(cfg, jax.random.PRNGKey(7))
    rng = np.random.RandomState(3)
    ti_all = rng.randn(P, D).astype(np.float32)
    tt_all = rng.randn(P, D).astype(np.float32)
    _, _, batches = _pub_fixture(seed=3)
    spec = GroupSpec(modality="img+txt", criterion="ContrastiveLoss")
    srv = _mini_server({"Coco": cfg}, {"Coco": spec}, mm_dataset="Coco")

    opt, step = srv._build_distill_step()
    assert opt.weight_decay == 0.01  # torch.optim.AdamW default
    p_ours = params
    ostate = init_opt_state(opt, p_ours)
    for j, b in enumerate(batches):
        ti = jnp.asarray(ti_all[b["didx"]])
        tt = jnp.asarray(tt_all[b["didx"]])
        p_ours, ostate, _ = step(p_ours, ostate, jax.device_put(b), ti, tt,
                                 jax.random.PRNGKey(200 + j))

    twin = SeqTwin(cfg.modalities, cfg.tasks, depth=2)
    _copy_from_jax(twin, cfg, params)
    opt_t = torch.optim.AdamW([p for p in twin.parameters()
                               if p.requires_grad], lr=P_LR)  # wd=0.01
    mse = torch.nn.MSELoss()
    for img, txt, didx in _torch_pub_batches(batches):
        opt_t.zero_grad()
        si, st = twin.forward_seq([img, txt])
        out_i, out_t = si.sum(dim=1), st.sum(dim=1)
        loss = KD * (mse(out_i, torch.tensor(ti_all)[didx])
                     + mse(out_t, torch.tensor(tt_all)[didx]))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(twin.parameters(), 2)
        opt_t.step()
    stacked = jax.tree_util.tree_map(lambda x: x[None], p_ours)
    _assert_trees_close(stacked, _twin_tree(twin, cfg))


def test_contrastive_weighted_aggregation_matches_torch():
    """Feature aggregation: per-client diagonal log-prob -> softmax over
    clients -> weighted sum (creamflserver.py:369-402)."""
    rng = np.random.RandomState(4)
    n_cl = 3
    vecs = rng.randn(n_cl, P, D).astype(np.float32)
    g_other = rng.randn(P, D).astype(np.float32)
    ours = np.asarray(CreamflServer._contrastive_weighted(
        jnp.asarray(vecs), jnp.asarray(g_other)))

    tv = [torch.tensor(v) for v in vecs]
    go = torch.tensor(g_other)
    ws = []
    for vec in tv:
        logits = vec @ go.T
        log_prob = logits - torch.log(torch.exp(logits).sum(1, keepdim=True))
        ws.append(torch.diagonal(log_prob).reshape(1, -1))
    w = torch.softmax(torch.cat(ws, 0), dim=0)
    want = sum((tv[i] * w[i].reshape(-1, 1)).unsqueeze(0)
               for i in range(n_cl)).sum(0)
    np.testing.assert_allclose(ours, want.numpy(), rtol=2e-5, atol=2e-6)
