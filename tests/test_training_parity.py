"""Training-dynamics parity: several AdamW steps on identical weights and
data must produce near-identical parameters in our batched JAX program and
an independently written torch twin of the reference's client loop
(fedavgclient.py:55-118).  This is the end-to-end numerics check behind the
'matched R@1' target (SURVEY.md §7 hard parts).

Coverage (one test per flagship path):
* text classification, depth 1 (the original twin) and depth 4 (scan /
  stacked-leaf semantics);
* image classification incl. Conv2d patchify + cls/pos embed
  (mome.py:578-611);
* img+txt CLIP-contrastive retrieval (fedavgclient.py:93-95);
* FedProx's proximal term (fedproxclient.py:64-67 — per-tensor L2 norms);
* a with_aux client: 3 steps training through the folded ``W + s*W_aux``
  reparam (mome.py:42-97, aux frozen / scales live), the upload fold-in
  (fedavgclient.py:158-184), and the server aux exchange
  (fedavgserver.py:821-845).
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fedcola_tpu.federation.aux import (exchange_aux_weights,
                                        fold_aux_into_upload)
from fedcola_tpu.models.mat import MATConfig, init_mat
from fedcola_tpu.parallel.client_update import GroupSpec, build_group_update
from fedcola_tpu.parallel.optim import OptimizerSpec, init_opt_state

D, H, L, V, NC = 8, 2, 6, 40, 3
B, STEPS = 4, 3
LR = 1e-3
IMG = 16          # twin image size (patch 8 -> 2x2 grid, N = 5 tokens)
PATCH = 8


class TorchTwin(torch.nn.Module):
    """Minimal text-classification MAT path written directly from the
    reference semantics (BertEmbeddings -> blocks -> norm -> cls head)."""

    def __init__(self):
        super().__init__()
        self.word = torch.nn.Parameter(torch.zeros(V, D))
        self.pos = torch.nn.Parameter(torch.zeros(L, D))
        self.tok = torch.nn.Parameter(torch.zeros(2, D))
        self.eln = torch.nn.LayerNorm(D, eps=1e-12)
        self.n1 = torch.nn.LayerNorm(D, eps=1e-5)
        self.qkv = torch.nn.Linear(D, 3 * D)
        self.proj = torch.nn.Linear(D, D)
        self.n2 = torch.nn.LayerNorm(D, eps=1e-5)
        self.fc1 = torch.nn.Linear(D, 4 * D)
        self.fc2 = torch.nn.Linear(4 * D, D)
        self.norm = torch.nn.LayerNorm(D, eps=1e-6)
        self.head = torch.nn.Linear(D, NC)

    def forward(self, ids):
        Bb, Ll = ids.shape
        x = self.word[ids] + self.pos[:Ll][None] + self.tok[0][None, None]
        x = self.eln(x)
        h = self.n1(x)
        qkv = self.qkv(h).reshape(Bb, Ll, 3, H, D // H).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (D // H) ** -0.5, qkv[1], qkv[2]
        attn = (q.float() @ k.float().transpose(-2, -1)).softmax(-1)
        a = (attn @ v).transpose(1, 2).reshape(Bb, Ll, D)
        x = x + self.proj(a)
        m = self.fc2(torch.nn.functional.gelu(self.fc1(self.n2(x))))
        x = x + m
        x = self.norm(x)
        return self.head(x[:, 0])


def test_adamw_training_matches_torch():
    cfg = MATConfig(modalities=(None, "txt"), tasks=(None, "cls"),
                    num_classes=(None, NC), embed_dim=D, depth=1,
                    num_heads=H, vocab_size=V, max_text_len=L, img_size=32,
                    drop_path_rate=0.0, use_pallas=False,
                    compute_dtype="float32")
    params = init_mat(cfg, jax.random.PRNGKey(0))

    twin = TorchTwin()
    with torch.no_grad():
        e = params["emb"]["1"]; b = params["blk"]["1"]
        twin.word.copy_(torch.tensor(np.asarray(e["word"])))
        twin.pos.copy_(torch.tensor(np.asarray(e["posemb"])))
        twin.tok.copy_(torch.tensor(np.asarray(e["toktype"])))
        twin.eln.weight.copy_(torch.tensor(np.asarray(e["ln_scale"])))
        twin.eln.bias.copy_(torch.tensor(np.asarray(e["ln_bias"])))
        twin.n1.weight.copy_(torch.tensor(np.asarray(b["norm1_scale"][0])))
        twin.n1.bias.copy_(torch.tensor(np.asarray(b["norm1_bias"][0])))
        twin.qkv.weight.copy_(torch.tensor(np.asarray(b["qkv_kernel"][0]).T))
        twin.qkv.bias.copy_(torch.tensor(np.asarray(b["qkv_bias"][0])))
        twin.proj.weight.copy_(torch.tensor(np.asarray(b["proj_kernel"][0]).T))
        twin.proj.bias.copy_(torch.tensor(np.asarray(b["proj_bias"][0])))
        twin.n2.weight.copy_(torch.tensor(np.asarray(b["norm2_scale"][0])))
        twin.n2.bias.copy_(torch.tensor(np.asarray(b["norm2_bias"][0])))
        twin.fc1.weight.copy_(torch.tensor(np.asarray(b["fc1_kernel"][0]).T))
        twin.fc1.bias.copy_(torch.tensor(np.asarray(b["fc1_bias"][0])))
        twin.fc2.weight.copy_(torch.tensor(np.asarray(b["fc2_kernel"][0]).T))
        twin.fc2.bias.copy_(torch.tensor(np.asarray(b["fc2_bias"][0])))
        twin.norm.weight.copy_(torch.tensor(np.asarray(params["norm"]["scale"])))
        twin.norm.bias.copy_(torch.tensor(np.asarray(params["norm"]["bias"])))
        twin.head.weight.copy_(
            torch.tensor(np.asarray(params["head"]["1"]["kernel"]).T))
        twin.head.bias.copy_(torch.tensor(np.asarray(params["head"]["1"]["bias"])))

    rng = np.random.RandomState(7)
    ids = rng.randint(0, V, (STEPS, B, L)).astype(np.int32)
    ys = rng.randint(0, NC, (STEPS, B)).astype(np.int32)

    # ---- torch side (reference client loop: fresh AdamW, CE, no clip)
    opt = torch.optim.AdamW(twin.parameters(), lr=LR, weight_decay=0.0)
    for s in range(STEPS):
        opt.zero_grad()
        logits = twin(torch.tensor(ids[s]).long())
        loss = torch.nn.CrossEntropyLoss()(logits, torch.tensor(ys[s]).long())
        loss.backward()
        opt.step()

    # ---- ours: the batched client program with n=1
    spec = GroupSpec(modality="txt", criterion="CrossEntropyLoss")
    ospec = OptimizerSpec(name="AdamW", weight_decay=0.0)
    update = build_group_update(cfg, spec, ospec, None)
    stacked = jax.tree_util.tree_map(lambda x: x[None] + 0, params)
    ostate = init_opt_state(ospec, stacked, n_clients=1)
    chunk = {
        "x": ids[None],                      # [1, S, B, L]
        "y": ys[None],
        "valid": np.ones((1, STEPS, B), bool),
        "step_valid": np.ones((1, STEPS), bool),
    }
    rngs = jax.random.split(jax.random.PRNGKey(1), 1)
    stacked, _, _ = update(stacked, ostate, chunk, rngs,
                           jnp.float32(LR), params)

    got = {
        "qkv": np.asarray(stacked["blk"]["1"]["qkv_kernel"][0, 0]).T,
        "fc1": np.asarray(stacked["blk"]["1"]["fc1_kernel"][0, 0]).T,
        "head": np.asarray(stacked["head"]["1"]["kernel"][0]).T,
        "word": np.asarray(stacked["emb"]["1"]["word"][0]),
        "norm": np.asarray(stacked["norm"]["scale"][0]),
    }
    ref = {
        "qkv": twin.qkv.weight.detach().numpy(),
        "fc1": twin.fc1.weight.detach().numpy(),
        "head": twin.head.weight.detach().numpy(),
        "word": twin.word.detach().numpy(),
        "norm": twin.norm.weight.detach().numpy(),
    }
    for k in got:
        np.testing.assert_allclose(got[k], ref[k], rtol=5e-4, atol=5e-5,
                                   err_msg=k)


# ------------------------------------------------------- generic torch twin

class TorchBlock(torch.nn.Module):
    """Reference Block (mome.py:186-228): pre-LN attention + MLP residuals,
    fp32 attention scores/softmax, exact-erf GELU.  ``reparam`` kinds get
    the CrossModalReparamLinear treatment (mome.py:42-60): effective weight
    ``W + cross_modal_scale * W_aux`` with aux frozen (aux_trained=False)."""

    def __init__(self, reparam=()):
        super().__init__()
        self.n1 = torch.nn.LayerNorm(D, eps=1e-5)
        self.qkv = torch.nn.Linear(D, 3 * D)
        self.proj = torch.nn.Linear(D, D)
        self.n2 = torch.nn.LayerNorm(D, eps=1e-5)
        self.fc1 = torch.nn.Linear(D, 4 * D)
        self.fc2 = torch.nn.Linear(4 * D, D)
        self.reparam = tuple(reparam)
        for kind in self.reparam:
            lay = getattr(self, kind)
            aux = torch.nn.Parameter(lay.weight.detach().clone())
            aux.requires_grad_(False)
            self.register_parameter(f"{kind}_aux", aux)
            self.register_parameter(f"{kind}_scale",
                                    torch.nn.Parameter(torch.zeros(1)))

    def _lin(self, kind, x):
        lay = getattr(self, kind)
        w = lay.weight
        if kind in self.reparam:
            w = w + getattr(self, f"{kind}_scale") * getattr(self, f"{kind}_aux")
        return torch.nn.functional.linear(x, w, lay.bias)

    def forward(self, x):
        Bb, N, _ = x.shape
        h = self.n1(x)
        qkv = self._lin("qkv", h).reshape(Bb, N, 3, H, D // H)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (D // H) ** -0.5, qkv[1], qkv[2]
        attn = (q.float() @ k.float().transpose(-2, -1)).softmax(-1)
        a = (attn @ v).transpose(1, 2).reshape(Bb, N, D)
        x = x + self._lin("proj", a)
        m = self._lin("fc2", torch.nn.functional.gelu(
            self._lin("fc1", self.n2(x))))
        return x + m


class TorchTwinMAT(torch.nn.Module):
    """Configurable MAT twin: per-modality embedding + block stack, shared
    final norm, cls Linear heads / L2-normalized CLS retrieval features
    (mome.py:671-922)."""

    def __init__(self, modalities, tasks, depth, reparam=()):
        super().__init__()
        self.modalities, self.tasks = modalities, tasks
        self.blockses = torch.nn.ModuleList()
        self.embeddings = torch.nn.ModuleList()
        self.heads = torch.nn.ModuleList()
        for i, m in enumerate(modalities):
            if m == "img":
                emb = torch.nn.Module()
                emb.conv = torch.nn.Conv2d(3, D, PATCH, stride=PATCH)
                emb.cls = torch.nn.Parameter(torch.zeros(1, 1, D))
                npatch = (IMG // PATCH) ** 2
                emb.pos = torch.nn.Parameter(torch.zeros(1, npatch + 1, D))
                self.embeddings.append(emb)
            elif m == "txt":
                emb = torch.nn.Module()
                emb.word = torch.nn.Parameter(torch.zeros(V, D))
                emb.posemb = torch.nn.Parameter(torch.zeros(L, D))
                emb.toktype = torch.nn.Parameter(torch.zeros(2, D))
                emb.ln = torch.nn.LayerNorm(D, eps=1e-12)
                self.embeddings.append(emb)
            else:
                self.embeddings.append(torch.nn.Module())
            self.blockses.append(torch.nn.ModuleList(
                [TorchBlock(reparam if m is not None else ())
                 for _ in range(depth)]) if m is not None
                else torch.nn.ModuleList())
            if tasks[i] == "cls":
                self.heads.append(torch.nn.Linear(D, NC))
            else:
                self.heads.append(torch.nn.Module())
        self.norm = torch.nn.LayerNorm(D, eps=1e-6)

    def _embed(self, i, x):
        emb = self.embeddings[i]
        if self.modalities[i] == "img":
            h = emb.conv(x).flatten(2).transpose(1, 2)
            h = torch.cat([emb.cls.expand(h.shape[0], -1, -1), h], dim=1)
            return h + emb.pos
        ids = x.long()
        h = emb.word[ids] + emb.posemb[: ids.shape[1]][None] \
            + emb.toktype[0][None, None]
        return emb.ln(h)

    def forward(self, inputs, feat_out=False):
        outs = [None] * len(self.modalities)
        for i, m in enumerate(self.modalities):
            if m is None or inputs[i] is None:
                continue
            h = self._embed(i, inputs[i])
            for blk in self.blockses[i]:
                h = blk(h)
            h = self.norm(h)
            cls_tok = h[:, 0]
            if feat_out or self.tasks[i] == "rtv":
                outs[i] = cls_tok / cls_tok.norm(dim=-1, keepdim=True)
            elif self.tasks[i] == "cls":
                outs[i] = self.heads[i](cls_tok)
        return outs


def _copy_from_jax(twin: TorchTwinMAT, cfg: MATConfig, params) -> None:
    """Load our init into the twin (kernels are [in, out] -> weight.T)."""
    def t(a):
        return torch.tensor(np.asarray(a))

    with torch.no_grad():
        for i, m in enumerate(cfg.modalities):
            if m is None:
                continue
            s = str(i)
            e, emb = params["emb"][s], twin.embeddings[i]
            if m == "img":
                emb.conv.weight.copy_(t(e["patch_kernel"]).permute(3, 2, 0, 1))
                emb.conv.bias.copy_(t(e["patch_bias"]))
                emb.cls.copy_(t(e["cls"]))
                emb.pos.copy_(t(e["pos"]))
            else:
                emb.word.copy_(t(e["word"]))
                emb.posemb.copy_(t(e["posemb"]))
                emb.toktype.copy_(t(e["toktype"]))
                emb.ln.weight.copy_(t(e["ln_scale"]))
                emb.ln.bias.copy_(t(e["ln_bias"]))
            b = params["blk"][s]
            for l, blk in enumerate(twin.blockses[i]):
                blk.n1.weight.copy_(t(b["norm1_scale"][l]))
                blk.n1.bias.copy_(t(b["norm1_bias"][l]))
                blk.n2.weight.copy_(t(b["norm2_scale"][l]))
                blk.n2.bias.copy_(t(b["norm2_bias"][l]))
                for kind in ("qkv", "proj", "fc1", "fc2"):
                    lay = getattr(blk, kind)
                    lay.weight.copy_(t(b[f"{kind}_kernel"][l]).T)
                    lay.bias.copy_(t(b[f"{kind}_bias"][l]))
                for kind in blk.reparam:
                    getattr(blk, f"{kind}_aux").copy_(
                        t(params["aux"][f"{kind}_aux"][l]).T)
                    getattr(blk, f"{kind}_scale").copy_(
                        t(params["aux"][f"{kind}_scale"][l]).reshape(1))
            if cfg.tasks[i] == "cls":
                twin.heads[i].weight.copy_(t(params["head"][s]["kernel"]).T)
                twin.heads[i].bias.copy_(t(params["head"][s]["bias"]))
        twin.norm.weight.copy_(t(params["norm"]["scale"]))
        twin.norm.bias.copy_(t(params["norm"]["bias"]))


def _twin_tree(twin: TorchTwinMAT, cfg: MATConfig):
    """Extract the twin's parameters in OUR pytree layout (stacked blocks)."""
    out = {"emb": {}, "blk": {}, "head": {},
           "norm": {"scale": twin.norm.weight.detach().numpy(),
                    "bias": twin.norm.bias.detach().numpy()}}
    for i, m in enumerate(cfg.modalities):
        if m is None:
            continue
        s = str(i)
        emb = twin.embeddings[i]
        if m == "img":
            out["emb"][s] = {
                "patch_kernel":
                    emb.conv.weight.detach().permute(2, 3, 1, 0).numpy(),
                "patch_bias": emb.conv.bias.detach().numpy(),
                "cls": emb.cls.detach().numpy(),
                "pos": emb.pos.detach().numpy()}
        else:
            out["emb"][s] = {
                "word": emb.word.detach().numpy(),
                "posemb": emb.posemb.detach().numpy(),
                "toktype": emb.toktype.detach().numpy(),
                "ln_scale": emb.ln.weight.detach().numpy(),
                "ln_bias": emb.ln.bias.detach().numpy()}
        blkd = {}
        blocks = list(twin.blockses[i])
        blkd["norm1_scale"] = np.stack([b.n1.weight.detach().numpy()
                                        for b in blocks])
        blkd["norm1_bias"] = np.stack([b.n1.bias.detach().numpy()
                                       for b in blocks])
        blkd["norm2_scale"] = np.stack([b.n2.weight.detach().numpy()
                                        for b in blocks])
        blkd["norm2_bias"] = np.stack([b.n2.bias.detach().numpy()
                                       for b in blocks])
        for kind in ("qkv", "proj", "fc1", "fc2"):
            blkd[f"{kind}_kernel"] = np.stack(
                [getattr(b, kind).weight.detach().numpy().T for b in blocks])
            blkd[f"{kind}_bias"] = np.stack(
                [getattr(b, kind).bias.detach().numpy() for b in blocks])
        out["blk"][s] = blkd
        if blocks and blocks[0].reparam:
            out["aux"] = {}
            for kind in blocks[0].reparam:
                out["aux"][f"{kind}_aux"] = np.stack(
                    [getattr(b, f"{kind}_aux").detach().numpy().T
                     for b in blocks])
                out["aux"][f"{kind}_scale"] = np.concatenate(
                    [getattr(b, f"{kind}_scale").detach().numpy()
                     for b in blocks])
        if cfg.tasks[i] == "cls":
            out["head"][s] = {
                "kernel": twin.heads[i].weight.detach().numpy().T,
                "bias": twin.heads[i].bias.detach().numpy()}
    return out


def _assert_trees_close(ours_stacked, twin_tree, rtol=5e-4, atol=5e-5):
    """Compare our post-training stacked ([1, ...]) tree to the twin's.

    The K section of ``qkv_bias`` is a gauge direction: a key bias adds a
    per-query constant to every attention score, which softmax cancels, so
    its true gradient is zero and AdamW amplifies fp noise there to
    O(lr)-scale drift — in torch and in JAX alike (the reference has the
    identical degeneracy).  That slice is compared at an O(lr*steps) bound
    instead of the tight tolerance."""
    flat_o = jax.tree_util.tree_flatten_with_path(ours_stacked)[0]
    flat_t, _ = jax.tree_util.tree_flatten_with_path(twin_tree)
    assert len(flat_o) == len(flat_t)
    for (path_o, leaf_o), (path_t, leaf_t) in zip(flat_o, flat_t):
        key = jax.tree_util.keystr(path_o)
        assert key == jax.tree_util.keystr(path_t)
        got, want = np.asarray(leaf_o)[0], np.asarray(leaf_t)
        if key.endswith("['qkv_bias']"):
            got, want = got.reshape(-1, 3, D), want.reshape(-1, 3, D)
            np.testing.assert_allclose(got[:, 1], want[:, 1],
                                       atol=2 * LR * STEPS,
                                       err_msg=key + " (k gauge slice)")
            got, want = got[:, (0, 2)], want[:, (0, 2)]
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                                   err_msg=key)


def _make_cfg(**kw):
    base = dict(embed_dim=D, depth=1, num_heads=H, vocab_size=V,
                max_text_len=L, img_size=IMG, patch_size=PATCH,
                drop_path_rate=0.0, use_pallas=False,
                compute_dtype="float32")
    base.update(kw)
    return MATConfig(**base)


def _run_ours(cfg, spec, params, chunk, steps=STEPS,
              global_params=None):
    ospec = OptimizerSpec(name="AdamW", weight_decay=0.0)
    update = build_group_update(cfg, spec, ospec, None)
    stacked = jax.tree_util.tree_map(lambda x: x[None] + 0, params)
    ostate = init_opt_state(ospec, stacked, n_clients=1)
    full = dict(chunk)
    full["valid"] = np.ones((1, steps, B), bool)
    full["step_valid"] = np.ones((1, steps), bool)
    rngs = jax.random.split(jax.random.PRNGKey(1), 1)
    stacked, _, _ = update(stacked, ostate, full, rngs, jnp.float32(LR),
                           params if global_params is None else global_params)
    return stacked


def _train_twin(twin, batches, loss_fn, prox_mu=None):
    """Reference client loop: fresh AdamW, no clip; optional FedProx
    proximal term over named_parameters (fedproxclient.py:64-67)."""
    g0 = {k: v.detach().clone() for k, v in twin.named_parameters()} \
        if prox_mu else None
    opt = torch.optim.AdamW([p for p in twin.parameters()
                             if p.requires_grad], lr=LR, weight_decay=0.0)
    for batch in batches:
        opt.zero_grad()
        loss = loss_fn(twin, batch)
        if prox_mu:
            prox = 0.0
            for name, p in twin.named_parameters():
                prox = prox + (p - g0[name]).norm(2)
            loss = loss + prox_mu * (0.5 * prox)
        loss.backward()
        opt.step()


def _torch_clip_loss(img_f, txt_f):
    """torchmultimodal ContrastiveLossWithTemperature at its fixed
    per-batch re-init temperature 1/0.07 (fedavgclient.py:95 semantics)."""
    scale = math.exp(math.log(1.0 / 0.07))
    logits = scale * img_f @ txt_f.t()
    labels = torch.arange(logits.shape[0])
    ce = torch.nn.functional.cross_entropy
    return 0.5 * (ce(logits, labels) + ce(logits.t(), labels))


# ------------------------------------------------------------------- tests

def test_img_training_matches_torch():
    """Image path: Conv2d patchify + cls/pos embed + CE head
    (mome.py:578-611,881-907)."""
    cfg = _make_cfg(modalities=("img", None), tasks=("cls", None),
                    num_classes=(NC, None), depth=2)
    params = init_mat(cfg, jax.random.PRNGKey(3))
    twin = TorchTwinMAT(cfg.modalities, cfg.tasks, depth=2)
    _copy_from_jax(twin, cfg, params)

    rng = np.random.RandomState(11)
    imgs = rng.randint(0, 256, (STEPS, B, IMG, IMG, 3)).astype(np.uint8)
    ys = rng.randint(0, NC, (STEPS, B)).astype(np.int32)

    def loss_fn(tw, s):
        x = torch.tensor(imgs[s]).float().permute(0, 3, 1, 2) / 255.0
        logits = tw([x, None])[0]
        return torch.nn.CrossEntropyLoss()(logits, torch.tensor(ys[s]).long())

    _train_twin(twin, range(STEPS), loss_fn)

    spec = GroupSpec(modality="img", criterion="CrossEntropyLoss")
    stacked = _run_ours(cfg, spec, params,
                        {"x": imgs[None], "y": ys[None]})
    _assert_trees_close(stacked, _twin_tree(twin, cfg))


def test_mm_clip_training_matches_torch():
    """img+txt CLIP-contrastive path (fedavgclient.py:93-95)."""
    cfg = _make_cfg(modalities=("img", "txt"), tasks=("rtv", "rtv"),
                    num_classes=(None, None), depth=1)
    params = init_mat(cfg, jax.random.PRNGKey(5))
    twin = TorchTwinMAT(cfg.modalities, cfg.tasks, depth=1)
    _copy_from_jax(twin, cfg, params)

    rng = np.random.RandomState(13)
    imgs = rng.randint(0, 256, (STEPS, B, IMG, IMG, 3)).astype(np.uint8)
    ids = rng.randint(0, V, (STEPS, B, L)).astype(np.int32)

    def loss_fn(tw, s):
        x = torch.tensor(imgs[s]).float().permute(0, 3, 1, 2) / 255.0
        outs = tw([x, torch.tensor(ids[s])], feat_out=True)
        return _torch_clip_loss(outs[0], outs[1])

    _train_twin(twin, range(STEPS), loss_fn)

    spec = GroupSpec(modality="img+txt", criterion="ContrastiveLoss")
    stacked = _run_ours(cfg, spec, params,
                        {"x": imgs[None], "y": ids[None]})
    _assert_trees_close(stacked, _twin_tree(twin, cfg))


def test_fedprox_training_matches_torch():
    """FedProx proximal term: mu * 0.5 * sum of PER-NAMED-PARAMETER L2
    norms (fedproxclient.py:64-67 — NOT the paper's squared norm).
    depth=3 so the depth-stacked leaves must contribute one norm per
    layer slice — a whole-stack norm (sqrt of the summed squares across
    layers) passes at depth=1 but diverges here from step 2 on."""
    mu = 0.05
    cfg = _make_cfg(modalities=(None, "txt"), tasks=(None, "cls"),
                    num_classes=(None, NC), depth=3)
    params = init_mat(cfg, jax.random.PRNGKey(7))
    twin = TorchTwinMAT(cfg.modalities, cfg.tasks, depth=3)
    _copy_from_jax(twin, cfg, params)

    rng = np.random.RandomState(17)
    ids = rng.randint(0, V, (STEPS, B, L)).astype(np.int32)
    ys = rng.randint(0, NC, (STEPS, B)).astype(np.int32)

    def loss_fn(tw, s):
        logits = tw([None, torch.tensor(ids[s])])[1]
        return torch.nn.CrossEntropyLoss()(logits, torch.tensor(ys[s]).long())

    _train_twin(twin, range(STEPS), loss_fn, prox_mu=mu)

    spec = GroupSpec(modality="txt", criterion="CrossEntropyLoss",
                     mu=mu, algorithm="fedprox")
    stacked = _run_ours(cfg, spec, params,
                        {"x": ids[None], "y": ys[None]})
    _assert_trees_close(stacked, _twin_tree(twin, cfg))


def test_depth4_training_matches_torch():
    """depth-4 stack: the scanned stacked-leaf execution must track four
    unrolled torch blocks through an optimizer trajectory."""
    cfg = _make_cfg(modalities=(None, "txt"), tasks=(None, "cls"),
                    num_classes=(None, NC), depth=4)
    params = init_mat(cfg, jax.random.PRNGKey(9))
    twin = TorchTwinMAT(cfg.modalities, cfg.tasks, depth=4)
    _copy_from_jax(twin, cfg, params)

    rng = np.random.RandomState(19)
    ids = rng.randint(0, V, (STEPS, B, L)).astype(np.int32)
    ys = rng.randint(0, NC, (STEPS, B)).astype(np.int32)

    def loss_fn(tw, s):
        logits = tw([None, torch.tensor(ids[s])])[1]
        return torch.nn.CrossEntropyLoss()(logits, torch.tensor(ys[s]).long())

    _train_twin(twin, range(STEPS), loss_fn)

    spec = GroupSpec(modality="txt", criterion="CrossEntropyLoss")
    stacked = _run_ours(cfg, spec, params,
                        {"x": ids[None], "y": ys[None]})
    _assert_trees_close(stacked, _twin_tree(twin, cfg))


def test_with_aux_training_fold_and_exchange_match_torch():
    """FedCola aux, end to end vs torch: (1) 3 AdamW steps training through
    the folded W + s*W_aux (aux frozen, scales trainable, mome.py:42-60),
    (2) the upload fold-in W <- W + s*W_aux with aux keys stripped
    (fedavgclient.py:158-184), (3) the server aux exchange copying the
    other modality's aggregated kernels into the aux slots
    (fedavgserver.py:821-845)."""
    cfg_img = _make_cfg(modalities=("img", None), tasks=("cls", None),
                        num_classes=(NC, None), depth=2, with_aux=True,
                        aux_trained=False)
    cfg_txt = _make_cfg(modalities=(None, "txt"), tasks=(None, "cls"),
                        num_classes=(None, NC), depth=2, with_aux=True,
                        aux_trained=False)
    p_img = init_mat(cfg_img, jax.random.PRNGKey(21))
    p_txt = init_mat(cfg_txt, jax.random.PRNGKey(22))

    twin_img = TorchTwinMAT(cfg_img.modalities, cfg_img.tasks, depth=2,
                            reparam=("qkv", "proj", "fc1", "fc2"))
    twin_txt = TorchTwinMAT(cfg_txt.modalities, cfg_txt.tasks, depth=2,
                            reparam=("qkv", "proj", "fc1", "fc2"))
    _copy_from_jax(twin_img, cfg_img, p_img)
    _copy_from_jax(twin_txt, cfg_txt, p_txt)

    rng = np.random.RandomState(23)
    imgs = rng.randint(0, 256, (STEPS, B, IMG, IMG, 3)).astype(np.uint8)
    yimg = rng.randint(0, NC, (STEPS, B)).astype(np.int32)
    ids = rng.randint(0, V, (STEPS, B, L)).astype(np.int32)
    ytxt = rng.randint(0, NC, (STEPS, B)).astype(np.int32)

    def loss_img(tw, s):
        x = torch.tensor(imgs[s]).float().permute(0, 3, 1, 2) / 255.0
        logits = tw([x, None])[0]
        return torch.nn.CrossEntropyLoss()(logits,
                                           torch.tensor(yimg[s]).long())

    def loss_txt(tw, s):
        logits = tw([None, torch.tensor(ids[s])])[1]
        return torch.nn.CrossEntropyLoss()(logits,
                                           torch.tensor(ytxt[s]).long())

    _train_twin(twin_img, range(STEPS), loss_img)
    _train_twin(twin_txt, range(STEPS), loss_txt)

    s_img = _run_ours(cfg_img, GroupSpec(modality="img",
                                         criterion="CrossEntropyLoss"),
                      p_img, {"x": imgs[None], "y": yimg[None]})
    s_txt = _run_ours(cfg_txt, GroupSpec(modality="txt",
                                         criterion="CrossEntropyLoss",
                                         txt_slot=1),
                      p_txt, {"x": ids[None], "y": ytxt[None]})

    # (1) trained trees match, including live scales and untouched aux
    t_img = _twin_tree(twin_img, cfg_img)
    t_txt = _twin_tree(twin_txt, cfg_txt)
    _assert_trees_close(s_img, t_img)
    _assert_trees_close(s_txt, t_txt)
    # the scales actually moved (the reparam path was exercised) and the
    # frozen aux did not
    assert np.abs(np.asarray(
        s_img["aux"]["qkv_scale"][0])).max() > 1e-6
    np.testing.assert_array_equal(np.asarray(s_img["aux"]["qkv_aux"][0]),
                                  np.asarray(p_img["aux"]["qkv_aux"]))

    # (2) upload fold-in vs the torch twin's fold (fedavgclient.py:173-181)
    up_img = fold_aux_into_upload(
        cfg_img, jax.tree_util.tree_map(lambda x: np.asarray(x)[0], s_img))
    assert "aux" not in up_img
    for l, blk in enumerate(twin_img.blockses[0]):
        for kind in ("qkv", "proj", "fc1", "fc2"):
            lay = getattr(blk, kind)
            folded = (lay.weight + getattr(blk, f"{kind}_scale")
                      * getattr(blk, f"{kind}_aux")).detach().numpy().T
            np.testing.assert_allclose(
                np.asarray(up_img["blk"]["0"][f"{kind}_kernel"][l]), folded,
                rtol=5e-4, atol=5e-5, err_msg=f"{kind}@{l}")

    # (3) server aux exchange: with one client per dataset the aggregated
    # global IS the folded upload; the img model's aux slots must become
    # the txt model's folded kernels, slot-remapped (blockses.0<->1)
    up_txt = fold_aux_into_upload(
        cfg_txt, jax.tree_util.tree_map(lambda x: np.asarray(x)[0], s_txt))
    g_img = dict(up_img)
    g_img["aux"] = {k: np.asarray(v)[0] for k, v in s_img["aux"].items()}
    g_txt = dict(up_txt)
    g_txt["aux"] = {k: np.asarray(v)[0] for k, v in s_txt["aux"].items()}
    exchanged = exchange_aux_weights(
        {"IMGDS": g_img, "TXTDS": g_txt},
        {"IMGDS": cfg_img, "TXTDS": cfg_txt},
        {"IMGDS": "img", "TXTDS": "txt"})
    for l, blk in enumerate(twin_txt.blockses[1]):
        for kind in ("qkv", "proj", "fc1", "fc2"):
            lay = getattr(blk, kind)
            folded = (lay.weight + getattr(blk, f"{kind}_scale")
                      * getattr(blk, f"{kind}_aux")).detach().numpy().T
            np.testing.assert_allclose(
                np.asarray(exchanged["IMGDS"]["aux"][f"{kind}_aux"][l]),
                folded, rtol=5e-4, atol=5e-5, err_msg=f"xchg {kind}@{l}")


def test_two_round_federation_matches_torch():
    """Capstone seam test: 2 clients with UNEQUAL sizes x 2 federated
    rounds — the vmapped multi-client group update, the plan/apply
    aggregation streaming EMA, the re-download, and the second round all
    composed — vs two torch twins trained per the reference client loop
    (fresh AdamW per round, fedavgclient.py:76-100) and the reference's
    literal accumulation recurrence ``final += (local - final) * c_i``
    with c_i = n_i/Σn (fedavgserver.py:655-665).  That recurrence is NOT
    a plain weighted average: it keeps a Π(1-c_i) residual of the old
    global and weights client i by c_i·Π_{j>i}(1-c_j) — a plain-average
    torch twin diverges by ~6e-4 after one round.  The per-path
    trajectory tests above prove each leg; this proves the composition
    including that residual semantics."""
    from fedcola_tpu.federation import aggregate as agg
    from fedcola_tpu.models import naming

    cfg = _make_cfg(modalities=(None, "txt"), tasks=(None, "cls"),
                    num_classes=(None, NC), depth=2)
    g0 = init_mat(cfg, jax.random.PRNGKey(31))
    sizes = {0: 96, 1: 32}
    rng = np.random.RandomState(33)
    ids = rng.randint(0, V, (2, 2, STEPS, B, L)).astype(np.int32)
    ys = rng.randint(0, NC, (2, 2, STEPS, B)).astype(np.int32)

    spec = GroupSpec(modality="txt", criterion="CrossEntropyLoss",
                     txt_slot=1)
    clients = {i: agg.ClientMeta(id=i, dataset="TXTDS", modality="txt",
                                 task="cls", n_train=sizes[i])
               for i in (0, 1)}
    names = [n for _, n in naming.param_names(cfg)]
    param_scope = naming.build_param_scope(names, "none", "dataset")

    # ---- ours: both clients in ONE vmapped group update per round
    ospec = OptimizerSpec(name="AdamW", weight_decay=0.0)
    update = build_group_update(cfg, spec, ospec, None)
    gp = g0
    for r in range(2):
        stacked = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (2,) + x.shape) + 0, gp)
        ostate = init_opt_state(ospec, stacked, n_clients=2)
        full = {"x": ids[:, r], "y": ys[:, r],
                "valid": np.ones((2, STEPS, B), bool),
                "step_valid": np.ones((2, STEPS), bool)}
        rngs = jax.random.split(jax.random.PRNGKey(100 + r), 2)
        uploads, _, _ = update(stacked, ostate, full, rngs,
                               jnp.float32(LR), gp)
        jobs, weights = agg.plan_aggregation(
            "TXTDS", cfg, {"TXTDS": cfg}, clients, [0, 1], sizes,
            param_scope, ["txt", "txt"], {"TXTDS": [0, 1]},
            share_scope="dataset", model_modality="txt", model_task="cls")
        gp = agg.apply_aggregation(jobs, weights, gp, {"TXTDS": uploads})

    # ---- torch twins, same recipe
    twins = [TorchTwinMAT(cfg.modalities, cfg.tasks, depth=2)
             for _ in range(2)]
    for tw in twins:
        _copy_from_jax(tw, cfg, g0)

    def loss_for(c, r):
        def loss(tw, s):
            logits = tw([None, torch.tensor(ids[c, r, s])])[1]
            return torch.nn.CrossEntropyLoss()(
                logits, torch.tensor(ys[c, r, s]).long())
        return loss

    g_sd = {k: v.detach().clone() for k, v in twins[0].state_dict().items()}
    for r in range(2):
        for c, tw in enumerate(twins):
            _train_twin(tw, range(STEPS), loss_for(c, r))
        with torch.no_grad():
            # the reference accumulation: final += (local - final) * c_i,
            # client order = sorted ids (fedavgserver.py:655-665)
            sds = [tw.state_dict() for tw in twins]
            for c in (0, 1):
                coef = sizes[c] / 128.0
                for k in g_sd:
                    g_sd[k] += (sds[c][k] - g_sd[k]) * coef
            for tw in twins:
                tw.load_state_dict(g_sd)

    t_tree = _twin_tree(twins[0], cfg)
    gp_stacked = jax.tree_util.tree_map(lambda x: np.asarray(x)[None], gp)
    _assert_trees_close(gp_stacked, t_tree)
