"""Training-dynamics parity: several AdamW steps on identical weights and
data must produce near-identical parameters in our batched JAX program and
an independently written torch twin of the reference's client loop
(fedavgclient.py:55-118).  This is the end-to-end numerics check behind the
'matched R@1' target (SURVEY.md §7 hard parts)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fedcola_tpu.models.mat import MATConfig, init_mat
from fedcola_tpu.parallel.client_update import GroupSpec, build_group_update
from fedcola_tpu.parallel.optim import OptimizerSpec, init_opt_state

D, H, L, V, NC = 8, 2, 6, 40, 3
B, STEPS = 4, 3
LR = 1e-3


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
    ostate = init_opt_state(ospec, stacked)
    ostate["t"] = jnp.zeros((1,), jnp.int32)
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
