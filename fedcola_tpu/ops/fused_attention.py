"""Fully fused attention sublayer Pallas kernel:

    a = proj( multi_head_attention( LayerNorm(x) ) )

i.e. the complete pre-residual attention path of a MAT block (reference
Block.forward first half, mome.py:225-227; Attention, mome.py:150-168;
fp32 scores/softmax preserved).  One program handles one (client, batch
item): the [N, 3D] qkv tensor, the per-head [N, N] score matrices and the
LayerNorm intermediates never touch HBM — per layer per step the only HBM
activation traffic is x in / a out.

Batching follows the fused-MLP pattern (ops/fused_mlp.py): a custom_vmap
rule maps the client axis onto the outer grid dimension so per-client
weights stay single-copy in VMEM, and the weight gradients accumulate in
f32 scratch across the (sequential) batch grid dimension, DMA-spilled to
HBM on each client's last batch item.

Constraints: embed_dim % 128 == 0 (dW DMA spill alignment) and
head_dim >= 8; sequence length is free (197 and 40 both used).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from fedcola_tpu.ops.common import (batch_arg as _batch_arg,
                                    interpret as _interpret,
                                    items_per_program as _largest_ib,
                                    wide_compiler_params as _wide_params)


def _ln_fwd(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * inv
    return xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32), \
        xhat, inv


def _heads_fwd(qkv, D, H, hd, scale, dtype):
    """Score matmul operands stay in the compute dtype (MXU bf16 rate);
    the scale, softmax logits and probabilities are f32 (reference
    mome.py:157-162 keeps scores/softmax in fp32)."""
    # phase-separated: all score dots, then all softmaxes, then all AV dots
    # — every dot in a phase is independent, so the scheduler can keep the
    # MXU busy while the VPU runs the previous head's softmax
    ss = []
    for h in range(H):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, D + h * hd:D + (h + 1) * hd]
        ss.append(jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
                  * scale)
    ps = []
    for s in ss:
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        ps.append(e / jnp.sum(e, axis=-1, keepdims=True))
    outs = []
    for h in range(H):
        v = qkv[:, 2 * D + h * hd:2 * D + (h + 1) * hd]
        outs.append(jnp.dot(ps[h].astype(dtype), v,
                            preferred_element_type=jnp.float32))
    return outs, ps


# parsed once at import (like FEDCOLA_MLP_BWD_G) so a malformed value
# fails here with context, not deep inside a Pallas kernel trace;
# None = N-adaptive default (see _make_bwd_save_kernel)
_BWD_G = (max(1, int(os.environ["FEDCOLA_ATTN_BWD_G"]))
          if os.environ.get("FEDCOLA_ATTN_BWD_G") else None)


def _make_fwd_kernel(H: int, IB: int):
    def kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
               bproj_ref, a_ref):
        for i in range(IB):
            x = x_ref[0, i]
            N, D = x.shape
            hd = D // H
            dtype = x.dtype
            hnorm, _, _ = _ln_fwd(x, lns_ref[0, 0], lnb_ref[0, 0])
            h = hnorm.astype(dtype)
            qkv = jnp.dot(h, wqkv_ref[0].astype(dtype),
                          preferred_element_type=jnp.float32) \
                + bqkv_ref[0, 0].astype(jnp.float32)
            qkv = qkv.astype(dtype)
            outs, _ = _heads_fwd(qkv, D, H, hd, hd ** -0.5, dtype)
            cat = jnp.concatenate(outs, axis=1).astype(dtype)
            a = jnp.dot(cat, wproj_ref[0].astype(dtype),
                        preferred_element_type=jnp.float32) \
                + bproj_ref[0, 0].astype(jnp.float32)
            a_ref[0, i] = a.astype(a_ref.dtype)

    return kernel


def _make_fwd_save_kernel(H: int, IB: int, residual: bool = False):
    """Forward that additionally emits the softmax probabilities and the
    pre-projection head concat as outputs.  Saving (p, cat) lets the
    backward skip every score dot, the softmax, and every AV dot — the
    small-matmul pipeline drain that dominates attention backward time at
    hd=64 — at the price of their HBM round-trip.

    ``residual=True`` folds the residual join + per-sample DropPath scale
    into the kernel: a_out = x + s_i * attn_sublayer(x)."""
    def kernel_impl(x_ref, s_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                    wproj_ref, bproj_ref, a_ref, p_ref, cat_ref):
        N, D = x_ref.shape[2], x_ref.shape[3]
        hd = D // H
        dtype = x_ref.dtype
        wqkv = wqkv_ref[0].astype(dtype)
        wproj = wproj_ref[0].astype(dtype)
        # phase across item groups (group size bounded by the live
        # intermediates' VMEM footprint, which scales with N)
        G = 2 if N >= 128 else 4
        for g0 in range(0, IB, G):
            group = range(g0, min(g0 + G, IB))
            hs = {i: _ln_fwd(x_ref[0, i], lns_ref[0, 0],
                             lnb_ref[0, 0])[0].astype(dtype) for i in group}
            qkvs = {i: (jnp.dot(hs[i], wqkv,
                                preferred_element_type=jnp.float32)
                        + bqkv_ref[0, 0].astype(jnp.float32)).astype(dtype)
                    for i in group}
            head_outs = {i: _heads_fwd(qkvs[i], D, H, hd, hd ** -0.5, dtype)
                         for i in group}
            for i in group:
                outs, ps = head_outs[i]
                for hh in range(H):
                    p_ref[0, i, hh] = ps[hh].astype(p_ref.dtype)
                cat = jnp.concatenate(outs, axis=1).astype(dtype)
                cat_ref[0, i] = cat
                a = jnp.dot(cat, wproj,
                            preferred_element_type=jnp.float32) \
                    + bproj_ref[0, 0].astype(jnp.float32)
                if s_ref is not None:
                    # s lives whole-array in SMEM (a [n, B] f32 vector is
                    # too thin for a VMEM block spec); absolute index
                    s = s_ref[pl.program_id(0), pl.program_id(1) * IB + i]
                    a = x_ref[0, i].astype(jnp.float32) + s * a
                a_ref[0, i] = a.astype(a_ref.dtype)

    if residual:
        def kernel(x_ref, s_ref, *refs):
            kernel_impl(x_ref, s_ref, *refs)
    else:
        def kernel(x_ref, *refs):
            kernel_impl(x_ref, None, *refs)
    return kernel


def _make_bwd_save_kernel(H: int, IB: int, residual: bool = False):
    """Backward fed with the saved (p, cat): recomputes only LN + the qkv
    projection (one full-efficiency dot), then runs straight into the
    gradient dots."""
    def kernel_impl(x_ref, s_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                    wproj_ref, p_ref, cat_ref, da_ref,
                    dx_ref, dlns_ref, dlnb_ref, dwqkv_ref, dbqkv_ref,
                    dwproj_ref, dbproj_ref,
                    dlns_acc, dlnb_acc, dwqkv_acc, dbqkv_acc, dwproj_acc,
                    dbproj_acc, sems):
        c = pl.program_id(0)
        b = pl.program_id(1)
        n_b = pl.num_programs(1)

        @pl.when(b == 0)
        def _init():
            dlns_acc[...] = jnp.zeros_like(dlns_acc)
            dlnb_acc[...] = jnp.zeros_like(dlnb_acc)
            dwqkv_acc[...] = jnp.zeros_like(dwqkv_acc)
            dbqkv_acc[...] = jnp.zeros_like(dbqkv_acc)
            dwproj_acc[...] = jnp.zeros_like(dwproj_acc)
            dbproj_acc[...] = jnp.zeros_like(dbproj_acc)

        # phase-separated across item GROUPS and heads: ops within a phase
        # are independent, letting the scheduler overlap VPU softmax-grad
        # math with MXU dots; groups cap the number of items whose
        # intermediates are live at once (VMEM scales with the group)
        dtype = x_ref.dtype
        lns = lns_ref[0, 0].astype(jnp.float32)
        wqkv = wqkv_ref[0].astype(dtype)
        wproj = wproj_ref[0].astype(dtype)
        N, D = x_ref.shape[2], x_ref.shape[3]
        hd = D // H
        scale = hd ** -0.5

        # _BWD_G is pre-parsed and clamped >= 1 at import (a non-positive
        # group size would make the item loop empty and return
        # never-written VMEM as gradients); None = N-adaptive default
        G = _BWD_G if _BWD_G else (2 if N >= 128 else 4)
        for g0 in range(0, IB, G):
          group = range(g0, min(g0 + G, IB))
          lnouts = {i: _ln_fwd(x_ref[0, i], lns_ref[0, 0], lnb_ref[0, 0])
                    for i in group}
          hs = {i: lnouts[i][0].astype(dtype) for i in group}
          # residual fold: branch gradient is s*do (s from whole-array
          # SMEM at absolute [c, b*IB+i] — see the fwd kernel note)
          das = {i: (da_ref[0, i].astype(jnp.float32)
                     * s_ref[c, b * IB + i]
                     if s_ref is not None
                     else da_ref[0, i].astype(jnp.float32)) for i in group}
          da_cs = {i: das[i].astype(dtype) for i in group}
          cats = {i: cat_ref[0, i] for i in group}
          qkvs = {i: (jnp.dot(hs[i], wqkv,
                              preferred_element_type=jnp.float32)
                      + bqkv_ref[0, 0].astype(jnp.float32)).astype(dtype)
                  for i in group}
          dwprojs = {i: jax.lax.dot_general(
                         cats[i], da_cs[i], (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32) for i in group}
          dcats = {i: jax.lax.dot_general(
                       da_cs[i], wproj, (((1,), (1,)), ((), ())),
                       preferred_element_type=jnp.float32) for i in group}

          dos = {i: [dcats[i][:, hh * hd:(hh + 1) * hd].astype(dtype)
                     for hh in range(H)] for i in group}
          ps_c = {i: [p_ref[0, i, hh] for hh in range(H)] for i in group}
          dvs = {i: [jax.lax.dot_general(ps_c[i][hh], dos[i][hh],
                                         (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                     for hh in range(H)] for i in group}
          dps = {i: [jax.lax.dot_general(
                         dos[i][hh],
                         qkvs[i][:, 2 * D + hh * hd:2 * D + (hh + 1) * hd],
                         (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
                     for hh in range(H)] for i in group}
          dss = {}
          for i in group:
              row = []
              for hh in range(H):
                  p = ps_c[i][hh].astype(jnp.float32)
                  dp = dps[i][hh]
                  delta = jnp.sum(dp * p, axis=-1, keepdims=True)
                  row.append((p * (dp - delta)).astype(dtype))
              dss[i] = row
          dqs = {i: [jnp.dot(dss[i][hh],
                             qkvs[i][:, D + hh * hd:D + (hh + 1) * hd],
                             preferred_element_type=jnp.float32) * scale
                     for hh in range(H)] for i in group}
          dks = {i: [jax.lax.dot_general(
                         dss[i][hh], qkvs[i][:, hh * hd:(hh + 1) * hd],
                         (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32) * scale
                     for hh in range(H)] for i in group}
          dqkvs = {i: jnp.concatenate(
              [jnp.concatenate(dqs[i], axis=1),
               jnp.concatenate(dks[i], axis=1),
               jnp.concatenate(dvs[i], axis=1)], axis=1) for i in group}
          dqkv_cs = {i: dqkvs[i].astype(dtype) for i in group}
          dhs = {i: jax.lax.dot_general(
                      dqkv_cs[i], wqkv, (((1,), (1,)), ((), ())),
                      preferred_element_type=jnp.float32) for i in group}

          # weight-gradient dots accumulate inline (one [D,3D]-sized
          # temporary live at a time — see the MLP kernel's liveness note)
          for i in group:
              dwqkv_acc[...] += jax.lax.dot_general(
                  hs[i], dqkv_cs[i], (((0,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32)
              _, xhat, inv = lnouts[i]
              dh = dhs[i]
              dg = dh * lns
              m1 = jnp.mean(dg, axis=-1, keepdims=True)
              m2 = jnp.mean(dg * xhat, axis=-1, keepdims=True)
              dx = inv * (dg - m1 - xhat * m2)
              if s_ref is not None:  # + identity branch of the residual
                  dx = dx + da_ref[0, i].astype(jnp.float32)
              dx_ref[0, i] = dx.astype(dx_ref.dtype)
              dlns_acc[...] += jnp.sum(dh * xhat, axis=0, keepdims=True)
              dlnb_acc[...] += jnp.sum(dh, axis=0, keepdims=True)
              dbqkv_acc[...] += jnp.sum(dqkvs[i], axis=0, keepdims=True)
              dwproj_acc[...] += dwprojs[i]
              dbproj_acc[...] += jnp.sum(das[i], axis=0, keepdims=True)

        @pl.when(b == n_b - 1)
        def _spill():
            for j, (acc, ref) in enumerate([
                    (dlns_acc, dlns_ref), (dlnb_acc, dlnb_ref),
                    (dwqkv_acc, dwqkv_ref), (dbqkv_acc, dbqkv_ref),
                    (dwproj_acc, dwproj_ref), (dbproj_acc, dbproj_ref)]):
                dma = pltpu.make_async_copy(acc, ref.at[c], sems.at[j])
                dma.start()
                dma.wait()

    if residual:
        def kernel(x_ref, s_ref, *refs):
            kernel_impl(x_ref, s_ref, *refs)
    else:
        def kernel(x_ref, *refs):
            kernel_impl(x_ref, None, *refs)
    return kernel


def _make_bwd_kernel(H: int, IB: int):
    def kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
               da_ref,
               dx_ref, dlns_ref, dlnb_ref, dwqkv_ref, dbqkv_ref,
               dwproj_ref, dbproj_ref,
               dlns_acc, dlnb_acc, dwqkv_acc, dbqkv_acc, dwproj_acc,
               dbproj_acc, sems):
        c = pl.program_id(0)
        b = pl.program_id(1)
        n_b = pl.num_programs(1)

        @pl.when(b == 0)
        def _init():
            dlns_acc[...] = jnp.zeros_like(dlns_acc)
            dlnb_acc[...] = jnp.zeros_like(dlnb_acc)
            dwqkv_acc[...] = jnp.zeros_like(dwqkv_acc)
            dbqkv_acc[...] = jnp.zeros_like(dbqkv_acc)
            dwproj_acc[...] = jnp.zeros_like(dwproj_acc)
            dbproj_acc[...] = jnp.zeros_like(dbproj_acc)

        for item in range(IB):
            _bwd_one(H, x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                     wproj_ref, da_ref, dx_ref, item,
                     dlns_acc, dlnb_acc, dwqkv_acc, dbqkv_acc, dwproj_acc,
                     dbproj_acc)

        @pl.when(b == n_b - 1)
        def _spill():
            for j, (acc, ref) in enumerate([
                    (dlns_acc, dlns_ref), (dlnb_acc, dlnb_ref),
                    (dwqkv_acc, dwqkv_ref), (dbqkv_acc, dbqkv_ref),
                    (dwproj_acc, dwproj_ref), (dbproj_acc, dbproj_ref)]):
                dma = pltpu.make_async_copy(acc, ref.at[c], sems.at[j])
                dma.start()
                dma.wait()

    return kernel


def _bwd_one(H, x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
             da_ref, dx_ref, item,
             dlns_acc, dlnb_acc, dwqkv_acc, dbqkv_acc, dwproj_acc,
             dbproj_acc):
        x = x_ref[0, item]
        N, D = x.shape
        hd = D // H
        scale = hd ** -0.5
        dtype = x.dtype
        da = da_ref[0, item].astype(jnp.float32)
        lns = lns_ref[0, 0].astype(jnp.float32)

        # ---- recompute forward
        hnorm, xhat, inv = _ln_fwd(x, lns_ref[0, 0], lnb_ref[0, 0])
        h = hnorm.astype(dtype)
        wqkv = wqkv_ref[0].astype(dtype)
        qkv = jnp.dot(h, wqkv, preferred_element_type=jnp.float32) \
            + bqkv_ref[0, 0].astype(jnp.float32)
        qkv = qkv.astype(dtype)
        outs, ps = _heads_fwd(qkv, D, H, hd, scale, dtype)
        cat = jnp.concatenate(outs, axis=1).astype(dtype)

        # ---- projection backward (matmul operands in the compute dtype —
        # bf16 runs the MXU at ~4x its f32 rate on v5e; accumulation f32)
        da_c = da.astype(dtype)
        dwproj = jax.lax.dot_general(cat, da_c,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        dbproj = jnp.sum(da, axis=0, keepdims=True)
        dcat = jax.lax.dot_general(da_c, wproj_ref[0].astype(dtype),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

        # ---- per-head attention backward (softmax grad math stays f32),
        # phase-separated like _heads_fwd so independent dots can overlap
        # the VPU softmax-gradient work
        dos = [dcat[:, hh * hd:(hh + 1) * hd].astype(dtype)
               for hh in range(H)]
        dvs = [jax.lax.dot_general(ps[hh].astype(dtype), dos[hh],
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               for hh in range(H)]
        dps = [jax.lax.dot_general(
                   dos[hh], qkv[:, 2 * D + hh * hd:2 * D + (hh + 1) * hd],
                   (((1,), (1,)), ((), ())),
                   preferred_element_type=jnp.float32)
               for hh in range(H)]
        dss = []
        for hh in range(H):
            p, dp = ps[hh], dps[hh]
            delta = jnp.sum(dp * p, axis=-1, keepdims=True)
            dss.append((p * (dp - delta)).astype(dtype))
        dqs = [jnp.dot(dss[hh], qkv[:, D + hh * hd:D + (hh + 1) * hd],
                       preferred_element_type=jnp.float32) * scale
               for hh in range(H)]
        dks = [jax.lax.dot_general(dss[hh], qkv[:, hh * hd:(hh + 1) * hd],
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) * scale
               for hh in range(H)]
        dqkv = jnp.concatenate(
            [jnp.concatenate(dqs, axis=1), jnp.concatenate(dks, axis=1),
             jnp.concatenate(dvs, axis=1)], axis=1)      # [N, 3D] f32

        # ---- qkv projection backward
        dqkv_c = dqkv.astype(dtype)
        dwqkv = jax.lax.dot_general(h, dqkv_c,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
        dh = jax.lax.dot_general(dqkv_c, wqkv,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)

        # ---- LayerNorm backward
        dg = dh * lns
        m1 = jnp.mean(dg, axis=-1, keepdims=True)
        m2 = jnp.mean(dg * xhat, axis=-1, keepdims=True)
        dx = inv * (dg - m1 - xhat * m2)
        dlns = jnp.sum(dh * xhat, axis=0, keepdims=True)
        dlnb = jnp.sum(dh, axis=0, keepdims=True)
        dx_ref[0, item] = dx.astype(dx_ref.dtype)

        dlns_acc[...] += dlns
        dlnb_acc[...] += dlnb
        dwqkv_acc[...] += dwqkv
        dbqkv_acc[...] += dbqkv
        dwproj_acc[...] += dwproj
        dbproj_acc[...] += dbproj


# ------------------------------------------------------------ pallas calls --

_FWD_VMEM_BUDGET = int(os.environ.get('FEDCOLA_ATTN_FWD_VMEM', 8 * 1024 * 1024))
_BWD_VMEM_BUDGET = int(os.environ.get('FEDCOLA_ATTN_BWD_VMEM', 8 * 1024 * 1024))


def _items_per_program(B: int, N: int, D: int, budget: int) -> int:
    """Amortise grid and MXU-pipeline overhead: as many batch items per
    program as the VMEM ``budget`` allows (the [N,3D] qkv + per-head score
    tiles are the per-item cost).  More items per program = more independent
    small dots for the scheduler to overlap with VPU softmax work — this is
    where the win is for short sequences (N=40 text)."""
    per_item = N * 3 * D * 4 * 2 + 3 * N * N * 4
    return _largest_ib(B, per_item, budget)


def _fwd_call(H, x, lns, lnb, wqkv, bqkv, wproj, bproj):
    """x: [n, B, N, D]; lns/lnb: [n, 1, D]; wqkv: [n, D, 3D];
    bqkv: [n, 1, 3D]; wproj: [n, D, D]; bproj: [n, 1, D]."""
    n, B, N, D = x.shape
    IB = _items_per_program(B, N, D, _FWD_VMEM_BUDGET)
    item = pl.BlockSpec((1, IB, N, D), lambda c, b: (c, b, 0, 0),
                        memory_space=pltpu.VMEM)
    per_c = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda c, b: (c,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_fwd_kernel(H, IB),
        name="attn_sublayer_fwd",
        grid=(n, B // IB),
        in_specs=[item, per_c((1, D)), per_c((1, D)), per_c((D, 3 * D)),
                  per_c((1, 3 * D)), per_c((D, D)), per_c((1, D))],
        out_specs=item,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * B * (N * D * 4 * D + 2 * N * N * D),
            bytes_accessed=2 * n * B * N * D * x.dtype.itemsize,
            transcendentals=n * B * H * N * N,
        ),
        interpret=_interpret(),
        compiler_params=_wide_params(D),
    )(x, lns, lnb, wqkv, bqkv, wproj, bproj)


def _bwd_call(H, x, lns, lnb, wqkv, bqkv, wproj, da):
    n, B, N, D = x.shape
    IB = _items_per_program(B, N, D, _BWD_VMEM_BUDGET)
    item = pl.BlockSpec((1, IB, N, D), lambda c, b: (c, b, 0, 0),
                        memory_space=pltpu.VMEM)
    per_c = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda c, b: (c,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    f32 = jnp.float32
    return pl.pallas_call(
        _make_bwd_kernel(H, IB),
        name="attn_sublayer_bwd",
        grid=(n, B // IB),
        in_specs=[item, per_c((1, D)), per_c((1, D)), per_c((D, 3 * D)),
                  per_c((1, 3 * D)), per_c((D, D)), item],
        out_specs=(item, any_spec, any_spec, any_spec, any_spec, any_spec,
                   any_spec),
        scratch_shapes=[pltpu.VMEM((1, D), f32), pltpu.VMEM((1, D), f32),
                        pltpu.VMEM((D, 3 * D), f32),
                        pltpu.VMEM((1, 3 * D), f32),
                        pltpu.VMEM((D, D), f32), pltpu.VMEM((1, D), f32),
                        pltpu.SemaphoreType.DMA((6,))],
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((n, 1, D), f32),
                   jax.ShapeDtypeStruct((n, 1, D), f32),
                   jax.ShapeDtypeStruct((n, D, 3 * D), f32),
                   jax.ShapeDtypeStruct((n, 1, 3 * D), f32),
                   jax.ShapeDtypeStruct((n, D, D), f32),
                   jax.ShapeDtypeStruct((n, 1, D), f32)),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * B * (N * D * 4 * D + 2 * N * N * D),
            bytes_accessed=4 * n * B * N * D * x.dtype.itemsize,
            transcendentals=2 * n * B * H * N * N,
        ),
        interpret=_interpret(),
        compiler_params=_wide_params(D),
    )(x, lns, lnb, wqkv, bqkv, wproj, da)


def _save_items_per_program(B: int, N: int, D: int, H: int,
                            budget: int) -> int:
    """IB for the residual-saving kernels: the p [H, N, N] and cat [N, D]
    blocks join the per-item VMEM bill."""
    per_item = (N * 3 * D * 4 * 2 + 3 * N * N * 4
                + H * N * N * 4 + N * D * 4)
    return _largest_ib(B, per_item, budget)


def _fwd_save_call(H, x, lns, lnb, wqkv, bqkv, wproj, bproj, s=None):
    n, B, N, D = x.shape
    IB = _save_items_per_program(B, N, D, H, _FWD_VMEM_BUDGET)
    item = pl.BlockSpec((1, IB, N, D), lambda c, b: (c, b, 0, 0),
                        memory_space=pltpu.VMEM)
    p_item = pl.BlockSpec((1, IB, H, N, N), lambda c, b: (c, b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    per_c = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda c, b: (c,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    # the [n, B] f32 scale vector rides whole-array in SMEM: a (1, IB)
    # VMEM block would violate Mosaic's last-dim 128 rule for thin arrays
    scale = pl.BlockSpec(memory_space=pltpu.SMEM)
    residual = s is not None
    in_specs = [item] + ([scale] if residual else []) + [
        per_c((1, D)), per_c((1, D)), per_c((D, 3 * D)),
        per_c((1, 3 * D)), per_c((D, D)), per_c((1, D))]
    args = (x,) + ((s,) if residual else ()) + (lns, lnb, wqkv, bqkv,
                                                wproj, bproj)
    return pl.pallas_call(
        _make_fwd_save_kernel(H, IB, residual),
        name=("attn_sublayer_res_fwd_save" if residual
              else "attn_sublayer_fwd_save") + f"_n{N}",
        grid=(n, B // IB),
        in_specs=in_specs,
        out_specs=(item, p_item, item),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((n, B, H, N, N), x.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * B * (N * D * 4 * D + 2 * N * N * D),
            bytes_accessed=n * B * (2 * N * D + H * N * N + N * D)
            * x.dtype.itemsize,
            transcendentals=n * B * H * N * N,
        ),
        interpret=_interpret(),
        compiler_params=_wide_params(D),
    )(*args)


def _bwd_save_call(H, x, lns, lnb, wqkv, bqkv, wproj, p, cat, da, s=None):
    n, B, N, D = x.shape
    IB = _save_items_per_program(B, N, D, H, _BWD_VMEM_BUDGET)
    item = pl.BlockSpec((1, IB, N, D), lambda c, b: (c, b, 0, 0),
                        memory_space=pltpu.VMEM)
    p_item = pl.BlockSpec((1, IB, H, N, N), lambda c, b: (c, b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    per_c = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda c, b: (c,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    f32 = jnp.float32
    scale = pl.BlockSpec(memory_space=pltpu.SMEM)  # whole-array, see fwd
    residual = s is not None
    in_specs = [item] + ([scale] if residual else []) + [
        per_c((1, D)), per_c((1, D)), per_c((D, 3 * D)),
        per_c((1, 3 * D)), per_c((D, D)), p_item, item, item]
    args = (x,) + ((s,) if residual else ()) + (lns, lnb, wqkv, bqkv,
                                                wproj, p, cat, da)
    return pl.pallas_call(
        _make_bwd_save_kernel(H, IB, residual),
        name=("attn_sublayer_res_bwd_save" if residual
              else "attn_sublayer_bwd_save") + f"_n{N}",
        grid=(n, B // IB),
        in_specs=in_specs,
        out_specs=(item, any_spec, any_spec, any_spec, any_spec, any_spec,
                   any_spec),
        scratch_shapes=[pltpu.VMEM((1, D), f32), pltpu.VMEM((1, D), f32),
                        pltpu.VMEM((D, 3 * D), f32),
                        pltpu.VMEM((1, 3 * D), f32),
                        pltpu.VMEM((D, D), f32), pltpu.VMEM((1, D), f32),
                        pltpu.SemaphoreType.DMA((6,))],
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((n, 1, D), f32),
                   jax.ShapeDtypeStruct((n, 1, D), f32),
                   jax.ShapeDtypeStruct((n, D, 3 * D), f32),
                   jax.ShapeDtypeStruct((n, 1, 3 * D), f32),
                   jax.ShapeDtypeStruct((n, D, D), f32),
                   jax.ShapeDtypeStruct((n, 1, D), f32)),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * B * (N * D * 4 * D + 2 * N * N * D),
            bytes_accessed=n * B * (4 * N * D + H * N * N) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
        compiler_params=_wide_params(D),
    )(*args)


# ------------------------------------------------ custom_vmap + custom_vjp --

# _batch_arg is shared: fedcola_tpu.ops.common.batch_arg (imported above)


@functools.lru_cache(maxsize=8)
def make_fused_attention_sublayer(num_heads: int,
                                  save_residuals: bool = False):
    """Returns fn(x[B,N,D], ln_scale[D], ln_bias[D], wqkv[D,3D], bqkv[3D],
    wproj[D,D], bproj[D]) -> a[B,N,D], differentiable and client-vmappable.

    ``save_residuals=True``: the differentiated forward emits the softmax
    probabilities and head concat as extra kernel outputs, and the backward
    consumes them instead of recomputing scores/softmax/AV — trading HBM
    round-trips for the small-dot pipeline drain that dominates backward
    time at hd=64.  Use WITHOUT a jax.checkpoint wrapper (a remat policy
    that doesn't save the residuals would force the expensive forward to
    run twice)."""
    H = num_heads

    @custom_vmap
    def fwd_cv(x, lns, lnb, wqkv, bqkv, wproj, bproj):
        return _fwd_call(H, x[None], lns[None], lnb[None], wqkv[None],
                         bqkv[None], wproj[None], bproj[None])[0]

    @fwd_cv.def_vmap
    def _fwd_rule(axis_size, in_batched, *args):
        args = [_batch_arg(a, b, axis_size)
                for a, b in zip(args, in_batched)]
        return _fwd_call(H, *args), True

    @custom_vmap
    def bwd_cv(x, lns, lnb, wqkv, bqkv, wproj, da):
        outs = _bwd_call(H, x[None], lns[None], lnb[None], wqkv[None],
                         bqkv[None], wproj[None], da[None])
        return tuple(o[0] for o in outs)

    @bwd_cv.def_vmap
    def _bwd_rule(axis_size, in_batched, *args):
        args = [_batch_arg(a, b, axis_size)
                for a, b in zip(args, in_batched)]
        return _bwd_call(H, *args), (True,) * 7

    @custom_vmap
    def fwd_save_cv(x, lns, lnb, wqkv, bqkv, wproj, bproj):
        outs = _fwd_save_call(H, x[None], lns[None], lnb[None], wqkv[None],
                              bqkv[None], wproj[None], bproj[None])
        return tuple(o[0] for o in outs)

    @fwd_save_cv.def_vmap
    def _fwd_save_rule(axis_size, in_batched, *args):
        args = [_batch_arg(a, b, axis_size)
                for a, b in zip(args, in_batched)]
        return _fwd_save_call(H, *args), (True,) * 3

    @custom_vmap
    def bwd_save_cv(x, lns, lnb, wqkv, bqkv, wproj, p, cat, da):
        outs = _bwd_save_call(H, x[None], lns[None], lnb[None], wqkv[None],
                              bqkv[None], wproj[None], p[None], cat[None],
                              da[None])
        return tuple(o[0] for o in outs)

    @bwd_save_cv.def_vmap
    def _bwd_save_rule(axis_size, in_batched, *args):
        args = [_batch_arg(a, b, axis_size)
                for a, b in zip(args, in_batched)]
        return _bwd_save_call(H, *args), (True,) * 7

    @jax.custom_vjp
    def sublayer(x, lns, lnb, wqkv, bqkv, wproj, bproj):
        return fwd_cv(x, lns.reshape(1, -1), lnb.reshape(1, -1), wqkv,
                      bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1))

    def vjp_fwd(x, lns, lnb, wqkv, bqkv, wproj, bproj):
        if save_residuals:
            out, p, cat = fwd_save_cv(
                x, lns.reshape(1, -1), lnb.reshape(1, -1), wqkv,
                bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1))
            return out, (x, lns, lnb, wqkv, bqkv, wproj, bproj, p, cat)
        out = fwd_cv(x, lns.reshape(1, -1), lnb.reshape(1, -1), wqkv,
                     bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1))
        return out, (x, lns, lnb, wqkv, bqkv, wproj, bproj, None)

    def vjp_bwd(res, da):
        if save_residuals:
            x, lns, lnb, wqkv, bqkv, wproj, bproj, p, cat = res
            grads = bwd_save_cv(
                x, lns.reshape(1, -1), lnb.reshape(1, -1), wqkv,
                bqkv.reshape(1, -1), wproj, p, cat, da)
        else:
            x, lns, lnb, wqkv, bqkv, wproj, bproj, _ = res
            grads = bwd_cv(
                x, lns.reshape(1, -1), lnb.reshape(1, -1), wqkv,
                bqkv.reshape(1, -1), wproj, da)
        dx, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj = grads
        return (dx,
                dlns.reshape(lns.shape).astype(lns.dtype),
                dlnb.reshape(lnb.shape).astype(lnb.dtype),
                dwqkv.astype(wqkv.dtype),
                dbqkv.reshape(bqkv.shape).astype(bqkv.dtype),
                dwproj.astype(wproj.dtype),
                dbproj.reshape(bproj.shape).astype(bproj.dtype))

    sublayer.defvjp(vjp_fwd, vjp_bwd)
    return sublayer


@functools.lru_cache(maxsize=8)
def make_fused_attention_residual_sublayer(num_heads: int):
    """Residual-folded save-residuals variant:
    fn(x, s, lns, lnb, wqkv, bqkv, wproj, bproj) -> x + s*attn_sublayer(x),
    where s is a per-sample [B] DropPath scale (ones when stochastic depth
    is off).  The residual join and DropPath select run inside the
    kernels, removing a full [B, N, D] XLA read-modify-write pass per
    sublayer per direction; s receives a zero gradient (it is an RNG
    draw, not a parameter)."""
    H = num_heads

    @custom_vmap
    def fwd_cv(x, s, lns, lnb, wqkv, bqkv, wproj, bproj):
        outs = _fwd_save_call(H, x[None], lns[None], lnb[None], wqkv[None],
                              bqkv[None], wproj[None], bproj[None],
                              s=s[None])
        return tuple(o[0] for o in outs)

    @fwd_cv.def_vmap
    def _fwd_rule(axis_size, in_batched, *args):
        args = [_batch_arg(a, b, axis_size)
                for a, b in zip(args, in_batched)]
        x, s, lns, lnb, wqkv, bqkv, wproj, bproj = args
        return _fwd_save_call(H, x, lns, lnb, wqkv, bqkv, wproj, bproj,
                              s=s), (True,) * 3

    @custom_vmap
    def bwd_cv(x, s, lns, lnb, wqkv, bqkv, wproj, p, cat, da):
        outs = _bwd_save_call(H, x[None], lns[None], lnb[None], wqkv[None],
                              bqkv[None], wproj[None], p[None], cat[None],
                              da[None], s=s[None])
        return tuple(o[0] for o in outs)

    @bwd_cv.def_vmap
    def _bwd_rule(axis_size, in_batched, *args):
        args = [_batch_arg(a, b, axis_size)
                for a, b in zip(args, in_batched)]
        x, s, lns, lnb, wqkv, bqkv, wproj, p, cat, da = args
        return _bwd_save_call(H, x, lns, lnb, wqkv, bqkv, wproj, p, cat,
                              da, s=s), (True,) * 7

    @jax.custom_vjp
    def sublayer(x, s, lns, lnb, wqkv, bqkv, wproj, bproj):
        out, _, _ = fwd_cv(x, s, lns.reshape(1, -1), lnb.reshape(1, -1),
                           wqkv, bqkv.reshape(1, -1), wproj,
                           bproj.reshape(1, -1))
        return out

    def vjp_fwd(x, s, lns, lnb, wqkv, bqkv, wproj, bproj):
        out, p, cat = fwd_cv(x, s, lns.reshape(1, -1), lnb.reshape(1, -1),
                             wqkv, bqkv.reshape(1, -1), wproj,
                             bproj.reshape(1, -1))
        return out, (x, s, lns, lnb, wqkv, bqkv, wproj, bproj, p, cat)

    def vjp_bwd(res, da):
        x, s, lns, lnb, wqkv, bqkv, wproj, bproj, p, cat = res
        dx, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj = bwd_cv(
            x, s, lns.reshape(1, -1), lnb.reshape(1, -1), wqkv,
            bqkv.reshape(1, -1), wproj, p, cat, da)
        return (dx,
                jnp.zeros_like(s),
                dlns.reshape(lns.shape).astype(lns.dtype),
                dlnb.reshape(lnb.shape).astype(lnb.dtype),
                dwqkv.astype(wqkv.dtype),
                dbqkv.reshape(bqkv.shape).astype(bqkv.dtype),
                dwproj.astype(wproj.dtype),
                dbproj.reshape(bproj.shape).astype(bproj.dtype))

    sublayer.defvjp(vjp_fwd, vjp_bwd)
    return sublayer
