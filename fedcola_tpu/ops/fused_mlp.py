"""Fused transformer MLP Pallas kernels: fc1 -> exact GELU -> fc2 without
materialising the 4x-wide hidden activation in HBM.

The MAT block's MLP (reference Mlp, mome.py:100-123) is the largest HBM
consumer after attention at MAT shapes: the [rows, 4D] hidden tensor is
written+read in the forward and twice more in the backward.  These kernels
tile the flattened token rows, keep the hidden tile in VMEM, and the custom
VJP recomputes the hidden activations per tile in the backward (consistent
with the framework's full-remat stance — HBM bandwidth is the scarce
resource on v5e).

Batching design: jax's default pallas vmap widens every block with the
mapped axis, so under the client-vmapped training programs the f32 dW
accumulators would scale with n_clients and blow the 16MB VMEM budget.
A ``custom_vmap`` rule instead maps the client axis onto an **outer grid
dimension** — each program still holds exactly one client's weights and one
row tile, and the dW accumulation runs per client over the (sequential,
fastest-iterating) row-tile dimension.

dW/db gradients accumulate across row tiles in f32 inside the output refs:
TPU grids iterate row-major, so read-modify-write accumulation per client
is the standard k-loop pattern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Row-tile sizes swept on a real v5e at the ViT-small MAT shape
# (scripts/perf_sweep.py): fwd 512 > 1024; bwd 256 > 128/384/512 (OOM).
_FWD_ROWS = int(os.environ.get("FEDCOLA_MLP_FWD_ROWS", 512))
_BWD_ROWS = int(os.environ.get("FEDCOLA_MLP_BWD_ROWS", 256))


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation (|err| < 1.5e-7):
    Mosaic has no erf/erfc primitive, but exp is native."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    # explicit erf form of torch's default (exact) GELU
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865475))


from fedcola_tpu.ops.common import (batch_arg as _batch_arg,
                                    interpret as _interpret,
                                    items_per_program as _largest_ib,
                                    wide_compiler_params as _wide_params)


# ------------------------------------------------------------- kernels -----

def _fwd_math(x, w1, b1, w2, b2, o_dtype):
    h = jnp.dot(x, w1.astype(x.dtype), preferred_element_type=jnp.float32)
    h = _gelu_exact(h + b1.astype(jnp.float32)).astype(x.dtype)
    o = jnp.dot(h, w2.astype(x.dtype), preferred_element_type=jnp.float32)
    return (o + b2.astype(jnp.float32)).astype(o_dtype)


def _bwd_math(x, w1, b1, w2, do):
    """Matmul *operands* stay in the compute dtype (bf16 on the fast path —
    the MXU runs bf16 at ~4x its f32 rate on v5e); every accumulation and
    all elementwise GELU-derivative math is f32."""
    dt = x.dtype
    w1 = w1.astype(dt)
    w2 = w2.astype(dt)
    do = do.astype(dt)
    pre = jnp.dot(x, w1, preferred_element_type=jnp.float32) \
        + b1.astype(jnp.float32)
    h = _gelu_exact(pre)
    dh = jax.lax.dot_general(do, w2, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    inv_sqrt2 = 0.7071067811865475
    cdf = 0.5 * (1.0 + _erf(pre * inv_sqrt2))
    pdf = jnp.exp(-0.5 * pre * pre) * 0.3989422804014327
    dpre = dh * (cdf + pre * pdf)
    dpre_c = dpre.astype(dt)
    dx = jax.lax.dot_general(dpre_c, w1, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dw1 = jax.lax.dot_general(x, dpre_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dpre, axis=0, keepdims=True)
    dw2 = jax.lax.dot_general(h.astype(dt), do, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db2 = jnp.sum(do.astype(jnp.float32), axis=0, keepdims=True)
    return dx, dw1, db1, dw2, db2


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    o_ref[0] = _fwd_math(x_ref[0], w1_ref[0], b1_ref[0], w2_ref[0],
                         b2_ref[0], o_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, do_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dw1_acc, db1_acc, dw2_acc, db2_acc, sems):
    """dW accumulation lives in single-buffered VMEM scratch (both
    double-buffered output blocks and the weight operands competing for the
    16MB budget); results DMA to HBM-resident outputs on each client's last
    row tile."""
    dx, dw1, db1, dw2, db2 = _bwd_math(x_ref[0], w1_ref[0], b1_ref[0],
                                       w2_ref[0], do_ref[0])
    dx_ref[0] = dx.astype(dx_ref.dtype)
    c = pl.program_id(0)
    i = pl.program_id(1)  # row-tile grid dim (iterates fastest)
    n_tiles = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        dw1_acc[...] = jnp.zeros_like(dw1_acc)
        db1_acc[...] = jnp.zeros_like(db1_acc)
        dw2_acc[...] = jnp.zeros_like(dw2_acc)
        db2_acc[...] = jnp.zeros_like(db2_acc)

    dw1_acc[...] += dw1
    db1_acc[...] += db1
    dw2_acc[...] += dw2
    db2_acc[...] += db2

    @pl.when(i == n_tiles - 1)
    def _spill():
        for j, (acc, ref) in enumerate([
                (dw1_acc, dw1_ref), (db1_acc, db1_ref),
                (dw2_acc, dw2_ref), (db2_acc, db2_ref)]):
            dma = pltpu.make_async_copy(acc, ref.at[c], sems.at[j])
            dma.start()
            dma.wait()


def _pad_rows(x, r, axis):
    rows = x.shape[axis]
    pad = (-rows) % r
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x, rows


# --------------------------------------------------- batched pallas calls ---

def _fwd_call(x, w1, b1, w2, b2):
    """x: [n, rows, D]; w1: [n, D, H]; b1: [n, 1, H]; w2: [n, H, D];
    b2: [n, 1, D] -> [n, rows, D].  Grid (n, row_tiles)."""
    n, _, D = x.shape
    Hd = w1.shape[-1]
    xp, rows = _pad_rows(x, _FWD_ROWS, axis=1)
    R = _FWD_ROWS
    row = pl.BlockSpec((1, R, D), lambda c, i: (c, i, 0),
                       memory_space=pltpu.VMEM)
    per_c = lambda shape: pl.BlockSpec((1,) + shape,
                                       lambda c, i: (c,) + (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        _fwd_kernel,
        name="mlp_fwd_rows",
        grid=(n, xp.shape[1] // R),
        in_specs=[row, per_c((D, Hd)), per_c((1, Hd)), per_c((Hd, D)),
                  per_c((1, D))],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * xp.shape[1] * D * Hd,
            bytes_accessed=(n * xp.shape[1] * D * 2 + n * D * Hd * 2)
            * x.dtype.itemsize,
            transcendentals=n * xp.shape[1] * Hd,
        ),
        interpret=_interpret(),
        compiler_params=_wide_params(D),
    )(xp, w1, b1, w2, b2)
    return o[:, :rows]


def _bwd_call(x, w1, b1, w2, do):
    n, _, D = x.shape
    Hd = w1.shape[-1]
    xp, rows = _pad_rows(x, _BWD_ROWS, axis=1)
    dop, _ = _pad_rows(do, _BWD_ROWS, axis=1)
    R = _BWD_ROWS
    row = pl.BlockSpec((1, R, D), lambda c, i: (c, i, 0),
                       memory_space=pltpu.VMEM)
    per_c = lambda shape: pl.BlockSpec((1,) + shape,
                                       lambda c, i: (c,) + (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        name="mlp_bwd_rows",
        grid=(n, xp.shape[1] // R),
        in_specs=[row, per_c((D, Hd)), per_c((1, Hd)), per_c((Hd, D)), row],
        out_specs=(row,
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[pltpu.VMEM((D, Hd), jnp.float32),
                        pltpu.VMEM((1, Hd), jnp.float32),
                        pltpu.VMEM((Hd, D), jnp.float32),
                        pltpu.VMEM((1, D), jnp.float32),
                        pltpu.SemaphoreType.DMA((4,))],
        out_shape=(jax.ShapeDtypeStruct(xp.shape, x.dtype),
                   jax.ShapeDtypeStruct((n, D, Hd), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1, Hd), jnp.float32),
                   jax.ShapeDtypeStruct((n, Hd, D), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1, D), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=12 * n * xp.shape[1] * D * Hd,
            bytes_accessed=(n * xp.shape[1] * D * 4 + n * D * Hd * 4) * 4,
            transcendentals=2 * n * xp.shape[1] * Hd,
        ),
        interpret=_interpret(),
        compiler_params=_wide_params(D),
    )(xp, w1, b1, w2, dop)
    return dx[:, :rows], dw1, db1, dw2, db2


# ------------------------------------------------ custom_vmap + custom_vjp --

# _batch_arg is shared: fedcola_tpu.ops.common.batch_arg (imported above)


@custom_vmap
def _fwd_cv(x, w1, b1, w2, b2):
    return _fwd_call(x[None], w1[None], b1[None], w2[None], b2[None])[0]


@_fwd_cv.def_vmap
def _fwd_cv_rule(axis_size, in_batched, x, w1, b1, w2, b2):
    args = [_batch_arg(a, b, axis_size)
            for a, b in zip((x, w1, b1, w2, b2), in_batched)]
    return _fwd_call(*args), True


@custom_vmap
def _bwd_cv(x, w1, b1, w2, do):
    dx, dw1, db1, dw2, db2 = _bwd_call(x[None], w1[None], b1[None],
                                       w2[None], do[None])
    return dx[0], dw1[0], db1[0], dw2[0], db2[0]


@_bwd_cv.def_vmap
def _bwd_cv_rule(axis_size, in_batched, x, w1, b1, w2, do):
    args = [_batch_arg(a, b, axis_size)
            for a, b in zip((x, w1, b1, w2, do), in_batched)]
    out = _bwd_call(*args)
    return out, (True,) * 5


@jax.custom_vjp
def fused_mlp(x, w1, b1, w2, b2):
    """x: [rows, D]; w1: [D, H]; b1: [H]; w2: [H, D]; b2: [D] -> [rows, D]."""
    return _fwd_cv(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


def _vjp_fwd(x, w1, b1, w2, b2):
    out = _fwd_cv(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out, (x, w1, b1, w2, b2)


def _vjp_bwd(res, do):
    x, w1, b1, w2, b2 = res
    dx, dw1, db1, dw2, db2 = _bwd_cv(x, w1, b1.reshape(1, -1), w2, do)
    return (dx, dw1.astype(w1.dtype), db1.reshape(b1.shape).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape(b2.shape).astype(b2.dtype))


fused_mlp.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------------- LN-fused MLP sublayer ---
# The full pre-residual MLP path of a MAT block:
#     m = fc2( GELU( fc1( LayerNorm(x) ) ) )
# Folding the LayerNorm in (like the attention sublayer's LN1) removes the
# XLA-side LN op and its f32 activation round-trips between kernels — the
# LN intermediates live and die in VMEM.

def _ln_rows(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * inv
    return xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32), \
        xhat, inv


def _ln_fwd_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   o_ref):
    hnorm, _, _ = _ln_rows(x_ref[0], lns_ref[0, 0], lnb_ref[0, 0])
    o_ref[0] = _fwd_math(hnorm.astype(x_ref.dtype), w1_ref[0], b1_ref[0],
                         w2_ref[0], b2_ref[0], o_ref.dtype)


def _ln_bwd_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, do_ref,
                   dx_ref, dlns_ref, dlnb_ref, dw1_ref, db1_ref, dw2_ref,
                   db2_ref,
                   dlns_acc, dlnb_acc, dw1_acc, db1_acc, dw2_acc, db2_acc,
                   sems):
    x = x_ref[0]
    dt = x.dtype
    lns = lns_ref[0, 0].astype(jnp.float32)
    hnorm, xhat, inv = _ln_rows(x, lns_ref[0, 0], lnb_ref[0, 0])
    hc = hnorm.astype(dt)
    w1 = w1_ref[0].astype(dt)
    w2 = w2_ref[0].astype(dt)
    do = do_ref[0].astype(dt)
    pre = jnp.dot(hc, w1, preferred_element_type=jnp.float32) \
        + b1_ref[0].astype(jnp.float32)
    h = _gelu_exact(pre)
    dh = jax.lax.dot_general(do, w2, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    cdf = 0.5 * (1.0 + _erf(pre * 0.7071067811865475))
    pdf = jnp.exp(-0.5 * pre * pre) * 0.3989422804014327
    dpre = dh * (cdf + pre * pdf)
    dpre_c = dpre.astype(dt)
    dhnorm = jax.lax.dot_general(dpre_c, w1, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dw1 = jax.lax.dot_general(hc, dpre_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dpre, axis=0, keepdims=True)
    dw2 = jax.lax.dot_general(h.astype(dt), do, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db2 = jnp.sum(do.astype(jnp.float32), axis=0, keepdims=True)
    # LayerNorm backward
    dg = dhnorm * lns
    m1 = jnp.mean(dg, axis=-1, keepdims=True)
    m2 = jnp.mean(dg * xhat, axis=-1, keepdims=True)
    dx = inv * (dg - m1 - xhat * m2)
    dlns = jnp.sum(dhnorm * xhat, axis=0, keepdims=True)
    dlnb = jnp.sum(dhnorm, axis=0, keepdims=True)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    c = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        dlns_acc[...] = jnp.zeros_like(dlns_acc)
        dlnb_acc[...] = jnp.zeros_like(dlnb_acc)
        dw1_acc[...] = jnp.zeros_like(dw1_acc)
        db1_acc[...] = jnp.zeros_like(db1_acc)
        dw2_acc[...] = jnp.zeros_like(dw2_acc)
        db2_acc[...] = jnp.zeros_like(db2_acc)

    dlns_acc[...] += dlns
    dlnb_acc[...] += dlnb
    dw1_acc[...] += dw1
    db1_acc[...] += db1
    dw2_acc[...] += dw2
    db2_acc[...] += db2

    @pl.when(i == n_tiles - 1)
    def _spill():
        for j, (acc, ref) in enumerate([
                (dlns_acc, dlns_ref), (dlnb_acc, dlnb_ref),
                (dw1_acc, dw1_ref), (db1_acc, db1_ref),
                (dw2_acc, dw2_ref), (db2_acc, db2_ref)]):
            dma = pltpu.make_async_copy(acc, ref.at[c], sems.at[j])
            dma.start()
            dma.wait()


def _ln_fwd_call(x, lns, lnb, w1, b1, w2, b2):
    n, _, D = x.shape
    Hd = w1.shape[-1]
    xp, rows = _pad_rows(x, _FWD_ROWS, axis=1)
    R = _FWD_ROWS
    row = pl.BlockSpec((1, R, D), lambda c, i: (c, i, 0),
                       memory_space=pltpu.VMEM)
    per_c = lambda shape: pl.BlockSpec((1,) + shape,
                                       lambda c, i: (c,) + (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        _ln_fwd_kernel,
        name="mlp_ln_fwd_rows",
        grid=(n, xp.shape[1] // R),
        in_specs=[row, per_c((1, D)), per_c((1, D)), per_c((D, Hd)),
                  per_c((1, Hd)), per_c((Hd, D)), per_c((1, D))],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * xp.shape[1] * D * Hd,
            bytes_accessed=(n * xp.shape[1] * D * 2 + n * D * Hd * 2)
            * x.dtype.itemsize,
            transcendentals=n * xp.shape[1] * Hd,
        ),
        interpret=_interpret(),
        compiler_params=_wide_params(D),
    )(xp, lns, lnb, w1, b1, w2, b2)
    return o[:, :rows]


def _ln_bwd_call(x, lns, lnb, w1, b1, w2, do):
    n, _, D = x.shape
    Hd = w1.shape[-1]
    xp, rows = _pad_rows(x, _BWD_ROWS, axis=1)
    dop, _ = _pad_rows(do, _BWD_ROWS, axis=1)
    R = _BWD_ROWS
    row = pl.BlockSpec((1, R, D), lambda c, i: (c, i, 0),
                       memory_space=pltpu.VMEM)
    per_c = lambda shape: pl.BlockSpec((1,) + shape,
                                       lambda c, i: (c,) + (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    anys = pl.BlockSpec(memory_space=pl.ANY)
    f32 = jnp.float32
    outs = pl.pallas_call(
        _ln_bwd_kernel,
        name="mlp_ln_bwd_rows",
        grid=(n, xp.shape[1] // R),
        in_specs=[row, per_c((1, D)), per_c((1, D)), per_c((D, Hd)),
                  per_c((1, Hd)), per_c((Hd, D)), row],
        out_specs=(row,) + (anys,) * 6,
        scratch_shapes=[pltpu.VMEM((1, D), f32), pltpu.VMEM((1, D), f32),
                        pltpu.VMEM((D, Hd), f32), pltpu.VMEM((1, Hd), f32),
                        pltpu.VMEM((Hd, D), f32), pltpu.VMEM((1, D), f32),
                        pltpu.SemaphoreType.DMA((6,))],
        out_shape=(jax.ShapeDtypeStruct(xp.shape, x.dtype),
                   jax.ShapeDtypeStruct((n, 1, D), f32),
                   jax.ShapeDtypeStruct((n, 1, D), f32),
                   jax.ShapeDtypeStruct((n, D, Hd), f32),
                   jax.ShapeDtypeStruct((n, 1, Hd), f32),
                   jax.ShapeDtypeStruct((n, Hd, D), f32),
                   jax.ShapeDtypeStruct((n, 1, D), f32)),
        cost_estimate=pl.CostEstimate(
            flops=12 * n * xp.shape[1] * D * Hd,
            bytes_accessed=(n * xp.shape[1] * D * 4 + n * D * Hd * 4) * 4,
            transcendentals=2 * n * xp.shape[1] * Hd,
        ),
        interpret=_interpret(),
        compiler_params=_wide_params(D),
    )(xp, lns, lnb, w1, b1, w2, dop)
    return (outs[0][:, :rows],) + tuple(outs[1:])


@custom_vmap
def _ln_fwd_cv(x, lns, lnb, w1, b1, w2, b2):
    return _ln_fwd_call(x[None], lns[None], lnb[None], w1[None], b1[None],
                        w2[None], b2[None])[0]


@_ln_fwd_cv.def_vmap
def _ln_fwd_cv_rule(axis_size, in_batched, *args):
    args = [_batch_arg(a, b, axis_size) for a, b in zip(args, in_batched)]
    return _ln_fwd_call(*args), True


@custom_vmap
def _ln_bwd_cv(x, lns, lnb, w1, b1, w2, do):
    outs = _ln_bwd_call(x[None], lns[None], lnb[None], w1[None], b1[None],
                        w2[None], do[None])
    return tuple(o[0] for o in outs)


@_ln_bwd_cv.def_vmap
def _ln_bwd_cv_rule(axis_size, in_batched, *args):
    args = [_batch_arg(a, b, axis_size) for a, b in zip(args, in_batched)]
    return _ln_bwd_call(*args), (True,) * 7


@jax.custom_vjp
def fused_mlp_sublayer(x, lns, lnb, w1, b1, w2, b2):
    """The complete pre-residual MLP path, LayerNorm included:
    x: [rows, D] -> fc2(GELU(fc1(LN(x)))) [rows, D]."""
    return _ln_fwd_cv(x, lns.reshape(1, -1), lnb.reshape(1, -1), w1,
                      b1.reshape(1, -1), w2, b2.reshape(1, -1))


def _ln_vjp_fwd(x, lns, lnb, w1, b1, w2, b2):
    out = _ln_fwd_cv(x, lns.reshape(1, -1), lnb.reshape(1, -1), w1,
                     b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out, (x, lns, lnb, w1, b1, w2, b2)


def _ln_vjp_bwd(res, do):
    x, lns, lnb, w1, b1, w2, b2 = res
    dx, dlns, dlnb, dw1, db1, dw2, db2 = _ln_bwd_cv(
        x, lns.reshape(1, -1), lnb.reshape(1, -1), w1, b1.reshape(1, -1),
        w2, do)
    return (dx,
            dlns.reshape(lns.shape).astype(lns.dtype),
            dlnb.reshape(lnb.shape).astype(lnb.dtype),
            dw1.astype(w1.dtype),
            db1.reshape(b1.shape).astype(b1.dtype),
            dw2.astype(w2.dtype),
            db2.reshape(b2.shape).astype(b2.dtype))


fused_mlp_sublayer.defvjp(_ln_vjp_fwd, _ln_vjp_bwd)


# ---------------------------------------------- item-mode MLP sublayer -----
# Same math as fused_mlp_sublayer but shaped [B, N, D]: the grid runs over
# batch items like the attention kernels, so the caller never flattens
# [B, N, D] -> [B*N, D].  That flatten is NOT free on TPU: N=197 breaks the
# (8,128) sublane tiling at every item boundary, so XLA materialises a
# physical relayout of the whole activation before AND after the rows-mode
# kernel (~3.4 ms/step at the bench shape), plus row padding.

def _mlp_items_per_program(B: int, N: int, Hd: int, budget: int) -> int:
    per_item = N * Hd * 4 * 3          # pre/h/dpre f32 tiles dominate
    return _largest_ib(B, per_item, budget)


_MLP_VMEM_BUDGET = int(os.environ.get("FEDCOLA_MLP_VMEM", 8 * 1024 * 1024))
# backward phase-group size (items whose VPU/MXU phases interleave);
# experiment knob for scripts/perf_sweep.py.  Clamped to >= 1: a
# non-positive group size would make the kernel's item loop empty and
# return never-written VMEM as gradients.
_MLP_BWD_G = max(1, int(os.environ.get("FEDCOLA_MLP_BWD_G", 2)))


def _make_ln_item_fwd_kernel(IB: int, residual: bool = False):
    """Phase-separated across items: all LNs (VPU), all fc1 dots (MXU),
    all GELUs (VPU), all fc2 dots (MXU) — each phase's ops are
    independent, so the scheduler can overlap one item's GELU with the
    next item's matmul instead of serialising the per-item chain.

    ``residual=True`` folds the residual join into the kernel:
    out = x + s_i * mlp(LN(x)) with a per-sample DropPath scale s (ones
    when stochastic depth is off) — removes the separate XLA
    residual-add pass over [B, N, D] per sublayer."""
    def body(x_ref, s_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
             b2_ref, o_ref):
        dt = x_ref.dtype
        w1 = w1_ref[0].astype(dt)
        w2 = w2_ref[0].astype(dt)
        hs = [_ln_rows(x_ref[0, i], lns_ref[0, 0], lnb_ref[0, 0])[0]
              .astype(dt) for i in range(IB)]
        pres = [jnp.dot(h, w1, preferred_element_type=jnp.float32)
                + b1_ref[0].astype(jnp.float32) for h in hs]
        gs = [_gelu_exact(p).astype(dt) for p in pres]
        for i in range(IB):
            o = jnp.dot(gs[i], w2, preferred_element_type=jnp.float32) \
                + b2_ref[0].astype(jnp.float32)
            if s_ref is not None:
                # s lives whole-array in SMEM (thin [n, B] f32 vector);
                # absolute index via the program ids
                s = s_ref[pl.program_id(0), pl.program_id(1) * IB + i]
                o = x_ref[0, i].astype(jnp.float32) + s * o
            o_ref[0, i] = o.astype(o_ref.dtype)

    if residual:
        def kernel(x_ref, s_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                   b2_ref, o_ref):
            body(x_ref, s_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                 b2_ref, o_ref)
    else:
        def kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                   b2_ref, o_ref):
            body(x_ref, None, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                 b2_ref, o_ref)
    return kernel


def _make_ln_item_bwd_kernel(IB: int, residual: bool = False):
    def kernel_impl(x_ref, s_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                    do_ref,
                    dx_ref, dlns_ref, dlnb_ref, dw1_ref, db1_ref, dw2_ref,
                    db2_ref,
                    dlns_acc, dlnb_acc, dw1_acc, db1_acc, dw2_acc, db2_acc,
                    sems):
        c = pl.program_id(0)
        b = pl.program_id(1)
        n_b = pl.num_programs(1)

        @pl.when(b == 0)
        def _init():
            dlns_acc[...] = jnp.zeros_like(dlns_acc)
            dlnb_acc[...] = jnp.zeros_like(dlnb_acc)
            dw1_acc[...] = jnp.zeros_like(dw1_acc)
            db1_acc[...] = jnp.zeros_like(db1_acc)
            dw2_acc[...] = jnp.zeros_like(dw2_acc)
            db2_acc[...] = jnp.zeros_like(db2_acc)

        # phase-separated across item groups of 2 (activation-sized
        # intermediates only; the weight-gradient dots accumulate inline
        # so at most ONE [D,Hd]-sized temporary is live — IB-wide phasing
        # of dw temporaries blew the 16MB VMEM stack at small-N shapes
        # where IB grows large)
        dt = x_ref.dtype
        lns = lns_ref[0, 0].astype(jnp.float32)
        w1 = w1_ref[0].astype(dt)
        w2 = w2_ref[0].astype(dt)
        for g0 in range(0, IB, _MLP_BWD_G):
            group = range(g0, min(g0 + _MLP_BWD_G, IB))
            lnouts = {i: _ln_rows(x_ref[0, i], lns_ref[0, 0], lnb_ref[0, 0])
                      for i in group}
            hcs = {i: lnouts[i][0].astype(dt) for i in group}
            # residual fold: the sublayer output was x + s*f(x), so the
            # branch gradient is s*do (s from whole-array SMEM at
            # absolute [c, b*IB+i]; f32 scale, then compute dtype)
            dos = {i: ((do_ref[0, i].astype(jnp.float32)
                        * s_ref[c, b * IB + i]).astype(dt)
                       if s_ref is not None
                       else do_ref[0, i].astype(dt)) for i in group}
            pres = {i: jnp.dot(hcs[i], w1,
                               preferred_element_type=jnp.float32)
                    + b1_ref[0].astype(jnp.float32) for i in group}
            dhs = {i: jax.lax.dot_general(dos[i], w2,
                                          (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
                   for i in group}
            hs, dpres = {}, {}
            for i in group:
                pre = pres[i]
                hs[i] = _gelu_exact(pre)
                cdf = 0.5 * (1.0 + _erf(pre * 0.7071067811865475))
                pdf = jnp.exp(-0.5 * pre * pre) * 0.3989422804014327
                dpres[i] = dhs[i] * (cdf + pre * pdf)
            dpre_cs = {i: dpres[i].astype(dt) for i in group}
            dhnorms = {i: jax.lax.dot_general(
                           dpre_cs[i], w1, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)
                       for i in group}
            for i in group:
                dw1_acc[...] += jax.lax.dot_general(
                    hcs[i], dpre_cs[i], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dw2_acc[...] += jax.lax.dot_general(
                    hs[i].astype(dt), dos[i], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                _, xhat, inv = lnouts[i]
                dhnorm = dhnorms[i]
                dg = dhnorm * lns
                m1 = jnp.mean(dg, axis=-1, keepdims=True)
                m2 = jnp.mean(dg * xhat, axis=-1, keepdims=True)
                dx = inv * (dg - m1 - xhat * m2)
                if s_ref is not None:   # + identity branch of the residual
                    dx = dx + do_ref[0, i].astype(jnp.float32)
                dx_ref[0, i] = dx.astype(dx_ref.dtype)
                dlns_acc[...] += jnp.sum(dhnorm * xhat, axis=0,
                                         keepdims=True)
                dlnb_acc[...] += jnp.sum(dhnorm, axis=0, keepdims=True)
                db1_acc[...] += jnp.sum(dpres[i], axis=0, keepdims=True)
                db2_acc[...] += jnp.sum(dos[i].astype(jnp.float32), axis=0,
                                        keepdims=True)

        @pl.when(b == n_b - 1)
        def _spill():
            for j, (acc, ref) in enumerate([
                    (dlns_acc, dlns_ref), (dlnb_acc, dlnb_ref),
                    (dw1_acc, dw1_ref), (db1_acc, db1_ref),
                    (dw2_acc, dw2_ref), (db2_acc, db2_ref)]):
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


def _ln_item_fwd_call(x, lns, lnb, w1, b1, w2, b2, s=None):
    n, B, N, D = x.shape
    Hd = w1.shape[-1]
    IB = _mlp_items_per_program(B, N, Hd, _MLP_VMEM_BUDGET)
    item = pl.BlockSpec((1, IB, N, D), lambda c, b: (c, b, 0, 0),
                        memory_space=pltpu.VMEM)
    per_c = lambda shape: pl.BlockSpec((1,) + shape,
                                       lambda c, b: (c,) + (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    scale = pl.BlockSpec(memory_space=pltpu.SMEM)  # whole-array [n, B]
    residual = s is not None
    in_specs = [item] + ([scale] if residual else []) + [
        per_c((1, D)), per_c((1, D)), per_c((D, Hd)),
        per_c((1, Hd)), per_c((Hd, D)), per_c((1, D))]
    args = (x,) + ((s,) if residual else ()) + (lns, lnb, w1, b1, w2, b2)
    return pl.pallas_call(
        _make_ln_item_fwd_kernel(IB, residual),
        name=("mlp_ln_res_fwd_items" if residual
              else "mlp_ln_fwd_items") + f"_n{N}",
        grid=(n, B // IB),
        in_specs=in_specs,
        out_specs=item,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * B * N * D * Hd,
            bytes_accessed=(n * B * N * D * 2 + n * D * Hd * 2)
            * x.dtype.itemsize,
            transcendentals=n * B * N * Hd,
        ),
        interpret=_interpret(),
        compiler_params=_wide_params(D),
    )(*args)


def _ln_item_bwd_call(x, lns, lnb, w1, b1, w2, do, s=None):
    n, B, N, D = x.shape
    Hd = w1.shape[-1]
    IB = _mlp_items_per_program(B, N, Hd, _MLP_VMEM_BUDGET)
    item = pl.BlockSpec((1, IB, N, D), lambda c, b: (c, b, 0, 0),
                        memory_space=pltpu.VMEM)
    per_c = lambda shape: pl.BlockSpec((1,) + shape,
                                       lambda c, b: (c,) + (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    scale = pl.BlockSpec(memory_space=pltpu.SMEM)  # whole-array [n, B]
    anys = pl.BlockSpec(memory_space=pl.ANY)
    f32 = jnp.float32
    residual = s is not None
    in_specs = [item] + ([scale] if residual else []) + [
        per_c((1, D)), per_c((1, D)), per_c((D, Hd)),
        per_c((1, Hd)), per_c((Hd, D)), item]
    args = (x,) + ((s,) if residual else ()) + (lns, lnb, w1, b1, w2, do)
    return pl.pallas_call(
        _make_ln_item_bwd_kernel(IB, residual),
        name=("mlp_ln_res_bwd_items" if residual
              else "mlp_ln_bwd_items") + f"_n{N}",
        grid=(n, B // IB),
        in_specs=in_specs,
        out_specs=(item,) + (anys,) * 6,
        scratch_shapes=[pltpu.VMEM((1, D), f32), pltpu.VMEM((1, D), f32),
                        pltpu.VMEM((D, Hd), f32), pltpu.VMEM((1, Hd), f32),
                        pltpu.VMEM((Hd, D), f32), pltpu.VMEM((1, D), f32),
                        pltpu.SemaphoreType.DMA((6,))],
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((n, 1, D), f32),
                   jax.ShapeDtypeStruct((n, 1, D), f32),
                   jax.ShapeDtypeStruct((n, D, Hd), f32),
                   jax.ShapeDtypeStruct((n, 1, Hd), f32),
                   jax.ShapeDtypeStruct((n, Hd, D), f32),
                   jax.ShapeDtypeStruct((n, 1, D), f32)),
        cost_estimate=pl.CostEstimate(
            flops=12 * n * B * N * D * Hd,
            bytes_accessed=(n * B * N * D * 4 + n * D * Hd * 4) * 4,
            transcendentals=2 * n * B * N * Hd,
        ),
        interpret=_interpret(),
        compiler_params=_wide_params(D),
    )(*args)


@custom_vmap
def _ln_item_fwd_cv(x, lns, lnb, w1, b1, w2, b2):
    return _ln_item_fwd_call(x[None], lns[None], lnb[None], w1[None],
                             b1[None], w2[None], b2[None])[0]


@_ln_item_fwd_cv.def_vmap
def _ln_item_fwd_rule(axis_size, in_batched, *args):
    args = [_batch_arg(a, b, axis_size) for a, b in zip(args, in_batched)]
    return _ln_item_fwd_call(*args), True


@custom_vmap
def _ln_item_bwd_cv(x, lns, lnb, w1, b1, w2, do):
    outs = _ln_item_bwd_call(x[None], lns[None], lnb[None], w1[None],
                             b1[None], w2[None], do[None])
    return tuple(o[0] for o in outs)


@_ln_item_bwd_cv.def_vmap
def _ln_item_bwd_rule(axis_size, in_batched, *args):
    args = [_batch_arg(a, b, axis_size) for a, b in zip(args, in_batched)]
    return _ln_item_bwd_call(*args), (True,) * 7


@jax.custom_vjp
def fused_mlp_sublayer_items(x, lns, lnb, w1, b1, w2, b2):
    """LN-folded MLP sublayer over [B, N, D] items (no row flattening)."""
    return _ln_item_fwd_cv(x, lns.reshape(1, -1), lnb.reshape(1, -1), w1,
                           b1.reshape(1, -1), w2, b2.reshape(1, -1))


def _ln_item_vjp_fwd(x, lns, lnb, w1, b1, w2, b2):
    out = _ln_item_fwd_cv(x, lns.reshape(1, -1), lnb.reshape(1, -1), w1,
                          b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out, (x, lns, lnb, w1, b1, w2, b2)


def _ln_item_vjp_bwd(res, do):
    x, lns, lnb, w1, b1, w2, b2 = res
    dx, dlns, dlnb, dw1, db1, dw2, db2 = _ln_item_bwd_cv(
        x, lns.reshape(1, -1), lnb.reshape(1, -1), w1, b1.reshape(1, -1),
        w2, do)
    return (dx,
            dlns.reshape(lns.shape).astype(lns.dtype),
            dlnb.reshape(lnb.shape).astype(lnb.dtype),
            dw1.astype(w1.dtype),
            db1.reshape(b1.shape).astype(b1.dtype),
            dw2.astype(w2.dtype),
            db2.reshape(b2.shape).astype(b2.dtype))


fused_mlp_sublayer_items.defvjp(_ln_item_vjp_fwd, _ln_item_vjp_bwd)


# ------------------------------------- residual-folded item-mode sublayer --
# out = x + s * mlp(LN(x)) with a per-sample DropPath scale s [B] (ones
# when stochastic depth is off): the residual join and the DropPath
# select run inside the kernel, removing one full [B, N, D] XLA
# read-modify-write pass per sublayer per direction.

@custom_vmap
def _ln_item_res_fwd_cv(x, s, lns, lnb, w1, b1, w2, b2):
    return _ln_item_fwd_call(x[None], lns[None], lnb[None], w1[None],
                             b1[None], w2[None], b2[None], s=s[None])[0]


@_ln_item_res_fwd_cv.def_vmap
def _ln_item_res_fwd_rule(axis_size, in_batched, *args):
    args = [_batch_arg(a, b, axis_size) for a, b in zip(args, in_batched)]
    x, s, lns, lnb, w1, b1, w2, b2 = args
    return _ln_item_fwd_call(x, lns, lnb, w1, b1, w2, b2, s=s), True


@custom_vmap
def _ln_item_res_bwd_cv(x, s, lns, lnb, w1, b1, w2, do):
    outs = _ln_item_bwd_call(x[None], lns[None], lnb[None], w1[None],
                             b1[None], w2[None], do[None], s=s[None])
    return tuple(o[0] for o in outs)


@_ln_item_res_bwd_cv.def_vmap
def _ln_item_res_bwd_rule(axis_size, in_batched, *args):
    args = [_batch_arg(a, b, axis_size) for a, b in zip(args, in_batched)]
    x, s, lns, lnb, w1, b1, w2, do = args
    return _ln_item_bwd_call(x, lns, lnb, w1, b1, w2, do, s=s), (True,) * 7


@jax.custom_vjp
def fused_mlp_residual_sublayer_items(x, s, lns, lnb, w1, b1, w2, b2):
    """x + s * MLP(LN(x)) over [B, N, D] items; s: [B] DropPath scales."""
    return _ln_item_res_fwd_cv(x, s, lns.reshape(1, -1),
                               lnb.reshape(1, -1), w1, b1.reshape(1, -1),
                               w2, b2.reshape(1, -1))


def _ln_item_res_vjp_fwd(x, s, lns, lnb, w1, b1, w2, b2):
    out = _ln_item_res_fwd_cv(x, s, lns.reshape(1, -1),
                              lnb.reshape(1, -1), w1, b1.reshape(1, -1),
                              w2, b2.reshape(1, -1))
    return out, (x, s, lns, lnb, w1, b1, w2, b2)


def _ln_item_res_vjp_bwd(res, do):
    x, s, lns, lnb, w1, b1, w2, b2 = res
    dx, dlns, dlnb, dw1, db1, dw2, db2 = _ln_item_res_bwd_cv(
        x, s, lns.reshape(1, -1), lnb.reshape(1, -1), w1,
        b1.reshape(1, -1), w2, do)
    return (dx,
            jnp.zeros_like(s),   # DropPath scales are RNG draws, not params
            dlns.reshape(lns.shape).astype(lns.dtype),
            dlnb.reshape(lnb.shape).astype(lnb.dtype),
            dw1.astype(w1.dtype),
            db1.reshape(b1.shape).astype(b1.dtype),
            dw2.astype(w2.dtype),
            db2.reshape(b2.shape).astype(b2.dtype))


fused_mlp_residual_sublayer_items.defvjp(_ln_item_res_vjp_fwd,
                                         _ln_item_res_vjp_bwd)
