"""Pallas kernel for the depthwise-conv WEIGHT gradient (one memory pass).

The hand-unrolled dkernel in ops/dwconv.py re-reads the activation and
cotangent tensors once per tap -- K*K full passes (81 for the UniRepLKNet k=9
branches), measured at ~45ms of the 640px train-step backward. This kernel
streams x and g through VMEM ONCE and accumulates all K*K per-channel partial
sums on the VPU:

    dk[ky, kx, c] = sum_{b,h,w} x_pad[b, h + ky*d, w + kx*d, c] * g[b, h, w, c]

Halo rows (the (k-1)*d extra rows a row-block's taps reach into) are provided
by passing x_pad through TWO block specs offset by one block -- valid because
every shipped DW branch has halo <= ROWS (k<=9 d<=2 and k<=3 d<=7). The output
block has a constant index_map, so partials accumulate in VMEM across the
sequential TPU grid and spill to HBM once. f32 accumulation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 16


def _dk_kernel(xa_ref, xb_ref, g_ref, out_ref, *, k: int, dilation: int):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xp = jnp.concatenate(
        [xa_ref[0], xb_ref[0]], axis=0).astype(jnp.float32)  # [2R, Wp, C]
    g = g_ref[0].astype(jnp.float32)                         # [R, W, C]
    w = g.shape[1]
    for ky in range(k):
        for kx in range(k):
            patch = jax.lax.slice(
                xp, (ky * dilation, kx * dilation, 0),
                (ky * dilation + ROWS, kx * dilation + w, xp.shape[2]))
            out_ref[ky * k + kx] += jnp.sum(patch * g, axis=(0, 1))


@partial(jax.jit, static_argnames=("k", "pad", "dilation", "interpret"))
def dw_grad_kernel(x, g, k: int, pad: int, dilation: int = 1,
                   interpret: bool = False):
    """x [B,H,W,C], cotangent g [B,H,W,C] (stride-1 'same' dw conv) ->
    dk [K,K,1,C] f32."""
    b, h, w, c = x.shape
    halo = (k - 1) * dilation
    assert halo <= ROWS, f"halo {halo} > {ROWS} rows (k={k}, d={dilation})"
    assert h % ROWS == 0, f"H={h} not a multiple of {ROWS}"
    assert 2 * pad == halo, "kernel assumes 'same' padding (all DW uses)"
    # pad: 'same' halo rows/cols + one extra row block for the halo BlockSpec
    xp = jnp.pad(x, [(0, 0), (pad, ROWS + pad - halo), (pad, pad), (0, 0)])
    wp = w + 2 * pad
    grid = (b, h // ROWS)

    out = pl.pallas_call(
        partial(_dk_kernel, k=k, dilation=dilation),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, ROWS, wp, c), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, wp, c), lambda bi, ri: (bi, ri + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, w, c), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * k, c), lambda bi, ri: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * k, c), jnp.float32),
    )(xp, xp, g)
    return out.reshape(k, k, 1, c)


def dw_grad_supported(h: int, k: int, dilation: int) -> bool:
    return h % ROWS == 0 and (k - 1) * dilation <= ROWS


# ---------------------------------------------------------------------------
# v2: flat-lane planar formulation
# ---------------------------------------------------------------------------
#
# The v1 kernel above keeps NHWC blocks, so every kx tap is a slice at an
# arbitrary SUBLANE offset -- Mosaic materializes a relayout copy per tap
# (k*k of them), which is why it measured slower in-graph than the unrolled
# XLA taps. v2 uses the fused-front-end layout instead (ops/
# frontend_pallas.py): channels in sublanes, flat (row, col) in lanes. Then
#   * x is pre-padded in XLA (rows AND cols) so every tap reads true zeros
#     at image borders -- no masks at all;
#   * tap (ky, kx) is ONE static lane slice of the band at offset
#     ky*d*Wp + kx*d, multiply-accumulated against g on the VPU;
#   * x and g stream through VMEM once per band (vs k*k HBM passes of the
#     unrolled form), with an in-kernel MXU eye-contraction doing the
#     [S, C] -> [C, S] layout turn.

def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _planar_kernel(xa_ref, xb_ref, g_ref, out_ref, *, k: int,
                   dilation: int, rows: int, wp: int, c: int, pad: int):
    bi = pl.program_id(0)
    band = pl.program_id(1)

    @pl.when((bi == 0) & (band == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # halo rows via two stacked block views (offset by one block): manual
    # HBM DMA would need the minor dim (C) 128-lane-aligned, which most
    # layer widths are not
    xcat = jnp.concatenate([xa_ref[0], xb_ref[0]], axis=0)   # [2R, Wp, C]

    # layout turn in the INPUT precision: bf16 inputs (the train step) pay
    # bf16 dot cost; f32 inputs (parity tests) stay exact
    dt = g_ref.dtype
    eye = (jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) ==
           jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)).astype(dt)

    def to_planar(a, n):
        flat = a.reshape(n * wp, c).astype(dt)
        return jax.lax.dot_general(
            eye, flat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)

    xpl = to_planar(xcat, 2 * rows)                     # [C, 2R*Wp]
    gpl = to_planar(g_ref[0], rows)                     # [C, R*Wp]
    s = rows * wp
    for ky in range(k):
        for kx in range(k):
            off = ky * dilation * wp + kx * dilation
            tap = jax.lax.slice(xpl, (0, off), (c, off + s))
            prod = tap.astype(jnp.float32) * gpl.astype(jnp.float32)
            out_ref[ky * k + kx] += jnp.sum(prod, axis=1)


@partial(jax.jit, static_argnames=("k", "pad", "dilation", "interpret"))
def dw_grad_planar(x, g, k: int, pad: int, dilation: int = 1,
                   interpret: bool = False):
    """One-pass depthwise weight grad, planar layout. x, g [B,H,W,C]
    (stride-1 'same' dw conv) -> dk [K,K,1,C] f32."""
    b, h, w, c = x.shape
    halo = (k - 1) * dilation
    assert 2 * pad == halo, "assumes 'same' padding (all shipped DW uses)"
    wp = _round_up(w + 2 * pad, 8)

    rows = h
    per_lane = 3 * (2 * c * 2) + 4 * c          # x cat + planar + f32 prod
    while (rows % 2 == 0 and rows // 2 >= 2 * pad + 1
           and (2 * rows) * wp * per_lane > 48 * 2**20):
        rows //= 2
    assert h % rows == 0 and rows >= 2 * pad + 1, (h, rows, pad)
    bands = h // rows

    # rows: (p top) + image + (pad so (bands+1) blocks exist for the offset
    # halo view); cols: (p left) + image + align-pad (taps then read true
    # zeros everywhere -- no masks)
    xp = jnp.pad(x, [(0, 0), (pad, (bands + 1) * rows - h - pad),
                     (pad, wp - w - pad), (0, 0)])
    gp = jnp.pad(g, [(0, 0), (0, 0), (0, wp - w), (0, 0)])

    kern = partial(_planar_kernel, k=k, dilation=dilation, rows=rows,
                   wp=wp, c=c, pad=pad)
    out = pl.pallas_call(
        kern,
        grid=(b, bands),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, rows, wp, c), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, wp, c), lambda bi, ri: (bi, ri + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, wp, c), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * k, c), lambda bi, ri: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * k, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(xp, xp, gp)
    return out.reshape(k, k, 1, c)


def dw_grad_planar_supported(h: int, w: int, k: int, dilation: int,
                             pad: int) -> bool:
    # needs 'same' padding and at least one halo's worth of rows per band
    # (only Wp must be sublane-aligned; it is padded internally)
    return 2 * pad == (k - 1) * dilation and h >= 2 * pad + 1
