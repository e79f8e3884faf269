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
