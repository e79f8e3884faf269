"""Depthwise conv with a hand-written VJP.

XLA's TPU lowering of the *gradient* of a grouped/depthwise convolution at large
spatial sizes explodes: the MAF-YOLO-N train step at 640px compiled to a 2.2GB
executable (AOT serialization failure) and ran at ~10s/step, entirely from the
DW large-kernel (UniRepLKNet) branches. The forward is fine -- only the autodiff
transpose is pathological.

This op keeps the standard forward and replaces the backward with:
  * dx: a depthwise conv of the cotangent with the spatially-flipped kernel
    (same padding/dilation; stride-1 only -- every DW conv in the MAF graphs is
    stride 1), i.e. another *forward-style* conv that lowers cleanly;
  * dkernel: K*K shifted multiply-reduce taps (python-unrolled, K<=9 -> <=81
    cheap VPU reductions) -- tiny code, fully fused.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dw_conv(x, kernel, pad: int, dilation: int):
    """Depthwise conv, stride 1. x [B,H,W,C], kernel [K,K,1,C] -> [B,H',W',C]."""
    return _fwd(x, kernel, pad, dilation)


def _fwd(x, kernel, pad, dilation):
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)], rhs_dilation=(dilation, dilation),
        feature_group_count=c, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _fwd_rule(x, kernel, pad, dilation):
    return _fwd(x, kernel, pad, dilation), (x, kernel)


def _bwd_rule(pad, dilation, res, g):
    x, kernel = res
    k = kernel.shape[0]
    c = x.shape[-1]
    # dx: depthwise conv of g with the flipped kernel; for stride 1 the transpose
    # padding is d*(K-1) - pad per side (== pad for 'same' odd kernels)
    pad_t = dilation * (k - 1) - pad
    dx = jax.lax.conv_general_dilated(
        g, jnp.flip(kernel, axis=(0, 1)).astype(g.dtype), window_strides=(1, 1),
        padding=[(pad_t, pad_t), (pad_t, pad_t)], rhs_dilation=(dilation, dilation),
        feature_group_count=c, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # dkernel: the unrolled XLA taps remain the default. BOTH Pallas
    # alternatives measured slower in-graph on v5e (round-2 NHWC-block
    # kernel: kx taps are unaligned sublane slices Mosaic relayout-copies;
    # round-3 planar kernel: the per-tap cross-lane reductions cost more
    # than the HBM re-reads they save -- 282 vs 197 ms fwd+loss+grad).
    # Kept opt-in for future toolchains: MAFYOLO_PALLAS_DWGRAD=planar|1.
    import os
    from mafyolo_tpu.ops.dw_grad_pallas import (
        dw_grad_kernel, dw_grad_planar, dw_grad_planar_supported,
        dw_grad_supported)
    mode = os.environ.get("MAFYOLO_PALLAS_DWGRAD", "0")
    if jax.default_backend() not in ("cpu",):
        if (mode == "planar"
                and dw_grad_planar_supported(x.shape[1], x.shape[2], k,
                                             dilation, pad)):
            dk = dw_grad_planar(x, g, k, pad, dilation).astype(kernel.dtype)
            return dx.astype(x.dtype), dk
        if (mode == "1" and dw_grad_supported(x.shape[1], k, dilation)
                and 2 * pad == (k - 1) * dilation):
            dk = dw_grad_kernel(x, g, k, pad, dilation).astype(kernel.dtype)
            return dx.astype(x.dtype), dk
    # default: unrolled shifted reductions (K^2 taps; XLA fuses them well)
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    gh, gw = g.shape[1], g.shape[2]
    gf = g.astype(jnp.float32)
    taps = []
    for ky in range(k):
        row = []
        for kx in range(k):
            patch = jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(xp, ky * dilation, gh, axis=1),
                kx * dilation, gw, axis=2)
            row.append(jnp.sum(patch.astype(jnp.float32) * gf, axis=(0, 1, 2)))
        taps.append(jnp.stack(row, 0))
    dk = jnp.stack(taps, 0)[:, :, None, :].astype(kernel.dtype)   # [K,K,1,C]
    return dx.astype(x.dtype), dk


dw_conv.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Channel-multiplier variant: ONE depthwise pass computing nB parallel branch
# convolutions (round-5 merged DilatedReparamBlock, models/blocks.py). The
# kernel is group-major interleaved: output channel c*nB + j is branch j of
# input channel c (XLA grouped-conv semantics: output feature o reads input
# group o // (O/G) with G = C groups).
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw_conv_multi(x, kernel, pad: int):
    """x [B,H,W,C], kernel [K,K,1,C*nB] (dense; dilated branches pre-embedded)
    -> [B,H,W,C*nB]. Stride 1, dilation 1 (branch dilations live in the
    embedded taps)."""
    return _fwd_multi(x, kernel, pad)


def _fwd_multi(x, kernel, pad):
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)], feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _fwd_multi_rule(x, kernel, pad):
    return _fwd_multi(x, kernel, pad), (x, kernel)


def _bwd_multi_rule(pad, res, g):
    x, kernel = res
    k = kernel.shape[0]
    c = x.shape[-1]
    nb = kernel.shape[-1] // c
    # dx[c] = sum_j conv(g[..., c*nB+j], flip(kernel[..., c*nB+j])): one
    # grouped conv, G=C groups of nB cotangent channels each -> 1 output
    # channel per group. Kernel [K,K,nB,C]: I dim = branch j, O dim = c.
    kf = jnp.flip(kernel, axis=(0, 1)).reshape(k, k, c, nb)
    kf = jnp.transpose(kf, (0, 1, 3, 2))
    pad_t = (k - 1) - pad
    dx = jax.lax.conv_general_dilated(
        g, kf.astype(g.dtype), window_strides=(1, 1),
        padding=[(pad_t, pad_t), (pad_t, pad_t)], feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # dkernel: K^2 shifted taps; each contracts x-patch [B,H,W,C] against the
    # cotangent reshaped [B,H,W,C,nB] over (B,H,W) -> [C,nB] per tap.
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    gh, gw = g.shape[1], g.shape[2]
    gf = g.astype(jnp.float32).reshape(g.shape[0], gh, gw, c, nb)
    taps = []
    for ky in range(k):
        row = []
        for kx in range(k):
            patch = jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(xp, ky, gh, axis=1),
                kx, gw, axis=2)
            row.append(jnp.sum(patch.astype(jnp.float32)[..., None] * gf,
                               axis=(0, 1, 2)))          # [C, nB]
        taps.append(jnp.stack(row, 0))
    dk = jnp.stack(taps, 0).reshape(k, k, 1, c * nb).astype(kernel.dtype)
    return dx.astype(x.dtype), dk


dw_conv_multi.defvjp(_fwd_multi_rule, _bwd_multi_rule)
