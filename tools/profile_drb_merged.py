"""A/B: DilatedReparamBlock train-form as N separate DW convs + N BatchNorms
(shipped form) vs ONE channel-multiplier DW conv + ONE merged BatchNorm.

Motivation (round-5): profile_bwd_micro pins the UniRepLK k3 block (3 DW
branches x 4 BNs) at fwd 5.56 / bwd 7.33 ms standalone @160^2 C72 bs32 --
~14x its VPU tap floor. Every branch is a separate pass over x and every BN
a separate stats reduction; merging them into one grouped conv with channel
multiplier nB and one BN over nB*C channels is mathematically identical
(zero-padded kernel taps contribute exact zeros; BN is per-channel) but
collapses 2N+1 HBM passes into ~3.

Reference equivalence: the torch DilatedReparamBlock
(/root/reference/yolov6/layers/common.py:2948-3051) runs the same N branch
convs separately; cuDNN absorbs the cost. On TPU the merge is the native
formulation.
"""
import argparse
import os.path as osp
import sys
import time
from functools import partial

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *a, iters=20):
    def sync(o):
        return float(jnp.asarray(jax.tree.leaves(o)[0], jnp.float32).sum())
    sync(fn(*a))
    sync(fn(*a))
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = fn(*a)
    sync(o)
    return (time.perf_counter() - t0) / iters


EPS, MOM = 1e-3, 0.97


def bn_train(y, scale, bias):
    """flax nn.BatchNorm train-mode math (normalization.py _compute_stats +
    _normalize): f32 stats, fast variance, f32 normalize, cast back."""
    yf = y.astype(jnp.float32)
    mu = yf.mean((0, 1, 2))
    var = jnp.maximum(0.0, (yf * yf).mean((0, 1, 2)) - mu * mu)
    out = (yf - mu) * jax.lax.rsqrt(var + EPS) * scale + bias
    return out.astype(y.dtype), mu, var


def dw(x, kern, pad, dil=1, fgc=None):
    return jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)], rhs_dilation=(dil, dil),
        feature_group_count=fgc or x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---------------- A: shipped form (separate branches) ----------------

def drb_sep(x, kerns, scales, biases, branches):
    from mafyolo_tpu.ops.dwconv import dw_conv
    out = None
    for (ks, r), kern, s, b in zip(branches, kerns, scales, biases):
        y = dw_conv(x, kern.astype(x.dtype), (ks - 1) * r // 2, r)
        y, _, _ = bn_train(y, s, b)
        out = y if out is None else out + y
    return out


# ---------------- B: merged form ----------------

def embed(kern, ks, r, K):
    """[ks,ks,1,C] dilation r -> dense [K,K,1,C] (zero taps elsewhere)."""
    if ks == K and r == 1:
        return kern
    eff = (ks - 1) * r + 1
    start = (K - eff) // 2
    z = jnp.zeros((K, K) + kern.shape[2:], kern.dtype)
    return z.at[start:start + eff:r, start:start + eff:r].set(kern)


def drb_merged(x, kerns, scales, biases, branches, K):
    from mafyolo_tpu.ops.dwconv import dw_conv_multi
    C = x.shape[-1]
    nB = len(branches)
    dense = [embed(k, ks, r, K) for (ks, r), k in zip(branches, kerns)]
    # group-major interleave: out channel c*nB + j = branch j of channel c
    merged = jnp.stack(dense, axis=-1)            # [K,K,1,C,nB]
    merged = merged.reshape(K, K, 1, C * nB)
    y = dw_conv_multi(x, merged.astype(x.dtype), K // 2)   # [B,H,W,C*nB]
    sc = jnp.stack(scales, -1).reshape(C * nB)
    bi = jnp.stack(biases, -1).reshape(C * nB)
    y, _, _ = bn_train(y, sc, bi)
    B, H, W, _ = y.shape
    return y.reshape(B, H, W, C, nB).sum(-1).astype(x.dtype)


def run_case(name, B, H, C, K, branches, dtype, iters):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, H, C)), dtype)
    kerns = [jnp.asarray(rng.normal(size=(ks, ks, 1, C)) * 0.1, jnp.float32)
             for ks, r in branches]
    scales = [jnp.asarray(rng.normal(size=(C,)) * 0.1 + 1, jnp.float32)
              for _ in branches]
    biases = [jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
              for _ in branches]
    g0 = jnp.asarray(rng.normal(size=(B, H, H, C)), dtype)

    f_sep = jax.jit(lambda xx, kk: drb_sep(xx, kk, scales, biases, branches))
    f_mrg = jax.jit(lambda xx, kk: drb_merged(xx, kk, scales, biases,
                                              branches, K))

    # parity
    a = np.asarray(f_sep(x, kerns), np.float32)
    b = np.asarray(f_mrg(x, kerns), np.float32)
    err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)

    def mkgrad(f):
        @jax.jit
        def fg(xx, kk):
            def loss(xi, ki):
                return jnp.sum(f(xi, ki).astype(jnp.float32) * g0.astype(jnp.float32))
            l, gr = jax.value_and_grad(loss, argnums=(0, 1))(xx, kk)
            return l + sum(jnp.sum(t) for t in jax.tree.leaves(gr)) * 0
        return fg

    t_sf = timeit(f_sep, x, kerns, iters=iters)
    t_mf = timeit(f_mrg, x, kerns, iters=iters)
    t_sg = timeit(mkgrad(drb_sep_fn(scales, biases, branches)), x, kerns,
                  iters=iters)
    t_mg = timeit(mkgrad(drb_mrg_fn(scales, biases, branches, K)), x, kerns,
                  iters=iters)
    print(f"{name:34s} rel_err {err:.1e} | fwd sep {t_sf*1e3:6.2f} mrg "
          f"{t_mf*1e3:6.2f} | fwd+grad sep {t_sg*1e3:6.2f} mrg {t_mg*1e3:6.2f}")


def drb_sep_fn(scales, biases, branches):
    return lambda xx, kk: drb_sep(xx, kk, scales, biases, branches)


def drb_mrg_fn(scales, biases, branches, K):
    return lambda xx, kk: drb_merged(xx, kk, scales, biases, branches, K)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    b = args.batch

    # L2 inner UniRepLK: k3 -> origin k3 + dil (3,1) + (1,1)
    run_case("k3 C72 @160^2 (L2 inner)", b, 160, 72, 3,
             [(3, 1), (3, 1), (1, 1)], dtype, args.iters)
    # the k5 instances in deeper RepHDW stages (C=96 @80^2 ballpark)
    run_case("k5 C96 @80^2", b, 80, 96, 5,
             [(5, 1), (3, 1), (1, 1)], dtype, args.iters)
    # k7 @40^2
    run_case("k7 C192 @40^2", b, 40, 192, 7,
             [(7, 1), (5, 1), (3, 1)], dtype, args.iters)


if __name__ == "__main__":
    main()
