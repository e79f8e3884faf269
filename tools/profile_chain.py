"""Slope-based (chain-N) micro timing: per-instance cost without the ~1.4 ms
per-dispatch overhead that pollutes single-op probes on the tunneled chip
(round-5 finding: silu-alone == BN-alone == conv-alone ~= 1.4-1.6 ms at
[32,160,160,48] -- a per-call floor, not compute).

Method: jit ONE function applying the cell N times (chained, distinct params
so XLA cannot CSE), time at N1 and N2; per-instance cost = (t2-t1)/(N2-N1).

Cases: the 160^2-tier train cells that dominate the backward
(profile_bwd_prefix: L2 RepHDW = 28.6 ms of the 145 ms bs32@640 fwd+grad):
  1x1 ConvBN+silu as conv-op vs reshaped dot_general;
  UniRepLK k3 DRB: separate branches (shipped) vs merged dw_conv_multi.
"""
import argparse
import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-3


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


def bn_train(y, scale, bias):
    yf = y.astype(jnp.float32)
    mu = yf.mean((0, 1, 2))
    var = jnp.maximum(0.0, (yf * yf).mean((0, 1, 2)) - mu * mu)
    out = (yf - mu) * jax.lax.rsqrt(var + EPS) * scale + bias
    return out.astype(y.dtype)


def slope(make_cell, params_for, x, n1, n2, iters, grad):
    """Per-instance ms of `cell` from the (n2-n1) chain-length delta."""
    def chain(n):
        ps = [params_for(i) for i in range(n)]

        def fwd(ps_, xx):
            for p in ps_:
                xx = make_cell(p, xx)
            return jnp.sum(xx.astype(jnp.float32))

        if not grad:
            return jax.jit(fwd), ps

        def fg(ps_, xx):
            l, gr = jax.value_and_grad(fwd, argnums=(0, 1))(ps_, xx)
            return l + sum(jnp.sum(t) for t in jax.tree.leaves(gr)) * 0
        return jax.jit(fg), ps

    f1, p1 = chain(n1)
    f2, p2 = chain(n2)
    t1 = timeit(f1, p1, x, iters=iters)
    t2 = timeit(f2, p2, x, iters=iters)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hw", type=int, default=160)
    ap.add_argument("--ch", type=int, default=48)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n1", type=int, default=2)
    ap.add_argument("--n2", type=int, default=6)
    ap.add_argument("--cases", default="dot,conv,drb_sep,drb_mrg")
    ap.add_argument("--k", type=int, default=3, help="DRB origin kernel")
    ap.add_argument("--drb-ch", type=int, default=72)
    args = ap.parse_args()

    from mafyolo_tpu.utils.envs import setup_jax
    setup_jax()
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    b, hw, c = args.batch, args.hw, args.ch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, hw, hw, c)), dtype)

    def conv_cell(p, xx):
        y = jax.lax.conv_general_dilated(
            xx, p["k"].astype(xx.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.silu(bn_train(y, p["s"], p["b"]))

    def dot_cell(p, xx):
        y = jax.lax.dot_general(
            xx.reshape(-1, c), p["k"][0, 0].astype(xx.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(xx.dtype)
        return jax.nn.silu(bn_train(y.reshape(b, hw, hw, c), p["s"], p["b"]))

    def cellp(i):
        r = np.random.default_rng(i + 1)
        return {"k": jnp.asarray(r.normal(size=(1, 1, c, c)) * 0.05,
                                 jnp.float32),
                "s": jnp.asarray(r.normal(size=(c,)) * 0.05 + 1, jnp.float32),
                "b": jnp.asarray(r.normal(size=(c,)) * 0.05, jnp.float32)}

    cases = args.cases.split(",")
    for grad in (False, True):
        tag = "fwd+grad" if grad else "fwd     "
        if "conv" in cases:
            t = slope(conv_cell, cellp, x, args.n1, args.n2, args.iters, grad)
            print(f"1x1 ConvBN+silu conv-op   {tag} {t:7.3f} ms/inst",
                  flush=True)
        if "dot" in cases:
            t = slope(dot_cell, cellp, x, args.n1, args.n2, args.iters, grad)
            print(f"1x1 ConvBN+silu dot       {tag} {t:7.3f} ms/inst",
                  flush=True)

    # ------- DRB separate vs merged (channel width drb_ch, same-res) -------
    cd = args.drb_ch
    K = args.k
    from mafyolo_tpu.models.blocks import DILATED_BRANCHES
    branches = [(K, 1)] + list(DILATED_BRANCHES[K])
    xd = jnp.asarray(rng.normal(size=(b, hw, hw, cd)), dtype)

    def drbp(i):
        r = np.random.default_rng(100 + i)
        return {
            "ks": [jnp.asarray(r.normal(size=(ks, ks, 1, cd)) * 0.05,
                               jnp.float32) for ks, _ in branches],
            "s": [jnp.asarray(r.normal(size=(cd,)) * 0.05 + 1, jnp.float32)
                  for _ in branches],
            "b": [jnp.asarray(r.normal(size=(cd,)) * 0.05, jnp.float32)
                  for _ in branches],
        }

    def drb_sep(p, xx):
        from mafyolo_tpu.ops.dwconv import dw_conv
        out = None
        for (ks, r), kern, s, bb in zip(branches, p["ks"], p["s"], p["b"]):
            y = dw_conv(xx, kern.astype(xx.dtype), (ks - 1) * r // 2, r)
            y = bn_train(y, s, bb)
            out = y if out is None else out + y
        return out.astype(xx.dtype)

    def embed(kern, ks, r):
        if ks == K and r == 1:
            return kern
        eff = (ks - 1) * r + 1
        start = (K - eff) // 2
        z = jnp.zeros((K, K) + kern.shape[2:], kern.dtype)
        return z.at[start:start + eff:r, start:start + eff:r].set(kern)

    def drb_mrg(p, xx):
        from mafyolo_tpu.ops.dwconv import dw_conv_multi
        nb = len(branches)
        dense = [embed(k, ks, r) for (ks, r), k in zip(branches, p["ks"])]
        merged = jnp.stack(dense, -1).reshape(K, K, 1, cd * nb)
        y = dw_conv_multi(xx, merged.astype(xx.dtype), K // 2)
        sc = jnp.stack(p["s"], -1).reshape(cd * nb)
        bi = jnp.stack(p["b"], -1).reshape(cd * nb)
        y = bn_train(y, sc, bi)
        return y.reshape(b, hw, hw, cd, nb).sum(-1).astype(xx.dtype)

    def drb_nodk(p, xx):
        # dk excluded (stop_gradient on kernels): isolates the K^2-tap cost
        from mafyolo_tpu.ops.dwconv import dw_conv
        out = None
        for (ks, r), kern, s, bb in zip(branches, p["ks"], p["s"], p["b"]):
            y = dw_conv(xx, jax.lax.stop_gradient(kern).astype(xx.dtype),
                        (ks - 1) * r // 2, r)
            y = bn_train(y, s, bb)
            out = y if out is None else out + y
        return out.astype(xx.dtype)

    def drb_nobn(p, xx):
        # branch BNs replaced by a plain scale (no batch-stats reduction)
        from mafyolo_tpu.ops.dwconv import dw_conv
        out = None
        for (ks, r), kern, s, bb in zip(branches, p["ks"], p["s"], p["b"]):
            y = dw_conv(xx, kern.astype(xx.dtype), (ks - 1) * r // 2, r)
            y = y * s.astype(xx.dtype) + bb.astype(xx.dtype)
            out = y if out is None else out + y
        return out.astype(xx.dtype)

    for grad in (False, True):
        tag = "fwd+grad" if grad else "fwd     "
        for key, fn, label in (("drb_sep", drb_sep, "separate"),
                               ("drb_nodk", drb_nodk, "sep-no-dk"),
                               ("drb_nobn", drb_nobn, "sep-no-bn"),
                               ("drb_mrg", drb_mrg, "merged")):
            if key in cases:
                t = slope(fn, drbp, xd, args.n1, args.n2, args.iters, grad)
                print(f"DRB k{K} C{cd} {label:12s} {tag} {t:7.3f} ms/inst",
                      flush=True)


if __name__ == "__main__":
    main()
