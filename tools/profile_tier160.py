"""Formulation probe for the 160^2-tier train-form cells (round 5).

profile_bwd_micro: ConvWrapper 1x1 48ch @160^2 standalone = fwd 2.65 /
bwd 1.13 ms vs a ~0.25 ms bandwidth floor; L2 RepHDW = fwd 9.44 / bwd 18.18.
This probe isolates WHERE that goes: conv-op vs reshaped dot_general for the
1x1, BN train cost, silu cost -- fwd and fwd+grad each -- so the fix
(XLA-level reformulation vs Pallas) is chosen from data.
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
from flax import linen as nn


def timeit(fn, *a, iters=30):
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


def bench(name, fwd_fn, params, x, iters):
    @jax.jit
    def f(p, xx):
        return jnp.sum(fwd_fn(p, xx).astype(jnp.float32))

    @jax.jit
    def g(p, xx):
        l, gr = jax.value_and_grad(
            lambda pp, xi: jnp.sum(fwd_fn(pp, xi).astype(jnp.float32)),
            argnums=(0, 1))(p, xx)
        return l + sum(jnp.sum(t) for t in jax.tree.leaves(gr)) * 0

    tf = timeit(f, params, x, iters=iters)
    tg = timeit(g, params, x, iters=iters)
    print(f"{name:44s} fwd {tf*1e3:6.2f}  fwd+grad {tg*1e3:6.2f}  "
          f"bwd~ {(tg-tf)*1e3:6.2f}", flush=True)


EPS = 1e-3


def bn_train(y, scale, bias):
    yf = y.astype(jnp.float32)
    mu = yf.mean((0, 1, 2)) if y.ndim == 4 else yf.mean(0)
    var = jnp.maximum(0.0, (yf * yf).mean((0, 1, 2) if y.ndim == 4 else 0)
                      - mu * mu)
    out = (yf - mu) * jax.lax.rsqrt(var + EPS) * scale + bias
    return out.astype(y.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hw", type=int, default=160)
    ap.add_argument("--cin", type=int, default=48)
    ap.add_argument("--cout", type=int, default=48)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from mafyolo_tpu.utils.envs import setup_jax
    setup_jax()
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    b, hw, cin, cout = args.batch, args.hw, args.cin, args.cout
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, hw, hw, cin)), dtype)
    k = jnp.asarray(rng.normal(size=(1, 1, cin, cout)) * 0.1, jnp.float32)
    kd = jnp.asarray(k[0, 0], jnp.float32)
    sc = jnp.asarray(rng.normal(size=(cout,)) * 0.1 + 1, jnp.float32)
    bi = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)

    def conv_op(p, xx):
        return jax.lax.conv_general_dilated(
            xx, p["k"].astype(xx.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def dot_op(p, xx):
        y = jax.lax.dot_general(
            xx.reshape(-1, cin), p["kd"].astype(xx.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return y.astype(xx.dtype).reshape(b, hw, hw, cout)

    bench("conv1x1 (conv op)", conv_op, {"k": k}, x, args.iters)
    bench("conv1x1 (reshaped dot)", dot_op, {"kd": kd}, x, args.iters)
    bench("BN train alone", lambda p, xx: bn_train(xx, p["s"], p["b"]),
          {"s": jnp.ones(cin), "b": jnp.zeros(cin)}, x, args.iters)
    bench("silu alone", lambda p, xx: jax.nn.silu(xx + p["b"][0]),
          {"b": jnp.zeros(1)}, x, args.iters)
    bench("conv+BN+silu (conv op)",
          lambda p, xx: jax.nn.silu(bn_train(conv_op(p, xx), p["s"], p["b"])),
          {"k": k, "s": sc, "b": bi}, x, args.iters)
    bench("conv+BN+silu (reshaped dot)",
          lambda p, xx: jax.nn.silu(bn_train(dot_op({"kd": p["kd"]}, xx),
                                             p["s"], p["b"])),
          {"kd": kd, "s": sc, "b": bi}, x, args.iters)
    # flax cell for reference (what ConvWrapper actually runs)
    cell = nn.Sequential([])

    class Cell(nn.Module):
        @nn.compact
        def __call__(self, xx):
            y = nn.Conv(cout, (1, 1), use_bias=False, dtype=dtype,
                        param_dtype=jnp.float32)(xx)
            y = nn.BatchNorm(use_running_average=False, momentum=0.97,
                             epsilon=1e-3, dtype=dtype,
                             param_dtype=jnp.float32)(y)
            return jax.nn.silu(y)

    cm = Cell()
    pv = cm.init(jax.random.PRNGKey(0), x[:1])

    def flax_fwd(p, xx):
        y, _ = cm.apply({"params": p["p"], "batch_stats": pv["batch_stats"]},
                        xx, mutable=["batch_stats"])
        return y

    bench("flax Conv+BN+silu cell", flax_fwd, {"p": pv["params"]}, x,
          args.iters)


if __name__ == "__main__":
    main()
