"""Per-block fwd / fwd+grad timing at the real front-end shapes.

Drills into the profile_bwd_prefix result (L0-2 = 52.8 ms of the 147.7 ms
bs32@640 fwd+grad): times each train-form block standalone, plus ablations
(single-branch, no-BN) to attribute the cost to branches / BN / conv grads.
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


def bench_block(name, mod, shape, dtype, iters):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), dtype)
    pv = jax.jit(mod.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x[:1], train=False)
    params = {"params": pv["params"]}
    stats = {k: pv[k] for k in pv if k != "params"}

    @jax.jit
    def fwd(p, xx):
        out, _ = mod.apply({**p, **stats}, xx, train=True,
                           mutable=[k for k in stats] or False)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def fwdgrad(p, xx):
        def loss(pp, xi):
            out, _ = mod.apply({**pp, **stats}, xi, train=True,
                               mutable=[k for k in stats] or False)
            return jnp.sum(out.astype(jnp.float32))
        # grad wrt params AND x: mirrors the in-graph position (dx chains up)
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(p, xx)
        return l + sum(jnp.sum(t) for t in jax.tree.leaves(g)) * 0

    t_f = timeit(fwd, params, x, iters=iters)
    t_g = timeit(fwdgrad, params, x, iters=iters)
    print(f"{name:42s} fwd {t_f*1e3:7.2f}  fwd+grad {t_g*1e3:7.2f}  "
          f"bwd~ {(t_g-t_f)*1e3:7.2f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from mafyolo_tpu.models import blocks as B
    from mafyolo_tpu.utils.envs import setup_jax

    setup_jax()
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    b = args.batch

    bench_block("L0 RepVGG 3->24 s2 @640^2",
                B.RepVGGBlock(3, 24, stride=2, dtype=dtype),
                (b, 640, 640, 3), dtype, args.iters)
    bench_block("L1 RepVGG 24->48 s2 @320^2",
                B.RepVGGBlock(24, 48, stride=2, dtype=dtype),
                (b, 320, 320, 24), dtype, args.iters)
    bench_block("L2 RepHDW 48 k3 @160^2",
                B.RepHDW(48, 48, depth=1, depth_expansion=3.0, expansion=0.5,
                         kersize=3, shortcut=True, dtype=dtype),
                (b, 160, 160, 48), dtype, args.iters)
    # ablations at the L2 shape
    bench_block("  ConvWrapper 48->48 1x1 @160^2",
                B.ConvWrapper(48, k=1, dtype=dtype),
                (b, 160, 160, 48), dtype, args.iters)
    bench_block("  UniRepLK DW k3 (3 BN branches) @160^2 C72",
                B.UniRepLKNetBlock(72, 3, dtype=dtype),
                (b, 160, 160, 72), dtype, args.iters)


if __name__ == "__main__":
    main()
