"""Fused front-end kernel vs XLA: in-graph forward timing + parity on TPU.

Usage: python tools/profile_frontend.py [--batch 32] [--img-size 640]
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


def timeit(fn, *a, n=100):
    def sync(o):
        return float(jnp.asarray(jax.tree.leaves(o)[0], jnp.float32).sum())
    sync(fn(*a))
    sync(fn(*a))
    t0 = time.perf_counter()
    o = None
    for _ in range(n):
        o = fn(*a)
    sync(o)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--graph", default="maf-yolo-n")
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    from mafyolo_tpu.utils.envs import setup_jax
    setup_jax()
    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models.reparam import fold_variables
    from mafyolo_tpu.ops.frontend_pallas import (
        build_frontend_weights, frontend_params_from_folded, frontend_l01,
        frontend_apply, lanepad_for, prep_s2d)

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    b, hw = args.batch, args.img_size
    train_model = build_model(args.graph, nc=80)
    variables = jax.jit(train_model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    folded = jax.device_put(fold_variables(train_model.specs, variables))
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (b, hw, hw, 3), dtype=np.uint8))

    model = build_model(args.graph, nc=80, deploy=True, dtype=dtype)

    @jax.jit
    def fwd_xla(u8):
        x = u8[..., ::-1].astype(dtype) / jnp.asarray(255.0, dtype)
        return model.apply(folded, x, train=False)

    skip = build_model(args.graph, nc=80, deploy=True, skip_until=1,
                       dtype=dtype)

    @jax.jit
    def fwd_kernel(u8):
        return frontend_apply(skip, folded, u8)

    # kernel-only (prep + pallas, no rest-of-graph) to isolate its cost
    k0, b0, k1, b1 = frontend_params_from_folded(folded)
    wts = build_frontend_weights(k0, b0, k1, b1)
    c0, c1 = wts["c0"], wts["c1"]   # keep static (device_put would trace them)
    wts = {k: jax.device_put(v) for k, v in wts.items() if k in
           ("w0", "b0", "w1", "b1")}
    lp = lanepad_for(hw)

    @jax.jit
    def kernel_only(u8):
        xp = prep_s2d(u8, lp)
        return frontend_l01(xp, wts["w0"], wts["b0"], wts["w1"], wts["b1"],
                            c0=c0, c1=c1, hb=hw // 4, wb=hw // 4, lp=lp)

    @jax.jit
    def prep_only(u8):
        return prep_s2d(u8, lp)

    print(f"prep_s2d only:        {timeit(prep_only, imgs, n=args.iters):7.2f} ms")
    print(f"kernel (prep+l01):    {timeit(kernel_only, imgs, n=args.iters):7.2f} ms")
    print(f"forward XLA:          {timeit(fwd_xla, imgs, n=args.iters):7.2f} ms")
    print(f"forward fused kernel: {timeit(fwd_kernel, imgs, n=args.iters):7.2f} ms")

    # parity on-device (bf16 both paths)
    a = fwd_xla(imgs)
    g = fwd_kernel(imgs)
    for (_, wc, _), (_, gc, _) in zip(a, g):
        d = np.abs(np.asarray(wc, np.float32) - np.asarray(gc, np.float32))
        print(f"cls delta mean {d.mean():.5f} max {d.max():.5f}")


if __name__ == "__main__":
    main()
