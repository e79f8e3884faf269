"""Cumulative forward timing: deploy graph truncated after layer K.

Unlike tools/profile_layers.py (per-block standalone, ~1.9ms tunnel dispatch
overhead per call), this times jitted PREFIXES of the real graph, so XLA
fusion across block boundaries is included; differences between cut points
give honest in-graph per-stage costs. Usage:
  python tools/profile_prefix.py [--batch 32] [--cuts 0,1,2,3,9,30,33]
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
from flax import linen as nn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--graph", default="maf-yolo-n")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--cuts", default="0,1,2,3,4,5,9,22,30,33")
    args = ap.parse_args()

    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models import blocks as B
    from mafyolo_tpu.models.graph import GraphNet
    from mafyolo_tpu.models.reparam import fold_variables
    from mafyolo_tpu.utils.envs import setup_jax

    setup_jax()
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    train_model = build_model(args.graph, nc=80)
    variables = jax.jit(train_model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    folded = jax.device_put(fold_variables(train_model.specs, variables))
    model = build_model(args.graph, nc=80, deploy=True, dtype=dtype)

    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (args.batch, args.img_size, args.img_size, 3), dtype=np.uint8))

    class Prefix(nn.Module):
        cut: int

        @nn.compact
        def __call__(self, x, train: bool = False):
            # mirror GraphNet's walk but stop after self.cut
            specs = model.specs
            y = {}
            for spec in specs:
                if spec.idx > self.cut or spec.kind == "Out":
                    break
                if spec.frm != (-1,):
                    inp = [x if j == -1 else y[j if j >= 0 else spec.idx + j]
                           for j in spec.frm]
                    if len(inp) == 1:
                        inp = inp[0]
                else:
                    inp = x
                if spec.kind == "Upsample":
                    x = B.Upsample2x(dtype=dtype, name=f"layer{spec.idx}")(inp, train)
                elif spec.kind == "Concat":
                    x = B.Concat(dtype=dtype, name=f"layer{spec.idx}")(inp, train)
                else:
                    from mafyolo_tpu.models.graph import _BLOCK_CTORS
                    x = _BLOCK_CTORS[spec.kind](
                        deploy=True, dtype=dtype,
                        name=f"layer{spec.idx}", **spec.kw)(inp, train)
                if spec.idx in model.save:
                    y[spec.idx] = x
            return x

    def timeit(fn, n, *a):
        def sync(o):
            return float(jnp.asarray(jax.tree.leaves(o)[0], jnp.float32).sum())
        sync(fn(*a))
        sync(fn(*a))
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*a)
        sync(o)
        return (time.perf_counter() - t0) / n

    net_params = {"params": folded["params"]["net"]}
    prev = 0.0
    for cut in [int(c) for c in args.cuts.split(",")]:
        mod = Prefix(cut=cut)

        @jax.jit
        def run(u8):
            x = u8[..., ::-1].astype(dtype) / jnp.asarray(255.0, dtype)
            return mod.apply(net_params, x, train=False)

        dt = timeit(run, args.iters, imgs) * 1e3
        print(f"prefix 0..{cut:2d}: {dt:7.2f} ms  (delta {dt - prev:+6.2f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
