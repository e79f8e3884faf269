"""Per-segment cost of the deploy graph DOWNSTREAM of the fused front-end
kernel: times jitted (kernel -> layers 3..cut) prefixes. XLA dead-code
eliminates layers not needed for the cut output, so deltas between successive
cuts on the backbone chain are honest in-graph segment costs."""
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


def timeit(fn, n, *a):
    def sync(o):
        return float(jnp.asarray(jax.tree.leaves(o)[0], jnp.float32).sum())
    sync(fn(*a)); sync(fn(*a))
    t0 = time.perf_counter()
    o = None
    for _ in range(n):
        o = fn(*a)
    sync(o)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--cuts", default="3,4,5,6,7,8,9,12,16,20,22,26,30,31,32,33")
    args = ap.parse_args()

    from mafyolo_tpu.models import build_model, blocks as B
    from mafyolo_tpu.models.graph import _BLOCK_CTORS
    from mafyolo_tpu.models.reparam import fold_variables
    from mafyolo_tpu.ops import frontend_pallas as F
    from mafyolo_tpu.utils.envs import setup_jax

    setup_jax()
    dtype = jnp.bfloat16
    train_model = build_model("maf-yolo-n", nc=80)
    variables = jax.jit(train_model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    folded = jax.device_put(fold_variables(train_model.specs, variables))
    cfg, wts = F.frontend_build(train_model.specs, folded, 640, 640)
    wts = tuple(jax.device_put(wts))
    model = build_model("maf-yolo-n", nc=80, deploy=True, skip_until=2,
                        dtype=dtype)
    net_params = {"params": folded["params"]["net"]}

    imgs_np = np.random.default_rng(0).integers(
        0, 255, (args.batch, 640, 640, 3), dtype=np.uint8)
    xp = jnp.asarray(F.pack_s2d_np(imgs_np, cfg))

    class Prefix(nn.Module):
        cut: int

        @nn.compact
        def __call__(self, x, train: bool = False):
            y = {2: x}
            for spec in model.specs:
                if spec.idx <= 2:
                    continue
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
                    x = _BLOCK_CTORS[spec.kind](
                        deploy=True, dtype=dtype,
                        name=f"layer{spec.idx}", **spec.kw)(inp, train)
                if spec.idx in model.save:
                    y[spec.idx] = x
            return x

    prev = 0.0
    for cut in [int(c) for c in args.cuts.split(",")]:
        mod = Prefix(cut=cut)

        @jax.jit
        def run(x):
            y = F.frontend_forward(x, wts, cfg)[:, :, :cfg.wb, :]
            return mod.apply(net_params, y, train=False)

        dt = timeit(run, args.iters, xp) * 1e3
        print(f"kernel+3..{cut:2d}: {dt:7.2f} ms  (delta {dt - prev:+6.2f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
