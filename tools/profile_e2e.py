"""Stage breakdown of the CURRENT fused-frontend inference path.

Times jitted stages: fused kernel only; kernel + rest-of-graph; full e2e with
decode+NMS. Differences give honest in-graph stage costs (fusion included).
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--graph", default="maf-yolo-n")
    args = ap.parse_args()

    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models.reparam import fold_variables
    from mafyolo_tpu.ops import frontend_pallas as F
    from mafyolo_tpu.ops.nms import fused_decode_nms
    from mafyolo_tpu.utils.envs import setup_jax

    setup_jax()
    dtype = jnp.bfloat16
    train_model = build_model(args.graph, nc=80)
    variables = jax.jit(train_model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    folded = jax.device_put(fold_variables(train_model.specs, variables))
    skip = F.frontend_skip_until(train_model.specs, train_model.save)
    model = build_model(args.graph, nc=80, deploy=True, skip_until=skip,
                        dtype=dtype)
    cfg, wts = F.frontend_build(train_model.specs, folded, 640, 640,
                                fuse_l2=skip >= 2)
    wts = tuple(jax.device_put(wts))

    imgs_np = np.random.default_rng(0).integers(
        0, 255, (args.batch, 640, 640, 3), dtype=np.uint8)
    xp = jnp.asarray(F.pack_s2d_np(imgs_np, cfg))

    @jax.jit
    def kernel_only(x):
        return F.frontend_forward(x, wts, cfg)

    @jax.jit
    def fwd(x):
        y = F.frontend_forward(x, wts, cfg)
        return model.apply(folded, y[:, :, :cfg.wb, :], train=False)

    @jax.jit
    def e2e(x):
        outs = fwd(x)
        return fused_decode_nms(outs, strides=model.strides,
                                reg_max=model.reg_max, conf_thres=0.03,
                                iou_thres=0.65, max_det=300)

    tk = timeit(kernel_only, args.iters, xp) * 1e3
    tf = timeit(fwd, args.iters, xp) * 1e3
    te = timeit(e2e, args.iters, xp) * 1e3
    print(f"fused kernel (L0-2)   : {tk:7.2f} ms")
    print(f"full forward          : {tf:7.2f} ms  (post-kernel {tf-tk:+.2f})")
    print(f"e2e with decode+NMS   : {te:7.2f} ms  (nms+decode {te-tf:+.2f})")
    print(f"img/s e2e             : {args.batch/(te/1e3):.0f}")


if __name__ == "__main__":
    main()
