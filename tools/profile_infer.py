"""Forced-sync inference-stage profiler (single chip, bs32 @640, MAF-YOLO-N).

Stages: forward (plain/s2d stem), +decode, +NMS, fused decode->NMS.
Usage: python tools/profile_infer.py [--batch 32]
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


def timeit(fn, n=20, warmup=2):
    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        return float(jnp.asarray(leaf, jnp.float32).sum())
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models.detect import decode_eval
    from mafyolo_tpu.models.reparam import fold_variables
    from mafyolo_tpu.ops.nms import batched_nms
    from mafyolo_tpu.utils.envs import setup_jax

    setup_jax()
    b, s = args.batch, args.img_size
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    train_model = build_model("maf-yolo-n", nc=80)
    variables = jax.jit(train_model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    folded = jax.device_put(fold_variables(train_model.specs, variables))
    folded_s2d = jax.device_put(
        fold_variables(train_model.specs, variables, s2d_stem=True))
    model = build_model("maf-yolo-n", nc=80, deploy=True, dtype=dtype)
    model_s2d = build_model("maf-yolo-n", nc=80, deploy=True, s2d_stem=True,
                            dtype=dtype)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (b, s, s, 3), dtype=np.uint8))

    def norm(u8):
        return u8[..., ::-1].astype(dtype) / jnp.asarray(255.0, dtype)

    fns = {}
    fns["fwd(plain)"] = jax.jit(
        lambda u8: model.apply(folded, norm(u8), train=False)[0][1])
    fns["fwd(s2d)"] = jax.jit(
        lambda u8: model_s2d.apply(folded_s2d, norm(u8), train=False)[0][1])
    fns["fwd+decode(s2d)"] = jax.jit(lambda u8: decode_eval(
        model_s2d.apply(folded_s2d, norm(u8), train=False),
        strides=(8, 16, 32)))
    fns["e2e old (plain+decode+nms)"] = jax.jit(lambda u8: batched_nms(
        decode_eval(model.apply(folded, norm(u8), train=False),
                    strides=(8, 16, 32)),
        conf_thres=0.03, iou_thres=0.65, max_det=300))
    fns["e2e old (s2d)"] = jax.jit(lambda u8: batched_nms(
        decode_eval(model_s2d.apply(folded_s2d, norm(u8), train=False),
                    strides=(8, 16, 32)),
        conf_thres=0.03, iou_thres=0.65, max_det=300))
    try:
        from mafyolo_tpu.ops.nms import fused_decode_nms
        fns["e2e fused (s2d)"] = jax.jit(lambda u8: fused_decode_nms(
            model_s2d.apply(folded_s2d, norm(u8), train=False),
            strides=(8, 16, 32), conf_thres=0.03, iou_thres=0.65, max_det=300))
        fns["e2e fused (plain)"] = jax.jit(lambda u8: fused_decode_nms(
            model.apply(folded, norm(u8), train=False),
            strides=(8, 16, 32), conf_thres=0.03, iou_thres=0.65, max_det=300))
    except ImportError:
        pass
    try:
        from mafyolo_tpu.core.quant import int8_predict_fn, ptq_calibrate
        quant = ptq_calibrate("maf-yolo-n", 80, folded,
                              [np.asarray(imgs[:2])], max_batches=1,
                              dtype=dtype)
        fns["e2e int8 (real MXU int8)"] = int8_predict_fn(
            "maf-yolo-n", 80, folded, quant, conf_thres=0.03, dtype=dtype)
    except Exception as e:  # noqa: BLE001
        print(f"int8 path unavailable: {e}")

    for name, fn in fns.items():
        t = timeit(lambda f=fn: f(imgs), n=args.iters)
        print(f"{name:32s} {t*1e3:8.2f} ms   {b/t:8.1f} img/s")


if __name__ == "__main__":
    main()
