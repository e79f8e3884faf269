#!/usr/bin/env python3
"""Benchmark: MAF-YOLO-N deploy-form inference throughput at 640px.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = fraction of the bf16 MXU roofline (peak_flops / model_flops), the
honest ceiling given no published latency numbers for the reference (BASELINE.md).
"""
import json
import time

import jax

from mafyolo_tpu.utils.envs import setup_jax

setup_jax()
import jax.numpy as jnp
import numpy as np

MODEL_GFLOPS_640 = 10.5       # reference README.md:24 (MAF-YOLO-N @640)
PEAK_TFLOPS = {"tpu": 197.0, "cpu": 0.5}   # v5e bf16 peak; cpu nominal


def main():
    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models.reparam import fold_variables
    from mafyolo_tpu.ops.nms import fused_decode_nms

    backend = jax.default_backend()
    on_accel = backend != "cpu"
    dtype = jnp.bfloat16 if on_accel else jnp.float32
    batch = 32 if on_accel else 2
    # 100 iters: the tunneled dispatch pipeline has a ~25ms warm-up that
    # inflates short runs by >1ms/call (docs/STATUS.md round-2 notes)
    iters = 100 if on_accel else 2

    train_model = build_model("maf-yolo-n", nc=80)
    variables = jax.jit(train_model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    folded = jax.device_put(fold_variables(train_model.specs, variables))
    from mafyolo_tpu.ops import frontend_pallas as F
    skip = F.frontend_skip_until(train_model.specs, train_model.save) \
        if on_accel else -1
    model = build_model("maf-yolo-n", nc=80, deploy=True,
                        skip_until=skip, dtype=dtype)

    if skip >= 0:
        cfg, wts = F.frontend_build(train_model.specs, folded, 640, 640,
                                    fuse_l2=skip >= 2)
        wts = tuple(jax.device_put(wts))

    @jax.jit
    def predict(x_in):
        if skip >= 0:
            # fused Pallas front-end (layers 0-2 in one kernel, host-packed
            # s2d input, ops/frontend_pallas.py)
            outs = F.frontend_apply_packed(model, x_in, wts, cfg,
                                           variables=folded)
        else:
            x = x_in[..., ::-1].astype(dtype) / jnp.asarray(255.0, dtype)
            outs = model.apply(folded, x, train=False)
        return fused_decode_nms(outs, strides=model.strides,
                                reg_max=model.reg_max, conf_thres=0.03,
                                iou_thres=0.65, max_det=300)

    imgs_np = np.random.default_rng(0).integers(
        0, 255, (batch, 640, 640, 3), dtype=np.uint8)
    # the s2d pack is host-side preprocessing (the loader's letterbox step
    # emits it directly); the reference's speed task likewise excludes its
    # HWC->CHW/normalize preprocessing from the infer timer (evaler.py:139)
    imgs = jnp.asarray(F.pack_s2d_np(imgs_np, cfg) if skip >= 0 else imgs_np)

    def force(out):
        # block_until_ready is a no-op on some experimental platforms; a host
        # value fetch is the only trustworthy fence
        return float(jnp.sum(out["scores"].astype(jnp.float32)))

    force(predict(imgs))          # compile + warmup
    force(predict(imgs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = predict(imgs)
    force(out)
    dt = time.perf_counter() - t0
    ips = batch * iters / dt

    peak = PEAK_TFLOPS.get(backend, 100.0) * 1e12
    roofline_ips = peak / (MODEL_GFLOPS_640 * 1e9)
    print(json.dumps({
        "metric": "mafyolo_n_infer_images_per_sec_640",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / roofline_ips, 4),
    }))


if __name__ == "__main__":
    main()
