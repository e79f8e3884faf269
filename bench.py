#!/usr/bin/env python3
"""Benchmark: MAF-YOLO deploy-form inference + training throughput at 640px.

Prints ONE JSON line. Primary metric (unchanged across rounds for
comparability): MAF-YOLO-N bs32 deploy inference img/s on one chip.
  vs_baseline        = fraction of the bf16 MXU roofline (197 TF/s / 10.5 GF)
  vs_derived_ceiling = fraction of the measured VPU-bound ceiling (~2900 img/s;
                       BASELINE.md "Derived throughput ceiling") — the honest
                       speed-of-light for this depthwise-heavy architecture.
Extra metrics (extra_metrics key): MAF-YOLO-S and -M deploy inference img/s and
MAF-YOLO-N training img/s/chip (full optimizer step), per BASELINE.json configs.

preprocessing_excluded=true: the s2d byte pack for the fused front-end runs
host-side OUTSIDE the timed loop (the loader's letterbox step emits packed
bytes directly; the reference's --task speed likewise excludes its
HWC->CHW/normalize preprocessing from the infer timer, evaler.py:139). The
measured on-device cost of packing instead in-graph is ~1.7 ms/batch32.
"""
import json
import time

import jax

from mafyolo_tpu.utils.envs import setup_jax

setup_jax()
import jax.numpy as jnp
import numpy as np

MODEL_GFLOPS_640 = {"maf-yolo-n": 10.5, "maf-yolo-s": 25.5, "maf-yolo-m": 76.7}
PEAK_TFLOPS = {"tpu": 197.0, "cpu": 0.5}   # v5e bf16 peak; cpu nominal
DERIVED_CEILING_N_IPS = 2900.0  # BASELINE.md round-3 VPU-bound derivation
# Per-graph VPU-bound ceilings from the mechanical HLO FLOP-split derivation
# (tools/graph_flops.py, round 5; BASELINE.md "S/M ceilings"). N's mechanical
# number (2692) is slightly below the round-3 hand-derived 2900 (the HLO walk
# counts every DW site incl. heads + pad taps); vs_derived_ceiling keeps the
# 2900 anchor for round-over-round comparability.
DERIVED_CEILING_IPS = {"maf-yolo-s": 1431.0, "maf-yolo-m": 639.0}

# Fused Pallas front-end on/off per graph, decided by measurement on the real
# chip (tools/profile_frontend_sm.py, round 5, bs32@640 e2e img/s on/off):
#   N 2212/1686 (+31%), S 1078/894 (+20%), M 561/528 (+6%) -> ON everywhere.
FRONTEND_ON = {"maf-yolo-n": True, "maf-yolo-s": True, "maf-yolo-m": True}


def _force(x):
    # block_until_ready is a no-op on some experimental platforms; a host
    # value fetch is the only trustworthy fence
    return float(jnp.asarray(x, jnp.float32).sum())


def bench_infer(graph, batch, iters, dtype, on_accel, latency_iters=0):
    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models.reparam import fold_variables
    from mafyolo_tpu.ops import frontend_pallas as F
    from mafyolo_tpu.ops.nms import fused_decode_nms

    train_model = build_model(graph, nc=80)
    variables = jax.jit(train_model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    folded = jax.device_put(fold_variables(train_model.specs, variables))
    skip = F.frontend_skip_until(train_model.specs, train_model.save) \
        if (on_accel and FRONTEND_ON.get(graph, False)) else -1
    model = build_model(graph, nc=80, deploy=True, skip_until=skip,
                        dtype=dtype)

    cfg = None
    if skip >= 0:
        cfg, wts = F.frontend_build(train_model.specs, folded, 640, 640,
                                    fuse_l2=skip >= 2)
        wts = tuple(jax.device_put(wts))

    @jax.jit
    def predict(x_in):
        if skip >= 0:
            # fused Pallas front-end (layers 0..skip in one kernel,
            # host-packed s2d input, ops/frontend_pallas.py)
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
    imgs = jnp.asarray(F.pack_s2d_np(imgs_np, cfg) if skip >= 0 else imgs_np)

    _force(predict(imgs)["scores"])          # compile + warmup
    _force(predict(imgs)["scores"])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = predict(imgs)
    _force(out["scores"])
    dt = time.perf_counter() - t0
    ips = batch * iters / dt
    if not latency_iters:
        return ips
    # per-batch e2e latency distribution (BASELINE.json north-star "p50 e2e
    # latency"): dispatch + device step + forced host sync each iteration.
    # The per-iter sync includes the tunnel round-trip (~measured below as
    # p50 - async mean), which a colocated host would not pay.
    lats = []
    for _ in range(latency_iters):
        t1 = time.perf_counter()
        _force(predict(imgs)["scores"])
        lats.append((time.perf_counter() - t1) * 1e3)
    lats = np.sort(np.asarray(lats))
    pct = {p: float(lats[min(len(lats) - 1, int(round(p / 100 * (len(lats) - 1))))])
           for p in (50, 99)}
    return ips, pct


def bench_train(batch, iters, dtype):
    """Full jitted train step (fwd+loss+grad+SGD+EMA) img/s, MAF-YOLO-N."""
    from mafyolo_tpu.core.train_state import init_train_state, make_train_step
    from mafyolo_tpu.models import build_model

    s = 640
    model = build_model("maf-yolo-n", nc=80, remat=False, dtype=dtype)
    state = init_train_state(model, jax.random.PRNGKey(0), s)
    step = make_train_step(model, num_classes=80, img_size=s)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (batch, s, s, 3), np.uint8))
    targets = np.full((batch, 120, 5), -1, np.float32)
    targets[:, 0] = [0, 0.5, 0.5, 0.4, 0.4]
    targets[:, 1] = [3, 0.3, 0.3, 0.2, 0.2]
    targets = jnp.asarray(targets)
    one, mom = jnp.float32(0.01), jnp.float32(0.937)

    def one_step(st):
        st, m = step(st, imgs, targets, one, one, one, mom,
                     jnp.bool_(True), False)
        return st, m["loss"]

    state, loss = one_step(state)   # compile + warmup
    _force(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = one_step(state)
    _force(loss)                    # steps serialize via state threading
    return batch * iters / (time.perf_counter() - t0)


def main():
    backend = jax.default_backend()
    on_accel = backend != "cpu"
    dtype = jnp.bfloat16 if on_accel else jnp.float32
    batch = 32 if on_accel else 2
    # 100 iters: the tunneled dispatch pipeline has a ~25ms warm-up that
    # inflates short runs by >1ms/call (docs/STATUS.md round-2 notes)
    iters = 100 if on_accel else 2

    ips, lat = bench_infer("maf-yolo-n", batch, iters, dtype, on_accel,
                           latency_iters=50 if on_accel else 2)
    peak = PEAK_TFLOPS.get(backend, 100.0) * 1e12

    extra = {"mafyolo_n_p50_ms": round(lat[50], 2),
             "mafyolo_n_p99_ms": round(lat[99], 2)}
    if on_accel:
        for graph, key, it in (("maf-yolo-s",
                                "mafyolo_s_infer_images_per_sec_640", 50),
                               ("maf-yolo-m",
                                "mafyolo_m_infer_images_per_sec_640", 25)):
            try:
                v = bench_infer(graph, batch, it, dtype, on_accel)
                extra[key] = round(v, 2)
                extra[key + "_vs_mxu_roofline"] = round(
                    v / (peak / (MODEL_GFLOPS_640[graph] * 1e9)), 4)
                extra[key + "_vs_derived_ceiling"] = round(
                    v / DERIVED_CEILING_IPS[graph], 4)
            except Exception as e:   # never lose the primary metric
                extra[key + "_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            extra["mafyolo_n_train_images_per_sec_640"] = round(
                bench_train(batch, 20, dtype), 2)
        except Exception as e:
            extra["mafyolo_n_train_error"] = f"{type(e).__name__}: {e}"[:200]

    roofline_ips = peak / (MODEL_GFLOPS_640["maf-yolo-n"] * 1e9)
    print(json.dumps({
        "metric": "mafyolo_n_infer_images_per_sec_640",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / roofline_ips, 4),
        "vs_derived_ceiling": round(ips / DERIVED_CEILING_N_IPS, 4),
        "preprocessing_excluded": True,
        "extra_metrics": extra,
    }))


if __name__ == "__main__":
    main()
