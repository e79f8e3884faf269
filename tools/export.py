#!/usr/bin/env python3
"""Deployment export (parity target: tools/export_onnx semantics + end2end.py).

The reference exports ONNX (optionally with NMS fused in-graph) for TensorRT.
TPU-native equivalents:
  * StableHLO: the portable compiled artifact (what serving stacks consume);
  * jax2tf SavedModel (optional, when tensorflow is present);
  * in-graph end-to-end mode: preprocessing (BGR->RGB, /255) + forward + decode +
    NMS in ONE function, mirroring End2End's with-preprocess flag (end2end.py:260-282).
"""
import argparse
import os
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

from mafyolo_tpu.utils.envs import setup_jax  # noqa: E402

setup_jax()


def get_args_parser():
    p = argparse.ArgumentParser("MAF-YOLO-TPU export")
    p.add_argument("--weights", required=True)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--format", choices=["stablehlo", "savedmodel"],
                   default="stablehlo")
    p.add_argument("--end2end", action="store_true",
                   help="include preprocessing + NMS in the exported graph")
    p.add_argument("--conf-thres", type=float, default=0.4)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--out", default="export")
    p.add_argument("--quant", choices=["none", "sim", "int8"], default="none",
                   help="export the quantized graph from a calibrated ckpt "
                        "(tools/quantize.py): 'sim' = fake-quant, 'int8' = "
                        "real int8 MXU convs (the QAT->TRT export analog, "
                        "tools/qat/qat_export.py)")
    return p


def run(args):
    import jax
    import jax.numpy as jnp

    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models.detect import decode_eval
    from mafyolo_tpu.models.reparam import fold_variables
    from mafyolo_tpu.ops.nms import batched_nms
    from mafyolo_tpu.utils.checkpoint import eval_variables, load_checkpoint
    from mafyolo_tpu.utils.events import LOGGER

    ckpt = load_checkpoint(args.weights)
    meta = ckpt.get("meta", {})
    graph = meta.get("graph", "maf-yolo-n")
    nc = int(meta.get("nc", 80))
    variables = eval_variables(ckpt)
    if not ckpt.get("folded", False):
        variables = fold_variables(build_model(graph, nc=nc).specs, variables)
    quant_tree = ckpt.get("quant")
    if args.quant != "none" and quant_tree is None:
        raise SystemExit("--quant needs a calibrated checkpoint "
                         "(tools/quantize.py output with a 'quant' tree)")
    if args.quant == "int8":
        from mafyolo_tpu.models import blocks as _B
        _B.INT8_INFER = True   # trace-time flag; the export below traces once
    model = build_model(graph, nc=nc, deploy=True,
                        quant=args.quant != "none")
    apply_vars = dict(params=variables["params"])
    if args.quant != "none":
        apply_vars["quant"] = quant_tree

    def fwd(imgs_u8):
        x = imgs_u8[..., ::-1].astype(jnp.float32) / 255.0
        outs = model.apply(apply_vars, x, train=False)
        pred = decode_eval(outs, strides=model.strides, reg_max=model.reg_max)
        if args.end2end:
            return batched_nms(pred, conf_thres=args.conf_thres,
                               iou_thres=args.iou_thres, max_det=args.max_det)
        return pred

    x_spec = jnp.zeros((args.batch_size, args.img_size, args.img_size, 3),
                       jnp.uint8)
    os.makedirs(args.out, exist_ok=True)
    if args.format == "stablehlo":
        lowered = jax.jit(fwd).lower(x_spec)
        path = osp.join(args.out, "mafyolo.stablehlo.mlir")
        with open(path, "w") as f:
            f.write(lowered.as_text())
        LOGGER.info(f"StableHLO -> {path}")
    else:
        import tensorflow as tf
        from jax.experimental import jax2tf
        tf_fn = tf.function(
            jax2tf.convert(fwd, with_gradient=False),
            input_signature=[tf.TensorSpec(x_spec.shape, tf.uint8)])
        module = tf.Module()
        module.f = tf_fn
        tf.saved_model.save(module, args.out)
        LOGGER.info(f"SavedModel -> {args.out}")


if __name__ == "__main__":
    run(get_args_parser().parse_args())
