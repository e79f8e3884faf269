#!/usr/bin/env python3
"""INT8 PTQ CLI (parity target: tools/train.py --quant --calib + tools/qat/).

Folds a checkpoint to deploy form, max-calibrates activation amax over training
batches, saves the quantized checkpoint (folded params + amax tree), and reports
val AP for fp vs int8-simulated inference.
"""
import argparse
import os.path as osp
import pickle
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

from mafyolo_tpu.utils.envs import setup_jax  # noqa: E402

setup_jax()


def get_args_parser():
    p = argparse.ArgumentParser("MAF-YOLO-TPU INT8 PTQ")
    p.add_argument("--weights", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--calib-batches", type=int, default=32)
    p.add_argument("--out", default=None, help="output ckpt (default *_calib.npck)")
    p.add_argument("--eval", action="store_true", help="eval fp32 vs int8 AP")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--qat", action="store_true",
                   help="quantization-aware finetune after calibration")
    p.add_argument("--qat-epochs", type=int, default=3)
    p.add_argument("--qat-lr", type=float, default=1e-4)
    # calibration method surface (reference cfg.ptq.calib_method +
    # histogram_amax_method, tools/qat/qat_utils.py:39-59)
    p.add_argument("--calib-method", default="max",
                   choices=["max", "percentile", "mse", "entropy"])
    p.add_argument("--percentile", type=float, default=99.99)
    p.add_argument("--num-bins", type=int, default=2048)
    p.add_argument("--sensitive-layers-skip", nargs="*", default=None,
                   help="layer-path substrings to leave unquantized "
                        "(cfg.ptq.sensitive_layers_list analog)")
    p.add_argument("--sensitivity", action="store_true",
                   help="per-layer quantization sensitivity sweep "
                        "(partial_quantization/sensitivity_analyse.py analog)")
    p.add_argument("--sensitivity-out", default="quant_sensitivity.txt")
    return p


def run(args):
    import jax

    from mafyolo_tpu.core.quant import ptq_calibrate
    from mafyolo_tpu.data import create_dataloader
    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models.reparam import fold_variables
    from mafyolo_tpu.utils.checkpoint import eval_variables, load_checkpoint
    from mafyolo_tpu.utils.events import LOGGER, load_yaml

    data_dict = load_yaml(args.data)
    ckpt = load_checkpoint(args.weights)
    meta = ckpt.get("meta", {})
    graph = meta.get("graph", "maf-yolo-n")
    nc = int(meta.get("nc", data_dict["nc"]))
    variables = eval_variables(ckpt)
    if not ckpt.get("folded", False):
        variables = fold_variables(build_model(graph, nc=nc).specs, variables)

    loader, _ = create_dataloader(data_dict["train"], args.img_size,
                                  args.batch_size, augment=False,
                                  workers=args.workers, shuffle=True,
                                  task="train")
    quant_tree = ptq_calibrate(graph, nc, variables, loader,
                               max_batches=args.calib_batches,
                               method=args.calib_method,
                               percentile=args.percentile,
                               num_bins=args.num_bins,
                               skip_layers=args.sensitive_layers_skip)

    if args.sensitivity:
        sensitivity_sweep(args, graph, nc, variables, quant_tree, data_dict)
        return
    if args.qat:
        from mafyolo_tpu.core.quant import qat_finetune
        qat_loader, _ = create_dataloader(
            data_dict["train"], args.img_size, args.batch_size, augment=False,
            workers=args.workers, shuffle=True, task="train")
        variables = {"params": qat_finetune(
            graph, nc, variables, quant_tree, qat_loader,
            img_size=args.img_size, epochs=args.qat_epochs,
            lr=args.qat_lr)["params"]}
    out = args.out or args.weights.replace(".npck", "_calib.npck").replace(
        ".pt", "_calib.npck")
    with open(out, "wb") as f:
        pickle.dump({"model": variables, "quant": jax.device_get(quant_tree),
                     "folded": True, "meta": meta, "ema": None}, f, protocol=4)
    LOGGER.info(f"calibrated checkpoint -> {out}")

    if args.eval:
        from mafyolo_tpu.core.evaler import Evaler
        from mafyolo_tpu.core.quant import (int8_predict_fn,
                                            quantized_predict_fn)
        modes = [("fp", None), ("int8-sim", quantized_predict_fn)]
        if not args.sensitive_layers_skip:
            # real int8 needs every conv calibrated (mixed precision is a
            # fake-quant concept)
            modes.append(("int8-real", int8_predict_fn))
        for tag, mk in modes:
            evaler = Evaler(data_dict, img_size=args.img_size,
                            batch_size=args.batch_size, workers=args.workers)
            loader_v = evaler.init_data()
            evaler.init_model(graph, variables, nc, folded=True)
            if mk is not None:
                evaler._predict = mk(
                    graph, nc, variables, quant_tree,
                    conf_thres=evaler.conf_thres,
                    iou_thres=evaler.iou_thres, max_det=evaler.max_det)
            metrics = evaler.eval_model(evaler.predict_model(loader_v))
            LOGGER.info(f"{tag}: AP={metrics.get('AP', 0):.4f}")
            evaler.report_speed()


def sensitivity_sweep(args, graph, nc, variables, quant_tree, data_dict):
    """Quantize ONE layer at a time and record val AP -- ranks layers by
    quantization sensitivity (sensitivity_analyse.py:27-51). The most
    sensitive (lowest-AP) layers are the --sensitive-layers-skip candidates."""
    from mafyolo_tpu.core.evaler import Evaler
    from mafyolo_tpu.core.quant import (only_layer_quant, quant_layer_names,
                                        quantized_predict_fn)
    from mafyolo_tpu.utils.events import LOGGER

    layers = quant_layer_names(quant_tree)
    LOGGER.info(f"sensitivity sweep over {len(layers)} quantized convs")
    results = []
    evaler = Evaler(data_dict, img_size=args.img_size,
                    batch_size=args.batch_size, workers=args.workers)
    loader_v = evaler.init_data()
    evaler.init_model(graph, variables, nc, folded=True)
    for name in layers:
        evaler._predict = quantized_predict_fn(
            graph, nc, variables, only_layer_quant(quant_tree, name),
            conf_thres=evaler.conf_thres, iou_thres=evaler.iou_thres,
            max_det=evaler.max_det)
        m = evaler.eval_model(evaler.predict_model(loader_v))
        results.append((name, m.get("AP50", 0.0), m.get("AP", 0.0)))
        LOGGER.info(f"quantize only {name}: mAP0.5={results[-1][1]:.4f} "
                    f"mAP0.5:0.95={results[-1][2]:.4f}")
    results.sort(key=lambda r: r[2])
    with open(args.sensitivity_out, "w") as f:
        for name, ap50, ap in results:
            f.write(f"{name} {ap50:.6f} {ap:.6f}\n")
    LOGGER.info(f"sensitivity ranking (most sensitive first) -> "
                f"{args.sensitivity_out}")


if __name__ == "__main__":
    run(get_args_parser().parse_args())
