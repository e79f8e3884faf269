#!/usr/bin/env python3
"""Training CLI (parity target: /root/reference/tools/train.py).

Example:
    python tools/train.py --conf configs/maf_yolo_n.py --data data/coco.yaml \
        --img-size 640 --batch-size 64 --epochs 300
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
    p = argparse.ArgumentParser("MAF-YOLO-TPU training")
    p.add_argument("--conf-file", "--conf", dest="conf_file",
                   default="configs/maf_yolo_n.py", help="experiment config .py")
    p.add_argument("--data-path", "--data", dest="data_path",
                   default="data/coco.yaml", help="dataset yaml")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=32, help="global batch size")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--remat", action="store_true",
                   help="per-block rematerialization (trades ~16%% step time "
                        "for lower activation memory; off by default)")
    p.add_argument("--loader-processes", action="store_true",
                   help="decode/augment in a process pool (GIL-free host "
                        "feeding for many-core hosts)")
    p.add_argument("--output-dir", default="./runs/train")
    p.add_argument("--name", default="exp")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", nargs="?", const=True, default=None)
    p.add_argument("--pretrained", default=None, help="checkpoint for finetune")
    p.add_argument("--eval-interval", type=int, default=20)
    p.add_argument("--heavy-eval-range", type=int, default=50)
    p.add_argument("--stop-aug-last-n-epoch", type=int, default=15)
    p.add_argument("--save-interval", type=int, default=1,
                   help="checkpoint every N epochs (evals/best always save)")
    p.add_argument("--max-labels", type=int, default=120)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of steps 2-7 into "
                        "save_dir/profile (tensorboard-viewable)")
    p.add_argument("--wandb", action="store_true",
                   help="mirror scalars to wandb (if installed)")
    p.add_argument("--wandb-project", default="mafyolo-tpu")
    p.add_argument("--simota", action="store_true", help="use SimOTA loss")
    p.add_argument("--distill", action="store_true",
                   help="knowledge distillation from --teacher-model-path")
    p.add_argument("--teacher-model-path", default=None)
    p.add_argument("--distill-feat", action="store_true",
                   help="also distill neck feature maps")
    p.add_argument("--temperature", type=float, default=20.0)
    p.add_argument("--device-aug", action="store_true",
                   help="run affine/HSV/flip augmentation on device "
                        "(host does letterbox only; mosaic disabled)")
    p.add_argument("--quant", action="store_true",
                   help="INT8 flow (reference tools/train.py --quant): with"
                        " --calib runs PTQ calibration via tools/quantize.py")
    p.add_argument("--calib", action="store_true",
                   help="run PTQ calibration instead of training")
    p.add_argument("--device-count", type=int, default=None,
                   help="limit mesh to the first N local devices")
    return p


def increment_name(path):
    import glob
    if not osp.exists(path):
        return path
    n = len(glob.glob(path + "*"))
    return f"{path}{n + 1}"


def main(args):
    from mafyolo_tpu.core.engine import Trainer
    from mafyolo_tpu.parallel.mesh import init_distributed, make_mesh
    from mafyolo_tpu.utils.config import Config
    from mafyolo_tpu.utils.events import LOGGER, load_yaml, save_yaml

    init_distributed()
    cfg = Config.fromfile(args.conf_file)
    data_dict = load_yaml(args.data_path)
    args.save_dir = increment_name(osp.join(args.output_dir, args.name))
    os.makedirs(args.save_dir, exist_ok=True)
    save_yaml({k: v for k, v in vars(args).items() if not callable(v)},
              osp.join(args.save_dir, "args.yaml"))
    LOGGER.info(f"save dir: {args.save_dir}")
    if args.quant and args.calib:
        # PTQ calibration path (reference engine.calibrate, engine.py:581-598).
        # Calibration folds + quantizes an existing checkpoint, so a trained
        # model is mandatory (reference loads args.calib_pt, engine.py:604).
        if not args.pretrained:
            raise SystemExit(
                "--quant --calib requires --pretrained <checkpoint>: "
                "PTQ calibration runs on a trained model (see tools/quantize.py)")
        import tools.quantize as Q
        qargs = Q.get_args_parser().parse_args([
            "--weights", args.pretrained,
            "--data", args.data_path, "--img-size", str(args.img_size),
            "--batch-size", str(args.batch_size), "--eval"])
        Q.run(qargs)
        return
    mesh = make_mesh(args.device_count)
    trainer = Trainer(args, cfg, data_dict, mesh=mesh)
    trainer.train()


if __name__ == "__main__":
    main(get_args_parser().parse_args())
