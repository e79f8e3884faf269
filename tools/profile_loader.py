"""Host input-pipeline throughput: scan time + loader img/s at 640 with mosaic.

Builds a synthetic 640-class dataset once under /tmp, then measures (a) the
label-cache scan, (b) steady-state train-loader throughput with full
augmentation. Compare against the train step rate (docs/STATUS.md): the loader
must sustain >= 2x the step rate to never gate the chip.
Usage: python tools/profile_loader.py [--images 256] [--batch 32] [--workers 8]
"""
import argparse
import os.path as osp
import shutil
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--keep", action="store_true", help="reuse dataset dir")
    args = ap.parse_args()

    from mafyolo_tpu.data import create_dataloader
    from tests.helpers import make_synth_dataset

    root = f"/tmp/loader_bench_{args.images}_{args.img_size}"
    if not args.keep and osp.exists(root):
        shutil.rmtree(root)
    if not osp.exists(root):
        make_synth_dataset(root, n_images=args.images, img_size=args.img_size,
                           max_objects=12, nc=16, seed=0, splits=("train",))

    hyp = dict(mosaic=1.0, mixup=0.1, dy_mixup=0.1, hsv_h=0.015, hsv_s=0.7,
               hsv_v=0.4, degrees=0.0, translate=0.1, scale=0.9, shear=0.0,
               flipud=0.0, fliplr=0.5)

    t0 = time.perf_counter()
    loader, ds = create_dataloader(
        f"{root}/images/train", args.img_size, args.batch, stride=32, hyp=hyp,
        augment=True, workers=args.workers, shuffle=True, seed=0)
    n_first = 0
    for imgs, _, _ in loader:
        n_first += imgs.shape[0]
    t_scan_first = time.perf_counter() - t0
    print(f"scan + first epoch ({n_first} imgs): {t_scan_first:.2f}s "
          f"({n_first / t_scan_first:.1f} img/s cold)")

    # worker x mode sweep: the feed-rate table for the pod-scale plan
    # (docs/STATUS.md round-3): a v5e-8 at the current step rate needs
    # 8 * step-img/s from ONE host unless feeding is multi-host.
    print(f"{'mode':9s} {'workers':7s} img/s")
    for use_proc in (False, True):
        for w in sorted({1, 2, 4, args.workers}):
            loader, _ = create_dataloader(
                f"{root}/images/train", args.img_size, args.batch, stride=32,
                hyp=hyp, augment=True, workers=w, shuffle=True, seed=0,
                use_processes=use_proc)
            n = 0
            t0 = time.perf_counter()
            for ep in range(1, args.epochs + 1):
                loader.set_epoch(ep)
                for imgs, targets, _ in loader:
                    n += imgs.shape[0]
            dt = time.perf_counter() - t0
            print(f"{'process' if use_proc else 'thread':9s} {w:7d} "
                  f"{n / dt:.1f}")


if __name__ == "__main__":
    main()
