#!/usr/bin/env python3
"""Visualize YOLO-format labels on images (parity: yolov6/data/vis_dataset.py)."""
import argparse
import os
import os.path as osp
from pathlib import Path

import cv2
import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("label visualizer")
    p.add_argument("--img-dir", required=True)
    p.add_argument("--label-dir", default=None)
    p.add_argument("--out-dir", default="runs/vis")
    p.add_argument("--max-images", type=int, default=50)
    return p


def main():
    args = get_args_parser().parse_args()
    label_dir = args.label_dir or args.img_dir.replace(
        f"{os.sep}images", f"{os.sep}labels")
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(1)
    colors = rng.integers(64, 255, (100, 3)).tolist()
    n = 0
    for f in sorted(Path(args.img_dir).iterdir()):
        if f.suffix.lower() not in (".jpg", ".jpeg", ".png", ".bmp"):
            continue
        img = cv2.imread(str(f))
        if img is None:
            continue
        h, w = img.shape[:2]
        txt = Path(label_dir) / (f.stem + ".txt")
        if txt.exists():
            for line in txt.read_text().splitlines():
                vals = line.split()
                if len(vals) < 5:
                    continue
                c = int(float(vals[0]))
                cx, cy, bw, bh = map(float, vals[1:5])
                x1, y1 = int((cx - bw / 2) * w), int((cy - bh / 2) * h)
                x2, y2 = int((cx + bw / 2) * w), int((cy + bh / 2) * h)
                cv2.rectangle(img, (x1, y1), (x2, y2), colors[c % 100], 2)
                cv2.putText(img, str(c), (x1, max(y1 - 4, 10)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.6, colors[c % 100], 2)
        cv2.imwrite(osp.join(args.out_dir, f.name), img)
        n += 1
        if n >= args.max_images:
            break
    print(f"wrote {n} visualizations -> {args.out_dir}")


if __name__ == "__main__":
    main()
