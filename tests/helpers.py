"""Shared test fixtures: an offline synthetic detection dataset.

No network egress exists in this environment (COCO is unreachable), so train/eval
smoke tests run on generated images: solid colored rectangles on textured noise,
one class per color -- learnable by a detector in a handful of steps.
"""
from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np
import yaml

COLORS = [(40, 40, 220), (40, 220, 40), (220, 40, 40)]  # BGR per class


def make_synth_dataset(root, n_images=16, img_size=320, max_objects=4, nc=3, seed=0,
                       splits=("train", "val"), noise=0):
    """Create images/{split}, labels/{split} + dataset yaml. Returns yaml path."""
    rng = np.random.default_rng(seed)
    root = Path(root)
    for split in splits:
        img_dir = root / "images" / split
        lbl_dir = root / "labels" / split
        img_dir.mkdir(parents=True, exist_ok=True)
        lbl_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n_images):
            h = int(rng.integers(img_size * 3 // 4, img_size * 5 // 4))
            w = int(rng.integers(img_size * 3 // 4, img_size * 5 // 4))
            img = rng.integers(90, 130, (h, w, 3)).astype(np.uint8)
            lines = []
            for _ in range(int(rng.integers(1, max_objects + 1))):
                c = int(rng.integers(0, nc))
                bw = int(rng.integers(w // 8, w // 3))
                bh = int(rng.integers(h // 8, h // 3))
                x1 = int(rng.integers(0, w - bw))
                y1 = int(rng.integers(0, h - bh))
                cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh),
                              COLORS[c % len(COLORS)], -1)
                cx, cy = (x1 + bw / 2) / w, (y1 + bh / 2) / h
                lines.append(f"{c} {cx:.6f} {cy:.6f} {bw / w:.6f} {bh / h:.6f}")
            if noise:
                # per-pixel texture AFTER the solid rectangles: convs are
                # shift-invariant, so any flat region (the drawn objects!)
                # yields bit-equal scores at neighboring anchors, and
                # greedy-NMS tie-breaking between equal scores is
                # framework-dependent -- the texture de-degenerates them
                img = np.clip(img.astype(np.int16) + rng.integers(
                    -noise, noise + 1, (h, w, 3)), 0, 255).astype(np.uint8)
            cv2.imwrite(str(img_dir / f"{i:06d}.jpg"), img)
            (lbl_dir / f"{i:06d}.txt").write_text("\n".join(lines) + "\n")
    data = dict(
        train=str(root / "images" / "train"),
        val=str(root / "images" / (splits[-1])),
        nc=nc, names=[f"class{i}" for i in range(nc)], is_coco=False)
    yaml_path = root / "dataset.yaml"
    yaml_path.write_text(yaml.safe_dump(data))
    return str(yaml_path)


# A minimal 3-level graph exercising the same block kinds / loss / train-step
# code paths as the shipped MAF graphs at a fraction of the CPU compile cost
# (the full maf-yolo-n train-step compile is ~4 min on a 1-core CPU host).
TINY_GRAPH = dict(
    depth_multiple=1.0,
    width_multiple=1.0,
    backbone=[
        [-1, 1, "RepVGGBlock", [8, 3, 2]],
        [-1, 1, "RepVGGBlock", [16, 3, 2]],
        [-1, 1, "RepHDW", [16, True, 0.5, 3, 1]],
        [-1, 1, "MPRep", [32]],                   # P3
        [-1, 1, "MPRep", [32]],                   # P4
        [-1, 1, "MPRep", [32]],                   # P5
    ],
    neck=[],
    effidehead=[
        [3, 1, "Head_DepthUni", [32, 16, 3]],
        [4, 1, "Head_DepthUni", [32, 16, 3]],
        [5, 1, "Head_DepthUni", [32, 16, 3]],
        [[6, 7, 8], 1, "Out", []],
    ],
)
