#!/usr/bin/env python3
"""Pascal VOC xml -> YOLO txt label converter (parity: yolov6/data/voc2yolo.py)."""
import argparse
import os
import os.path as osp
import xml.etree.ElementTree as ET
from pathlib import Path

VOC_NAMES = ["aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
             "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
             "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor"]


def convert_box(size, box):
    dw, dh = 1.0 / size[0], 1.0 / size[1]
    x = (box[0] + box[1]) / 2.0
    y = (box[2] + box[3]) / 2.0
    w = box[1] - box[0]
    h = box[3] - box[2]
    return x * dw, y * dh, w * dw, h * dh


def convert_annotation(xml_path, out_txt, names=VOC_NAMES):
    tree = ET.parse(xml_path)
    root = tree.getroot()
    size = root.find("size")
    w = int(size.find("width").text)
    h = int(size.find("height").text)
    lines = []
    for obj in root.iter("object"):
        cls = obj.find("name").text
        difficult = obj.find("difficult")
        if cls not in names or (difficult is not None and difficult.text == "1"):
            continue
        xml_box = obj.find("bndbox")
        b = [float(xml_box.find(t).text) for t in ("xmin", "xmax", "ymin", "ymax")]
        bb = convert_box((w, h), b)
        lines.append(f"{names.index(cls)} " + " ".join(f"{v:.6f}" for v in bb))
    Path(out_txt).write_text("\n".join(lines) + ("\n" if lines else ""))


def get_args_parser():
    p = argparse.ArgumentParser("VOC xml -> YOLO txt")
    p.add_argument("--xml-dir", required=True)
    p.add_argument("--out-dir", required=True)
    return p


def main():
    args = get_args_parser().parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for f in sorted(Path(args.xml_dir).glob("*.xml")):
        convert_annotation(f, osp.join(args.out_dir, f.stem + ".txt"))
        n += 1
    print(f"converted {n} annotations -> {args.out_dir}")


if __name__ == "__main__":
    main()
