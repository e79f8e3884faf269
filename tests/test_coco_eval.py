"""COCO evaluator correctness on hand-computable fixtures."""
import numpy as np

from mafyolo_tpu.utils.coco_eval import COCOEvaluator, evaluate_coco


def _gt(images, anns, nc=2):
    return dict(
        images=[dict(id=i, width=640, height=640) for i in images],
        annotations=[dict(id=j, image_id=a[0], category_id=a[1],
                          bbox=list(map(float, a[2])),
                          area=float(a[2][2] * a[2][3]), iscrowd=a[3] if len(a) > 3
                          else 0, segmentation=[]) for j, a in enumerate(anns)],
        categories=[dict(id=c, name=str(c)) for c in range(nc)])


def _det(image_id, cat, box, score):
    return dict(image_id=image_id, category_id=cat, bbox=list(map(float, box)),
                score=float(score))


def test_perfect_detections_ap1():
    gt = _gt([0, 1], [(0, 0, (10, 10, 50, 50)), (0, 1, (100, 100, 40, 80)),
                      (1, 0, (5, 5, 60, 60))])
    dets = [_det(0, 0, (10, 10, 50, 50), 0.9),
            _det(0, 1, (100, 100, 40, 80), 0.8),
            _det(1, 0, (5, 5, 60, 60), 0.95)]
    m = evaluate_coco(gt, dets)
    assert np.isclose(m["AP"], 1.0)
    assert np.isclose(m["AP50"], 1.0)
    assert np.isclose(m["AR100"], 1.0)


def test_no_detections_ap0():
    gt = _gt([0], [(0, 0, (10, 10, 50, 50))])
    m = evaluate_coco(gt, [])
    assert m["AP"] == 0.0


def test_half_iou_counts_only_low_thresholds():
    # det overlaps gt with IoU = 0.5 exactly -> matches at thr 0.5 only
    gt = _gt([0], [(0, 0, (0, 0, 100, 100))])
    dets = [_det(0, 0, (0, 0, 50, 100), 1.0)]  # IoU = 0.5
    m = evaluate_coco(gt, dets)
    assert np.isclose(m["AP50"], 1.0)
    assert m["AP75"] == 0.0
    # 1 threshold of 10 matched
    assert np.isclose(m["AP"], 0.1, atol=1e-6)


def test_false_positive_lowers_precision_not_recall():
    gt = _gt([0], [(0, 0, (10, 10, 50, 50))])
    dets = [_det(0, 0, (10, 10, 50, 50), 0.9),
            _det(0, 0, (300, 300, 50, 50), 0.8)]   # FP, lower score
    m = evaluate_coco(gt, dets)
    # PR curve: (r=1, p=1) then FP: interpolated precision stays 1 -> AP 1.0
    assert np.isclose(m["AP50"], 1.0)
    # FP scoring above the TP drags sampled precision to 1/2 at every recall point
    dets2 = [_det(0, 0, (10, 10, 50, 50), 0.7),
             _det(0, 0, (300, 300, 50, 50), 0.95)]
    m2 = evaluate_coco(gt, dets2)
    assert np.isclose(m2["AP50"], 0.5)


def test_duplicate_detection_is_fp():
    gt = _gt([0], [(0, 0, (10, 10, 50, 50))])
    dets = [_det(0, 0, (10, 10, 50, 50), 0.9),
            _det(0, 0, (11, 11, 50, 50), 0.85)]  # duplicate, becomes FP
    m = evaluate_coco(gt, dets)
    assert np.isclose(m["AP50"], 1.0)  # TP first: envelope keeps precision 1
    assert np.isclose(m["AR100"], 1.0)


def test_crowd_gt_absorbs_matches_without_counting():
    # crowd gt: detections matching it are ignored, not FP; npig excludes it
    gt = _gt([0], [(0, 0, (10, 10, 50, 50), 0), (0, 0, (200, 200, 100, 100), 1)])
    dets = [_det(0, 0, (10, 10, 50, 50), 0.9),
            _det(0, 0, (210, 210, 90, 90), 0.8)]  # overlaps the crowd region
    m = evaluate_coco(gt, dets)
    assert np.isclose(m["AP50"], 1.0)


def test_area_ranges():
    # one small (20x20=400 < 32^2) and one large gt (200x200)
    gt = _gt([0], [(0, 0, (10, 10, 20, 20)), (0, 0, (100, 100, 200, 200))])
    dets = [_det(0, 0, (10, 10, 20, 20), 0.9)]
    m = evaluate_coco(gt, dets)
    assert np.isclose(m["APs"], 1.0)
    assert m["APl"] == 0.0
    # recall 0.5 with perfect precision: 51 of the 101 sampled points are 1.0
    assert np.isclose(m["AP"], 51 / 101)


def test_maxdets_1_limits_recall():
    gt = _gt([0], [(0, 0, (10, 10, 50, 50)), (0, 0, (200, 200, 50, 50))])
    dets = [_det(0, 0, (10, 10, 50, 50), 0.9),
            _det(0, 0, (200, 200, 50, 50), 0.8)]
    ev = COCOEvaluator(gt, dets)
    m = ev.summarize()
    assert np.isclose(m["AR1"], 0.5)
    assert np.isclose(m["AR100"], 1.0)
