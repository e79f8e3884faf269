"""PR/F1/confusion metrics: parity vs the reference yolov6/utils/metrics.py and
semantic sanity checks for the Evaler's do_pr_metric path."""
import sys

import numpy as np
import pytest

from mafyolo_tpu.utils.metrics import (ConfusionMatrix, ap_per_class,
                                       process_batch)
from tests.conftest import REFERENCE, requires_reference

if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


def _random_stats(rng, n=200, m=60, nc=5):
    """Random (detections, labels) in a 100x100 image, plus derived stat arrays."""
    det_xy = rng.uniform(0, 80, (n, 2))
    det = np.concatenate([det_xy, det_xy + rng.uniform(4, 20, (n, 2)),
                          rng.uniform(0.05, 1.0, (n, 1)),
                          rng.integers(0, nc, (n, 1)).astype(float)], -1)
    lab_xy = rng.uniform(0, 80, (m, 2))
    labels = np.concatenate([rng.integers(0, nc, (m, 1)).astype(float), lab_xy,
                             lab_xy + rng.uniform(4, 20, (m, 2))], -1)
    return det, labels


@requires_reference
def test_process_batch_parity():
    torch = pytest.importorskip("torch")
    from yolov6.utils.metrics import process_batch as ref_process_batch
    rng = np.random.default_rng(0)
    det, labels = _random_stats(rng)
    iouv = np.linspace(0.5, 0.95, 10)
    ours = process_batch(det, labels, iouv)
    ref = ref_process_batch(torch.tensor(det), torch.tensor(labels),
                            torch.tensor(iouv)).numpy()
    np.testing.assert_array_equal(ours, ref)


@requires_reference
def test_ap_per_class_parity():
    from yolov6.utils.metrics import ap_per_class as ref_ap_per_class
    rng = np.random.default_rng(1)
    det, labels = _random_stats(rng, n=400, m=120)
    iouv = np.linspace(0.5, 0.95, 10)
    correct = process_batch(det, labels, iouv)
    args = (correct, det[:, 4], det[:, 5], labels[:, 0])
    p, r, ap, f1, cls = ap_per_class(*args)
    rp, rr, rap, rf1, rcls = ref_ap_per_class(*args)
    np.testing.assert_allclose(p, rp, atol=1e-10)
    np.testing.assert_allclose(r, rr, atol=1e-10)
    np.testing.assert_allclose(ap, rap, atol=1e-8)
    np.testing.assert_allclose(f1, rf1, atol=1e-10)
    np.testing.assert_array_equal(cls, rcls)


@requires_reference
def test_confusion_matrix_parity():
    torch = pytest.importorskip("torch")
    from yolov6.utils.metrics import ConfusionMatrix as RefCM
    rng = np.random.default_rng(2)
    ours, ref = ConfusionMatrix(nc=5), RefCM(nc=5)
    for _ in range(3):
        det, labels = _random_stats(rng, n=40, m=15)
        ours.process_batch(det, labels)
        ref.process_batch(torch.tensor(det), torch.tensor(labels))
    np.testing.assert_array_equal(ours.matrix, ref.matrix)


def test_perfect_detections_give_unit_pr():
    """A detection exactly on every label => P=R=F1=1, mAP50=1."""
    rng = np.random.default_rng(3)
    m = 20
    xy = rng.uniform(0, 80, (m, 2))
    boxes = np.concatenate([xy, xy + rng.uniform(8, 20, (m, 2))], -1)
    cls = rng.integers(0, 3, m).astype(float)
    det = np.concatenate([boxes, np.full((m, 1), 0.9), cls[:, None]], -1)
    labels = np.concatenate([cls[:, None], boxes], -1)
    iouv = np.linspace(0.5, 0.95, 10)
    correct = process_batch(det, labels, iouv)
    assert correct.all()
    p, r, ap, f1, _ = ap_per_class(correct, det[:, 4], det[:, 5], labels[:, 0])
    best = (2 * p * r / (p + r + 1e-16)).mean(0).argmax()
    assert p[:, best].mean() > 0.99 and r[:, best].mean() > 0.99
    np.testing.assert_allclose(ap[:, 0], 1.0, atol=1e-6)


def test_evaler_pr_metric_end_to_end(tmp_path):
    """Evaler with do_pr_metric: feed GT-echo detections through the real
    predict_model loop -> P=R=1, mAP50~1, confusion CSV written, COCO+PR
    metrics merged in eval_model."""
    from mafyolo_tpu.core.evaler import Evaler
    from mafyolo_tpu.utils.events import load_yaml
    from tests.helpers import make_synth_dataset

    # >8 images so every image (not just the first vis-captured 8) must appear
    # in the COCO conversion
    yaml_path = make_synth_dataset(tmp_path / "ds", n_images=10, img_size=96,
                                   seed=7)
    data_dict = load_yaml(yaml_path)
    nc = int(data_dict["nc"])
    ev = Evaler(data_dict, img_size=64, batch_size=2, task="val", half=False,
                workers=2, do_pr_metric=True, plot_confusion_matrix=True,
                verbose=True, conf_thres=0.01, save_dir=str(tmp_path))
    loader = ev.init_data()
    ev.nc = nc
    md = ev.max_det

    # GT-echo predictor: detections = the loader's own letterboxed labels.
    # Iteration order is deterministic (shuffle=False), so pre-walk the loader
    # once and replay per batch.
    fakes = []
    for imgs, targets, shapes in loader:
        b = imgs.shape[0]
        hw = imgs.shape[1:3]
        boxes = np.zeros((b, md, 4), np.float32)
        scores = np.zeros((b, md), np.float32)
        classes = np.zeros((b, md), np.int32)
        valid = np.zeros((b, md), bool)
        for i in range(b):
            t = np.asarray(targets[i])
            t = t[t[:, 0] >= 0]
            k = len(t)
            xy, wh = t[:, 1:3] * [hw[1], hw[0]], t[:, 3:5] * [hw[1], hw[0]]
            boxes[i, :k] = np.concatenate([xy - wh / 2, xy + wh / 2], -1)
            scores[i, :k] = 0.9
            classes[i, :k] = t[:, 0].astype(np.int32)
            valid[i, :k] = True
        fakes.append(dict(boxes=boxes, scores=scores, classes=classes,
                          valid=valid))
    it = iter(fakes)
    ev._predict = lambda imgs: next(it)

    preds = ev.predict_model(loader)
    metrics = ev.eval_model(preds)
    for k in ("P", "R", "F1", "mAP50", "mAP", "AP"):
        assert k in metrics and np.isfinite(metrics[k])
    assert metrics["P"] > 0.99 and metrics["R"] > 0.99, metrics
    assert metrics["mAP50"] > 0.99, metrics
    assert metrics["AP50"] > 0.99, metrics        # COCO side agrees
    assert (tmp_path / "confusion_matrix.csv").exists()
    # rendered artifacts (reference ap_per_class(plot=True) + ConfusionMatrix
    # .plot paths, yolov6/core/evaler.py:246,268)
    for f in ("PR_curve.png", "F1_curve.png", "P_curve.png", "R_curve.png",
              "confusion_matrix.png"):
        assert (tmp_path / f).stat().st_size > 1000, f
    assert ev._pr_seen == 10
    # every image contributed predictions (regression: the vis-capture block
    # must not swallow the COCO conversion for images beyond the first 8)
    assert len({p["image_id"] for p in preds}) == 10
