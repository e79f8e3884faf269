"""NMS parity vs a numpy oracle of the reference algorithm.

torchvision is not installed here, so the oracle reimplements the exact semantics of
yolov6/utils/nms.py:31-105 (multi-label candidates conf=obj*cls > conf_thres,
xywh->xyxy, class-offset greedy NMS with torchvision keep rules, max_det truncation)
in plain numpy and our fixed-shape TPU NMS is compared against it.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from mafyolo_tpu.ops.nms import batched_nms


def _fake_preds(rng, b=2, a=400, nc=7):
    """Clustered random detections: xywh boxes, obj=1, spiky class scores."""
    centers = rng.uniform(40, 600, (b, a, 2)).astype(np.float32)
    wh = rng.uniform(10, 120, (b, a, 2)).astype(np.float32)
    obj = np.ones((b, a, 1), np.float32)
    cls = (rng.uniform(0, 1, (b, a, nc)) ** 4).astype(np.float32)
    return np.concatenate([centers, wh, obj, cls], -1)


def _oracle_nms(pred, conf, iou_thr, max_det=300):
    obj = pred[:, 4:5]
    scores = pred[:, 5:] * obj
    cand = np.argwhere(scores > conf)
    if len(cand) == 0:
        return np.zeros((0, 6), np.float32)
    bi, ci = cand[:, 0], cand[:, 1]
    xy, wh = pred[bi, :2], pred[bi, 2:4]
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], -1)
    sc = scores[bi, ci]
    off = boxes + ci[:, None] * 4096.0           # the reference's max_wh class offset
    order = np.argsort(-sc, kind="stable")
    keep = []
    suppressed = np.zeros(len(order), bool)
    areas = (off[:, 2] - off[:, 0]) * (off[:, 3] - off[:, 1])
    for oi, i in enumerate(order):
        if suppressed[oi]:
            continue
        keep.append(i)
        rest = order[oi + 1:]
        lt = np.maximum(off[i, :2], off[rest, :2])
        rb = np.minimum(off[i, 2:], off[rest, 2:])
        inter = np.clip(rb - lt, 0, None).prod(-1)
        iou = inter / (areas[i] + areas[rest] - inter + 1e-12)
        suppressed[oi + 1:] |= iou > iou_thr
    keep = keep[:max_det]
    return np.concatenate([boxes[keep], sc[keep, None],
                           ci[keep, None].astype(np.float32)], -1)


@pytest.mark.parametrize("conf,iou", [(0.03, 0.65), (0.25, 0.45)])
def test_nms_matches_oracle(rng, conf, iou):
    preds = _fake_preds(rng)
    ours = batched_nms(jnp.array(preds), conf_thres=conf, iou_thres=iou,
                       max_det=300, pre_nms_topk=2000)
    for i in range(preds.shape[0]):
        ref = _oracle_nms(preds[i], conf, iou)
        ref_sorted = ref[np.argsort(-ref[:, 4], kind="stable")]
        n_ours = int(np.asarray(ours["valid"][i]).sum())
        assert n_ours == len(ref), f"image {i}: {n_ours} vs {len(ref)}"
        ob = np.asarray(ours["boxes"][i][:n_ours])
        osc = np.asarray(ours["scores"][i][:n_ours])
        ocl = np.asarray(ours["classes"][i][:n_ours])
        order = np.argsort(-osc, kind="stable")
        np.testing.assert_allclose(osc[order], ref_sorted[:, 4], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ob[order], ref_sorted[:, :4], rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(ocl[order], ref_sorted[:, 5].astype(np.int32))


def test_nms_basic_suppression():
    a = 8
    pred = np.zeros((1, a, 5 + 3), np.float32)
    pred[:, :, 4] = 1.0
    pred[0, 0, :4] = [100, 100, 50, 50]
    pred[0, 0, 5] = 0.9
    pred[0, 1, :4] = [102, 102, 50, 50]
    pred[0, 1, 5] = 0.8          # suppressed by box 0 (same class, IoU ~0.85)
    pred[0, 2, :4] = [300, 300, 40, 40]
    pred[0, 2, 6] = 0.7          # different class, kept
    out = batched_nms(jnp.array(pred), conf_thres=0.1, iou_thres=0.5, pre_nms_topk=24,
                      max_det=10)
    n = int(np.asarray(out["valid"][0]).sum())
    assert n == 2
    np.testing.assert_allclose(np.asarray(out["scores"][0][:2]), [0.9, 0.7], atol=1e-6)
    assert set(np.asarray(out["classes"][0][:2]).tolist()) == {0, 1}


def test_nms_multilabel_same_box_two_classes():
    # one anchor whose two class scores clear conf: multi-label keeps both
    pred = np.zeros((1, 4, 5 + 3), np.float32)
    pred[:, :, 4] = 1.0
    pred[0, 0, :4] = [50, 50, 20, 20]
    pred[0, 0, 5] = 0.9
    pred[0, 0, 6] = 0.6
    out = batched_nms(jnp.array(pred), conf_thres=0.1, iou_thres=0.5, pre_nms_topk=24,
                      max_det=10)
    assert int(np.asarray(out["valid"][0]).sum()) == 2


def test_fused_decode_nms_matches_unfused():
    """fused_decode_nms == decode_eval + batched_nms on a real model's outputs
    (same candidates, keep-set, boxes, scores)."""
    import jax

    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models.detect import decode_eval
    from mafyolo_tpu.ops.nms import fused_decode_nms

    from tests.helpers import TINY_GRAPH
    nc, img = 7, 96
    m = build_model(TINY_GRAPH, nc=nc)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, img, img, 3))
    v = m.init(jax.random.PRNGKey(4), x, train=False)
    outs = m.apply(v, x, train=False)

    kw = dict(conf_thres=0.01, iou_thres=0.65, max_det=100, pre_nms_topk=500)
    ref = batched_nms(decode_eval(outs, strides=(8, 16, 32)), **kw)
    fused = fused_decode_nms(outs, strides=(8, 16, 32), **kw)

    for i in range(2):
        n_ref = int(np.asarray(ref["valid"][i]).sum())
        n_f = int(np.asarray(fused["valid"][i]).sum())
        assert n_ref == n_f, (n_ref, n_f)
        np.testing.assert_allclose(np.asarray(fused["scores"][i][:n_f]),
                                   np.asarray(ref["scores"][i][:n_ref]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(fused["boxes"][i][:n_f]),
                                   np.asarray(ref["boxes"][i][:n_ref]),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(fused["classes"][i][:n_f]),
                                      np.asarray(ref["classes"][i][:n_ref]))
