"""Numerical parity vs the PyTorch reference implementation (CPU torch).

These tests import modules from /root/reference (read-only) and compare our jnp
implementations against them on random fixtures. They are the substitute for the
reference's missing test suite (SURVEY.md section 4) and gate assignment/loss parity.
"""
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE, requires_reference

if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from mafyolo_tpu.assigners import atss_assign, tal_assign  # noqa: E402
from mafyolo_tpu.models.detect import (bbox2dist, dfl_decode,  # noqa: E402
                                       dist2bbox, generate_anchors_train)
from mafyolo_tpu.models.losses import varifocal_loss  # noqa: E402
from mafyolo_tpu.ops.boxes import iou_loss, xywh2xyxy  # noqa: E402


def _random_scene(rng, b=2, n=6, nc=5, img=64):
    """Random gts + predictions over a 3-level grid (img=64 -> 84 anchors)."""
    hw = [(img // s, img // s) for s in (8, 16, 32)]
    strides = (8, 16, 32)
    a = sum(h * w for h, w in hw)
    # gt boxes: centers spread over the image, sizes 8..32; last row padded out
    cx = rng.uniform(8, img - 8, (b, n))
    cy = rng.uniform(8, img - 8, (b, n))
    w = rng.uniform(8, 32, (b, n))
    h = rng.uniform(8, 32, (b, n))
    gt = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1).astype(np.float32)
    mask = np.ones((b, n, 1), np.float32)
    mask[:, -2:] = 0.0
    gt = gt * mask
    labels = rng.integers(0, nc, (b, n, 1)).astype(np.float32) * mask
    labels = np.where(mask > 0, labels, -1.0)
    scores = rng.uniform(0.05, 0.95, (b, a, nc)).astype(np.float32)
    # predicted boxes: anchor-centered boxes with random ltrb in grid units * stride
    anchors, points, counts, stride_t = generate_anchors_train(hw, strides)
    points = np.asarray(points)
    stride_t = np.asarray(stride_t)
    ltrb = rng.uniform(0.5, 3.5, (b, a, 4)).astype(np.float32)
    pboxes = np.concatenate([points - ltrb[..., :2] * stride_t,
                             points + ltrb[..., 2:] * stride_t], -1).astype(np.float32)
    return dict(hw=hw, strides=strides, gt=gt, labels=labels, mask=mask,
                scores=scores, pboxes=pboxes, anchors=np.asarray(anchors),
                points=points, counts=counts, stride_t=stride_t, nc=nc)


@requires_reference
def test_tal_assigner_parity(rng):
    from yolov6.assigners.tal_assigner import TaskAlignedAssigner
    s = _random_scene(rng)
    ref = TaskAlignedAssigner(topk=13, num_classes=s["nc"], alpha=1.0, beta=6.0)
    tl, tb, ts, fg = ref(
        torch.tensor(s["scores"]), torch.tensor(s["pboxes"]),
        torch.tensor(s["points"]), torch.tensor(s["labels"]),
        torch.tensor(s["gt"]), torch.tensor(s["mask"]))
    jl, jb, js, jf = tal_assign(
        jnp.array(s["scores"]), jnp.array(s["pboxes"]), jnp.array(s["points"]),
        jnp.array(s["labels"]), jnp.array(s["gt"]), jnp.array(s["mask"]),
        topk=13, num_classes=s["nc"])
    np.testing.assert_array_equal(np.asarray(jf), fg.numpy())
    fgm = fg.numpy()
    np.testing.assert_array_equal(np.asarray(jl) * fgm, tl.numpy() * fgm)
    np.testing.assert_allclose(np.asarray(jb) * fgm[..., None],
                               tb.numpy() * fgm[..., None], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(js), ts.numpy(), rtol=1e-4, atol=1e-6)


@requires_reference
def test_atss_assigner_parity(rng):
    from yolov6.assigners.atss_assigner import ATSSAssigner
    # smallest level must have >= topk anchors or the reference itself crashes
    s = _random_scene(rng, img=128)
    ref = ATSSAssigner(topk=9, num_classes=s["nc"])
    tl, tb, ts, fg = ref(
        torch.tensor(s["anchors"]), list(s["counts"]),
        torch.tensor(s["labels"]), torch.tensor(s["gt"]),
        torch.tensor(s["mask"]), torch.tensor(s["pboxes"]))
    jl, jb, js, jf = atss_assign(
        jnp.array(s["anchors"]), tuple(s["counts"]), jnp.array(s["labels"]),
        jnp.array(s["gt"]), jnp.array(s["mask"]), jnp.array(s["pboxes"]),
        topk=9, num_classes=s["nc"])
    np.testing.assert_array_equal(np.asarray(jf), fg.numpy())
    np.testing.assert_array_equal(np.asarray(jl), tl.numpy())
    fgm = fg.numpy()
    np.testing.assert_allclose(np.asarray(jb) * fgm[..., None],
                               tb.numpy() * fgm[..., None], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(js), ts.numpy(), rtol=1e-4, atol=1e-6)


@requires_reference
def test_anchor_generation_parity():
    from yolov6.assigners.anchor_generator import generate_anchors
    feats = [torch.zeros(1, 3, 8, 8), torch.zeros(1, 3, 4, 4), torch.zeros(1, 3, 2, 2)]
    ta, tp, tc, tst = generate_anchors(feats, [8, 16, 32], 5.0, 0.5)
    ja, jp, jc, jst = generate_anchors_train([(8, 8), (4, 4), (2, 2)], (8, 16, 32))
    np.testing.assert_allclose(np.asarray(ja), ta.numpy())
    np.testing.assert_allclose(np.asarray(jp), tp.numpy())
    assert list(jc) == list(tc)
    np.testing.assert_allclose(np.asarray(jst), tst.numpy())


@requires_reference
def test_varifocal_parity(rng):
    from yolov6.models.loss import VarifocalLoss
    p = rng.uniform(1e-4, 1 - 1e-4, (2, 84, 5)).astype(np.float32)
    q = rng.uniform(0, 1, (2, 84, 5)).astype(np.float32)
    y = (rng.uniform(0, 1, (2, 84, 5)) > 0.9).astype(np.float32)
    ref = VarifocalLoss()(torch.tensor(p), torch.tensor(q), torch.tensor(y)).item()
    ours = float(varifocal_loss(jnp.array(p), jnp.array(q), jnp.array(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


@requires_reference
@pytest.mark.parametrize("iou_type", ["iou", "giou", "diou", "ciou", "siou"])
def test_iou_loss_parity(rng, iou_type):
    from yolov6.utils.figure_iou import IOUloss
    b1 = rng.uniform(0, 50, (40, 2)).astype(np.float32)
    b1 = np.concatenate([b1, b1 + rng.uniform(2, 30, (40, 2)).astype(np.float32)], -1)
    b2 = rng.uniform(0, 50, (40, 2)).astype(np.float32)
    b2 = np.concatenate([b2, b2 + rng.uniform(2, 30, (40, 2)).astype(np.float32)], -1)
    ref = IOUloss(box_format="xyxy", iou_type=iou_type, eps=1e-10)(
        torch.tensor(b1), torch.tensor(b2)).numpy().reshape(-1)
    ours = np.asarray(iou_loss(jnp.array(b1), jnp.array(b2), iou_type=iou_type,
                               eps=1e-10))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@requires_reference
def test_wiou_parity(rng):
    """Wise-IoU v3 vs yolov6/utils/wiou.py IoU_Cal.WIoU (through the
    figure_iou.py iou_type=='wiou' dispatch semantics), incl. the running-mean
    update that happens at IoU_Cal construction."""
    from yolov6.utils.wiou import IoU_Cal

    from mafyolo_tpu.ops.boxes import WIOU_MOMENTUM, wiou_loss
    assert np.isclose(WIOU_MOMENTUM, IoU_Cal.momentum)

    b1 = rng.uniform(0, 50, (40, 2)).astype(np.float32)
    b1 = np.concatenate([b1, b1 + rng.uniform(2, 30, (40, 2)).astype(np.float32)], -1)
    b2 = rng.uniform(0, 50, (40, 2)).astype(np.float32)
    b2 = np.concatenate([b2, b2 + rng.uniform(2, 30, (40, 2)).astype(np.float32)], -1)

    IoU_Cal.iou_mean = 1.0
    IoU_Cal.train()
    calc = IoU_Cal(torch.tensor(b1), torch.tensor(b2))
    ref = IoU_Cal.WIoU(None, None, self=calc).numpy().reshape(-1)
    ref_mean = IoU_Cal.iou_mean

    ours, new_mean = wiou_loss(jnp.array(b1), jnp.array(b2), jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(new_mean), ref_mean, rtol=1e-5)

    # second call: the running mean carries over
    calc2 = IoU_Cal(torch.tensor(b2), torch.tensor(b1))
    ref2 = IoU_Cal.WIoU(None, None, self=calc2).numpy().reshape(-1)
    ours2, _ = wiou_loss(jnp.array(b2), jnp.array(b1), new_mean)
    np.testing.assert_allclose(np.asarray(ours2), ref2, rtol=1e-4, atol=1e-5)


@requires_reference
def test_dist2bbox_dfl_parity(rng):
    import torch.nn.functional as F
    from yolov6.utils.general import bbox2dist as t_b2d
    from yolov6.utils.general import dist2bbox as t_d2b
    reg_max = 16
    logits = rng.normal(0, 1, (2, 84, 4 * (reg_max + 1))).astype(np.float32)
    pts = rng.uniform(0, 8, (84, 2)).astype(np.float32)
    t = torch.tensor(logits).view(2, 84, 4, reg_max + 1)
    proj = torch.linspace(0, reg_max, reg_max + 1)
    t_ltrb = F.softmax(t, dim=-1).matmul(proj)
    ref = t_d2b(t_ltrb, torch.tensor(pts)).numpy()
    ours = np.asarray(dist2bbox(dfl_decode(jnp.array(logits), reg_max), jnp.array(pts)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    boxes = rng.uniform(0, 60, (2, 84, 4)).astype(np.float32)
    ref2 = t_b2d(torch.tensor(pts), torch.tensor(boxes), reg_max).numpy()
    ours2 = np.asarray(bbox2dist(jnp.array(pts), jnp.array(boxes), reg_max))
    np.testing.assert_allclose(ours2, ref2, rtol=1e-5, atol=1e-5)


def test_topk_rows_exact_vs_lax_topk():
    """Hierarchical top-k == flat lax.top_k bit-exactly, values AND indices
    (incl. lower-index-first tie order), on random, tie-heavy, and
    all-equal inputs."""
    import jax.numpy as jnp
    from jax import lax

    from mafyolo_tpu.assigners.common import topk_rows

    rng = np.random.default_rng(0)
    cases = [
        jnp.asarray(rng.normal(size=(37, 8400)).astype(np.float32)),
        # tie-heavy: quantized to few levels (zeros dominate, like early TAL)
        jnp.asarray((rng.integers(0, 4, (16, 8400)) == 0).astype(np.float32)
                    * rng.integers(1, 3, (16, 8400)).astype(np.float32)),
        jnp.zeros((5, 8400), jnp.float32),
        jnp.asarray(rng.normal(size=(8, 500)).astype(np.float32)),  # fallback
    ]
    for x in cases:
        for k in (13, 9, 1):
            v_ref, i_ref = lax.top_k(x, k)
            v, i = topk_rows(x, k)
            np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
            np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
