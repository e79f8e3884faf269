"""Threshold-compaction selection: unit exactness + NMS fast-path parity.

The compaction path (ops/compaction.py + the fast path of fused_decode_nms)
replaces the reference's boolean-mask candidate compaction
(/root/reference/yolov6/utils/nms.py:63-80, x[xc]); these tests pin
(a) compact_mask_indices == np.nonzero on random masks of every density,
(b) the fast path's keep-set == the dense top-M path on inputs that do not
    overflow, and
(c) the overflow lax.cond fallback produces the dense path's results.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mafyolo_tpu.ops.compaction import compact_mask_indices


@pytest.mark.parametrize("n,density", [
    (100, 0.0), (100, 0.05), (128, 1.0), (8400, 0.001), (8400, 0.02),
    (672000, 0.0002), (672000, 0.0),
])
def test_compact_matches_nonzero(n, density):
    rng = np.random.default_rng(hash((n, int(density * 1e6))) % 2**32)
    mask = rng.random(n) < density
    k = 256
    idx, count = compact_mask_indices(jnp.asarray(mask), k)
    idx, count = np.asarray(idx), int(count)
    expect = np.nonzero(mask)[0]
    assert count == len(expect)
    take = min(k, len(expect))
    np.testing.assert_array_equal(idx[:take], expect[:take])


def test_compact_count_overflow_reported():
    mask = np.zeros(1000, bool)
    mask[::2] = True                      # 500 survivors
    idx, count = compact_mask_indices(jnp.asarray(mask), 64)
    assert int(count) == 500
    np.testing.assert_array_equal(np.asarray(idx), np.arange(0, 128, 2))


def _fake_head_outs(rng, b=2, nc=7, base=8, reg_max=16, sparse=True):
    """Synthetic per-level (feat, cls, reg) with controllable survivor count."""
    outs = []
    for s in (1, 2, 4):
        h = w = base // s
        cls = rng.random((b, h, w, nc)).astype(np.float32)
        cls = cls * 0.02 if sparse else cls        # sparse: ~nothing > 0.03
        if sparse:
            # plant a handful of confident detections per level
            for bi in range(b):
                for _ in range(3):
                    cls[bi, rng.integers(h), rng.integers(w),
                        rng.integers(nc)] = 0.2 + 0.6 * rng.random()
        reg = rng.normal(size=(b, h, w, 4 * (reg_max + 1))).astype(np.float32)
        outs.append((None, jnp.asarray(cls), jnp.asarray(reg)))
    return outs


def _assert_same_dets(out_a, out_b):
    va, vb = np.asarray(out_a["valid"]), np.asarray(out_b["valid"])
    np.testing.assert_array_equal(va, vb)
    for key in ("boxes", "scores", "classes"):
        a, b = np.asarray(out_a[key]), np.asarray(out_b[key])
        np.testing.assert_allclose(a[va], b[vb], rtol=1e-5, atol=1e-5)


def test_fast_path_matches_dense_path():
    from mafyolo_tpu.ops.nms import fused_decode_nms
    rng = np.random.default_rng(0)
    outs = _fake_head_outs(rng, sparse=True)
    kw = dict(strides=(8, 16, 32), conf_thres=0.03, iou_thres=0.6, max_det=20)
    fast = fused_decode_nms(outs, compact_k=64, **kw)
    # compact_k=1 always overflows (>1 planted survivor) -> dense fallback
    dense = fused_decode_nms(outs, compact_k=1, pre_nms_topk=200, **kw)
    _assert_same_dets(fast, dense)
    assert np.asarray(fast["valid"]).sum() > 0      # the test isn't vacuous


def test_overflow_falls_back_exactly():
    from mafyolo_tpu.ops.nms import fused_decode_nms
    rng = np.random.default_rng(1)
    outs = _fake_head_outs(rng, sparse=False)       # nearly all pairs survive
    kw = dict(strides=(8, 16, 32), conf_thres=0.03, iou_thres=0.6, max_det=20)
    over = fused_decode_nms(outs, compact_k=16, pre_nms_topk=300, **kw)
    dense = fused_decode_nms(outs, compact_k=1, pre_nms_topk=300, **kw)
    _assert_same_dets(over, dense)
