"""Pallas greedy-NMS kernel: exactness vs the XLA fixpoint (interpret mode on CPU)."""
import pytest
import numpy as np

import jax
import jax.numpy as jnp

from mafyolo_tpu.ops.boxes import box_iou_pairwise
from mafyolo_tpu.ops.nms import _greedy_nms_mask
from mafyolo_tpu.ops.pallas_nms import pallas_greedy_nms

pytestmark = pytest.mark.slow  # full-model compile; excluded from the fast subset


def test_pallas_nms_matches_xla_greedy(rng):
    b, m = 3, 256
    xy = rng.uniform(0, 640, (b, m, 2)).astype(np.float32)
    boxes = np.concatenate(
        [xy, xy + rng.uniform(10, 80, (b, m, 2)).astype(np.float32)], -1)
    valid = rng.uniform(0, 1, (b, m)) > 0.15
    bj, vj = jnp.asarray(boxes), jnp.asarray(valid)
    keep_p = np.asarray(pallas_greedy_nms(bj, vj, 0.5, interpret=True))
    iou = jax.vmap(lambda x: box_iou_pairwise(x, x))(bj)
    keep_x = np.asarray(jax.vmap(
        lambda i, v: _greedy_nms_mask(i, v, 0.5))(iou, vj))
    np.testing.assert_array_equal(keep_p, keep_x)
    assert keep_p.sum() > 0
    # invalid rows never kept
    assert not keep_p[~valid].any()
