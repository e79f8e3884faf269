"""RepOptimizer machinery: reinit math + gradient masks vs the torch reference."""
import sys

import numpy as np
import pytest

from mafyolo_tpu.solver.repopt import (apply_grad_masks, build_grad_mask_tree,
                                       repopt_grad_mask, repopt_reinit_kernel)
from tests.conftest import REFERENCE, requires_reference

if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


def test_grad_mask_structure():
    cin = cout = 8
    s = (np.full(cout, 0.5, np.float32),    # identity
         np.full(cout, 2.0, np.float32),    # 1x1
         np.full(cout, 3.0, np.float32))    # conv
    mask = repopt_grad_mask((3, 3, cin, cout), s)
    # corners: s_conv^2
    np.testing.assert_allclose(mask[0, 0], 9.0)
    # center, off-diagonal: s_conv^2 + s_1x1^2
    assert np.isclose(mask[1, 1, 0, 1], 13.0)
    # center, diagonal: + 1 for identity
    assert np.isclose(mask[1, 1, 0, 0], 14.0)

    s2 = (np.full(cout, 2.0, np.float32), np.full(cout, 3.0, np.float32))
    mask2 = repopt_grad_mask((3, 3, 4, cout), s2)
    np.testing.assert_allclose(mask2[0, 0], 9.0)
    np.testing.assert_allclose(mask2[1, 1], 13.0)


@requires_reference
def test_grad_mask_matches_reference():
    torch = pytest.importorskip("torch")
    cout = cin = 6
    rng = np.random.default_rng(0)
    s_id = rng.uniform(0.1, 2, cout).astype(np.float32)
    s_1 = rng.uniform(0.1, 2, cout).astype(np.float32)
    s_c = rng.uniform(0.1, 2, cout).astype(np.float32)
    # reference mask (generate_gradient_masks, OIHW)
    para = torch.zeros(cout, cin, 3, 3)
    mask_t = torch.ones_like(para) * (torch.tensor(s_c) ** 2).view(-1, 1, 1, 1)
    mask_t[:, :, 1:2, 1:2] += torch.ones(cout, cin, 1, 1) * (
        torch.tensor(s_1) ** 2).view(-1, 1, 1, 1)
    ids = np.arange(cout)
    mask_t[ids, ids, 1:2, 1:2] += 1.0
    ours = repopt_grad_mask((3, 3, cin, cout), (s_id, s_1, s_c))
    np.testing.assert_allclose(ours.transpose(3, 2, 0, 1), mask_t.numpy(),
                               rtol=1e-6)


def test_reinit_and_mask_tree():
    rng = np.random.default_rng(1)
    k = rng.normal(0, 0.1, (3, 3, 8, 8)).astype(np.float32)
    s = (np.ones(8, np.float32), np.full(8, 2.0, np.float32),
         np.full(8, 3.0, np.float32))
    out = repopt_reinit_kernel(k, s, rng)
    assert out.shape == k.shape
    # identity taps got +1 * s_id at center diagonal
    delta = out[1, 1, 0, 0] - (k[1, 1, 0, 0] * 3.0)
    assert abs(delta) > 0.5  # identity + 1x1 contributions present

    import jax.numpy as jnp
    params = {"a": {"conv": {"kernel": jnp.asarray(k)}},
              "b": {"bias": jnp.zeros(8)}}
    masks = build_grad_mask_tree(params, {
        "a/conv/kernel": repopt_grad_mask(k.shape, s)})
    grads = {"a": {"conv": {"kernel": jnp.ones_like(jnp.asarray(k))}},
             "b": {"bias": jnp.ones(8)}}
    masked = apply_grad_masks(grads, masks)
    np.testing.assert_allclose(np.asarray(masked["a"]["conv"]["kernel"][0, 0]), 9.0)
    np.testing.assert_allclose(np.asarray(masked["b"]["bias"]), 1.0)
