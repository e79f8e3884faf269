"""Distillation loss: finite, reduces to base loss + positive distill terms,
matches reference KL formulas on canned tensors."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mafyolo_tpu.models import build_model
from mafyolo_tpu.models.losses.distill import (distill_detection_loss,
                                               distill_loss_cls)

pytestmark = pytest.mark.slow  # full-model compile; excluded from the fast subset
from tests.conftest import REFERENCE, requires_reference

if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


@requires_reference
def test_distill_cls_kl_matches_reference(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    s = rng.normal(0, 1, (2, 84, 5)).astype(np.float32)
    t = rng.normal(0, 1, (2, 84, 5)).astype(np.float32)
    temp = 20.0
    ls = torch.tensor(s).view(-1, 5)
    lt = torch.tensor(t).view(-1, 5)
    ref = (F.kl_div(torch.log(F.softmax(ls / temp, 1)), F.softmax(lt / temp, 1),
                    reduction="sum") * temp ** 2).item()
    ours = float(distill_loss_cls(jnp.array(s), jnp.array(t), temp))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_distill_detection_loss_runs():
    m = build_model("maf-yolo-n", nc=5)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    v_s = m.init(jax.random.PRNGKey(1), x, train=False)
    # a fresh init has ZERO pred-conv weights (reference bias init), making any
    # two inits produce identical head outputs; perturb the teacher to act trained
    leaves, tree = jax.tree_util.tree_flatten(v_s["params"])
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    v_t = {"params": jax.tree_util.tree_unflatten(
        tree, [l + 0.05 * jax.random.normal(k, l.shape)
               for l, k in zip(leaves, keys)]),
        "batch_stats": v_s["batch_stats"]}
    outs_s = m.apply(v_s, x, train=False)
    outs_t = m.apply(v_t, x, train=False)
    targets = np.zeros((2, 6, 5), np.float32)
    targets[:, :, 0] = -1
    targets[0, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    total, comps = distill_detection_loss(
        outs_s, outs_t, jnp.array(targets), epoch_num=10, max_epoch=300,
        use_atss=False, num_classes=5, img_size=64, distill_feat=True)
    assert np.isfinite(float(total))
    for k in ("iou", "dfl", "cls", "cwd"):
        assert np.isfinite(float(comps[k])), k
    # distillation adds signal on top of the base loss
    from mafyolo_tpu.models.losses import detection_loss
    base, _ = detection_loss(outs_s, jnp.array(targets), use_atss=False,
                             num_classes=5, img_size=64)
    assert float(total) > float(base)
