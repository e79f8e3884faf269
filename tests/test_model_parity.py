"""End-to-end model parity: reference torch Model vs our flax model, via the
checkpoint bridge. This is the test that guards .pt loading AND the whole
forward graph (block wiring, padding, BN semantics, head decode)."""
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE, requires_reference

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mafyolo_tpu.models import build_model  # noqa: E402
from mafyolo_tpu.models.detect import decode_eval  # noqa: E402
from mafyolo_tpu.models.reparam import fold_variables  # noqa: E402
from mafyolo_tpu.utils.torch_bridge import state_dict_to_variables  # noqa: E402

pytestmark = pytest.mark.slow  # full-model compile; excluded from the fast subset
from tests.ref_compat import build_reference_model  # noqa: E402


@pytest.fixture(scope="module")
def ref_and_ours():
    tm = build_reference_model("n", num_classes=8)
    torch.manual_seed(0)
    # populate BN running stats with a couple of train-mode passes
    tm.train()
    with torch.no_grad():
        for _ in range(2):
            tm(torch.randn(2, 3, 64, 64))
    tm.eval()
    ours = build_model("maf-yolo-n", nc=8)
    variables = state_dict_to_variables(tm.state_dict(), ours.specs)
    return tm, ours, variables


@requires_reference
def test_forward_parity_train_mode_outputs(ref_and_ours):
    tm, ours, variables = ref_and_ours
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        (feats, cls_t, reg_t), _ = tm(x, val_loss=True)
    xj = jnp.array(x.numpy().transpose(0, 2, 3, 1))
    outs = ours.apply(variables, xj, train=False)
    from mafyolo_tpu.models.detect import flatten_train_outputs
    _, cls_j, reg_j = flatten_train_outputs(outs)
    np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg_j), reg_t.numpy(), rtol=1e-3, atol=1e-3)


@requires_reference
def test_eval_decode_parity(ref_and_ours):
    tm, ours, variables = ref_and_ours
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        dec_t, _ = tm(x)           # eval: [B, A, 4+1+nc] xywh*stride
    xj = jnp.array(x.numpy().transpose(0, 2, 3, 1))
    outs = ours.apply(variables, xj, train=False)
    dec_j = decode_eval(outs, strides=(8, 16, 32))
    np.testing.assert_allclose(np.asarray(dec_j), dec_t.numpy(), rtol=1e-3, atol=5e-3)


@requires_reference
def test_fold_matches_reference_deploy(ref_and_ours):
    """Our fold of converted weights == torch's switch_to_deploy/reparameterize."""
    import copy
    tm, ours, variables = ref_and_ours
    tm2 = copy.deepcopy(tm)
    for m in tm2.modules():
        if hasattr(m, "switch_to_deploy"):
            m.switch_to_deploy()
        if hasattr(m, "merge_kernel"):
            m.merge_kernel()
        if hasattr(m, "reparameterize"):
            m.reparameterize()
    tm2.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        dec_t, _ = tm2(x)
    folded = fold_variables(ours.specs, variables)
    deploy = build_model("maf-yolo-n", nc=8, deploy=True)
    xj = jnp.array(x.numpy().transpose(0, 2, 3, 1))
    dec_j = decode_eval(deploy.apply(folded, xj, train=False), strides=(8, 16, 32))
    np.testing.assert_allclose(np.asarray(dec_j), dec_t.numpy(), rtol=1e-3, atol=5e-3)
