"""Office-path parity: EfficientRep + RepPANNeck + effidehead vs the
reference's non-yaml build_network dispatch (yolo.py:166-172, 225-275)."""
import numpy as np
import pytest

from tests.conftest import requires_reference

import jax
import jax.numpy as jnp

from mafyolo_tpu.models import build_model
from mafyolo_tpu.models.office import OFFICE_TORCH_PREFIXES, office_graph
from mafyolo_tpu.models.reparam import fold_variables

pytestmark = pytest.mark.slow


def test_office_graph_builds_and_runs():
    from tests.ref_compat import YOLOV6N_OFFICE
    g = office_graph(YOLOV6N_OFFICE)
    m = build_model(g, nc=8)
    v = jax.jit(m.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    outs = m.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    assert len(outs) == 3
    for lvl, (feat, cls, reg) in enumerate(outs):
        assert cls.shape[-1] == 8
        assert reg.shape[-1] == 4 * 17
    # deploy fold round-trips
    folded = fold_variables(m.specs, v)
    dep = build_model(g, nc=8, deploy=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.5, (1, 64, 64, 3)).astype(np.float32))
    a = m.apply(v, x, train=False)
    b = dep.apply(folded, x, train=False)
    for (_, ca, ra), (_, cb, rb) in zip(a, b):
        np.testing.assert_allclose(np.asarray(ca), np.asarray(cb),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ra), np.asarray(rb),
                                   rtol=1e-3, atol=1e-3)


def test_cspbep_graph_builds_and_folds():
    """CSPBepBackbone + CSPRepPANNeck (efficientrep.py:110, reppan.py:131):
    graph builds, runs, and the BepC3/BottleRep fold round-trips."""
    from tests.ref_compat import YOLOV6M_OFFICE_CSP
    g = office_graph(YOLOV6M_OFFICE_CSP)
    assert any(row[2] == "BepC3" for row in g["backbone"] + g["neck"])
    m = build_model(g, nc=8)
    v = jax.jit(m.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    folded = fold_variables(m.specs, v)
    dep = build_model(g, nc=8, deploy=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.5, (1, 64, 64, 3)).astype(np.float32))
    a = m.apply(v, x, train=False)
    b = dep.apply(folded, x, train=False)
    for (_, ca, ra), (_, cb, rb) in zip(a, b):
        np.testing.assert_allclose(np.asarray(ca), np.asarray(cb),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ra), np.asarray(rb),
                                   rtol=1e-3, atol=1e-3)


@requires_reference
def test_cspbep_forward_parity_vs_reference():
    """Bridged-weights train-output parity of the CSPBep office build vs the
    reference torch build_network (yolo.py:243-256 CSP branch)."""
    torch = pytest.importorskip("torch")
    from tests.ref_compat import (YOLOV6M_OFFICE_CSP,
                                  build_reference_office_model)
    from mafyolo_tpu.utils.torch_bridge import state_dict_to_variables
    tm = build_reference_office_model(num_classes=8,
                                      model_cfg=YOLOV6M_OFFICE_CSP)
    torch.manual_seed(0)
    tm.train()
    with torch.no_grad():
        for _ in range(2):
            tm(torch.randn(2, 3, 64, 64))
    tm.eval()
    ours = build_model(office_graph(YOLOV6M_OFFICE_CSP), nc=8)
    variables = state_dict_to_variables(tm.state_dict(), ours.specs,
                                        prefixes=OFFICE_TORCH_PREFIXES)
    x = torch.randn(1, 3, 64, 64)
    tm.detect.training = True
    with torch.no_grad():
        (feats, cls_t, reg_t), _ = tm(x)
    tm.detect.training = False
    xj = jnp.array(x.numpy().transpose(0, 2, 3, 1))
    outs = ours.apply(variables, xj, train=False)
    from mafyolo_tpu.models.detect import flatten_train_outputs
    _, cls_j, reg_j = flatten_train_outputs(outs)
    np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg_j), reg_t.numpy(),
                               rtol=1e-3, atol=1e-3)
    # fold parity vs the reference deploy switch
    for mm in tm.modules():
        if hasattr(mm, "switch_to_deploy"):
            mm.switch_to_deploy()
    tm.detect.training = True
    with torch.no_grad():
        (_, cls_d, reg_d), _ = tm(x)
    folded = fold_variables(ours.specs, variables)
    dep = build_model(office_graph(YOLOV6M_OFFICE_CSP), nc=8, deploy=True)
    outs_d = dep.apply(folded, xj, train=False)
    _, cls_dj, reg_dj = flatten_train_outputs(outs_d)
    np.testing.assert_allclose(np.asarray(cls_dj), cls_d.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(reg_dj), reg_d.numpy(),
                               rtol=1e-3, atol=2e-3)


@pytest.fixture(scope="module")
def office_ref_and_ours():
    torch = pytest.importorskip("torch")
    from tests.ref_compat import (YOLOV6N_OFFICE,
                                  build_reference_office_model)
    from mafyolo_tpu.utils.torch_bridge import state_dict_to_variables
    tm = build_reference_office_model(num_classes=8)
    torch.manual_seed(0)
    tm.train()
    with torch.no_grad():
        for _ in range(2):
            tm(torch.randn(2, 3, 64, 64))
    tm.eval()
    ours = build_model(office_graph(YOLOV6N_OFFICE), nc=8)
    variables = state_dict_to_variables(tm.state_dict(), ours.specs,
                                        prefixes=OFFICE_TORCH_PREFIXES)
    return tm, ours, variables


@requires_reference
def test_office_forward_parity_train_outputs(office_ref_and_ours):
    torch = pytest.importorskip("torch")
    tm, ours, variables = office_ref_and_ours
    x = torch.randn(1, 3, 64, 64)
    # effidehead.Detect branches on self.training (not val_loss); flip only
    # the flag so its BN children stay in eval mode
    tm.detect.training = True
    with torch.no_grad():
        (feats, cls_t, reg_t), _ = tm(x)
    tm.detect.training = False
    xj = jnp.array(x.numpy().transpose(0, 2, 3, 1))
    outs = ours.apply(variables, xj, train=False)
    from mafyolo_tpu.models.detect import flatten_train_outputs
    _, cls_j, reg_j = flatten_train_outputs(outs)
    np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg_j), reg_t.numpy(),
                               rtol=1e-3, atol=1e-3)


@requires_reference
def test_office_eval_decode_parity(office_ref_and_ours):
    torch = pytest.importorskip("torch")
    tm, ours, variables = office_ref_and_ours
    from mafyolo_tpu.models.detect import decode_eval
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        dec_t, _ = tm(x)
    xj = jnp.array(x.numpy().transpose(0, 2, 3, 1))
    outs = ours.apply(variables, xj, train=False)
    dec_j = decode_eval(outs, strides=(8, 16, 32))
    np.testing.assert_allclose(np.asarray(dec_j), dec_t.numpy(),
                               rtol=1e-3, atol=2e-3)


@requires_reference
def test_office_fold_matches_reference_deploy(office_ref_and_ours):
    torch = pytest.importorskip("torch")
    tm, ours, variables = office_ref_and_ours
    from tests.ref_compat import YOLOV6N_OFFICE
    # reference deploy switch: every RepVGGBlock folds itself
    for m in tm.modules():
        if hasattr(m, "switch_to_deploy"):
            m.switch_to_deploy()
    x = torch.randn(1, 3, 64, 64)
    tm.detect.training = True
    with torch.no_grad():
        (_, cls_t, reg_t), _ = tm(x)
    tm.detect.training = False
    folded = fold_variables(ours.specs, variables)
    dep = build_model(office_graph(YOLOV6N_OFFICE), nc=8, deploy=True)
    xj = jnp.array(x.numpy().transpose(0, 2, 3, 1))
    outs = dep.apply(folded, xj, train=False)
    from mafyolo_tpu.models.detect import flatten_train_outputs
    _, cls_j, reg_j = flatten_train_outputs(outs)
    np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(reg_j), reg_t.numpy(),
                               rtol=1e-3, atol=2e-3)
