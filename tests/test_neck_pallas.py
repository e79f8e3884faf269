"""Fused neck cluster (layers 19-22) parity vs the XLA deploy path.

Runs the kernel in interpreter mode on CPU against the folded deploy
blocks' own forward on the same inputs (Concat -> RepHDW(k5) -> Concat ->
RepHDW(k5); reference RepHDW deploy chain common.py:898-946)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mafyolo_tpu.models import build_model, blocks as B
from mafyolo_tpu.models.reparam import fold_variables

pytestmark = pytest.mark.slow  # pallas interpret mode


@pytest.fixture(scope="module")
def folded_n():
    m = build_model("maf-yolo-n", nc=7)
    v = jax.jit(m.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    return m, fold_variables(m.specs, v)


def _xla_cluster(model, folded, x18, x4, x17u):
    p = folded["params"]["net"]
    cat = jnp.concatenate([x18, x4, x17u], axis=-1)
    y20 = B.RepHDW(deploy=True, **dict(model.specs[20].kwargs)).apply(
        {"params": p["layer20"]}, cat, train=False)
    cat2 = jnp.concatenate([y20, x17u], axis=-1)
    y22 = B.RepHDW(deploy=True, **dict(model.specs[22].kwargs)).apply(
        {"params": p["layer22"]}, cat2, train=False)
    return y20, y22


@pytest.mark.parametrize("h", [16, 32])
def test_neck80_matches_xla(folded_n, h):
    from mafyolo_tpu.ops import neck_pallas as NP
    model, folded = folded_n
    assert NP.neck80_supported(model.specs)
    cfg = NP.neck80_cfg(model.specs, h)
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.normal(0, 0.5, (2, h, h, c)).astype(np.float32))
          for c in cfg.cins]
    want20, want22 = _xla_cluster(model, folded, *xs)
    wts = NP.neck80_weights(folded["params"]["net"], model.specs, cfg)
    got20, got22 = NP.neck80_forward(*xs, wts, cfg, interpret=True)
    for got, want in ((got20, want20), (got22, want22)):
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=0.08, atol=0.05)
        err = np.abs(np.asarray(got, np.float32) -
                     np.asarray(want, np.float32))
        assert err.mean() < 0.01


def test_neck80_nonzero_bias_halo(folded_n):
    """Multi-band halos with nonzero folded biases: out-of-image rows must
    act as conv zero padding at every DW in both chained RepHDWs."""
    from mafyolo_tpu.ops import neck_pallas as NP
    model, folded = folded_n
    folded = jax.tree.map(lambda x: x, folded)
    rng = np.random.default_rng(7)
    p = folded["params"]["net"]
    for layer in ("layer20", "layer22"):
        for path in (("cv_in",), ("cv_out",), ("m0", "expand"),
                     ("m0", "dw", "fused"), ("m0", "project")):
            node = p[layer]
            for k in path:
                node = node[k]
            conv = node["conv"]
            conv["bias"] = jnp.asarray(
                rng.uniform(0.2, 1.0, conv["bias"].shape), jnp.float32)
    h = 32
    cfg = NP.neck80_cfg(model.specs, h)
    xs = [jnp.asarray(rng.normal(0, 0.5, (1, h, h, c)).astype(np.float32))
          for c in cfg.cins]
    want20, want22 = _xla_cluster(model, folded, *xs)
    wts = NP.neck80_weights(folded["params"]["net"], model.specs, cfg)
    # rows=8 forces 4 grid bands at h=32 -> every inter-band halo exercised
    got20, got22 = NP.neck80_forward(*xs, wts, cfg, interpret=True, rows=8)
    np.testing.assert_allclose(np.asarray(got22, np.float32),
                               np.asarray(want22, np.float32),
                               rtol=0.08, atol=0.05)
