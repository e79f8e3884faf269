"""Re-param fold correctness: train-form (eval BN) forward == deploy-form forward.

The reference has no such tests; fold identity is the single most fragile invariant of
the architecture (SURVEY.md section 4), so every foldable block is covered, plus the full
MAF-YOLO-N model end to end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mafyolo_tpu.models import blocks as B
from mafyolo_tpu.models import build_model
from mafyolo_tpu.models.reparam import _fold_block, fold_variables


def _randomize(variables, key):
    """Randomize params and batch_stats (vars kept positive)."""
    def rnd(path, leaf, k):
        pathstr = "/".join(str(p.key) for p in path)
        if pathstr.endswith("var"):
            return jax.random.uniform(k, leaf.shape, jnp.float32, 0.5, 2.0)
        return jax.random.normal(k, leaf.shape, jnp.float32) * 0.5
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(variables)
    keys = jax.random.split(key, len(leaves_with_path))
    new = [rnd(p, l, k) for (p, l), k in zip(leaves_with_path, keys)]
    return jax.tree_util.tree_unflatten(treedef, new)


BLOCK_CASES = [
    ("Conv", B.Conv, dict(cout=16, k=3, stride=1), dict(cout=16, k=3, stride=1), (8,)),
    ("ConvWrapper", B.ConvWrapper, dict(cout=16, stride=2), dict(cout=16, stride=2), (8,)),
    ("RepVGGBlock", B.RepVGGBlock, dict(cin=8, cout=8, stride=1), dict(cin=8, cout=8, stride=1), (8,)),
    ("RepVGGBlock", B.RepVGGBlock, dict(cin=8, cout=16, stride=2), dict(cin=8, cout=16, stride=2), (8,)),
    ("SPPF", B.SPPF, dict(cin=16, cout=24), dict(cin=16, cout=24), (16,)),
    ("MPRep", B.MPRep, dict(cin=8, cout=16), dict(cin=8, cout=16), (8,)),
    ("RepHDW", B.RepHDW, dict(cin=16, cout=16, depth=2, kersize=9, depth_expansion=3),
     dict(cin=16, cout=16, depth=2, kersize=9, depth_expansion=3), (16,)),
    ("Head_DepthUni", B.Head_DepthUni, dict(cin=16, cout=16, kersize=7, nc=4),
     dict(cin=16, cout=16, kersize=7, nc=4), (16,)),
]


@pytest.mark.parametrize("kind,ctor,kw_train,kw_deploy,cin", BLOCK_CASES,
                         ids=[f"{c[0]}-{i}" for i, c in enumerate(BLOCK_CASES)])
def test_block_fold_identity(kind, ctor, kw_train, kw_deploy, cin):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, cin[0]))
    train_mod = ctor(deploy=False, **kw_train)
    v = train_mod.init(key, x, train=False)
    v = _randomize(v, jax.random.PRNGKey(3))
    y_train = train_mod.apply(v, x, train=False)

    spec_kw = dict(kw_train)
    folded = _fold_block(kind, spec_kw, v["params"], v["batch_stats"])
    deploy_mod = ctor(deploy=True, **kw_deploy)
    y_deploy = deploy_mod.apply({"params": folded}, x, train=False)

    ta = y_train if not isinstance(y_train, tuple) else jnp.concatenate(
        [t.reshape(2, -1) for t in y_train], -1)
    da = y_deploy if not isinstance(y_deploy, tuple) else jnp.concatenate(
        [t.reshape(2, -1) for t in y_deploy], -1)
    np.testing.assert_allclose(np.asarray(ta), np.asarray(da), rtol=1e-4, atol=1e-4)


def test_unireplk_fold_all_kernel_sizes():
    for k in (3, 5, 7, 9):
        key = jax.random.PRNGKey(k)
        x = jax.random.normal(key, (1, 12, 12, 8))
        mod = B.UniRepLKNetBlock(ch=8, k=k)
        v = _randomize(mod.init(key, x, train=False), jax.random.PRNGKey(k + 1))
        y1 = mod.apply(v, x, train=False)
        from mafyolo_tpu.models.reparam import fold_unireplk
        folded = fold_unireplk(v["params"], v["batch_stats"], k)
        y2 = B.UniRepLKNetBlock(ch=8, k=k, deploy=True).apply({"params": folded}, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-4)


def test_replk_fold():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 10, 10, 8))
    mod = B.ReparamLargeKernelConv(ch=8, k=7, small_k=3)
    v = _randomize(mod.init(key, x, train=False), jax.random.PRNGKey(5))
    y1 = mod.apply(v, x, train=False)
    from mafyolo_tpu.models.reparam import fold_replk
    folded = fold_replk(v["params"], v["batch_stats"], 7, 3)
    y2 = B.ReparamLargeKernelConv(ch=8, k=7, small_k=3, deploy=True).apply(
        {"params": folded}, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-4)


def test_full_model_fold_identity():
    m = build_model("maf-yolo-n", nc=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(1), x, train=False)
    # randomize only BN statistics: full-tree random params explode through 34 layers
    # and make float32 comparison meaningless; init-scale params keep it conditioned.
    stats = _randomize({"batch_stats": v["batch_stats"]}, jax.random.PRNGKey(2))
    v = {"params": v["params"], "batch_stats": stats["batch_stats"]}
    outs_train = m.apply(v, x, train=False)

    deploy = build_model("maf-yolo-n", nc=8, deploy=True)
    folded = fold_variables(m.specs, v)
    outs_deploy = deploy.apply(folded, x, train=False)
    for (f1, c1, r1), (f2, c2, r2) in zip(outs_train, outs_deploy):
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-3, atol=2e-3)
