"""Space-to-depth stem: folded s2d model == folded standard model, numerically."""
import pytest
import numpy as np

import jax

from mafyolo_tpu.models import build_model
from mafyolo_tpu.models.reparam import fold_variables

pytestmark = pytest.mark.slow  # full-model compile; excluded from the fast subset


def test_s2d_stem_identity():
    m = build_model("maf-yolo-n", nc=4)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(1), x, train=False)

    folded = fold_variables(m.specs, v)
    deploy = build_model("maf-yolo-n", nc=4, deploy=True)
    ref = deploy.apply(folded, x, train=False)

    folded_s2d = fold_variables(m.specs, v, s2d_stem=True)
    deploy_s2d = build_model("maf-yolo-n", nc=4, deploy=True, s2d_stem=True)
    out = deploy_s2d.apply(folded_s2d, x, train=False)

    for (f1, c1, r1), (f2, c2, r2) in zip(ref, out):
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                                   rtol=1e-4, atol=1e-4)
