"""Trainer integration: two epochs end-to-end on a tiny synthetic dataset (CPU)."""
import pytest
import numpy as np

from mafyolo_tpu.core.engine import Trainer
from mafyolo_tpu.utils.config import Config
from mafyolo_tpu.utils.events import load_yaml

pytestmark = pytest.mark.slow  # full-model compile; excluded from the fast subset
from tests.helpers import make_synth_dataset


class _Args:
    img_size = 64
    batch_size = 8
    epochs = 2
    workers = 2
    seed = 0
    save_dir = None
    resume = None
    pretrained = None
    eval_interval = 99
    heavy_eval_range = 0
    stop_aug_last_n_epoch = 0
    max_labels = 16
    bf16 = 0
    save_interval = 99
    remat = 0
    device_aug = False
    simota = False
    distill = False
    tensorboard = False


def test_trainer_repopt(tmp_path):
    """cfg.training_mode='repopt': plain graph + scale reinit + grad-mask SGD
    trains end-to-end and the masked kernels move (engine.py:60-63)."""
    import pickle

    import jax

    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.solver.repopt import (plain_rep_kernel_paths,
                                           random_scales_like)

    # several optimizer steps: warmup lr_weight is 0 at step 0, so the kernel
    # only moves from step 1 on
    yaml_path = make_synth_dataset(tmp_path / "ds", n_images=16, img_size=96,
                                   seed=5)
    data_dict = load_yaml(yaml_path)
    cfg = Config.fromfile("configs/maf_yolo_n.py")
    cfg.training_mode = "repopt"

    # synthesize a hyper-search scale set matching the plain graph
    model = build_model("maf-yolo-n", nc=int(data_dict["nc"]), plain_rep=True)
    shapes = jax.eval_shape(
        lambda r, x: model.init(r, x, train=False),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 64, 64, 3), jnp_dtype()))
    scales = random_scales_like(shapes["params"], np.random.default_rng(3))
    assert len(scales) == len(plain_rep_kernel_paths(shapes["params"])) > 0
    scales_path = str(tmp_path / "scales.pkl")
    with open(scales_path, "wb") as f:
        pickle.dump(scales, f)
    cfg.model.scales = scales_path

    args = _Args()
    args.epochs = 3
    args.save_dir = str(tmp_path / "run")
    trainer = Trainer(args, cfg, data_dict)
    assert trainer.grad_mask is not None
    tree0 = trainer._pf.unflatten(trainer.state["params"])
    paths = plain_rep_kernel_paths(tree0)
    assert len(paths) == len(scales)

    def leaf_at(tree, path):
        leaf = tree
        for k in path.split("/"):
            leaf = leaf[k]
        return np.asarray(leaf)

    trainer.train()
    assert int(trainer.state["updates"]) > 0
    # the masked plain kernels received gradient: their momentum buffers moved
    # (param deltas themselves can be below float32 resolution at the tiny
    # early-warmup weight lr, so assert on the raw masked-grad accumulator)
    mom = trainer._pf.unflatten(trainer.state["mom"])
    moved = [np.abs(leaf_at(mom, p)).max() for p in paths]
    assert max(moved) > 0, "no masked plain kernel received gradient"


def jnp_dtype():
    import jax.numpy as jnp
    return jnp.float32


def test_trainer_two_epochs(tmp_path):
    yaml_path = make_synth_dataset(tmp_path / "ds", n_images=8, img_size=96, seed=4)
    data_dict = load_yaml(yaml_path)
    cfg = Config.fromfile("configs/maf_yolo_n.py")
    args = _Args()
    args.save_dir = str(tmp_path / "run")
    trainer = Trainer(args, cfg, data_dict)
    def pred_bias():
        tree = trainer._pf.unflatten(trainer.state["params"])
        return np.asarray(tree["net"]["layer31"]["cls_pred"]["bias"])

    p0 = pred_bias().copy()
    trainer.train()
    p1 = pred_bias()
    assert not np.array_equal(p0, p1), "no parameter movement after 2 epochs"
    assert int(trainer.state["updates"]) > 0
    import os
    assert os.path.exists(os.path.join(args.save_dir, "last_ckpt.npck"))
