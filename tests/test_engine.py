"""Trainer integration: two epochs end-to-end on a tiny synthetic dataset (CPU)."""
import numpy as np

from mafyolo_tpu.core.engine import Trainer
from mafyolo_tpu.utils.config import Config
from mafyolo_tpu.utils.events import load_yaml
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
