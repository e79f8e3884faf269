from mafyolo_tpu.models.losses.loss import detection_loss, varifocal_loss  # noqa: F401
