from mafyolo_tpu.data.datasets import DetectionDataset  # noqa: F401
from mafyolo_tpu.data.loader import create_dataloader  # noqa: F401
