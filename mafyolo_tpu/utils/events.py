"""Process-aware logging (reference: yolov6/utils/events.py:9-15) plus yaml helpers.

In the TPU world "rank 0" is `jax.process_index() == 0`; we avoid importing jax at
module import time so host-side tools can use the logger without initializing a backend.
"""
import logging
import os
import sys

import yaml


def _is_main_process() -> bool:
    # jax.process_index() would force backend init; honor the env var the same way
    # torch.distributed ranks are discovered in the reference (yolov6/utils/envs.py:12).
    return int(os.environ.get("JAX_PROCESS_INDEX", os.environ.get("RANK", "0"))) in (-1, 0)


def set_logging(name: str = "mafyolo_tpu"):
    level = logging.INFO if _is_main_process() else logging.WARNING
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s", "%H:%M:%S"))
        logger.addHandler(handler)
    logger.setLevel(level)
    logger.propagate = False
    return logger


LOGGER = set_logging()
NCOLS = min(100, os.get_terminal_size().columns if sys.stdout.isatty() else 100)


def load_yaml(path):
    """Load a dataset/model yaml (reference: yolov6/utils/events.py:25-30)."""
    with open(path, errors="ignore") as f:
        return yaml.safe_load(f)


def save_yaml(obj, path):
    with open(path, "w") as f:
        yaml.safe_dump(obj, f, sort_keys=False)
