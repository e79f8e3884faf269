"""Runtime environment setup (reference analog: yolov6/utils/envs.py).

select_device/CUDA_VISIBLE_DEVICES have no TPU meaning; what matters here:
  * a persistent XLA compilation cache so repeated CLI invocations do not pay
    the (remote) compile cost again -- first compiles over the tunneled chip can
    take minutes;
  * deterministic seeding helpers.
"""
from __future__ import annotations

import os
import random

import numpy as np


def setup_jax(cache_dir: str = None):
    import jax
    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                       os.path.expanduser("~/.cache/mafyolo_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path


def set_seed(seed: int):
    """Host-side RNG seeding (device RNG is explicit via jax.random keys)."""
    random.seed(seed)
    np.random.seed(seed)
