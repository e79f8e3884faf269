"""Device mesh + sharding helpers: the DDP/NCCL replacement (SURVEY.md section 2.8).

The reference's distributed layer is torch DDP over NCCL with env:// rendezvous
(tools/train.py:113-114, engine.py:476-489). TPU-native equivalent:
  * one `jax.sharding.Mesh` over all chips with a single 'data' axis;
  * the train step is jit-compiled with batch inputs sharded over 'data' and state
    replicated -- XLA inserts the gradient all-reduce over ICI automatically (the
    explicit-NCCL-allreduce analog, but compiler-scheduled and fused);
  * multi-host: `jax.distributed.initialize()` + per-process data sharding
    (DistributedSampler analog lives in data/loader.py shard_id/num_shards);
  * "rank 0" concepts map to jax.process_index() == 0.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mafyolo_tpu.utils.events import LOGGER


def init_distributed():
    """Multi-host rendezvous when launched under a JAX cluster env; no-op otherwise."""
    if int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1 and jax.process_count() == 1:
        jax.distributed.initialize()
        LOGGER.info(f"jax.distributed: process {jax.process_index()} / "
                    f"{jax.process_count()}")


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def is_main_process() -> bool:
    return jax.process_index() == 0
