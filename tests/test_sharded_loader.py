"""Multi-host data sharding: the DistributedSampler contract.

Reference semantics (data_load.py:65-67): each rank's sampler walks a
disjoint slice of one shared per-epoch permutation; together the ranks cover
the dataset exactly once per epoch. Our analog is DataLoader(shard_id,
num_shards) fed per-process (parallel/mesh.py; engine.py passes
shard_id=jax.process_index()).
"""
import numpy as np
import pytest

from mafyolo_tpu.data import create_dataloader
from tests.helpers import make_synth_dataset

HYP = dict(hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, degrees=0.0, translate=0.1,
           scale=0.5, shear=0.0, flipud=0.0, fliplr=0.5, mosaic=0.0,
           mixup=0.0, dy_label=5, dy_mixup=0.0, mask_refine=False,
           copy_paste=0.0)


def _make_loaders(tmp_path, n_shards, n_images=20, batch_size=2, shuffle=True):
    import yaml
    yaml_path = make_synth_dataset(tmp_path / "ds", n_images=n_images,
                                   img_size=96, seed=7)
    data = yaml.safe_load(open(yaml_path))
    return [create_dataloader(data["train"], img_size=64,
                              batch_size=batch_size, hyp=HYP, augment=True,
                              workers=1, shuffle=shuffle, seed=3,
                              shard_id=i, num_shards=n_shards)[0]
            for i in range(n_shards)]


def test_shards_partition_epoch_exactly(tmp_path):
    loaders = _make_loaders(tmp_path, n_shards=8, n_images=20)
    for epoch in (0, 1, 5):
        orders = []
        for ld in loaders:
            ld.set_epoch(epoch)
            orders.append(ld.shard_order())
        allidx = np.concatenate(orders)
        # exact partition: disjoint shards covering every index once
        assert len(allidx) == 20
        assert sorted(allidx.tolist()) == list(range(20))
    # different epochs reshuffle (shuffle=True)
    loaders[0].set_epoch(0)
    o0 = loaders[0].shard_order()
    loaders[0].set_epoch(1)
    o1 = loaders[0].shard_order()
    assert not np.array_equal(o0, o1)


def test_shard_batches_yield_all_samples(tmp_path):
    """Iterating every shard loader yields exactly the dataset once per epoch
    (sample identity tracked by label content = unique per synth image)."""
    loaders = _make_loaders(tmp_path, n_shards=4, n_images=16, batch_size=2,
                            shuffle=True)
    seen = []
    for ld in loaders:
        ld.set_epoch(2)
        expect = ld.shard_order()
        got = 0
        for imgs, labels, shapes in ld:
            got += len(imgs)
            assert imgs.dtype == np.uint8 and labels.shape[1:] == (120, 5)
        assert got == len(expect)
        seen.append(expect)
    assert sorted(np.concatenate(seen).tolist()) == list(range(16))


@pytest.mark.slow
def test_sharded_loaders_feed_mesh_train_step(tmp_path):
    """Integration: two simulated hosts' shard loaders feed the 8-device
    sharded train step for one full epoch; every sample consumed exactly once
    and the loss stays finite (VERDICT r3 #6)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mafyolo_tpu.core.train_state import init_train_state, make_train_step
    from mafyolo_tpu.models import build_model
    from tests.helpers import TINY_GRAPH

    n_hosts, per_host_bs = 2, 4
    loaders = _make_loaders(tmp_path, n_shards=n_hosts, n_images=16,
                            batch_size=per_host_bs)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    model = build_model(TINY_GRAPH, nc=3)
    state = init_train_state(model, jax.random.PRNGKey(0), 64)
    step = make_train_step(model, num_classes=3, img_size=64, mesh=mesh)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    data_sh = NamedSharding(mesh, P("data"))
    one = jnp.float32(0.01)

    for ld in loaders:
        ld.set_epoch(0)
    consumed = sum(len(ld.shard_order()) for ld in loaders)
    assert consumed == 16
    iters = [iter(ld) for ld in loaders]
    n_batches = min(len(ld) for ld in loaders)
    for _ in range(n_batches):
        parts = [next(it) for it in iters]
        imgs = np.concatenate([p[0] for p in parts])      # global batch
        labels = np.concatenate([p[1][:, :16] for p in parts])
        imgs = jax.device_put(imgs, data_sh)
        labels = jax.device_put(labels.astype(np.float32), data_sh)
        state, metrics = step(state, imgs, labels, one, one, one,
                              jnp.float32(0.9), jnp.bool_(True), False,
                              jnp.float32(0))
        assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_sharded_loaders_feed_mesh_train_step_320(tmp_path):
    """Same two-host -> 8-device mesh integration at a production-scale shape
    (320^2, 120-label rows) -- the sharding/collective layout of the real
    config, bounded to two steps (VERDICT r4 #7; the full 640^2 real-graph
    rehearsal runs via `python __graft_entry__.py --real-shapes`)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mafyolo_tpu.core.train_state import init_train_state, make_train_step
    from mafyolo_tpu.models import build_model
    from tests.helpers import TINY_GRAPH

    n_hosts, per_host_bs, img = 2, 4, 320
    loaders = _make_loaders(tmp_path, n_shards=n_hosts, n_images=16,
                            batch_size=per_host_bs)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    model = build_model(TINY_GRAPH, nc=3)
    state = init_train_state(model, jax.random.PRNGKey(0), img)
    step = make_train_step(model, num_classes=3, img_size=img, mesh=mesh)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    data_sh = NamedSharding(mesh, P("data"))
    one = jnp.float32(0.01)

    for ld in loaders:
        ld.set_epoch(0)
    iters = [iter(ld) for ld in loaders]
    for _ in range(2):
        parts = [next(it) for it in iters]
        # letterbox the 64px loader batches up to 320 (pad bottom-right);
        # labels are normalized so scale with the pad ratio
        imgs64 = np.concatenate([p[0] for p in parts])
        labels = np.concatenate([p[1] for p in parts]).astype(np.float32)
        b = imgs64.shape[0]
        imgs = np.full((b, img, img, 3), 114, np.uint8)
        imgs[:, :64, :64] = imgs64
        valid = labels[:, :, 0] >= 0
        labels[:, :, 1:] *= 64.0 / img
        labels[:, :, 0] = np.where(valid, labels[:, :, 0], -1)
        imgs = jax.device_put(imgs, data_sh)
        labels = jax.device_put(labels, data_sh)
        state, metrics = step(state, imgs, labels, one, one, one,
                              jnp.float32(0.9), jnp.bool_(True), False,
                              jnp.float32(0))
        assert np.isfinite(float(metrics["loss"]))
