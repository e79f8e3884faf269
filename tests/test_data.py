"""Data pipeline tests: letterbox geometry, dataset scan, loader collation, mosaic."""
import numpy as np
import pytest

from mafyolo_tpu.data import augment as A
from mafyolo_tpu.data import create_dataloader
from mafyolo_tpu.data.datasets import DetectionDataset, img2label_path
from tests.helpers import make_synth_dataset

HYP = dict(hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, degrees=0.0, translate=0.1, scale=0.5,
           shear=0.0, flipud=0.0, fliplr=0.5, mosaic=1.0, mixup=0.0, dy_label=5,
           dy_mixup=0.2, mask_refine=True, copy_paste=0.05)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    yaml_path = make_synth_dataset(root, n_images=12, img_size=256, seed=3)
    import yaml
    return yaml.safe_load(open(yaml_path))


def test_letterbox_geometry():
    im = np.zeros((400, 300, 3), np.uint8)
    out, r, (dw, dh) = A.letterbox(im, 640, auto=False, scaleup=True)
    assert out.shape[:2] == (640, 640)
    assert np.isclose(r, 640 / 400)
    assert np.isclose(dw, (640 - 300 * r) / 2)
    assert dh == 0
    # auto=True pads to stride multiples only
    out2, r2, _ = A.letterbox(im, 640, auto=True, stride=32)
    assert out2.shape[0] % 32 == 0 and out2.shape[1] % 32 == 0
    # return_int variant returns integer left/top pads
    _, _, (left, top) = A.letterbox(im, 640, auto=False, return_int=True)
    assert isinstance(left, int) and isinstance(top, int)


def test_letterbox_no_scaleup():
    im = np.zeros((100, 80, 3), np.uint8)
    out, r, _ = A.letterbox(im, 640, auto=False, scaleup=False)
    assert r == 1.0 and out.shape[:2] == (640, 640)


def test_img2label_path():
    assert img2label_path("/d/images/train/x.jpg") == "/d/labels/train/x.txt"


def test_dataset_scan_and_cache(synth):
    ds = DetectionDataset(synth["train"], img_size=256, class_names=synth["names"])
    assert len(ds) == 12
    assert all(len(l.shape) == 2 and l.shape[1] == 5 for l in ds.labels)
    assert ds.shapes.shape == (12, 2)
    # second construction hits the cache
    ds2 = DetectionDataset(synth["train"], img_size=256)
    np.testing.assert_array_equal(ds.shapes, ds2.shapes)
    gt = ds.coco_gt()
    assert len(gt["images"]) == 12 and len(gt["annotations"]) >= 12


def test_val_sample_letterbox_shapes(synth):
    ds = DetectionDataset(synth["val"], img_size=256, augment=False)
    img, labels, shapes = ds.get_sample(0, np.random.default_rng(0))
    assert img.shape == (256, 256, 3)
    (h0, w0), ((rh, rw), pad) = shapes
    assert h0 > 0 and w0 > 0
    if len(labels):
        assert labels[:, 1:].min() >= 0 and labels[:, 1:].max() <= 1


def test_mosaic_train_sample(synth):
    ds = DetectionDataset(synth["train"], img_size=256, augment=True, hyp=HYP)
    rng = np.random.default_rng(7)
    img, labels, shapes = ds.get_sample(0, rng)
    assert img.shape == (256, 256, 3)
    assert shapes is None
    if len(labels):
        assert labels[:, 0].min() >= 0
        assert labels[:, 1:].min() >= 0 and labels[:, 1:].max() <= 1


def test_sample_reproducible(synth):
    ds = DetectionDataset(synth["train"], img_size=256, augment=True, hyp=HYP)
    a = ds.get_sample(3, np.random.default_rng(42))
    b = ds.get_sample(3, np.random.default_rng(42))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_loader_collation_and_sharding(synth):
    loader, ds = create_dataloader(synth["train"], img_size=256, batch_size=4,
                                   hyp=HYP, augment=True, shuffle=True, workers=2,
                                   max_labels=50)
    batches = list(loader)
    assert len(batches) == 3
    imgs, labels, shapes = batches[0]
    assert imgs.shape == (4, 256, 256, 3) and imgs.dtype == np.uint8
    assert labels.shape == (4, 50, 5)
    pad_rows = labels[..., 0] == -1
    assert pad_rows.any()
    np.testing.assert_array_equal(labels[pad_rows][:, 1:], 0)
    # two shards partition the epoch
    l0, _ = create_dataloader(synth["train"], img_size=256, batch_size=4, hyp=HYP,
                              augment=True, shuffle=True, shard_id=0, num_shards=2)
    l1, _ = create_dataloader(synth["train"], img_size=256, batch_size=4, hyp=HYP,
                              augment=True, shuffle=True, shard_id=1, num_shards=2)
    assert len(l0) == len(l1) == 1  # 6 imgs per shard, drop_last
    # same epoch -> same permutation split, disjoint
    def indices(loader):
        n = len(loader.dataset)
        order = np.random.default_rng(loader.seed + 0).permutation(n)
        return set(order[loader.shard_id::loader.num_shards].tolist())
    assert not (indices(l0) & indices(l1))


def test_rect_batching(synth):
    ds = DetectionDataset(synth["val"], img_size=256, rect=True, batch_size=4,
                          stride=32, pad=0.5)
    assert hasattr(ds, "batch_shapes")
    assert (ds.batch_shapes % 32 == 0).all()


def test_process_loader_matches_thread_loader(tmp_path):
    """The process-pool loader must produce bitwise-identical batches to the
    thread loader (same per-(seed,epoch,idx) RNG keys)."""
    import numpy as np
    from mafyolo_tpu.data import create_dataloader
    from tests.helpers import make_synth_dataset
    yml = make_synth_dataset(tmp_path, n_images=8, img_size=96, nc=3, seed=0,
                             splits=("train",))
    # mixup=0: the cached-mosaic mixup partner depends on cache access ORDER
    # (true of the reference and of our thread loader across runs too); every
    # order-independent transform must match bitwise
    hyp = dict(mosaic=1.0, mixup=0.0, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4,
               degrees=0.0, translate=0.1, scale=0.5, shear=0.0, fliplr=0.5)
    batches = {}
    for use_proc in (False, True):
        loader, _ = create_dataloader(
            str(tmp_path / "images" / "train"), 96, 4, stride=32, hyp=hyp,
            augment=True, workers=2, shuffle=True, seed=7,
            use_processes=use_proc)
        loader.set_epoch(1)
        batches[use_proc] = [(np.asarray(i), np.asarray(t))
                             for i, t, _ in loader]
    assert len(batches[False]) == len(batches[True]) > 0
    for (ia, ta), (ib, tb) in zip(batches[False], batches[True]):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ta, tb)


def test_albumentations_hook(synth):
    """Optional albumentations wrapper (reference data_augment.py:22-36):
    identity no-op when the package is absent; dataset with albument=True
    still yields valid samples either way."""
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
    labels = np.array([[1, 0.5, 0.5, 0.25, 0.25]], np.float32)
    out_img, out_labels = A.albumentations_transform(
        img, labels, size=64, rng=np.random.default_rng(0))
    try:
        import albumentations  # noqa: F401
    except ImportError:
        assert out_img is img and out_labels is labels
    assert out_labels.shape[1] == 5

    ds = DetectionDataset(synth["train"], img_size=128, augment=True,
                          hyp=dict(HYP, mosaic=0.0), albument=True)
    im, lab, _ = ds.get_sample(0, np.random.default_rng(0))
    assert im.shape[2] == 3 and lab.shape[1] == 5
