"""Train-batch / val-pred visualization plumbing."""
import numpy as np

from mafyolo_tpu.utils.plots import plot_train_batch, plot_val_pred


def test_plot_train_batch_grid(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (4, 64, 64, 3), dtype=np.uint8)
    targets = np.full((4, 6, 5), -1, np.float32)
    targets[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    grid = plot_train_batch(imgs, targets, names=["a", "b", "c"])
    assert grid.shape == (128, 128, 3) and grid.dtype == np.uint8
    # annotated grid differs from raw tiling (borders + boxes drawn)
    raw = np.full_like(grid, 255)
    raw[:64, :64] = imgs[0]
    assert not np.array_equal(grid, raw)


def test_plot_val_pred_draws(tmp_path):
    import cv2
    rng = np.random.default_rng(1)
    path = str(tmp_path / "img.jpg")
    cv2.imwrite(path, rng.integers(0, 255, (80, 80, 3), dtype=np.uint8))
    dets = [dict(boxes=np.array([[10.0, 10, 50, 50]]),
                 scores=np.array([0.9]), classes=np.array([0]))]
    out = plot_val_pred(dets, [path], names=["thing"])
    assert len(out) == 1 and out[0].shape == (80, 80, 3)
    base = cv2.imread(path)[:, :, ::-1]
    assert not np.array_equal(out[0], base), "no boxes drawn"


def test_curve_and_confusion_rendering(tmp_path):
    """ap_per_class(plot=True) writes PR/F1/P/R PNGs; ConfusionMatrix.plot
    writes the heatmap PNG (reference metrics.py plot paths)."""
    from mafyolo_tpu.utils.metrics import ConfusionMatrix, ap_per_class

    rng = np.random.default_rng(0)
    n = 60
    tp = rng.random((n, 10)) < 0.6
    conf = rng.random(n)
    pred_cls = rng.integers(0, 3, n)
    target_cls = np.concatenate([pred_cls[: n // 2], rng.integers(0, 3, 5)])
    p, r, ap, f1, cls = ap_per_class(
        tp, conf, pred_cls, target_cls, plot=True, save_dir=str(tmp_path),
        names=["a", "b", "c"])
    for f in ("PR_curve.png", "F1_curve.png", "P_curve.png", "R_curve.png"):
        assert (tmp_path / f).stat().st_size > 1000, f
    # plot=True must not change the numbers
    p2, r2, ap2, f12, cls2 = ap_per_class(tp, conf, pred_cls, target_cls)
    np.testing.assert_array_equal(ap, ap2)
    np.testing.assert_array_equal(f1, f12)

    cm = ConfusionMatrix(nc=3)
    dets = np.array([[10.0, 10, 50, 50, 0.9, 1], [60, 60, 90, 90, 0.8, 2]])
    labels = np.array([[1, 11.0, 11, 49, 49], [0, 0, 0, 8, 8]])
    cm.process_batch(dets, labels)
    out = cm.plot(save_dir=str(tmp_path), names=["a", "b", "c"])
    assert (tmp_path / "confusion_matrix.png").stat().st_size > 1000
    assert str(out).endswith("confusion_matrix.png")


def test_plot_val_pred_conf_gate(tmp_path):
    import cv2
    path = str(tmp_path / "img.jpg")
    cv2.imwrite(path, np.zeros((40, 40, 3), np.uint8))
    dets = [dict(boxes=np.array([[5.0, 5, 30, 30]]),
                 scores=np.array([0.1]), classes=np.array([0]))]
    out = plot_val_pred(dets, [path], vis_conf=0.3)
    base = cv2.imread(path)[:, :, ::-1]
    np.testing.assert_array_equal(out[0], base)
