"""Device-side augmentation: identity behavior, label geometry, reproducibility."""
import numpy as np

import jax
import jax.numpy as jnp

from mafyolo_tpu.data.device_aug import device_augment, hsv_jitter


def _batch(rng, b=2, h=64, w=64, n=6):
    imgs = rng.integers(0, 255, (b, h, w, 3), dtype=np.uint8)
    labels = np.zeros((b, n, 5), np.float32)
    labels[:, :, 0] = -1
    labels[0, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    labels[1, 0] = [0, 0.3, 0.6, 0.25, 0.25]
    return jnp.asarray(imgs), jnp.asarray(labels)


def test_identity_transform_passthrough(rng):
    imgs, labels = _batch(rng)
    out_imgs, out_labels = device_augment(
        imgs, labels, jax.random.PRNGKey(0), degrees=0.0, translate=0.0,
        scale=0.0, shear=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0,
        fliplr=0.0, flipud=0.0)
    ref = np.asarray(imgs)[..., ::-1].astype(np.float32) / 255.0
    np.testing.assert_allclose(np.asarray(out_imgs), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_labels), np.asarray(labels),
                               atol=1e-5)


def test_fliplr_mirrors_labels(rng):
    imgs, labels = _batch(rng)
    out_imgs, out_labels = device_augment(
        imgs, labels, jax.random.PRNGKey(0), degrees=0.0, translate=0.0,
        scale=0.0, shear=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0,
        fliplr=1.0, flipud=0.0)
    ref = np.asarray(imgs)[..., ::-1].astype(np.float32) / 255.0
    np.testing.assert_allclose(np.asarray(out_imgs), ref[:, :, ::-1], atol=1e-5)
    lb = np.asarray(out_labels)
    assert np.isclose(lb[0, 0, 1], 0.5, atol=1e-5)       # centered box stays
    assert np.isclose(lb[1, 0, 1], 0.7, atol=1e-5)       # 0.3 -> 0.7
    np.testing.assert_array_equal(lb[:, 1:, 0], -1)      # padding untouched


def test_affine_keeps_valid_boxes_and_is_reproducible(rng):
    imgs, labels = _batch(rng, h=96, w=96)
    a1 = device_augment(imgs, labels, jax.random.PRNGKey(7), scale=0.5,
                        translate=0.1)
    a2 = device_augment(imgs, labels, jax.random.PRNGKey(7), scale=0.5,
                        translate=0.1)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    np.testing.assert_array_equal(np.asarray(a1[1]), np.asarray(a2[1]))
    lb = np.asarray(a1[1])
    live = lb[lb[:, :, 0] >= 0]
    if len(live):
        assert live[:, 1:].min() >= 0 and live[:, 1:].max() <= 1
    imgs_out = np.asarray(a1[0])
    assert imgs_out.min() >= 0 and imgs_out.max() <= 1 + 1e-5


def test_hsv_jitter_preserves_range(rng):
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    out = hsv_jitter(img, jax.random.PRNGKey(1))
    o = np.asarray(out)
    assert o.min() >= -1e-5 and o.max() <= 1 + 1e-5
    # zero-ish gains shouldn't change much
    out2 = hsv_jitter(img, jax.random.PRNGKey(1), hgain=0.0, sgain=0.0, vgain=0.0)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(img), atol=1e-3)


def test_device_mosaic_tiles_and_labels(rng):
    """mosaic=1.0: output mixes pixels from multiple batch images; labels stay
    normalized, valid-prefixed, fixed-shape; same key reproduces bitwise."""
    b, h = 4, 64
    imgs = np.zeros((b, h, h, 3), np.uint8)
    for i in range(b):        # solid, distinguishable colors
        imgs[i] = (i + 1) * 50
    labels = np.zeros((b, 8, 5), np.float32)
    labels[:, :, 0] = -1
    for i in range(b):
        labels[i, 0] = [i, 0.5, 0.5, 0.5, 0.5]
    imgs, labels = jnp.asarray(imgs), jnp.asarray(labels)

    out1 = device_augment(imgs, labels, jax.random.PRNGKey(3), degrees=0.0,
                          translate=0.1, scale=0.5, shear=0.0, hsv_h=0.0,
                          hsv_s=0.0, hsv_v=0.0, fliplr=0.0, flipud=0.0,
                          mosaic=1.0)
    out2 = device_augment(imgs, labels, jax.random.PRNGKey(3), degrees=0.0,
                          translate=0.1, scale=0.5, shear=0.0, hsv_h=0.0,
                          hsv_s=0.0, hsv_v=0.0, fliplr=0.0, flipud=0.0,
                          mosaic=1.0)
    oi, ol = np.asarray(out1[0]), np.asarray(out1[1])
    np.testing.assert_array_equal(oi, np.asarray(out2[0]))
    np.testing.assert_array_equal(ol, np.asarray(out2[1]))
    assert oi.shape == (b, h, h, 3) and ol.shape == (b, 8, 5)

    # at least one sample shows >= 2 distinct source colors (tiling happened);
    # match within bf16-canvas tolerance
    src_vals = np.array([(i + 1) * 50 / 255.0 for i in range(b)])
    mixed = 0
    for i in range(b):
        vals = np.unique(oi[i])
        hits = sum(bool((np.abs(vals - sv) < 5e-3).any()) for sv in src_vals)
        mixed += hits >= 2
    assert mixed >= 1, "no sample contains tiles from multiple images"

    # labels: valid rows lead, coords normalized in [0,1], w/h positive
    for i in range(b):
        v = ol[i][ol[i][:, 0] >= 0]
        if len(v):
            assert (v[:, 1:3] >= 0).all() and (v[:, 1:3] <= 1).all()
            assert (v[:, 3:5] > 0).all() and (v[:, 3:5] <= 1).all()
        first_invalid = np.argmax(ol[i][:, 0] < 0) if (ol[i][:, 0] < 0).any() \
            else len(ol[i])
        assert (ol[i][first_invalid:, 0] < 0).all(), "valid rows not prefixed"


def test_device_mosaic_prob_zero_matches_plain(rng):
    """mosaic=0.0 keeps the original (affine) semantics bit-for-bit."""
    imgs, labels = _batch(rng)
    a = device_augment(imgs, labels, jax.random.PRNGKey(5), scale=0.5,
                       hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, fliplr=0.0,
                       flipud=0.0)
    b = device_augment(imgs, labels, jax.random.PRNGKey(5), scale=0.5,
                       hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, fliplr=0.0,
                       flipud=0.0, mosaic=0.0)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_separable_warp_matches_gather(rng):
    """MXU-matmul axis-aligned warp == the per-pixel gather warp (bilinear +
    border fill), for random scale/translate inverse mappings."""
    import jax.numpy as jnp2
    from mafyolo_tpu.data.device_aug import _warp_axis_aligned, _warp_bilinear
    h = w = 48
    img = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    for sx, sy, tx, ty in [(1.1, 0.9, -3.0, 5.0), (0.6, 0.6, 10.0, -8.0),
                           (1.0, 1.0, 0.0, 0.0), (2.0, 1.5, -20.0, 30.0)]:
        m_inv = jnp.asarray([[sx, 0, tx], [0, sy, ty], [0, 0, 1]], jnp.float32)
        a = _warp_bilinear(img, m_inv, h, w, 0.447)
        b = _warp_axis_aligned(img, m_inv, h, w, 0.447)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_mosaic_canvas_matches_gather(rng):
    """Canvas+matmul mosaic == virtual-canvas gather mosaic."""
    from mafyolo_tpu.data.device_aug import (_mosaic_canvas_axis_aligned,
                                             _warp_mosaic_bilinear)
    s = 32
    quad = jnp.asarray(rng.uniform(0, 1, (4, s, s, 3)).astype(np.float32))
    for xc, yc, sx, tx, ty in [(20, 40, 1.0, -10.0, -5.0),
                               (48, 17, 0.7, 4.0, 12.0),
                               (16, 48, 1.4, -30.0, -20.0)]:
        m_inv = jnp.asarray([[sx, 0, tx], [0, sx, ty], [0, 0, 1]], jnp.float32)
        a = _warp_mosaic_bilinear(quad, m_inv, jnp.float32(xc),
                                  jnp.float32(yc), s, s, 0.447)
        b = _mosaic_canvas_axis_aligned(quad, jnp.float32(xc), jnp.float32(yc),
                                        m_inv, s, s, 0.447)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-2, atol=1e-2)  # bf16 canvas


def test_device_mixup_blends_and_unions_labels(rng):
    """mosaic=1, mixup=1: every sample is a beta(32,32) blend of its own
    mosaic with a partner's mosaic -- pixels become strict convex combos,
    and the label buffer carries boxes from both sets. Reference semantics:
    datasets.py:166-171 + data_augment.py mixup (beta 32,32, label concat)."""
    b, h = 4, 64
    imgs = np.zeros((b, h, h, 3), np.uint8)
    for i in range(b):
        imgs[i] = (i + 1) * 50
    labels = np.zeros((b, 16, 5), np.float32)
    labels[:, :, 0] = -1
    for i in range(b):
        labels[i, 0] = [i, 0.5, 0.5, 0.5, 0.5]
    imgs, labels = jnp.asarray(imgs), jnp.asarray(labels)

    kw = dict(degrees=0.0, translate=0.0, scale=0.0, shear=0.0, hsv_h=0.0,
              hsv_s=0.0, hsv_v=0.0, fliplr=0.0, flipud=0.0, mosaic=1.0)
    base = device_augment(imgs, labels, jax.random.PRNGKey(5), **kw)
    mixed = device_augment(imgs, labels, jax.random.PRNGKey(5), **kw,
                           mixup=1.0)
    bi, bl = np.asarray(base[0]), np.asarray(base[1])
    mi, ml = np.asarray(mixed[0]), np.asarray(mixed[1])
    assert mi.shape == bi.shape and ml.shape == bl.shape
    # same geometry keys -> the mixed image must differ from the unmixed one
    # (a blend with a different-colored partner) but stay within the batch's
    # value range
    assert np.abs(mi - bi).max() > 1e-3
    assert mi.min() >= 0.0 and mi.max() <= 1.0
    # label union: at least one sample must carry more valid boxes than its
    # unmixed counterpart
    nb = (bl[:, :, 0] >= 0).sum(1)
    nm = (ml[:, :, 0] >= 0).sum(1)
    assert (nm >= nb).all() and (nm > nb).any()
    # reproducibility
    again = device_augment(imgs, labels, jax.random.PRNGKey(5), **kw,
                           mixup=1.0)
    np.testing.assert_array_equal(mi, np.asarray(again[0]))


def test_device_dy_mixup_gates_on_box_count(rng):
    """dy_mixup only fires for samples with <= dy_label post-mosaic boxes
    (the dynamic arm, datasets.py:172-178)."""
    b, h, n = 2, 64, 128
    kw = dict(degrees=0.0, translate=0.0, scale=0.0, shear=0.0, hsv_h=0.0,
              hsv_s=0.0, hsv_v=0.0, fliplr=0.0, flipud=0.0, mosaic=1.0)

    def run(n_boxes, dy_mixup):
        imgs = np.zeros((b, h, h, 3), np.uint8)
        imgs[0], imgs[1] = 60, 200
        labels = np.full((b, n, 5), -1, np.float32)
        for i in range(b):    # boxes spread over the whole image so mosaic
            for j in range(n_boxes):   # tiles keep (most of) them
                labels[i, j] = [i, (j % 5) * 0.19 + 0.06,
                                (j // 5 % 5) * 0.19 + 0.06, 0.05, 0.05]
        out = device_augment(jnp.asarray(imgs), jnp.asarray(labels),
                             jax.random.PRNGKey(9), **kw, dy_label=5,
                             dy_mixup=dy_mixup)
        return np.asarray(out[0]), np.asarray(out[1])

    # all-crowded batch: every post-mosaic sample has > dy_label boxes ->
    # the dynamic arm never fires -> identical to dy_mixup=0
    crowd_base_i, crowd_base_l = run(25, 0.0)
    crowd_dyn_i, crowd_dyn_l = run(25, 1.0)
    assert (crowd_base_l[:, :, 0] >= 0).sum() > 2 * 5   # gate really above
    np.testing.assert_array_equal(crowd_base_i, crowd_dyn_i)
    np.testing.assert_array_equal(crowd_base_l, crowd_dyn_l)

    # all-sparse batch (1 box each, <= 4 post-mosaic): the arm fires and
    # blends at least one sample
    sparse_base_i, _ = run(1, 0.0)
    sparse_dyn_i, _ = run(1, 1.0)
    assert np.abs(sparse_dyn_i - sparse_base_i).max() > 1e-3
