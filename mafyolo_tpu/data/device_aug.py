"""Device-side augmentation: affine warp + HSV jitter + flips as jitted TPU ops.

The BASELINE.json north star moves the host cv2 pipeline onto the device. This
module implements the per-batch geometric + color stage as pure jnp with explicit
jax.random keys (one key per sample -> bitwise reproducibility independent of
host scheduling). The host keeps doing decode + letterbox + (optional) mosaic
tiling; the device applies:

  * random affine (rotate/scale/shear/translate, the get_transform_matrix
    semantics of data_augment.py:160-187) via inverse-warp bilinear sampling --
    a gather-based kernel that XLA fuses with the normalize step;
  * HSV jitter (data_augment.py:37-50 semantics on RGB floats);
  * horizontal/vertical flips;
  * label transform for the same affine + flips with the reference's
    box_candidates filter (degenerate boxes are masked out, shapes stay static).

Enable with Trainer(--device-aug): the host loader then runs in "letterbox-only"
mode and ships uint8 frames; everything else happens inside the train step.
"""
from __future__ import annotations

import math
from functools import partial


import jax
import jax.numpy as jnp


def _affine_matrix(key, h: int, w: int, degrees, translate, scale, shear):
    """Random centered rotate/scale/shear/translate matrix (3x3), image coords."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    a = jax.random.uniform(k1, (), minval=-degrees, maxval=degrees)
    s = jax.random.uniform(k2, (), minval=1 - scale, maxval=1 + scale)
    rad = a * math.pi / 180.0
    cos, sin = jnp.cos(rad) * s, jnp.sin(rad) * s
    shx = jnp.tan(jax.random.uniform(k3, (), minval=-shear, maxval=shear)
                  * math.pi / 180.0)
    shy = jnp.tan(jax.random.uniform(k4, (), minval=-shear, maxval=shear)
                  * math.pi / 180.0)
    tx = jax.random.uniform(k5, (), minval=0.5 - translate,
                            maxval=0.5 + translate) * w
    ty = jax.random.uniform(k6, (), minval=0.5 - translate,
                            maxval=0.5 + translate) * h
    c = jnp.array([[1, 0, -w / 2], [0, 1, -h / 2], [0, 0, 1]], jnp.float32)
    r = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], jnp.float32)
    r = r.at[0, 0].set(cos).at[0, 1].set(-sin).at[1, 0].set(sin).at[1, 1].set(cos)
    sh = jnp.eye(3, dtype=jnp.float32).at[0, 1].set(shx).at[1, 0].set(shy)
    t = jnp.eye(3, dtype=jnp.float32).at[0, 2].set(tx).at[1, 2].set(ty)
    return t @ sh @ r @ c, s


def _warp_bilinear(img, m_inv, out_h: int, out_w: int, fill: float):
    """Inverse-warp bilinear sampling; img [H,W,C] float, m_inv maps out->in."""
    gy, gx = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(gx)
    src = jnp.einsum("ij,jhw->ihw", m_inv, jnp.stack([gx, gy, ones]))
    sx, sy = src[0], src[1]
    h, w = img.shape[:2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx, fy = sx - x0, sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yy, xx):
        inside = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        v = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return jnp.where(inside[..., None], v, fill)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _rgb_to_hsv(rgb):
    return jax.vmap(jax.vmap(_px_rgb2hsv))(rgb)


def _px_rgb2hsv(px):
    r, g, b = px[0], px[1], px[2]
    mx = jnp.max(px)
    mn = jnp.min(px)
    d = mx - mn + 1e-12
    h = jnp.where(mx == r, (g - b) / d % 6.0,
                  jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0))
    h = h / 6.0
    s = d / (mx + 1e-12)
    return jnp.stack([h, s, mx])


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], -1)


def hsv_jitter(img, key, hgain=0.015, sgain=0.7, vgain=0.4):
    """HSV gain jitter on RGB floats in [0,1] (augment_hsv semantics)."""
    gains = jax.random.uniform(key, (3,), minval=-1, maxval=1) \
        * jnp.array([hgain, sgain, vgain]) + 1.0
    hsv = _rgb_to_hsv(img)
    h = (hsv[..., 0] * gains[0]) % 1.0
    s = jnp.clip(hsv[..., 1] * gains[1], 0, 1)
    v = jnp.clip(hsv[..., 2] * gains[2], 0, 1)
    return _hsv_to_rgb(jnp.stack([h, s, v], -1))


def _transform_labels(labels, m, s, out_h: int, out_w: int):
    """Affine-transform normalized-xywh labels [N,5]; mask degenerates.

    Mirrors random_affine's corner transform + box_candidates filter
    (data_augment.py:103-157). Padded rows (cls=-1) stay padded.
    """
    cls = labels[:, 0:1]
    valid_in = cls[:, 0] >= 0
    cx, cy, bw, bh = (labels[:, 1] * out_w, labels[:, 2] * out_h,
                      labels[:, 3] * out_w, labels[:, 4] * out_h)
    x1, y1 = cx - bw / 2, cy - bh / 2
    x2, y2 = cx + bw / 2, cy + bh / 2
    corners = jnp.stack([
        jnp.stack([x1, y1], -1), jnp.stack([x2, y2], -1),
        jnp.stack([x1, y2], -1), jnp.stack([x2, y1], -1)], 1)      # [N,4,2]
    ones = jnp.ones((*corners.shape[:2], 1), corners.dtype)
    pts = jnp.concatenate([corners, ones], -1) @ m.T               # [N,4,3]
    xs, ys = pts[..., 0], pts[..., 1]
    nx1 = jnp.clip(xs.min(1), 0, out_w)
    ny1 = jnp.clip(ys.min(1), 0, out_h)
    nx2 = jnp.clip(xs.max(1), 0, out_w)
    ny2 = jnp.clip(ys.max(1), 0, out_h)
    w2, h2 = nx2 - nx1, ny2 - ny1
    ar = jnp.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
    keep = ((w2 > 2) & (h2 > 2)
            & (w2 * h2 / (bw * s * bh * s + 1e-16) > 0.1) & (ar < 20)
            & valid_in)
    out = jnp.stack([(nx1 + nx2) / 2 / out_w, (ny1 + ny2) / 2 / out_h,
                     w2 / out_w, h2 / out_h], -1)
    cls_out = jnp.where(keep[:, None], cls, -1.0)
    return jnp.concatenate([cls_out, jnp.where(keep[:, None], out, 0.0)], -1)


@partial(jax.jit, static_argnames=("degrees", "translate", "scale", "shear",
                                   "hsv_h", "hsv_s", "hsv_v", "fliplr", "flipud"))
def device_augment(imgs_u8, labels, key, *, degrees=0.0, translate=0.1,
                   scale=0.5, shear=0.0, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4,
                   fliplr=0.5, flipud=0.0):
    """[B,H,W,3] uint8 BGR + [B,N,5] labels + key -> augmented (float RGB, labels).

    One independent key per sample; returns imgs in [0,1] RGB float32.
    """
    b, h, w, _ = imgs_u8.shape
    keys = jax.random.split(key, b)

    def one(img_u8, lbl, k):
        ka, kh, kf1, kf2 = jax.random.split(k, 4)
        img = img_u8[..., ::-1].astype(jnp.float32) / 255.0     # BGR -> RGB
        m, s = _affine_matrix(ka, h, w, degrees, translate, scale, shear)
        m_inv = jnp.linalg.inv(m)
        img = _warp_bilinear(img, m_inv, h, w, 114.0 / 255.0)
        lbl = _transform_labels(lbl, m, s, h, w)
        if hsv_h or hsv_s or hsv_v:   # static: reference skips when all gains 0
            img = hsv_jitter(img, kh, hsv_h, hsv_s, hsv_v)
        do_lr = jax.random.uniform(kf1) < fliplr
        img = jnp.where(do_lr, img[:, ::-1], img)
        lbl_x = jnp.where((lbl[:, 0:1] >= 0) & do_lr, 1.0 - lbl[:, 1:2],
                          lbl[:, 1:2])
        do_ud = jax.random.uniform(kf2) < flipud
        img = jnp.where(do_ud, img[::-1], img)
        lbl_y = jnp.where((lbl[:, 0:1] >= 0) & do_ud, 1.0 - lbl[:, 2:3],
                          lbl[:, 2:3])
        lbl = jnp.concatenate([lbl[:, 0:1], lbl_x, lbl_y, lbl[:, 3:]], -1)
        return img, lbl

    return jax.vmap(one)(imgs_u8, labels, keys)
