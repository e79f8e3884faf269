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


def _affine_matrix(key, h: int, w: int, degrees, translate, scale, shear,
                   out_h: int = None, out_w: int = None):
    """Random centered rotate/scale/shear/translate matrix (3x3), image coords.

    Mirrors get_transform_matrix (data_augment.py:160-187): the centering C
    uses the INPUT dims (the 2s mosaic canvas), the translation T the OUTPUT
    dims -- they differ exactly in the mosaic path.
    """
    out_h = h if out_h is None else out_h
    out_w = w if out_w is None else out_w
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
                            maxval=0.5 + translate) * out_w
    ty = jax.random.uniform(k6, (), minval=0.5 - translate,
                            maxval=0.5 + translate) * out_h
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


def _hat_matrix(src, in_size: int):
    """Bilinear resample matrix: src [out] f32 source coords -> [in, out]
    where column j holds the 2-tap hat weights max(0, 1-|i - src[j]|).

    Out-of-range sources get zero column sum; the caller blends `fill` by
    (1 - colsum), which reproduces the gather warp's border fill exactly."""
    rows = jnp.arange(in_size, dtype=jnp.float32)[:, None]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(rows - src[None, :]))
    return w


def _warp_axis_aligned(img, m_inv, out_h: int, out_w: int, fill: float):
    """Separable bilinear warp for axis-aligned affines (m_inv[0,1]==m_inv[1,0]
    ==0, i.e. degrees=0 and shear=0 -- the shipped MAF hyps). Two matmuls on
    the MXU replace the per-pixel 4-tap gather of _warp_bilinear (measured
    1.15 s -> ~5 ms per batch32 @640). Exact same bilinear + border-fill
    semantics (separable fill identity)."""
    h, w = img.shape[:2]
    xs = m_inv[0, 0] * jnp.arange(out_w, dtype=jnp.float32) + m_inv[0, 2]
    ys = m_inv[1, 1] * jnp.arange(out_h, dtype=jnp.float32) + m_inv[1, 2]
    mx = _hat_matrix(xs, w)                       # [W, W']
    my = _hat_matrix(ys, h)                       # [H, H']
    # x-pass: [H, W, C] @ [W, W'] -> [H, W', C]
    t = jnp.einsum("hwc,wx->hxc", img, mx, preferred_element_type=jnp.float32)
    t = t + (1.0 - mx.sum(0))[None, :, None] * fill
    # y-pass: [H, W', C] with [H, H'] -> [H', W', C]
    o = jnp.einsum("hxc,hy->yxc", t, my, preferred_element_type=jnp.float32)
    return o + (1.0 - my.sum(0))[:, None, None] * fill


def _mosaic_canvas_axis_aligned(quad, xc, yc, m_inv, out_h: int, out_w: int,
                                fill: float):
    """Mosaic + axis-aligned affine without gathers: compose the 4 tiles onto
    a 3s x 3s canvas (s/2 margins make every dynamic_update_slice fully
    in-bounds, clipping handled by the later crop) and run the separable warp
    with the margin folded into the source mapping."""
    s = quad.shape[1]
    m = s // 2
    cdt = jnp.bfloat16   # canvas is 3s x 3s; bf16 halves the HBM footprint
    canvas = jnp.full((3 * s, 3 * s, quad.shape[-1]), fill, cdt)
    # reference placement: tile i's inner corner meets (xc, yc) on the 2s
    # canvas; +m margin shift on the 3s canvas
    xi = xc.astype(jnp.int32) + m
    yi = yc.astype(jnp.int32) + m
    q = quad.astype(cdt)
    canvas = jax.lax.dynamic_update_slice(canvas, q[0], (yi - s, xi - s, 0))
    canvas = jax.lax.dynamic_update_slice(canvas, q[1], (yi - s, xi, 0))
    canvas = jax.lax.dynamic_update_slice(canvas, q[2], (yi, xi - s, 0))
    canvas = jax.lax.dynamic_update_slice(canvas, q[3], (yi, xi, 0))
    # the true mosaic canvas is 2s x 2s: clip tile content that spilled into
    # the margins (the gather formulation fills those regions)
    canvas = canvas.at[:m].set(fill).at[m + 2 * s:].set(fill)
    canvas = canvas.at[:, :m].set(fill).at[:, m + 2 * s:].set(fill)
    xs = m_inv[0, 0] * jnp.arange(out_w, dtype=jnp.float32) + m_inv[0, 2] + m
    ys = m_inv[1, 1] * jnp.arange(out_h, dtype=jnp.float32) + m_inv[1, 2] + m
    mx = _hat_matrix(xs, 3 * s)
    my = _hat_matrix(ys, 3 * s)
    t = jnp.einsum("hwc,wx->hxc", canvas, mx,
                   preferred_element_type=jnp.float32)
    t = t + (1.0 - mx.sum(0))[None, :, None] * fill
    o = jnp.einsum("hxc,hy->yxc", t, my, preferred_element_type=jnp.float32)
    return o + (1.0 - my.sum(0))[:, None, None] * fill


def _rgb_to_hsv(rgb):
    """Vectorized RGB->HSV on [..., 3] floats (round 1 used a per-pixel
    double vmap; this is one fused elementwise graph)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = rgb.max(-1)
    mn = rgb.min(-1)
    d = mx - mn + 1e-12
    h = jnp.where(mx == r, ((g - b) / d) % 6.0,
                  jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0))
    return jnp.stack([h / 6.0, d / (mx + 1e-12), mx], -1)


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


def _warp_mosaic_bilinear(imgs4, m_inv, xc, yc, out_h: int, out_w: int,
                          fill: float):
    """Inverse-warp the VIRTUAL 2s x 2s mosaic canvas without building it.

    imgs4 [4,s,s,3] float (TL,TR,BL,BR per the reference's placement where
    image i's corner meets the mosaic center (xc,yc), data_augment.py:190-254).
    Each bilinear tap maps an output pixel through m_inv to canvas coords,
    picks the quadrant, and gathers from the right source image -- the 2s
    canvas (4x the pixels) never exists in memory.
    """
    s = imgs4.shape[1]
    gy, gx = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(gx)
    src = jnp.einsum("ij,jhw->ihw", m_inv, jnp.stack([gx, gy, ones]))
    sx, sy = src[0], src[1]
    flat = imgs4.reshape(4 * s * s, imgs4.shape[-1])
    xc = xc.astype(jnp.int32)
    yc = yc.astype(jnp.int32)

    def tap(syi, sxi):
        qx = (sxi >= xc).astype(jnp.int32)
        qy = (syi >= yc).astype(jnp.int32)
        ox = jnp.where(qx == 0, xc - s, xc)
        oy = jnp.where(qy == 0, yc - s, yc)
        ix = sxi - ox
        iy = syi - oy
        inside = (ix >= 0) & (ix < s) & (iy >= 0) & (iy < s) \
            & (sxi >= 0) & (sxi < 2 * s) & (syi >= 0) & (syi < 2 * s)
        idx = ((qy * 2 + qx) * s + jnp.clip(iy, 0, s - 1)) * s \
            + jnp.clip(ix, 0, s - 1)
        v = flat[idx]
        return jnp.where(inside[..., None], v, fill)

    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    fx = (sx - x0.astype(jnp.float32))[..., None]
    fy = (sy - y0.astype(jnp.float32))[..., None]
    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _mosaic_labels_canvas(lbl4, xc, yc, s: int):
    """[4,N,5] normalized-xywh labels -> [4N,5] canvas-pixel xyxy + cls.

    Offsets per quadrant follow the reference's padw/padh (xc-s / xc, yc-s /
    yc, data_augment.py:219-246); padded rows (cls<0) stay invalid.
    """
    offs = jnp.stack([
        jnp.stack([xc - s, yc - s]), jnp.stack([xc, yc - s]),
        jnp.stack([xc - s, yc]), jnp.stack([xc, yc])])        # [4,2]
    cls = lbl4[..., 0].reshape(-1, 1)
    cx = lbl4[..., 1] * s + offs[:, None, 0]
    cy = lbl4[..., 2] * s + offs[:, None, 1]
    bw = lbl4[..., 3] * s
    bh = lbl4[..., 4] * s
    x1 = (cx - bw / 2).reshape(-1)
    y1 = (cy - bh / 2).reshape(-1)
    x2 = (cx + bw / 2).reshape(-1)
    y2 = (cy + bh / 2).reshape(-1)
    return cls, jnp.stack([x1, y1, x2, y2], -1)


def _affine_label_corners(cls, xyxy, m, s_gain, out_h: int, out_w: int):
    """Pixel-space xyxy labels through affine m + box_candidates filter
    (random_affine, data_augment.py:103-157). Returns [N,5] normalized xywh."""
    valid_in = cls[:, 0] >= 0
    x1, y1, x2, y2 = xyxy[:, 0], xyxy[:, 1], xyxy[:, 2], xyxy[:, 3]
    bw, bh = x2 - x1, y2 - y1
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
            & (w2 * h2 / (bw * s_gain * bh * s_gain + 1e-16) > 0.1) & (ar < 20)
            & valid_in)
    out = jnp.stack([(nx1 + nx2) / 2 / out_w, (ny1 + ny2) / 2 / out_h,
                     w2 / out_w, h2 / out_h], -1)
    cls_out = jnp.where(keep[:, None], cls, -1.0)
    return jnp.concatenate([cls_out, jnp.where(keep[:, None], out, 0.0)], -1)


def _compact_labels(lbl, n_out: int):
    """Move valid rows (cls>=0) to the front, truncate/pad to n_out rows --
    keeps the targets tensor fixed-shape like the host collate's max_labels."""
    valid = lbl[:, 0] >= 0
    order = jnp.argsort(~valid, stable=True)
    lbl = lbl[order][:n_out]
    pad_cls = jnp.where(lbl[:, 0:1] >= 0, lbl[:, 0:1], -1.0)
    return jnp.concatenate([pad_cls, lbl[:, 1:]], -1)


@partial(jax.jit, static_argnames=("degrees", "translate", "scale", "shear",
                                   "hsv_h", "hsv_s", "hsv_v", "fliplr",
                                   "flipud", "mosaic", "mixup", "dy_label",
                                   "dy_mixup"))
def device_augment(imgs_u8, labels, key, *, degrees=0.0, translate=0.1,
                   scale=0.5, shear=0.0, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4,
                   fliplr=0.5, flipud=0.0, mosaic=0.0, mixup=0.0,
                   dy_label=5, dy_mixup=0.0):
    """[B,H,W,3] uint8 BGR + [B,N,5] labels + key -> augmented (float RGB, labels).

    One independent key per sample; returns imgs in [0,1] RGB float32.
    mosaic>0 enables in-batch device mosaic: each sample draws 3 donor images
    from the same batch, tiles them on a virtual 2s canvas (never
    materialized -- the affine inverse-warp taps gather straight from the 4
    sources), and the affine maps canvas->s like the reference's
    mosaic+random_affine chain (data_augment.py:190-254). Non-mosaic samples
    skip the affine, mirroring the reference's else-branch (datasets.py
    __getitem__: letterbox + general_augment only).

    mixup/dy_mixup reproduce the reference's cached-mosaic mixup chain
    (datasets.py:166-178): for mosaic'd samples, with p=mixup -- or, when the
    sample has <= dy_label boxes, with p=dy_mixup (the dynamic-mixup arm) --
    the image is beta(32,32)-blended with ANOTHER sample's mosaic output
    (the in-batch stand-in for get_cache_mosaic of a random dataset index)
    and the label sets are concatenated (data_augment.py:85-100). HSV/flips
    run after, matching the reference's general_augment ordering.

    copy_paste is intentionally host-only: it needs per-instance polygon
    segments (ragged), which the fixed-shape device path does not carry
    (documented in docs/COMPONENTS.md).
    """
    b, h, w, _ = imgs_u8.shape
    n = labels.shape[1]
    keys = jax.random.split(key, b)
    imgs_f = imgs_u8[..., ::-1].astype(jnp.float32) / 255.0     # BGR -> RGB
    # the shipped MAF hyps have degrees=shear=0: the affine is axis-aligned
    # and warps become MXU matmuls (measured 1.15s -> ~ms per batch32 vs the
    # per-pixel gather warp)
    separable = (degrees == 0.0 and shear == 0.0)

    def phase_geom(i, k):
        """Mosaic(+affine) / affine for one sample. Returns the selected
        (img, lbl) plus the unconditional mosaic output (mixup partners use
        a partner's MOSAIC regardless of the partner's own gate, like the
        reference's get_cache_mosaic partner)."""
        ka, _, _, _, km, kd, kb, _, _ = jax.random.split(k, 9)
        img = imgs_f[i]
        lbl = labels[i]
        do_mo = jnp.bool_(False)
        mo_img, mo_lbl = img, lbl
        if mosaic:
            s = h
            donors = jax.random.randint(kd, (3,), 0, b)
            quad = jnp.stack([img, imgs_f[donors[0]], imgs_f[donors[1]],
                              imgs_f[donors[2]]])
            lbl4 = jnp.stack([lbl, labels[donors[0]], labels[donors[1]],
                              labels[donors[2]]])
            # mosaic center ~ U(s/2, 3s/2) (mosaic_border, datasets.py)
            cxy = jax.random.uniform(km, (2,), minval=0.5 * s, maxval=1.5 * s)
            xc, yc = jnp.floor(cxy[0]), jnp.floor(cxy[1])
            m, sg = _affine_matrix(ka, 2 * s, 2 * s, degrees, translate,
                                   scale, shear, out_h=s, out_w=s)
            m_inv = jnp.linalg.inv(m)
            if separable:
                mo_img = _mosaic_canvas_axis_aligned(quad, xc, yc, m_inv, s, s,
                                                     114.0 / 255.0)
            else:
                mo_img = _warp_mosaic_bilinear(quad, m_inv, xc, yc, s, s,
                                               114.0 / 255.0)
            mo_img = mo_img.astype(img.dtype)
            cls4, xyxy4 = _mosaic_labels_canvas(lbl4, xc, yc, s)
            mo_lbl = _compact_labels(
                _affine_label_corners(cls4, xyxy4, m, sg, s, s), n)
            do_mo = jax.random.uniform(kb) < mosaic
            img = jnp.where(do_mo, mo_img, img)
            lbl = jnp.where(do_mo, mo_lbl, lbl)
        elif degrees or translate or scale or shear:
            m, sg = _affine_matrix(ka, h, w, degrees, translate, scale, shear)
            m_inv = jnp.linalg.inv(m)
            if separable:
                img = _warp_axis_aligned(img, m_inv, h, w, 114.0 / 255.0)
            else:
                img = _warp_bilinear(img, m_inv, h, w, 114.0 / 255.0)
            lbl = _transform_labels(lbl, m, sg, h, w)
        return img, lbl, mo_img, mo_lbl, do_mo

    def phase_color(img, lbl, k):
        _, kh, kf1, kf2, _, _, _, _, _ = jax.random.split(k, 9)
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

    img1, lbl1, mo_img, mo_lbl, do_mo = jax.vmap(phase_geom)(
        jnp.arange(b), keys)

    if mosaic and (mixup or dy_mixup):
        def phase_mix(i, k):
            _, _, _, _, _, _, _, kp, kr = jax.random.split(k, 9)
            kp1, kp2, kp3 = jax.random.split(kp, 3)
            partner = jax.random.randint(kp1, (), 0, b)
            u_mix = jax.random.uniform(kp2) < mixup
            n_valid = jnp.sum(lbl1[i, :, 0] >= 0)
            u_dy = jax.random.uniform(kp3) < dy_mixup
            do = do_mo[i] & (u_mix | ((n_valid <= dy_label) & u_dy))
            r = jax.random.beta(kr, 32.0, 32.0)
            img = jnp.where(do, img1[i] * r + mo_img[partner] * (1.0 - r),
                            img1[i])
            both = _compact_labels(
                jnp.concatenate([lbl1[i], mo_lbl[partner]], 0), n)
            lbl = jnp.where(do, both, lbl1[i])
            return img, lbl
        img1, lbl1 = jax.vmap(phase_mix)(jnp.arange(b), keys)

    return jax.vmap(phase_color)(img1, lbl1, keys)
