"""Threshold compaction: indices of mask survivors, without sort or scatter.

The NMS candidate-selection bottleneck (docs/STATUS.md round-2 profile) was
lax.top_k over the [A*nc] multi-label score matrix: 7.6 ms/batch32 at 160k
elements, plus 1.7 ms for the stage-1 anchor top_k -- both pay the full
O(n log n) compare-network cost for every anchor, although at eval thresholds
(conf > 0.03) only a few hundred of the 672k (anchor, class) pairs survive.

This module compacts survivor indices with O(N + K*T) fully-vectorized work
(T = 128, the TPU lane width) and no sort, scatter, or one-hot matmul:

  1. tile counts   cnt[t]  = sum over lane-tile t of mask        (one fused pass)
  2. tile offsets  off[t]  = exclusive cumsum of cnt              (log-depth)
  3. slot -> tile  tile_of[j] = #{t : off[t] <= j} - 1            (hierarchical
     two-level compare-reduce; j < K)
  4. slot -> lane  gather tile_of[j]'s 128 mask lanes, cumsum across the lane
     axis, and pick the (j - off[tile_of])-th set bit:
         pos = sum(lane_cumsum <= rank)

Replaces the candidate selection of the reference's torch NMS front half
(/root/reference/yolov6/utils/nms.py:63-80: xc = prediction[..., 4] > conf_thres
followed by boolean-mask compaction x[xc], which torch does with a CUDA stream
compaction); TPU has no native stream compaction, hence this formulation.

Exact by construction while count <= K; callers must branch to a dense path on
overflow (count > K), reported by the returned count.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def compact_mask_indices(mask, k: int):
    """Indices of the first k True lanes of a flat boolean mask, in order.

    Args:
      mask: [N] bool (N need not be lane-aligned; padded internally).
      k:    static output capacity.

    Returns:
      idx:   [k] int32 -- positions of the j-th True element for j < count
             (ascending); garbage (but in-bounds, < N_pad) for j >= count.
      count: [] int32 -- total number of True elements. count > k means the
             output holds only *some* k survivors is NOT the case here: idx is
             always the FIRST k survivors in index order; count > k tells the
             caller survivors were dropped and an exact fallback is needed
             when "first k" is not an acceptable truncation.
    """
    n = mask.shape[0]
    npad = _round_up(n, LANES)
    m = jnp.pad(mask, (0, npad - n)).reshape(-1, LANES)        # [nt, 128]
    nt = m.shape[0]

    cnt = m.sum(-1, dtype=jnp.int32)                           # [nt]
    off = jnp.cumsum(cnt) - cnt                                # exclusive
    count = off[-1] + cnt[-1]

    j = jnp.arange(k, dtype=jnp.int32)                         # output slots

    # NO GATHERS below: XLA's TPU gather lowering costs ~100-250 us per op
    # at these shapes regardless of data size (round-3 trace,
    # tools/profile_xref.py), so every slot lookup is expressed as a masked
    # reduce or a one-hot MXU dot instead.
    # slot -> tile: largest t with off[t] <= j, via two-level compare-reduce
    # (a [k, nt] one-shot compare is O(k*nt); the coarse level cuts it to
    # O(k * (nt/128 + 128 + 128)) which matters at nt ~ 5000+)
    big = jnp.iinfo(jnp.int32).max
    if nt > 4 * LANES:
        ntc = _round_up(nt, LANES) // LANES
        off_p = jnp.pad(off, (0, ntc * LANES - nt), constant_values=big)
        off_2d = off_p.reshape(ntc, LANES)
        coarse_off = off_2d[:, 0]                              # [ntc]
        cmask = coarse_off[None, :] <= j[:, None]              # [k, ntc]
        cidx = jnp.maximum(cmask.sum(-1, dtype=jnp.int32) - 1, 0)
        # fine = off_2d[cidx] as a one-hot f32 dot (rows < 2^24: exact)
        chot = (cidx[:, None] ==
                jnp.arange(ntc, dtype=jnp.int32)[None, :]).astype(jnp.float32)
        fine = lax.dot_general(
            chot, jnp.minimum(off_2d, 1 << 24).astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ()))).astype(jnp.int32)
        fmask = fine <= j[:, None]                             # [k, 128]
        tile_of = cidx * LANES + fmask.sum(-1, dtype=jnp.int32) - 1
        off_sel = jnp.max(jnp.where(fmask, fine, 0), axis=-1)  # off[tile_of]
    else:
        tmask = off[None, :] <= j[:, None]                     # [k, nt]
        tile_of = tmask.sum(-1, dtype=jnp.int32) - 1
        # off is nondecreasing, so off[tile_of] is the largest masked value
        off_sel = jnp.max(jnp.where(tmask, off[None, :], 0), axis=-1)
    tile_of = jnp.clip(tile_of, 0, nt - 1)

    # slot -> lane: rank-th set bit of the tile's mask row; rows = m[tile_of]
    # as a one-hot MXU dot ([k, nt] @ [nt, 128] beats the gather by ~100x)
    rank = j - off_sel                                         # [k]
    thot = (tile_of[:, None] ==
            jnp.arange(nt, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    rows = lax.dot_general(
        thot, m.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())))            # [k, 128]
    csum = jnp.cumsum(rows.astype(jnp.int32), axis=-1)         # [k, 128]
    pos = (csum <= rank[:, None]).sum(-1, dtype=jnp.int32)     # [k]
    pos = jnp.minimum(pos, LANES - 1)

    return tile_of * LANES + pos, count
