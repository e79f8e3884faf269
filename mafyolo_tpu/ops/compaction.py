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

    # slot -> tile: largest t with off[t] <= j, via two-level compare-reduce
    # (a [k, nt] one-shot compare is O(k*nt); the coarse level cuts it to
    # O(k * (nt/128 + 128 + 128)) which matters at nt ~ 5000+)
    if nt > 4 * LANES:
        ntc = _round_up(nt, LANES) // LANES
        off_p = jnp.pad(off, (0, ntc * LANES - nt),
                        constant_values=jnp.iinfo(jnp.int32).max)
        coarse_off = off_p.reshape(ntc, LANES)[:, 0]           # [ntc]
        cidx = (coarse_off[None, :] <= j[:, None]).sum(-1,
                                                       dtype=jnp.int32) - 1
        cidx = jnp.maximum(cidx, 0)
        fine = off_p.reshape(ntc, LANES)[cidx]                 # [k, 128]
        tile_of = cidx * LANES + (fine <= j[:, None]).sum(-1,
                                                          dtype=jnp.int32) - 1
    else:
        tile_of = (off[None, :] <= j[:, None]).sum(-1, dtype=jnp.int32) - 1
    tile_of = jnp.clip(tile_of, 0, nt - 1)

    # slot -> lane: rank-th set bit of the tile's mask row
    rank = j - off[tile_of]                                    # [k]
    rows = m[tile_of]                                          # [k, 128] bool
    csum = jnp.cumsum(rows.astype(jnp.int32), axis=-1)         # [k, 128]
    pos = (csum <= rank[:, None]).sum(-1, dtype=jnp.int32)     # [k]
    pos = jnp.minimum(pos, LANES - 1)

    return tile_of * LANES + pos, count
