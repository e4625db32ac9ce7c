"""CLAHE (contrast-limited adaptive histogram equalization) on device.

Replaces cv2.createCLAHE(clipLimit, tileGridSize).apply(L) used by the
enhanced preprocessing preset (reference infer_enhanced_burr.py:50-52) and the
grayscale-frame enhancer (reference src/refactor/preprocess.py:44-50).

Implements OpenCV's exact algorithm as fixed-shape XLA ops:
  1. pad right/bottom with BORDER_REFLECT_101 to a multiple of the tile grid
  2. per-tile 256-bin histogram via one scatter-add (tile_id*256 + value)
  3. integer clip + excess redistribution (redistBatch to every bin, residual
     +1 every `max(256//residual, 1)`-th bin — cv2's residual loop, vectorized)
  4. LUT = round_half_even(cdf * 255 / tileArea)
  5. per-pixel bilinear blend of the 4 surrounding tile LUTs with cv2's
     half-pixel tile coordinates and edge clamping

This is a designated Pallas-kernel candidate (per-tile histograms in VMEM
scratch); the XLA scatter version here is the correctness reference.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

_BINS = 256


def _clahe_single(img: jnp.ndarray, tiles_y: int, tiles_x: int, clip_limit: float) -> jnp.ndarray:
    H, W = img.shape
    pad_h = (tiles_y - H % tiles_y) % tiles_y
    pad_w = (tiles_x - W % tiles_x) % tiles_x
    x = img.astype(jnp.int32)
    if pad_h or pad_w:
        x = jnp.pad(x, [(0, pad_h), (0, pad_w)], mode="reflect")
    ph, pw = H + pad_h, W + pad_w
    th, tw = ph // tiles_y, pw // tiles_x
    tile_area = th * tw
    n_tiles = tiles_y * tiles_x

    # --- per-tile histograms, scatter-free: reshape into tiles and count by
    # one-hot comparison (TPU scatter is ~1000x slower than dense VPU compares)
    tiles = x.reshape(tiles_y, th, tiles_x, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(n_tiles, tile_area)
    bins = jnp.arange(_BINS, dtype=jnp.int32)
    hist = jnp.sum(tiles[:, :, None] == bins[None, None, :], axis=1,
                   dtype=jnp.int32)                                  # (T, 256)

    # --- clip + redistribute (cv2 integer semantics)
    clip = max(int(clip_limit * tile_area / _BINS), 1)
    clipped = jnp.sum(jnp.maximum(hist - clip, 0), axis=1)          # (T,)
    hist = jnp.minimum(hist, clip)
    redist = clipped // _BINS
    residual = clipped - redist * _BINS                             # in [0, 256)
    hist = hist + redist[:, None]
    step = jnp.maximum(_BINS // jnp.maximum(residual, 1), 1)        # (T,)
    bins = jnp.arange(_BINS, dtype=jnp.int32)[None, :]
    bump = jnp.logical_and(bins % step[:, None] == 0,
                           bins // step[:, None] < residual[:, None])
    hist = hist + bump.astype(jnp.int32)

    # --- LUT: saturate_cast<uchar>(cvRound(cdf * lutScale))
    lut_scale = float(_BINS - 1) / tile_area
    cdf = jnp.cumsum(hist, axis=1).astype(jnp.float32)
    lut = jnp.clip(jnp.rint(cdf * lut_scale), 0, 255).astype(jnp.int32)  # (T, 256)

    # --- bilinear interpolation between 4 tile LUTs (cv2 half-pixel coords)
    def axis_coords(n, tile, ntiles):
        f = (np.arange(n, dtype=np.float64) + 0.0) / tile - 0.5
        i1 = np.floor(f).astype(np.int64)
        a = (f - i1).astype(np.float32)
        i2 = np.minimum(i1 + 1, ntiles - 1)
        i1u = i1
        i1 = np.maximum(i1, 0)
        return i1, i2, a, i1u

    ty1, ty2, ya, _ = axis_coords(H, th, tiles_y)
    tx1, tx2, xa, _ = axis_coords(W, tw, tiles_x)
    ya_c = jnp.asarray(ya)[:, None]
    xa_c = jnp.asarray(xa)[None, :]

    val = x[:H, :W]  # padded area never read

    if th % 2 == 0 and tw % 2 == 0:
        # Fast path: within each tile QUADRANT the 4 corner tiles are
        # constant (ty1 = (qy-1)//2 clamped, cv2 coords), so LUT application
        # becomes a one-hot (P, 256) @ (256, 4) MXU matmul per quadrant —
        # avoiding the per-pixel gather, which costs ~9 ns/element on TPU
        # and dominated the whole enhance preset.
        res = _interp_quadrant(val, lut, H, W, th, tw, tiles_y, tiles_x,
                               ya_c, xa_c)
    else:
        lutf = lut.reshape(-1)

        def gather(tyi, txi):
            t = jnp.asarray(tyi)[:, None] * tiles_x + jnp.asarray(txi)[None, :]
            return lutf[t * _BINS + val].astype(jnp.float32)

        res = (gather(ty1, tx1) * (1 - xa_c) * (1 - ya_c)
               + gather(ty1, tx2) * xa_c * (1 - ya_c)
               + gather(ty2, tx1) * (1 - xa_c) * ya_c
               + gather(ty2, tx2) * xa_c * ya_c)
    return jnp.clip(jnp.rint(res), 0, 255)


def _interp_quadrant(val, lut, H, W, th, tw, tiles_y, tiles_x, ya_c, xa_c):
    """Quadrant-blocked LUT interpolation (even tile dims).

    For pixel row y in quadrant-row qy (height th/2), the unclamped upper
    tile index is floor(y/th - 0.5) == (qy - 1) // 2 — constant per quadrant.
    Gather 4 corner LUTs per quadrant (static indices), one-hot-matmul the
    quadrant's pixels against them, then bilinear-blend with the per-pixel
    weights."""
    th2, tw2 = th // 2, tw // 2
    qh = -(-H // th2)          # quadrant-rows covering the un-padded image
    qw = -(-W // tw2)
    # pad val to quadrant multiples (values irrelevant, cropped later)
    vp = jnp.pad(val, [(0, qh * th2 - H), (0, qw * tw2 - W)]).astype(jnp.int32)

    qy = np.arange(qh)
    ty1 = np.clip((qy - 1) // 2, 0, tiles_y - 1)
    ty2 = np.clip((qy - 1) // 2 + 1, 0, tiles_y - 1)
    qx = np.arange(qw)
    tx1 = np.clip((qx - 1) // 2, 0, tiles_x - 1)
    tx2 = np.clip((qx - 1) // 2 + 1, 0, tiles_x - 1)
    corners = np.stack([
        ty1[:, None] * tiles_x + tx1[None, :],
        ty1[:, None] * tiles_x + tx2[None, :],
        ty2[:, None] * tiles_x + tx1[None, :],
        ty2[:, None] * tiles_x + tx2[None, :],
    ], axis=-1)                                       # (qh, qw, 4) static
    lut4 = lut[jnp.asarray(corners)].astype(jnp.float32)  # (qh, qw, 4, 256)

    q = vp.reshape(qh, th2, qw, tw2).transpose(0, 2, 1, 3).reshape(qh, qw, -1)
    onehot = (q[..., None] == jnp.arange(_BINS, dtype=jnp.int32)).astype(jnp.float32)
    vals4 = jnp.einsum("qrpc,qrkc->qrpk", onehot, lut4,
                       preferred_element_type=jnp.float32)  # (qh, qw, P, 4)
    vals4 = vals4.reshape(qh, qw, th2, tw2, 4).transpose(0, 2, 1, 3, 4)
    vals4 = vals4.reshape(qh * th2, qw * tw2, 4)[:H, :W]

    w11 = (1 - xa_c) * (1 - ya_c)
    w12 = xa_c * (1 - ya_c)
    w21 = (1 - xa_c) * ya_c
    w22 = xa_c * ya_c
    return (vals4[..., 0] * w11 + vals4[..., 1] * w12
            + vals4[..., 2] * w21 + vals4[..., 3] * w22)


def clahe(img: jnp.ndarray, clip_limit: float = 3.0,
          tile_grid: Sequence[int] = (8, 8)) -> jnp.ndarray:
    """cv2 CLAHE parity on (..., H, W) uint8-valued arrays.

    Returns float32 with integer values in [0, 255] (cast yourself if a uint8
    array is needed). `tile_grid` is (tilesX, tilesY) like cv2.
    """
    tiles_x, tiles_y = int(tile_grid[0]), int(tile_grid[1])
    lead = img.shape[:-2]
    fn = lambda im: _clahe_single(im, tiles_y, tiles_x, clip_limit)
    if not lead:
        return fn(img)
    out = jax.vmap(fn)(img.reshape((-1,) + img.shape[-2:]))
    return out.reshape(lead + out.shape[1:])
