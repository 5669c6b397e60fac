"""Batch image transforms: apply alignment parameters / rot_shift2D.

Two interpolation flavors, matching the two the reference mixes:

* ``transform_batch`` — bilinear inverse-map, exactly
  ``cu_transform_batch`` (cuda/gpu_aln_noref.cu:1145-1197).  Used inside
  the alignment loop to build class averages.

* ``rot_shift2d`` — EMAN2 ``rot_scale_trans2D_background`` with *quadri*
  interpolation, the public batch transform op of notebook 02
  (``rot_shift_2d_cupy``); claimed ~5x vs CPU in README.md:62.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import AlignParams
from .interp import bilinear_sample, quadri_sample


def transform_batch(images, params: AlignParams):
    """Apply (mirror -> rotate -> shift) inverse mapping, bilinear.

    Per target pixel p the source coordinate is computed exactly as in
    ``cu_transform_batch``:
      1. mirror:  src_x = nx - x (if mirror),
      2. rotate by +angle about (nx/2, ny/2),
      3. add (shift_x, shift_y),
    then a clamp-to-edge bilinear read (texture +0.5 offset cancels).

    Args:
      images: (N, H, W); params: AlignParams with (N,) fields.
    Returns:
      (N, H, W) transformed images.
    """
    n, h, w = images.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=images.dtype), jnp.arange(w, dtype=images.dtype),
        indexing="ij",
    )
    xx = xx.reshape(1, -1)
    yy = yy.reshape(1, -1)
    mirror = params.mirror[:, None].astype(images.dtype)
    src_x = jnp.where(mirror == 1.0, w - xx, xx)
    src_y = jnp.broadcast_to(yy, (n, h * w))

    ang = jnp.deg2rad(params.angle)[:, None]
    c, s = jnp.cos(ang), jnp.sin(ang)
    ctr_x = w // 2
    ctr_y = h // 2
    ux = src_x - ctr_x
    uy = src_y - ctr_y
    rx = ux * c - uy * s + ctr_x + params.shift_x[:, None]
    ry = ux * s + uy * c + ctr_y + params.shift_y[:, None]
    out = bilinear_sample(images, ry, rx)
    return out.reshape(n, h, w)


def rot_shift2d(images, angles, sx, sy, mirror=None, scale=None):
    """EMAN2 ``rot_shift2D`` with quadri-background interpolation, batched.

    Forward semantics: rotate by ``angle`` degrees about the center, shift
    by (sx, sy); mirror flips columns afterwards, leaving column 0 fixed
    for even sizes (``start = 1 - h % 2``) — the exact post-flip of the
    CuPy wrapper (notebook 02 cell 2).

    Args:
      images: (N, H, W).
      angles, sx, sy: (N,) float arrays (degrees / pixels).
      mirror: optional (N,) 0/1.
      scale: optional (N,) scale factors (default 1).
    Returns:
      (N, H, W).
    """
    n, h, w = images.shape
    angles = jnp.asarray(angles, images.dtype)
    sx = jnp.asarray(sx, images.dtype)
    sy = jnp.asarray(sy, images.dtype)
    if scale is None:
        scale = jnp.ones((n,), images.dtype)
    else:
        scale = jnp.asarray(scale, images.dtype)
        scale = jnp.where(scale == 0.0, 1.0, scale)

    sx = _restrict2(sx, w)
    sy = _restrict2(sy, h)

    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=images.dtype), jnp.arange(w, dtype=images.dtype),
        indexing="ij",
    )
    xx = xx.reshape(1, -1)
    yy = yy.reshape(1, -1)

    ang = jnp.deg2rad(angles)[:, None]
    cang, sang = jnp.cos(ang), jnp.sin(ang)
    xc = w // 2
    yc = h // 2
    shiftxc = xc + sx[:, None]
    shiftyc = yc + sy[:, None]
    inv_scale = 1.0 / scale[:, None]

    y = yy - shiftyc
    ycang = y * cang * inv_scale + yc
    ysang = -y * sang * inv_scale + xc
    x = xx - shiftxc
    xold = x * cang * inv_scale + ysang
    yold = x * sang * inv_scale + ycang

    out = quadri_sample(
        images, yold, xold,
        fallback_y=jnp.broadcast_to(yy, yold.shape),
        fallback_x=jnp.broadcast_to(xx, xold.shape),
    ).reshape(n, h, w)

    if mirror is not None:
        start = 1 - h % 2
        flipped = out.at[:, :, start:].set(jnp.flip(out[:, :, start:], axis=2))
        out = jnp.where(jnp.asarray(mirror).reshape(n, 1, 1) == 1, flipped, out)
    return out


def _restrict2(v, size):
    """EMAN2 ``restrict2``: ``while (x >= nx) x -= nx; while (x <= -nx) x += nx``
    (notebook 02 kernel).  For x >= nx this lands in [0, nx) (i.e. x mod nx);
    for x <= -nx it lands in (-nx, 0]."""
    size = float(size)
    v = jnp.where(v >= size, jnp.mod(v, size), v)
    v = jnp.where(v <= -size, -jnp.mod(-v, size), v)
    return v
