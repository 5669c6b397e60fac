"""Image centering utilities (SPHIRE ``center_2D`` equivalents).

In the active reference paths only two centering modes matter:
* the reffree driver's "average centering method" (``center == -1``): the
  mean per-particle shift is subtracted from the new reference via
  ``fshift`` (test_reffree_gpu_align.py:403-410) — that lives in the
  driver, not here;
* ``ref_ali2d`` calls ``center_2D(tavg, method)`` only when the CLI
  ``--center`` flag is > 0.

Here we provide a center-of-gravity method (SPHIRE's phase_cog-style
centering) for the >0 case.
"""

from __future__ import annotations

import jax.numpy as jnp

from .filters import fshift


def center_of_gravity(img):
    """(sx, sy) center-of-gravity displacement of the positive part of the
    image relative to the EMAN2 center (h//2, w//2)."""
    img = jnp.asarray(img)
    h, w = img.shape[-2:]
    pos = jnp.maximum(img, 0.0)
    total = jnp.sum(pos, axis=(-2, -1))
    yy = jnp.arange(h, dtype=img.dtype)
    xx = jnp.arange(w, dtype=img.dtype)
    cy = jnp.sum(pos * yy[:, None], axis=(-2, -1)) / jnp.maximum(total, 1e-20)
    cx = jnp.sum(pos * xx[None, :], axis=(-2, -1)) / jnp.maximum(total, 1e-20)
    return cx - w // 2, cy - h // 2


def center_2D(img, method: int = 1):
    """Center an image; returns (centered_image, sx, sy) where (sx, sy) is
    the applied correction shift (image shifted by (-sx, -sy))."""
    if method <= 0:
        return jnp.asarray(img), 0.0, 0.0
    sx, sy = center_of_gravity(img)
    return fshift(img, -sx, -sy), sx, sy
