"""Circular masks and mask-based normalization.

Equivalents of EMAN2/SPHIRE ``model_circle`` and the
``normalize.mask`` processor used by both reference drivers to condition
references (sigma-normalized) and particles (mean-subtracted only):
reference usage at test_mref_gpu_align.py:333-349 and
test_reffree_gpu_align.py:273-279.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def model_circle(radius: float, nx: int, ny: int | None = None) -> np.ndarray:
    """Binary disk of given radius centered at the EMAN2 image center.

    EMAN2's center convention for even sizes is ``nx//2`` in 0-indexed
    pixels (SPIDER's cnx = nx//2+1 in 1-indexed coords,
    test_mref_gpu_align.py:325 ``cny = cnx = nx/2+1``).
    """
    ny = nx if ny is None else ny
    cy, cx = ny // 2, nx // 2
    yy, xx = np.mgrid[0:ny, 0:nx]
    r2 = (yy - cy) ** 2 + (xx - cx) ** 2
    return (r2 <= radius * radius).astype(np.float32)


def infomask(img, mask):
    """(mean, sigma) of pixels under a binary mask (EMAN2 ``Util.infomask``
    semantics, used at test_reffree_gpu_align.py:276)."""
    m = jnp.asarray(mask)
    x = jnp.asarray(img)
    cnt = jnp.sum(m)
    mean = jnp.sum(x * m, axis=(-2, -1)) / cnt
    var = jnp.sum((x - mean[..., None, None]) ** 2 * m, axis=(-2, -1)) / cnt
    return mean, jnp.sqrt(jnp.maximum(var, 0.0))


def normalize_mask(img, mask, no_sigma: bool = False):
    """EMAN2 ``normalize.mask`` processor.

    Subtract the mean under ``mask`` from the whole image; unless
    ``no_sigma``... note EMAN2 semantics: ``no_sigma=1`` means *only*
    mean-subtract, ``no_sigma=0`` additionally divides by the sigma under
    the mask (references are normalized to N(0,1) with no_sigma=1 at
    test_mref_gpu_align.py:337, particles mean-subtracted with no_sigma=0
    at :344).

    EMAN2's NormalizeMaskProcessor: with no_sigma set, only the mean is
    removed; otherwise the image is scaled to unit sigma as well.
    Works on (..., H, W) batches.
    """
    mean, sigma = infomask(img, mask)
    out = jnp.asarray(img) - mean[..., None, None]
    if not no_sigma:
        safe = jnp.where(sigma > 0, sigma, 1.0)
        out = out / safe[..., None, None]
    return out
