"""Bilinear and quadratic (quadri) image sampling primitives.

These reproduce the two interpolators the reference mixes:

* bilinear with clamp-to-edge — the CUDA texture reads used by the polar
  resampler and the batch transform (``tex2D`` with
  ``cudaFilterModeLinear`` / ``cudaAddressModeClamp``,
  cuda/gpu_aln_noref.cu:2083-2086).  The CUDA version quantizes lerp
  weights to 9-bit fixed point; we use exact float weights.

* ``quadri`` quadratic interpolation with circulant wrap — EMAN2's
  ``rot_scale_trans2D_background`` kernel as ported to CuPy in
  notebook/02_CuPy_Image_Processing_rot_shift2d.ipynb cell 2.

All functions are shape-polymorphic: ``images`` is ``(N, H, W)`` and the
query coordinates are ``(N, ...)`` arrays in *pixel* units (no +0.5 texel
offset — callers add offsets per their convention).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(images, y, x):
    """Clamp-to-edge bilinear sampling.

    Args:
      images: (N, H, W) float array.
      y, x:   (N, M) float pixel coordinates (row, col).
    Returns:
      (N, M) sampled values.
    """
    n, h, w = images.shape
    flat = images.reshape(n, h * w)
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    ix0 = jnp.floor(x).astype(jnp.int32)
    iy0 = jnp.floor(y).astype(jnp.int32)
    ix1 = jnp.minimum(ix0 + 1, w - 1)
    iy1 = jnp.minimum(iy0 + 1, h - 1)
    fx = x - ix0
    fy = y - iy0

    def g(iy, ix):
        return jnp.take_along_axis(flat, iy * w + ix, axis=1)

    v00 = g(iy0, ix0)
    v01 = g(iy0, ix1)
    v10 = g(iy1, ix0)
    v11 = g(iy1, ix1)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def quadri_sample(images, y, x, fallback_y=None, fallback_x=None):
    """EMAN2 ``quadri_background`` quadratic interpolation.

    Matches the CuPy RawKernel port (notebook 02 cell 2): coordinates are
    in EMAN2's 1-based convention internally; here we take 0-based float
    pixel coords and convert.  Out-of-range coordinates fall back to the
    *target* pixel location (``xnew/ynew`` in the kernel) instead of
    wrapping; in-range neighbor lookups wrap circulantly.

    Args:
      images: (N, H, W).
      y, x: (N, M) 0-based float sample coordinates.
      fallback_y, fallback_x: (N, M) 0-based integer fallback coordinates
        (default: floor of y/x clipped in-bounds).
    Returns:
      (N, M) sampled values.
    """
    n, h, w = images.shape
    flat = images.reshape(n, h * w)
    # EMAN2 works in 1-based coords: valid domain is [1, nx+1).
    x1 = x + 1.0
    y1 = y + 1.0
    if fallback_x is None:
        fallback_x = jnp.clip(jnp.round(x), 0, w - 1) + 1.0
    else:
        fallback_x = fallback_x + 1.0
    if fallback_y is None:
        fallback_y = jnp.clip(jnp.round(y), 0, h - 1) + 1.0
    else:
        fallback_y = fallback_y + 1.0
    oob = (x1 < 1.0) | (x1 >= w + 1.0) | (y1 < 1.0) | (y1 >= h + 1.0)
    x1 = jnp.where(oob, fallback_x, x1)
    y1 = jnp.where(oob, fallback_y, y1)

    i = jnp.floor(x1).astype(jnp.int32)
    j = jnp.floor(y1).astype(jnp.int32)
    dx0 = x1 - i
    dy0 = y1 - j

    def wrap_x(ix):
        return jnp.where(ix > w, ix - w, jnp.where(ix < 1, ix + w, ix))

    def wrap_y(iy):
        return jnp.where(iy > h, iy - h, jnp.where(iy < 1, iy + h, iy))

    ip1 = wrap_x(i + 1)
    im1 = wrap_x(i - 1)
    jp1 = wrap_y(j + 1)
    jm1 = wrap_y(j - 1)

    def g(jj, ii):
        # fdata(i,j) = fdata[i-1 + (j-1)*nx]
        return jnp.take_along_axis(flat, (ii - 1) + (jj - 1) * w, axis=1)

    f0 = g(j, i)
    c1 = g(j, ip1) - f0
    c2 = (c1 - f0 + g(j, im1)) * 0.5
    c3 = g(jp1, i) - f0
    c4 = (c3 - f0 + g(jm1, i)) * 0.5
    dxb = dx0 - 1.0
    dyb = dy0 - 1.0
    hxc = jnp.where(dx0 >= 0, 1, -1).astype(jnp.int32)
    hyc = jnp.where(dy0 >= 0, 1, -1).astype(jnp.int32)
    ic = wrap_x(i + hxc)
    jc = wrap_y(j + hyc)
    hxf = hxc.astype(images.dtype)
    hyf = hyc.astype(images.dtype)
    c5 = (g(jc, ic) - f0 - hxf * c1 - (hxf * (hxf - 1.0)) * c2
          - hyf * c3 - (hyf * (hyf - 1.0)) * c4) * (hxf * hyf)
    return f0 + dx0 * (c1 + dxb * c2 + dy0 * c5) + dy0 * (c3 + dyb * c4)
