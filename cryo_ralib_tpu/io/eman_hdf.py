"""EMAN2-compatible HDF5 particle-stack I/O.

The EMAN2 on-disk schema (explored by the reference in
cuda/EMAN2_test.ipynb cell 4) stores image ``i`` of a stack at
``/MDF/images/<i>/image`` with per-image header attributes attached to the
``/MDF/images/<i>`` group as ``EMAN.<name>`` scalars, and the stack size at
``/MDF/images`` attr ``imageid_max``.

We read/write that layout with h5py — no EMAN2 dependency.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def _require_h5py():
    if h5py is None:  # pragma: no cover
        raise ImportError("h5py is required for EMAN2-HDF I/O")


def read_hdf_stack(path: str, indices=None):
    """Read an EMAN2 HDF stack.

    Returns (images, headers): images (N, H, W) float32, headers a list of
    dicts with the ``EMAN.`` prefix stripped.
    """
    _require_h5py()
    with h5py.File(path, "r") as f:
        grp = f["MDF"]["images"]
        if indices is None:
            count = int(grp.attrs.get("imageid_max", len(grp) - 1)) + 1
            indices = range(count)
        images = []
        headers = []
        for i in indices:
            g = grp[str(int(i))]
            images.append(np.asarray(g["image"], np.float32))
            hdr = {}
            for k, v in g.attrs.items():
                key = k[5:] if k.startswith("EMAN.") else k
                if isinstance(v, bytes):
                    v = v.decode("utf-8", "replace")
                elif isinstance(v, np.ndarray):
                    v = v.tolist()
                elif isinstance(v, np.generic):
                    v = v.item()
                hdr[key] = v
            headers.append(hdr)
    return np.stack(images), headers


def get_image_count(path: str) -> int:
    """EMAN2 ``EMUtil.get_image_count`` equivalent."""
    _require_h5py()
    with h5py.File(path, "r") as f:
        grp = f["MDF"]["images"]
        return int(grp.attrs.get("imageid_max", len(grp) - 1)) + 1


def _encode_attr(v: Any):
    if isinstance(v, bool):
        return np.int32(v)
    if isinstance(v, (int, np.integer)):
        return np.int32(v)
    if isinstance(v, (float, np.floating)):
        return np.float32(v)
    if isinstance(v, str):
        return v
    if isinstance(v, (list, tuple, np.ndarray)):
        arr = np.asarray(v)
        if arr.dtype.kind in "if":
            return arr.astype(np.float32)
        return json.dumps(list(v))
    if isinstance(v, dict):
        return json.dumps(v)
    return str(v)


def write_hdf_stack(path: str, images, headers=None, append: bool = False):
    """Write/append images to an EMAN2-layout HDF stack.

    Args:
      images: (N, H, W) or (H, W) array.
      headers: optional list of per-image attr dicts (stored as
        ``EMAN.<key>``).
      append: append after the current ``imageid_max`` instead of
        truncating (the drivers append one class average per iteration to
        ``aqc.hdf``-style files).
    """
    _require_h5py()
    images = np.asarray(images, np.float32)
    if images.ndim == 2:
        images = images[None]
    n = images.shape[0]
    if headers is None:
        headers = [{} for _ in range(n)]

    mode = "a" if (append and os.path.exists(path)) else "w"
    with h5py.File(path, mode) as f:
        mdf = f.require_group("MDF")
        grp = mdf.require_group("images")
        start = int(grp.attrs.get("imageid_max", -1)) + 1 if mode == "a" else 0
        for i in range(n):
            g = grp.require_group(str(start + i))
            if "image" in g:
                del g["image"]
            g.create_dataset("image", data=images[i])
            hdr = dict(headers[i])
            hdr.setdefault("nx", images.shape[2])
            hdr.setdefault("ny", images.shape[1])
            hdr.setdefault("nz", 1)
            for k, v in hdr.items():
                g.attrs["EMAN." + k] = _encode_attr(v)
        grp.attrs["imageid_max"] = np.int32(start + n - 1)


def write_image(path: str, image, index: int | None = None, header=None):
    """EMAN2 ``EMData.write_image`` equivalent: write one image at a slot
    (creating/extending the stack file)."""
    _require_h5py()
    image = np.asarray(image, np.float32)
    exists = os.path.exists(path)
    with h5py.File(path, "a" if exists else "w") as f:
        mdf = f.require_group("MDF")
        grp = mdf.require_group("images")
        cur = int(grp.attrs.get("imageid_max", -1))
        idx = cur + 1 if index is None else int(index)
        g = grp.require_group(str(idx))
        if "image" in g:
            del g["image"]
        g.create_dataset("image", data=image)
        hdr = dict(header or {})
        hdr.setdefault("nx", image.shape[1])
        hdr.setdefault("ny", image.shape[0])
        hdr.setdefault("nz", 1)
        for k, v in hdr.items():
            g.attrs["EMAN." + k] = _encode_attr(v)
        grp.attrs["imageid_max"] = np.int32(max(cur, idx))


def update_headers(path: str, updates: list[dict], indices=None):
    """Write-back of header attributes (the bdb_cuda variant's
    ``write_attr`` path, test_mref_cheng_yu_bdb_cuda.py:114-210)."""
    _require_h5py()
    with h5py.File(path, "a") as f:
        grp = f["MDF"]["images"]
        if indices is None:
            indices = range(len(updates))
        for upd, i in zip(updates, indices):
            g = grp[str(int(i))]
            for k, v in upd.items():
                g.attrs["EMAN." + k] = _encode_attr(v)
