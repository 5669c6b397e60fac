"""Aligned-dataset bundle: particle stack + 2D alignment params table.

Equivalent of the reference's ``HDFfile`` (src/utils_ralib.py:22-54):
pairs an EMAN2-HDF (or MRC) particle stack with the whitespace params
table ``idx angle_psi shift_x shift_y mirror class`` that the alignment
CLIs emit, for the EDA workflow of notebook 03.
"""

from __future__ import annotations

import numpy as np

from .eman_hdf import read_hdf_stack
from .mrc import read_mrc
from .star import PARAMS_HEADERS, Table, read_params_table


class HDFfile:
    """Stack path + params Table (pandas-free)."""

    def __init__(self, headers, df: Table, images: str):
        self.headers = headers
        self.df = df
        self.images = images

    @classmethod
    def load(cls, hdffile: str, params_file: str) -> "HDFfile":
        return cls(PARAMS_HEADERS, read_params_table(params_file), hdffile)

    def get_particles(self, lazy: bool = False) -> np.ndarray:
        """Read the full stack as (N, H, W) float32 (the reference's
        EMData.read_images path; ``lazy`` kept for API parity — HDF
        slicing is already lazy at the h5py level)."""
        del lazy
        if self.images.lower().endswith((".mrc", ".mrcs")):
            return read_mrc(self.images)
        imgs, _headers = read_hdf_stack(self.images)
        return imgs

    def aligned_particles(self) -> np.ndarray:
        """Apply the params table to the stack (the notebook-03 step of
        reconstructing aligned images before MPCA/TwoSDR)."""
        import jax.numpy as jnp

        from ..ops.transform import rot_shift2d

        imgs = self.get_particles()
        df = self.df
        out = rot_shift2d(
            jnp.asarray(imgs),
            jnp.asarray(np.asarray(df["angle_psi"], np.float32)),
            jnp.asarray(np.asarray(df["shift_x"], np.float32)),
            jnp.asarray(np.asarray(df["shift_y"], np.float32)),
            mirror=jnp.asarray(np.asarray(df["mirror"], np.int32)))
        return np.asarray(out)

    def write(self, out_path: str):
        """Write the params table back out."""
        cols = [np.asarray(self.df[h]) for h in self.headers if h in self.df]
        rows = np.stack(cols, axis=1)
        from .star import write_text_row

        write_text_row(rows, out_path)
