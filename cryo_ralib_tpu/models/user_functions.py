"""Reference-preparation "user functions".

Equivalent of SPHIRE's ``sp_user_functions.factory`` lookup the drivers do
(``user_func = factory[user_func_name]``, test_mref_gpu_align.py:256 /
test_reffree_gpu_align.py:200).  The only function the reference workloads
use is ``ref_ali2d``: FSC-driven tangent low-pass + optional centering.

``ref_data`` layout matches the reference exactly
(test_mref_gpu_align.py:355 ``ref_data = [mask, center, None, None]``):
  [0] mask, [1] center flag, [2] raw average, [3] fsc curve (freqs, values).
Returns (prepared_average, [cs_x, cs_y]).
"""

from __future__ import annotations

import numpy as np

from ..ops.center import center_2D
from ..ops.filters import filt_tanl
from ..ops.fsc import fit_tanh


def ref_ali2d(ref_data):
    """Tangent low-pass the raw average at the FSC-fitted cutoff; center
    only when the center flag is positive (SPHIRE ``ref_ali2d`` semantics —
    reimplemented, SPHIRE is not a dependency)."""
    _mask, center, tavg, frsc = ref_data
    fl, aa = fit_tanh(frsc)
    out = np.asarray(filt_tanl(np.asarray(tavg, np.float32), fl, aa))
    cs = [0.0, 0.0]
    if center is not None and center > 0:
        out_j, sx, sy = center_2D(out, int(center))
        out = np.asarray(out_j)
        cs = [float(sx), float(sy)]
    return out, cs


def ref_ali2d_no_filter(ref_data):
    """Pass-through variant (useful for deterministic tests)."""
    return np.asarray(ref_data[2], np.float32), [0.0, 0.0]


factory = {
    "ref_ali2d": ref_ali2d,
    "ref_ali2d_no_filter": ref_ali2d_no_filter,
}
