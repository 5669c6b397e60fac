"""Exploratory-analysis layer: CTF, poses, dimensionality reduction,
clustering metrics, plots (the reference's ``src/utils_ralib.py``
analysis surface, SURVEY.md §2.2 P8/P9)."""

from .ctf import compute_ctf, ctf_freqs, print_ctf_params  # noqa: F401
from .poses import (  # noqa: F401
    R_from_eman,
    R_from_relion,
    parse_pose_hdf,
    parse_pose_star,
)
from .reduction import MPCA, TwoSDR  # noqa: F401
from .metrics import c_purity_score, matlab2py, purity_score  # noqa: F401
