"""I/O: EMAN2-HDF, MRC, STAR, cryoSPARC, params tables."""

from .eman_hdf import (  # noqa: F401
    get_image_count,
    read_hdf_stack,
    update_headers,
    write_hdf_stack,
    write_image,
)
from .dataset import HDFfile  # noqa: F401
from .mrc import LazyImage, MRCHeader, parse_header, read_mrc, write_mrc  # noqa: F401
from .star import (  # noqa: F401
    Starfile,
    Table,
    csparc_get_particles,
    parse_ctf_star,
    prefix_paths,
    read_params_table,
    write_text_row,
)
