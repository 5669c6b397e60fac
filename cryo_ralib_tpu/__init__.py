"""cryo_ralib_tpu — TPU-native 2D cryo-EM particle alignment.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
phonchi/Cryo-RAlib (GPU-accelerated multireference and reference-free 2D
alignment for cryo-EM): polar ring resampling, FFT rotational
cross-correlation with mirror search over an x/y shift grid,
argmax + parabolic angle refinement, batch rotate/shift transforms,
even/odd class-average accumulation with FSC-driven reference filtering —
designed TPU-first (fused scan over the shift grid, MXU one-hot class
sums, `shard_map`/psum data parallelism over the particle axis).
"""

from .config import AlignConfig  # noqa: F401
from .params import AlignParams  # noqa: F401

__version__ = "0.1.0"
