"""Even/odd class-average accumulation.

Equivalent of the reference's two accumulation paths — the CuPy
``kernel_sum_oe`` zero-copy sums (test_mref_gpu_align.py:48-80) and the
CUDA ``cu_average_batch[_m]`` kernels (cuda/gpu_aln_noref.cu:1199-1274).

On TPU the per-class masked sums become a single one-hot matmul over the
particle axis (MXU work, no dynamic boolean gathers), which is also the
shape that ``psum``s cleanly across a particle-sharded mesh.

Parity convention: even/odd by the particle's *global stack index* parity
(``(start+img_idx)%2`` in ``cu_average_batch_m``; the CuPy path uses
batch-local parity, which coincides whenever batch starts are even).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def class_sum_oe(images, ref_id, n_classes: int, global_index=None, valid=None):
    """Per-class even/odd image sums and member counts.

    Args:
      images: (N, H, W) transformed (aligned) particles.
      ref_id: (N,) int32 class assignment.
      n_classes: static K.
      global_index: (N,) int32 global particle indices for parity;
        defaults to arange(N).
      valid: optional (N,) 0/1 mask excluding padding particles (stacks
        padded up to a multiple of the device-mesh size).

    Returns:
      sums:   (K, 2, H, W) float32 — [:, 0] even-parity sum, [:, 1] odd.
      counts: (K,) int32 class member counts (``get_num_ref`` equivalent,
              cuda/gpu_aln_noref.cu:384-386).
    """
    n, h, w = images.shape
    if global_index is None:
        global_index = jnp.arange(n, dtype=jnp.int32)
    parity = jnp.asarray(global_index, jnp.int32) % 2
    slot = ref_id * 2 + parity  # (N,) in [0, 2K)
    onehot = jax.nn.one_hot(slot, n_classes * 2, dtype=images.dtype)
    class_onehot = jax.nn.one_hot(ref_id, n_classes, dtype=jnp.int32)
    if valid is not None:
        onehot = onehot * jnp.asarray(valid, images.dtype)[:, None]
        class_onehot = class_onehot * jnp.asarray(valid, jnp.int32)[:, None]
    # HIGHEST: class sums must accumulate in f32 on the MXU — the default
    # TPU bf16 passes visibly perturb the averages
    sums = jnp.einsum("nc,nhw->chw", onehot, images,
                      precision=jax.lax.Precision.HIGHEST)
    counts = jnp.sum(class_onehot, axis=0)
    return sums.reshape(n_classes, 2, h, w), counts
