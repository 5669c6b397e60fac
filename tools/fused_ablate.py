"""Stage-ablation benchmark for the production fused search kernel.

Times `fused_search` (ops/fused_search.py) and stage-disabled variants
of the same banded kernel to re-rank bottlenecks after each landed
optimization — the measure-first protocol that produced the r2 kernel
history recorded in STATUS.md / docs/benchmarks.md (333 -> 179 ms per
8192-particle K=8 S=49 search on v5e).

Not a test.  Run on the TPU machine:

    timeout 560 python tools/fused_ablate.py [stages...]

Stages: full (the real kernel), plus ablations — no_ccf (skip
DFT+ccf+Nyquist), no_yred (y-tent contraction replaced by a slice),
sample_only (x-matmul + y-reduce + polar writes only).  Deltas are NOT
additive (the VPU and MXU overlap); use them to rank, not to budget.

End-of-r2 map (8192 particles, K=8, S=49, v5e): full 181.8 ms,
no_ccf 87.5, no_yred 132.1, sample_only 83.0 — the DFT+ccf block
(~94 ms, dominated by the 4 accumulator RMW streams per ring) is the
top r3 target, the y-tent contraction (~50 ms) second; the x-tent
matmul is near its MXU floor (~43 ms, fully overlapped).

Graveyard (measured slower or flat; kept out of the kernel):
slab-streamed y-reduction, row-major polar + one-DFT-per-block,
register-combined ring accumulation (multi-MB "register" temporaries
spill), ring-pair-combined ccf RMW, NT=16/32 tiles, 6/9/18 y-band
classes, a 4->3 shear-pass merge in transform_batch_mm, and a fused
Pallas transform kernel (all four shear passes in VMEM): both a
per-particle-dot variant (80 ms) and a tile-batched block-diagonal
variant (94 ms) lost to the XLA 4-pass pipeline (45 ms) on v5e — the
XLA giant-matmul shapes beat VMEM locality for this op.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cryo_ralib_tpu.config import AlignConfig
from cryo_ralib_tpu.ops.search import prepare_ref_spectra
from cryo_ralib_tpu.params import AlignParams

fs = importlib.import_module("cryo_ralib_tpu.ops.fused_search")
NT, L = fs.NT, fs.L

NX, K, N = 90, 8, 8192
cfg = AlignConfig(img_dim=NX, ring_num=36, ring_len=256, shift_step=1.0,
                  shift_rng_x=3.0, shift_rng_y=3.0)


def _ablated_kernel(mode):
    """The production _kernel_banded2 with a stage disabled."""
    real = fs._kernel_banded2

    def kern(img_ref, wxt_ref, *rest, n_dx, n_dy, n_ref, rpb, q_b, classes):
        if mode == "full":
            return real(img_ref, wxt_ref, *rest, n_dx=n_dx, n_dy=n_dy,
                        n_ref=n_ref, rpb=rpb, q_b=q_b, classes=classes)
        nc = len(classes)
        wyt_refs = rest[:2 * nc]
        (dft_ref, ref_ref, rny_ref, oh_ref, irf_ref, prio_ref, out_ref,
         polar_scr, nyq_scr, acc_o, acc_m, rows_scr) = rest[2 * nc:]
        n_rows = n_dx * n_dy * NT
        acc_o[:] = jnp.zeros_like(acc_o)
        acc_m[:] = jnp.zeros_like(acc_m)
        nyq_scr[:] = jnp.zeros_like(nyq_scr)
        for cls_idx, (start, sz, y0, bh,
                      a_off, a_wh, b_off, b_wh) in enumerate(classes):
            wyt_a = wyt_refs[2 * cls_idx]
            wyt_b = wyt_refs[2 * cls_idx + 1]
            img_band = img_ref[:, y0:y0 + bh, :].astype(jnp.bfloat16)
            img_flat = img_band.reshape(NT * bh, 128)

            def body(rbl, _, start=start, bh=bh, wyt_a=wyt_a, wyt_b=wyt_b,
                     a_off=a_off, a_wh=a_wh, b_off=b_off, b_wh=b_wh,
                     img_flat=img_flat):
                rb = start + rbl
                for c in range(n_dx):
                    u = jnp.dot(img_flat, wxt_ref[rb, c],
                                preferred_element_type=jnp.float32)
                    u = u.reshape(NT, bh, q_b)
                    for d in range(n_dy):
                        base = (c * n_dy + d) * NT
                        for (wyt_ch, off, wh, ch) in (
                                (wyt_a, a_off, a_wh, 0),
                                (wyt_b, b_off, b_wh, 1)):
                            for rr in range(rpb):
                                lane0 = rr * L + ch * 128
                                if mode == "no_yred":
                                    pol = u[:, 0, lane0:lane0 + 128]
                                else:
                                    w = wyt_ch[rbl, d, :,
                                               rr * 128:(rr + 1) * 128]
                                    pol = jnp.sum(
                                        u[:, off:off + wh,
                                          lane0:lane0 + 128]
                                        * w.astype(jnp.float32)[None],
                                        axis=1)
                                polar_scr[base:base + NT,
                                          lane0:lane0 + 128] = pol
                    del u
                if mode in ("no_ccf", "sample_only"):
                    return 0
                for rr in range(rpb):
                    ring = rb * rpb + rr
                    rows = polar_scr[:, rr * L:(rr + 1) * L]
                    spec = jnp.dot(rows.astype(jnp.bfloat16), dft_ref[:],
                                   preferred_element_type=jnp.float32)
                    s_re = spec[:, :128]
                    s_im = spec[:, 128:256]
                    oh = oh_ref[pl.ds(ring, 1)][0][None, :]
                    nyq_scr[:, :] += spec[:, 256:257] * oh
                    r = ref_ref[pl.ds(ring, 1)]
                    r_re = r[0, :, :128].reshape(n_ref, 1, 128)
                    r_im = r[0, :, 128:].reshape(n_ref, 1, 128)
                    a = s_re[None] * r_re
                    b = s_im[None] * r_im
                    ct = s_re[None] * r_im
                    dt = s_im[None] * r_re
                    acc_o[:, :, :128] += a + b
                    acc_o[:, :, 128:] += ct - dt
                    acc_m[:, :, :128] += a - b
                    acc_m[:, :, 128:] += -(ct + dt)
                return 0

            jax.lax.fori_loop(0, sz, body, 0)

        # minimal finalize so every variant produces an output
        n_e = 2 * n_dx * n_dy * n_ref
        if mode != "sample_only":
            c_ny = jnp.dot(nyq_scr[:], rny_ref[:],
                           preferred_element_type=jnp.float32)
            lane_l = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
            alt = jnp.where(lane_l % 2 == 0, 1.0 / L, -1.0 / L)
            for m, acc in ((0, acc_o), (1, acc_m)):
                for kk in range(n_ref):
                    rows = jnp.dot(acc[kk].astype(jnp.bfloat16), irf_ref[:],
                                   preferred_element_type=jnp.float32)
                    rows_scr[(m * n_ref + kk) * n_rows:
                             (m * n_ref + kk + 1) * n_rows, :] = \
                        rows + c_ny[:, kk:kk + 1] * alt
        allr = rows_scr[:].reshape(n_e, NT, L)
        out_ref[0, :, :128] = jnp.max(allr, axis=0)[:, :128]
        out_ref[0, :, 128:] = jnp.zeros((NT, L), jnp.float32)

    return kern


def main():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((N, NX, NX)).astype(np.float32))
    refs = jnp.asarray(rng.standard_normal((K, NX, NX)).astype(np.float32))
    params = AlignParams.zeros(N)
    tables = fs.FusedTables(cfg)
    rfw = jax.jit(lambda r: prepare_ref_spectra(r, cfg))(refs)

    modes = sys.argv[1:] or ["full", "no_ccf", "no_yred", "sample_only"]
    orig = fs._kernel_banded2
    for mode in modes:
        fs._build_banded2.cache_clear()
        fs._kernel_banded2 = _ablated_kernel(mode)
        try:
            fn = jax.jit(lambda i, r: fs.fused_search(i, r, params, cfg,
                                                      tables=tables))
            out = fn(imgs, rfw)
            np.asarray(out.best_val)
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(imgs, rfw)
                np.asarray(out.best_val)
            dt = (time.perf_counter() - t0) / 3
            print(f"{mode:12s}: {dt*1e3:7.1f} ms  ({N/dt:8.0f} pps)")
        finally:
            fs._kernel_banded2 = orig
    fs._build_banded2.cache_clear()


if __name__ == "__main__":
    main()
