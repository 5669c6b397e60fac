"""Stage-ablation benchmark for the production fused search kernel.

Times `fused_search` (ops/fused_search.py) and stage-disabled variants
of the same banded kernel to re-rank bottlenecks after each landed
optimization — the measure-first protocol that produced the r2 kernel
history recorded in STATUS.md / docs/benchmarks.md (333 -> 179 ms per
8192-particle K=8 S=49 search on v5e).

The stage flags live INSIDE the production kernel
(`_kernel_banded2(stage=...)`, threaded via `fused_search(_stage=...)`),
so the ablations always time the real kernel body — no hand-copied twin
to desynchronize (ADVICE r2).

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

End-of-r3 map (same workload, raw4 kernel): full 178.2 ms,
no_ccf 92.6, no_yred 130.5, sample_only 83.2 — raw4 shaved the ccf
block to ~86 ms; both remaining stages sit near their VPU floors.

Large-K map (r4, N=4096, S=49, v5e, one session; ~26 ms dispatch tax
included in each row — it cancels in the deltas).  K=32 (one kernel,
kc=33): full 136.8, no_ccf 62.6, no_yred 109.0, sample_only 53.6.
K=64 (chunks 33+31): full 246.2, sample_only 78.2.  Decomposition:
K-independent sampling ~28 ms compute per kernel pass, finalize
(2K irfft matmuls + argmax) ~9 ms at K=32, and the ccf accumulate is
everything else — ~74 ms at K=32, ~148 at K=64, i.e. ~2.3 ms per ref
per 4096 particles, perfectly linear in K.  That stage is the 4-way
raw product fold (VPU elementwise, ~58 MFLOP/particle at K=32) running
at ~3.2 TFLOP/s effective — the VPU floor, already paid in bf16
products and one RMW per ring block; no MXU formulation exists because
the ring contraction is batched over the minor (lane) frequency axis.
K>33 chunking costs exactly one extra sampling pass (+~26 ms) per
chunk.  The single-kernel rewrite was BUILT AND MEASURED in r5
(``fused_search(fold=True)``, the "fold" stage here): each (mirror,
ref) slab is irfft'd into one reused buffer and folded into per-lane
(value, priority) running registers + the winner's angle row —
bit-identical output (interpret CI + hardware parity case 7), and the
K-scaled rows_scr store disappears so K=64 fits one invocation
(max_chunk_k_fold).  Measured (one session, v5e): K=8 N=8192 full
168.9 ms vs fold 168.0 (cost-neutral at small K); K=64 N=4096 full
(chunked 32+32) 260.1 ms vs fold 283.5 — the fold LOSES 9%: its
per-slab fold chain (~5 extra (S, NT, L) VPU passes: slab max,
tie-priority min, per-particle argmin, one-hot row extraction) costs
~0.18 ms x 128 slabs ≈ 23 ms, more than the one duplicated ~26 ms
sampling pass it saves minus the dispatch it merges.  The overhead
scales with K x S (slabs) while the savings scale with chunk count, so
larger K does not rescue it (K=128: saves ~52 ms, pays ~46).
REJECTED as default — the chunked merge stays; fold remains opt-in
(parity-gated) for configs where VMEM, not time, is the binding
constraint.  The chunk split is equalized (32+32, one compiled shape,
half the Mosaic compile time of 33+31).

Graveyard (measured slower or flat; kept out of the kernel):
software-pipelined double-buffered polar scratch (ccf lagging sampling
by one block to overlap MXU/VPU: 183 vs 173 ms — Mosaic does not
overlap the stages and the dynamic guards cost ~10 ms), sliding-dy
shared y-tent tables (one base table + per-dy row-shifted u-slices:
199 vs 174 ms — non-8-aligned middle-dim value slices lower to
cross-sublane shuffles, eating 2x the saved multiplies),
slab-streamed y-reduction, row-major polar + one-DFT-per-block,
register-combined ring accumulation (multi-MB "register" temporaries
spill), ring-pair-combined ccf RMW, NT=16/32 tiles, 6/9/18 y-band
classes, a 4->3 shear-pass merge in transform_batch_mm (re-derived and re-tried
in r3 with the fused class-sum pipeline: 56.5 vs 63.6 ms transform+sum
— but folding the y-shift into the shear argument pushes content
|a|*|syr| px past the 128-pad margin and wraps into the crop at
|phi| -> 45 deg, maxd 2.7 at angle 46; correct only with pad 256,
which costs more than the merge saves), and a fused
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

from cryo_ralib_tpu.config import AlignConfig
from cryo_ralib_tpu.ops.search import prepare_ref_spectra
from cryo_ralib_tpu.params import AlignParams

# the package re-exports fused_search (the function) from ops/__init__;
# import the module itself explicitly
fs = importlib.import_module("cryo_ralib_tpu.ops.fused_search")

NX, K, N = 90, 8, 8192
cfg = AlignConfig(img_dim=NX, ring_num=36, ring_len=256, shift_step=1.0,
                  shift_rng_x=3.0, shift_rng_y=3.0)


def main():
    global K, N
    # optional overrides: k=32 n=4096 kc=16 (kc forces _k_chunk — the
    # large-K chunked path's chunk size) ahead of the stage names
    modes = []
    kc = None
    for a in sys.argv[1:]:
        if a.startswith("k="):
            K = int(a[2:])
        elif a.startswith("n="):
            N = int(a[2:])
        elif a.startswith("kc="):
            kc = int(a[3:])
        else:
            modes.append(a)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((N, NX, NX)).astype(np.float32))
    refs = jnp.asarray(rng.standard_normal((K, NX, NX)).astype(np.float32))
    params = AlignParams.zeros(N)
    tables = fs.FusedTables(cfg)
    rfw = jax.jit(lambda r: prepare_ref_spectra(r, cfg))(refs)
    print(f"K={K} N={N} kc={kc if kc is not None else fs.max_chunk_k(cfg)}",
          flush=True)

    modes = modes or ["full", "no_ccf", "no_yred", "sample_only"]
    for mode in modes:
        # "fold" = the full search through the r5 running-priority fold
        # finalize (single-kernel large K, no chunk merge) — the
        # VERDICT r4 next #4 accept/reject measurement
        fold = mode == "fold"
        stage = "full" if fold else mode
        fn = jax.jit(lambda i, r, stage=stage, fold=fold: fs.fused_search(
            i, r, params, cfg, tables=tables, _stage=stage, _k_chunk=kc,
            fold=fold))
        out = fn(imgs, rfw)
        np.asarray(out.best_val)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(imgs, rfw)
            np.asarray(out.best_val)
        dt = (time.perf_counter() - t0) / 3
        print(f"{mode:12s}: {dt*1e3:7.1f} ms  ({N/dt:8.0f} pps)", flush=True)


if __name__ == "__main__":
    main()
