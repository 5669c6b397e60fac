#!/bin/bash
# Round-5 hardware measurement session — run from the repo root with the
# TPU attached.  Sequential, NO outer timeouts (a timeout-killed attached
# TPU process wedges the tunneled worker for many minutes — CLAUDE.md).
# Usage: bash tools/r5_hw_session.sh <logdir>
set -u
LOG=${1:-/tmp/r5hw}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

probe() {
  python - <<'PY'
import time; t0=time.time()
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128,128), jnp.float32)
print("probe ok", float(np.asarray(x@x)[0,0]), jax.devices()[0].platform,
      f"{time.time()-t0:.1f}s", flush=True)
PY
}

echo "== probe ==" ; probe || exit 1

echo "== parity: new cases (0=headline, 5=eman2, 6=ring-plan, 7=fold) =="
python tools/tpu_parity_check.py 0 5 6 7 2>&1 | tee "$LOG/parity_new.log"

echo "== parity: remaining cases (1 2 3 4) =="
python tools/tpu_parity_check.py 1 2 3 4 2>&1 | tee "$LOG/parity_rest.log"

echo "== bench.py (full, r5 rows) =="
BENCH_DEADLINE_S=3000 python bench.py 2>"$LOG/bench.err" | tee "$LOG/bench.json"

echo "== fused ablate: fold sanity at K=8 =="
python tools/fused_ablate.py k=8 n=8192 full fold 2>&1 | tee "$LOG/fold_k8.log"

echo "== fused ablate: K=64 fold accept/reject =="
python tools/fused_ablate.py k=64 n=4096 full fold 2>&1 | tee "$LOG/fold_k64.log"

echo "== template ablate: 256px stage map =="
python tools/template_ablate.py nx=256 ou=100 xr=2 k=4 n=2048 \
  full build sf translate search mm_only 2>&1 | tee "$LOG/t256.log"

echo "== template ablate: eman2 stage map =="
python tools/template_ablate.py scheme=eman2 k=8 n=8192 \
  full build translate search 2>&1 | tee "$LOG/teman.log"

echo "== session done =="
