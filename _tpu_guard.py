"""Pre-import TPU liveness guard for the driver-facing entry points.

On this machine the axon TPU plugin connects to a tunneled worker at
backend-initialization time; during a worker outage the first jax
operation (or ``jax.devices()``) hangs forever (observed: a multi-hour
outage late in round 3).  ``bench.py`` and ``__graft_entry__.entry()``
are run by an external driver on a deadline — a hang there means no
benchmark / no compile check at all, which is strictly worse than a
CPU-fallback measurement that says so.

``ensure_live_platform()`` probes the default platform in a *subprocess*
(a tiny matmul plus host fetch — the only reliable completion barrier on
the tunneled transport, CLAUDE.md) with a hard timeout.  On failure it
pins the CURRENT process to the host CPU via
``jax.config.update("jax_platforms", "cpu")`` — the env-var route does
not work here: this image's jax ignores ``JAX_PLATFORMS`` from the
environment (see tests/conftest.py), only the config route wins.
``import jax`` itself is safe during an outage (the plugin warning still
prints); only backend init hangs, so the guard may import jax to apply
the config fallback.

Callers must invoke the guard before their first jax *operation*.

Standalone module on purpose: importing ``cryo_ralib_tpu`` pulls in jax
modules wholesale, and keeping this dependency-free makes it loadable by
path from any sys.path the driver uses.
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBE_SRC = (
    "import jax, numpy as np, jax.numpy as jnp\n"
    "x = jnp.ones((128, 128), jnp.float32)\n"
    "print(float(np.asarray(x @ x)[0, 0]))\n"
)


def ensure_live_platform(timeout_s: float = 180.0,
                         attempts: tuple | list | None = None,
                         retry_sleep_s: float = 45.0) -> bool:
    """Return True if the default JAX platform answers a tiny program.

    No-op (True) when jax is already imported in this process (the
    backend choice is already committed) or when ``JAX_PLATFORMS`` is
    pinned to cpu.  Otherwise runs the probe in a subprocess; on a
    non-zero exit or timeout, pins this process to the CPU platform
    (config route + env var), warns on stderr, and returns False.

    ``attempts`` (VERDICT r4 next #1): a sequence of per-attempt timeouts
    replacing the single ``timeout_s`` — failed attempts rest
    ``retry_sleep_s`` before retrying, because a timeout-killed probe can
    itself re-wedge a recovering worker (CLAUDE.md) and the rest gives
    the worker time to settle.  Observed init latencies: ~5 s healthy,
    87-200 s slow-phase, forever during an outage — so a retry schedule
    like (150, 180) distinguishes "slow phase" from "down" without
    burning the whole caller deadline.

    Env overrides (testing / tuning): ``TPU_GUARD_TIMEOUT_S`` replaces
    ``timeout_s`` AND disables retries (single attempt — tests rely on
    exact timing); ``TPU_GUARD_PROBE_SRC`` replaces the probe program.
    """
    if "jax" in sys.modules:
        try:
            from jax._src import xla_bridge

            if xla_bridge.backends_are_initialized():
                return True  # backend choice already committed
        except Exception:  # noqa: BLE001 - private API moved; assume committed
            return True
        # jax imported but no backend yet: probing is still worthwhile
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # the shell asked for CPU already; make it stick (this image's
        # jax ignores the env var — only the config route wins)
        _pin_cpu()
        return True
    env_timeout = os.environ.get("TPU_GUARD_TIMEOUT_S")
    if env_timeout:
        timeout_s = float(env_timeout)
        attempts = None
    probe_src = os.environ.get("TPU_GUARD_PROBE_SRC", _PROBE_SRC)
    schedule = tuple(attempts) if attempts else (timeout_s,)
    ok = False
    for i, tmo in enumerate(schedule):
        if i > 0:
            print(f"tpu_guard: probe attempt {i} failed; resting "
                  f"{retry_sleep_s:.0f}s before retry (timeout {tmo:.0f}s)",
                  file=sys.stderr, flush=True)
            import time

            time.sleep(retry_sleep_s)
        try:
            rc = subprocess.run(
                [sys.executable, "-c", probe_src],
                timeout=tmo,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            ).returncode
            ok = rc == 0
        except subprocess.TimeoutExpired:
            ok = False
        except Exception:  # noqa: BLE001 - probe machinery itself failed
            ok = False
        if ok:
            break
    if not ok:
        os.environ["JAX_PLATFORMS"] = "cpu"
        _pin_cpu()
        print(
            "tpu_guard: accelerator platform unreachable (probe failed or "
            f"timed out after {timeout_s:.0f}s); falling back to the CPU "
            "platform for this process",
            file=sys.stderr,
            flush=True,
        )
    return ok


def _pin_cpu() -> None:
    """Pin this process to the host-CPU platform before backend init."""
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001 - leave the env var as a best effort
        pass


