"""The pre-import TPU liveness guard (_tpu_guard.py).

During an axon-worker outage the first jax operation hangs forever; the
guard must detect that in a bounded subprocess probe and pin the process
to the CPU platform (config route — this image's jax ignores the
JAX_PLATFORMS env var, see conftest.py) so the driver's bench/entry hooks
degrade instead of hang (observed: a multi-hour worker outage in round 3).
"""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(src, env_extra=None, timeout=240):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(env_extra or {})
    return subprocess.run([sys.executable, "-c", src], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_noop_when_backend_initialized():
    np.asarray(jnp.zeros((2,)))  # commit the backend choice
    from _tpu_guard import ensure_live_platform

    # must return True without probing (a probe would cost seconds,
    # and timeout_s=0.001 would fail any real probe)
    assert ensure_live_platform(timeout_s=0.001) is True


def test_noop_when_cpu_pinned():
    r = _run(
        "import os; os.environ['JAX_PLATFORMS']='cpu';"
        "from _tpu_guard import ensure_live_platform;"
        "assert ensure_live_platform(timeout_s=0.001) is True;"
        "import jax; assert jax.devices()[0].platform == 'cpu'",
    )
    assert r.returncode == 0, r.stderr


def test_fallback_on_hung_probe():
    # Simulated outage: the probe program sleeps past the timeout.  The
    # guard must report failure and pin THIS process to the CPU platform
    # via the config route (the env var alone does not work here).
    r = _run(
        "from _tpu_guard import ensure_live_platform;"
        "assert ensure_live_platform() is False;"
        "import jax;"
        "assert jax.devices()[0].platform == 'cpu'",
        env_extra={
            "TPU_GUARD_PROBE_SRC": "import time; time.sleep(60)",
            "TPU_GUARD_TIMEOUT_S": "3",
        },
    )
    assert r.returncode == 0, r.stderr
    assert "unreachable" in r.stderr


def test_fallback_on_failing_probe():
    r = _run(
        "from _tpu_guard import ensure_live_platform;"
        "assert ensure_live_platform() is False;"
        "import jax;"
        "assert jax.devices()[0].platform == 'cpu'",
        env_extra={"TPU_GUARD_PROBE_SRC": "raise SystemExit(1)"},
    )
    assert r.returncode == 0, r.stderr


def test_retry_schedule_recovers_on_second_attempt(tmp_path):
    """r5 probe retries (VERDICT r4 next #1): a probe that fails once and
    succeeds on the retry must return True; a probe that always fails
    must exhaust the schedule and pin CPU."""
    marker = tmp_path / "attempt"
    flaky = (
        "import os, sys\n"
        f"m = {str(marker)!r}\n"
        "if os.path.exists(m):\n"
        "    sys.exit(0)\n"
        "open(m, 'w').write('x')\n"
        "sys.exit(1)\n"
    )
    r = _run(
        "import os; from _tpu_guard import ensure_live_platform;"
        "src = os.environ['FLAKY_SRC'];"
        "os.environ['TPU_GUARD_PROBE_SRC'] = src;"
        "ok = ensure_live_platform(attempts=(5.0, 5.0), retry_sleep_s=0.1);"
        "assert ok is True, ok",
        env_extra={"FLAKY_SRC": flaky},
    )
    assert r.returncode == 0, r.stderr
    assert "resting" in r.stderr  # the retry path announced itself
    r2 = _run(
        "from _tpu_guard import ensure_live_platform;"
        "import os; os.environ['TPU_GUARD_PROBE_SRC']='import sys; sys.exit(1)';"
        "ok = ensure_live_platform(attempts=(5.0, 5.0), retry_sleep_s=0.1);"
        "assert ok is False;"
        "import jax; assert jax.devices()[0].platform == 'cpu'",
    )
    assert r2.returncode == 0, r2.stderr
