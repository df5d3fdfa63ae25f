"""Device-path policy: when the codec's batched math runs on the TPU.

THEVC_DEVICE=1 forces the JAX device path on, =0 forces it off; unset
means AUTO — on exactly when JAX's default backend is an accelerator
(a real TPU chip), off on CPU-only hosts where the native AVX2 core wins.
Tests exercise the device code path on a CPU-JAX mesh by setting
THEVC_DEVICE=1 under JAX_PLATFORMS=cpu (tests/conftest.py), so the gate
runs on every CI invocation without TPU hardware.
"""

from __future__ import annotations

import os

_cache: dict = {}
_probe_cache: dict = {}   # survives reset_cache(): tunnel health is per-process

# transfer/launch accounting for the device path (bench reports these
# per frame so the host<->device ceiling is auditable; VERDICT r03 #3/#7)
STATS = {"launches": 0, "h2d_bytes": 0, "d2h_bytes": 0}


def stat_launch(h2d_bytes: int = 0) -> None:
    STATS["launches"] += 1
    STATS["h2d_bytes"] += int(h2d_bytes)


def stat_d2h(nbytes: int) -> None:
    STATS["d2h_bytes"] += int(nbytes)


def stats_reset() -> dict:
    """Return the counters so far and zero them."""
    out = dict(STATS)
    for k in STATS:
        STATS[k] = 0
    return out


def backend_probe(timeout: float = 180.0) -> str:
    """jax.default_backend(), probed in a SUBPROCESS with a hard timeout.

    Remote-TPU plugins (axon) block inside native backend init when the
    tunnel to the chip is down — an in-process jax.devices() then hangs
    the caller forever rather than raising.  Probing out-of-process
    turns that hang into a clean "cpu" answer so AUTO mode (and bench)
    degrade to the host path instead of wedging."""
    if "probe" not in _probe_cache:
        import subprocess
        import sys
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.default_backend())"],
                capture_output=True, text=True, timeout=timeout)
            lines = r.stdout.strip().splitlines()
            _probe_cache["probe"] = lines[-1] if r.returncode == 0 and lines \
                else "cpu"
        except Exception:
            _probe_cache["probe"] = "cpu"
    return _probe_cache["probe"]


def device_enabled() -> bool:
    env = os.environ.get("THEVC_DEVICE", "")
    if env == "1":
        _enable_compile_cache()
        return True
    if env == "0":
        return False
    if "auto" not in _cache:
        _cache["auto"] = backend_probe() != "cpu"
    if _cache["auto"]:
        _enable_compile_cache()
    return _cache["auto"]


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: a cold decode compiles a dozen
    shape classes, each ~10-60 s through a remote-TPU tunnel — cache them
    across processes."""
    if "cc" in _cache:
        return
    _cache["cc"] = True
    if effective_platform() == "cpu":
        # XLA:CPU AOT cache entries carry prefer-no-gather/no-scatter
        # machine features; reloaded executables run ~10x slower than a
        # fresh compile (measured on the decision pass: 0.8 -> 7.8
        # s/frame @1080p).  Persist only for real accelerators.
        return
    try:
        import jax
        path = os.path.expanduser("~/.cache/thevc_jax")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def effective_platform() -> str:
    """Platform jitted codec launches actually land on: the pinned
    jax_default_device wins (tests pin CPU while the TPU plugin is still
    registered, so jax.default_backend() alone would lie)."""
    try:
        import jax
        d = jax.config.jax_default_device
        if d is not None:
            return d.platform
        return jax.default_backend()
    except Exception:
        return "none"


def pallas_enabled() -> bool:
    """Residual-core kernel choice: THEVC_PALLAS=1 forces the Pallas
    kernel (interpret-mode on non-TPU backends — the CI path), =0 forces
    the XLA einsum formulation; unset means AUTO — Pallas exactly when
    the launches land on a real TPU (Mosaic-compiled)."""
    env = os.environ.get("THEVC_PALLAS", "")
    if env == "1":
        return True
    if env == "0":
        return False
    if "pallas_auto" not in _cache:
        _cache["pallas_auto"] = effective_platform() == "tpu"
    return _cache["pallas_auto"]


def reset_cache() -> None:
    _cache.clear()
