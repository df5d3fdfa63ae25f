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


def device_enabled() -> bool:
    env = os.environ.get("THEVC_DEVICE", "")
    if env == "1":
        return True
    if env == "0":
        return False
    if "auto" not in _cache:
        try:
            import jax
            _cache["auto"] = jax.default_backend() != "cpu"
        except Exception:
            _cache["auto"] = False
    return _cache["auto"]


def reset_cache() -> None:
    _cache.clear()
