"""Test-session configuration (runs before test collection).

Mirrors the reference's test strategy on the TPU-native stack (SURVEY.md §4):
property tests run on the CPU backend in float64 (the monotonicity tolerances
require f64 accumulation), with 8 virtual devices so mesh/GSPMD tests exercise
real sharding + collectives without TPU hardware.

Note: the environment may pre-import jax and point it at a real TPU platform
(e.g. an `axon` sitecustomize).  Env vars are therefore not enough — we force
the platform through `jax.config` before any backend is initialized.  Set
NBMF_TEST_PLATFORM to override (e.g. for the tpu-marked smoke tests).
"""

import os
import sys

_platform = os.environ.get("NBMF_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
if _platform == "cpu":
    # x64 is the CPU parity regime only — TPUs have no f64, and x64 integer
    # widening (i64) is not legal in Mosaic kernels.
    os.environ.setdefault("JAX_ENABLE_X64", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (may already be imported by sitecustomize)

jax.config.update("jax_platforms", _platform)
if _platform == "cpu" and os.environ.get("JAX_ENABLE_X64") == "1":
    jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(__file__))
