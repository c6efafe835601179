"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the SURVEY.md §4 test strategy: multi-device behavior is validated on
CPU via XLA's host-platform device-count flag (the TPU-world substitute for a
cluster).

NOTE: in this image jax is pre-imported at interpreter startup with the `axon`
TPU platform selected, so setting JAX_PLATFORMS in os.environ here is too late.
`jax.config.update` works as long as no backend has been initialized yet, and
XLA_FLAGS is read at backend-creation time, so both are still effective from
conftest import.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compile cache: the suite is dominated by XLA CPU compiles of the
# many small jitted programs; caching makes rerun wall-clock a fraction of the
# cold run (same helper run.py/bench.py use, scoped to the cpu backend)
from conditioned_diffusion_models_uad_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
