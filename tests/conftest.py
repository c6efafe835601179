"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the SURVEY.md §4 test strategy: multi-device behavior is validated on CPU
via XLA's host-platform device-count flag (the TPU-world substitute for a cluster).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: never run the suite over a TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
