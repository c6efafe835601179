"""Tracing / profiling harness.

The reference ships torch-tb-profiler but never wires it; its only perf
instrumentation is a thop-style attention FLOP hook
(reference: OpenAI_Unet.py:397-414, SURVEY.md §5). The TPU framework makes
profiling first-class:

* ``trace(logdir)``        — context manager around ``jax.profiler`` traces
                             (open in TensorBoard / xprof)
* ``StepTimer``            — wall-clock step timing with block_until_ready
                             semantics and summary statistics
* ``flops_summary``        — analytic UNet FLOP estimate + achieved TFLOP/s
                             (pairs with models.unet.unet_flops_per_forward)
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace", with_memory: bool = True):
    """jax.profiler trace context: `with trace('/tmp/t'): step()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accurate device-step timing: call `lap(result)` per step; the result is
    synced on, so each lap measures real device time + dispatch.

    ``sync='fetch'`` (default) pulls one element of one result leaf to host —
    on tunneled/remote device transports (axon), ``block_until_ready`` can
    return once a queued program is acknowledged rather than executed, so only
    a D2H value fetch is a reliable sync point. CONTRACT: the result must come
    from a single dispatch (any leaf then syncs the whole program — pytree
    leaf order says nothing about dispatch order). For results assembled from
    several dispatches use ``sync='fetch_all'`` (one element of EVERY leaf;
    one tunnel RTT per leaf). ``sync='block'`` restores plain
    ``block_until_ready`` for local devices."""

    def __init__(self, sync: str = "fetch"):
        self.times: list = []
        self.sync = sync

    @staticmethod
    def _device_leaves(result) -> list:
        return [
            leaf for leaf in jax.tree_util.tree_leaves(result)
            if (hasattr(leaf, "addressable_shards") or hasattr(leaf, "devices"))
            and getattr(leaf, "size", 0) > 0
        ]

    @classmethod
    def _fetch_one(cls, result) -> None:
        """D2H value fetch of one element of one device leaf — syncs the
        (single) program that produced the result and everything enqueued
        before it. See the class docstring for the single-dispatch contract."""
        leaves = cls._device_leaves(result)
        if not leaves:
            jax.block_until_ready(result)
        else:
            np.asarray(jax.device_get(jax.numpy.ravel(leaves[-1])[:1]))

    @classmethod
    def _fetch_all(cls, result) -> None:
        """One-element fetch of EVERY device leaf: correct for results
        assembled from multiple dispatches, at one RTT per leaf."""
        leaves = cls._device_leaves(result)
        if not leaves:
            jax.block_until_ready(result)
        for leaf in leaves:
            np.asarray(jax.device_get(jax.numpy.ravel(leaf)[:1]))

    def lap(self, result=None):
        if result is not None:
            if self.sync == "fetch":
                self._fetch_one(result)
            elif self.sync == "fetch_all":
                self._fetch_all(result)
            else:
                jax.block_until_ready(result)
        now = time.perf_counter()
        if hasattr(self, "_last"):
            self.times.append(now - self._last)
        self._last = now

    def summary(self) -> dict:
        ts = np.asarray(self.times[1:] or self.times or [float("nan")])
        return {
            "steps": len(self.times),
            "mean_s": float(ts.mean()),
            "median_s": float(np.median(ts)),
            "p90_s": float(np.percentile(ts, 90)) if ts.size else float("nan"),
            "steps_per_sec": float(1.0 / np.median(ts)) if ts.size else 0.0,
        }


def flops_summary(
    unet_cfg, image_hw, batch: int, step_time_s: float, n_forwards: int = 1
) -> dict:
    """Achieved model TFLOP/s for a measured step time (forward-only count;
    multiply n_forwards by 3 for fwd+bwd estimates)."""
    from ..models.unet import unet_flops_per_forward

    per_fwd = unet_flops_per_forward(unet_cfg, tuple(image_hw))
    total = per_fwd * batch * n_forwards
    return {
        "unet_gflops_per_forward": per_fwd / 1e9,
        "achieved_tflops": total / step_time_s / 1e12,
    }
