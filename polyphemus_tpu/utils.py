"""Misc utilities: seeding, parameter tables, profiling.

Reference counterparts: set_seed (/root/reference/utils.py:15-22),
print_params (:31-48). Profiling is new — the reference only prints
wall-clock times (SURVEY.md §5); here jax.profiler traces are first-class.
"""
from __future__ import annotations

import contextlib
import os
import random
import time
from typing import Iterator, Optional

import jax
import numpy as np


def set_seed(seed: int) -> None:
    """Host-side RNG seeding. JAX device RNG is explicit (jax.random.key),
    so unlike torch there is no hidden global device state to pin."""
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def enable_compile_cache(default_dir: str = "~/.cache/polyphemus_jax") -> None:
    """Persistent XLA compilation cache. The flagship train graph takes
    minutes to compile through the TPU tunnel; with the cache, re-entering
    a run (--resume, chunked long runs, repeated benches) pays ~seconds.
    POLY_COMPILE_CACHE overrides the location; set it to "" to disable."""
    cache_dir = os.environ.get("POLY_COMPILE_CACHE",
                               os.path.expanduser(default_dir))
    if not cache_dir:
        return
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def compiler_options(min_vmem_bytes: Optional[int] = None) -> Optional[dict]:
    """Per-jit XLA options, or None.

    When POLY_VMEM_LIMIT_MB is set (see ops.kernels.gcl_pallas.
    vmem_limit_bytes), every jit that may inline a Pallas kernel must raise
    XLA's scoped-VMEM budget to at least the kernel limit or Mosaic rejects
    the kernel. min_vmem_bytes raises the option to at least that many
    bytes regardless of the env (the chained GCL eval kernel sizes its own
    need via gcl_pallas.chain_vmem_bytes). Pass the result as
    `jax.jit(..., compiler_options=...)` — the option travels inside the
    PJRT compile request, so it works through the remote-TPU tunnel where
    process env flags may not propagate.
    """
    v = os.environ.get("POLY_VMEM_LIMIT_MB")
    lim_kib = (int(v) if v else 0) * 1024  # "0" disables, same as unset
    if min_vmem_bytes:
        lim_kib = max(lim_kib, -(-int(min_vmem_bytes) // 1024))
    if not lim_kib:
        return None
    # TPU-only XLA option: the CPU/GPU compilers reject unknown options
    # with INVALID_ARGUMENT, so attach it only on TPU backends (the real
    # chip here registers as 'axon' through the tunnel).
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": lim_kib}


def tpu_jit(fn, **jit_kwargs):
    """jax.jit that always pairs POLY_VMEM_LIMIT_MB with the matching XLA
    scoped-VMEM option. Any jit that may inline a Pallas kernel built with a
    raised vmem_limit_bytes MUST use this (or pass compiler_options
    manually) or Mosaic rejects the kernel at compile time."""
    return jax.jit(fn, compiler_options=compiler_options(), **jit_kwargs)


def param_count(tree) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(tree))


def print_params(params, log_fn=print) -> int:
    """Per-parameter table + total (reference utils.py:31-48)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    rows = [(jax.tree_util.keystr(p, simple=True, separator="."),
             int(np.prod(x.shape))) for p, x in flat]
    width = max((len(n) for n, _ in rows), default=10)
    log_fn(f"{'Module':<{width}} | Parameters")
    log_fn("-" * (width + 13))
    for name, n in rows:
        log_fn(f"{name:<{width}} | {n}")
    total = sum(n for _, n in rows)
    log_fn(f"Total Trainable Parameters: {total}")
    return total


def wait_for_backend(deadline_s: float = 2400.0,
                     poll_s: float = 30.0) -> int:
    """Block until the JAX backend answers a device query; return the count.

    A sick axon TPU tunnel shows two failure modes (both observed):
    (a) while draining a killed compile the first `jax.devices()` blocks
    indefinitely (>17 min at zero CPU); (b) the backend init fail-fasts
    with UNAVAILABLE. Benchmarks should wait out both instead of hanging
    or dying on the first probe, so the query runs in a daemon thread that
    RETRIES through init exceptions (a loud init failure leaves
    xla_bridge._backends empty, so the next jax.devices() re-runs the full
    init) while the main thread polls with progress lines on stderr up to
    `deadline_s`. Raises TimeoutError (with the last init error, if any)
    past the deadline; a still-blocked daemon thread dies with the
    process."""
    import sys
    import threading

    out: list[int] = []
    errs: list[BaseException] = []
    t0 = time.time()

    def probe():
        while time.time() - t0 < deadline_s:
            try:
                out.append(len(jax.devices()))
                return
            except Exception as e:  # fail-fast mode: retry re-inits
                errs.append(e)
                time.sleep(min(poll_s, 15.0))

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(min(poll_s, deadline_s))
    while t.is_alive() and time.time() - t0 < deadline_s:
        state = (f"backend init failing ({errs[-1]!r})" if errs
                 else "device query pending")
        print(f"[wait_for_backend] {state} ({int(time.time() - t0)} s) — "
              f"TPU tunnel busy, waiting for it to recover...",
              file=sys.stderr, flush=True)
        t.join(poll_s)
    if not out:
        last = f"; last error: {errs[-1]!r}" if errs else ""
        raise TimeoutError(
            f"JAX backend unresponsive after {deadline_s:.0f} s "
            f"(wedged TPU tunnel?){last}")
    return out[0]


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context (view with TensorBoard / xprof).
    No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-clock stats for train/gen loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0

    @property
    def steps_per_sec(self) -> float:
        m = self.mean
        return 1.0 / m if m > 0 else 0.0
