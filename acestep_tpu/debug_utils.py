"""Env-gated debug timers and tensor stats (analog of acestep/debug_utils.py
:107-121 and the C++ ACE_GGML_*_PROFILE knobs).

Enable with ACESTEP_TPU_DEBUG=1 (timers) or =2 (timers + tensor stats)."""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from typing import Dict, Optional

_LEVEL = int(os.environ.get("ACESTEP_TPU_DEBUG", "0") or 0)
_timings: Dict[str, float] = {}


def enabled(level: int = 1) -> bool:
    return _LEVEL >= level


@contextmanager
def debug_timer(name: str):
    """with debug_timer("dit_forward"): ... — prints + records when enabled."""
    if not enabled():
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _timings[name] = _timings.get(name, 0.0) + dt
        print(f"[acestep-tpu] {name}: {dt*1000:.2f} ms", flush=True)


def debug_tensor(name: str, x) -> None:
    """Print rms/min/max of a tensor when ACESTEP_TPU_DEBUG>=2
    (the C++ ACE_GGML_DEBUG_GENERATE_STATS latent-RMS dumps)."""
    if not enabled(2):
        return
    import numpy as np

    a = np.asarray(x, dtype=np.float32)
    rms = float(np.sqrt((a ** 2).mean())) if a.size else 0.0
    print(f"[acestep-tpu] {name}: shape={a.shape} rms={rms:.6f} "
          f"min={a.min():.4f} max={a.max():.4f}", flush=True)


def timings() -> Dict[str, float]:
    return dict(_timings)


def reset() -> None:
    _timings.clear()


@contextmanager
def jax_profiler(trace_dir: Optional[str] = None):
    """jax profiler trace (xprof) context — ACESTEP_TPU_TRACE_DIR or arg."""
    trace_dir = trace_dir or os.environ.get("ACESTEP_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
