"""Logging / tracing / profiling / debug utilities.

Covers the reference's auxiliary observability subsystems (SURVEY.md §5):
  * crash-proof logging handler (reference train.py:49-70 SafeStreamHandler)
  * rank-0 gated logging + debug_print (UniGenUtils.py:199-202)
  * parameter-count reporting (utils.py:27-38, infer.py:236-247)
  * MoE wall-clock/expert-count introspection -> here: jax.profiler traces,
    named_scope phase annotation, expert-count histograms
  * debug-mode shard-consistency assertion (replaces barrier-based "race
    detection": jit purity + explicit PRNG already removes the race classes)
"""

from __future__ import annotations

import contextlib
import logging
import sys
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


class SafeStreamHandler(logging.StreamHandler):
    """Never lets a logging failure kill training (broken pipe etc.)."""

    def emit(self, record):
        try:
            super().emit(record)
        except Exception:
            pass


def setup_logging(work_dir: Optional[str] = None, *, level=logging.INFO,
                  name: str = "unigen_tpu") -> logging.Logger:
    """Rank-aware logger: every process logs WARNING+, process 0 logs INFO+
    and owns the train.log file handler (reference train.py:219-239)."""
    logger = logging.getLogger(name)
    logger.handlers.clear()
    rank0 = jax.process_index() == 0
    handler = SafeStreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(
        f"%(asctime)s [p{jax.process_index()}] %(name)s: %(message)s"))
    logger.addHandler(handler)
    logger.setLevel(level if rank0 else logging.WARNING)
    if work_dir and rank0:
        fh = logging.FileHandler(f"{work_dir}/train.log")
        fh.setFormatter(handler.formatter)
        logger.addHandler(fh)
    return logger


def debug_print(*args, **kw) -> None:
    """Process-0-only print."""
    if jax.process_index() == 0:
        print(*args, **kw)


def param_report(tree: Any, name: str = "model") -> Dict[str, float]:
    """Parameter/byte counts, logged on process 0."""
    from unigen_tpu.utils import param_bytes, param_count
    stats = {"params": param_count(tree), "gbytes": param_bytes(tree) / 1e9}
    debug_print(f"{name}: {stats['params']/1e6:.1f}M params, "
                f"{stats['gbytes']:.2f} GB")
    return stats


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Named scope visible in jax.profiler traces (the reference's DeepSpeed
    wall-clock timers become profiler annotations)."""
    with jax.named_scope(name):
        yield


@contextlib.contextmanager
def profile(log_dir: str, *, enabled: bool = True) -> Iterator[None]:
    """jax.profiler trace context -> TensorBoard/XPlane dump."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def expert_histogram(expert_counts: jnp.ndarray) -> Dict[str, float]:
    """Load-balance metrics from the MoE expert_counts output."""
    c = np.asarray(expert_counts).astype(np.float64)
    total = max(c.sum(), 1.0)
    frac = c / total
    e = len(c)
    return {
        "moe/tokens": float(total),
        "moe/max_expert_frac": float(frac.max()),
        "moe/empty_experts": int((c == 0).sum()),
        # 1.0 = perfectly balanced, e = fully collapsed
        "moe/imbalance": float(e * np.square(frac).sum()),
    }


def assert_replica_consistency(x: jnp.ndarray, *, atol: float = 0.0) -> None:
    """Debug-mode check that a supposedly-replicated array is identical on
    all addressable shards (the TPU-native stand-in for barrier-based race
    checks)."""
    shards = [np.asarray(s.data) for s in x.addressable_shards]
    for s in shards[1:]:
        if not np.allclose(shards[0], s, atol=atol):
            raise AssertionError("replica divergence detected")


def log_step_metrics(logger: logging.Logger, step: int,
                     metrics: Dict[str, Any]) -> None:
    """Reference-style per-step scalar line (train.py:687-695)."""
    scalars = {}
    for k, v in metrics.items():
        arr = np.asarray(v)
        if arr.ndim == 0:
            scalars[k] = float(arr)
        elif k == "expert_counts":
            scalars.update(expert_histogram(arr))
    if jax.process_index() == 0:
        logger.info("step %d | %s", step,
                    " ".join(f"{k}={v:.5g}" for k, v in scalars.items()))
