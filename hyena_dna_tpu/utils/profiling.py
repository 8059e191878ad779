"""Profiling toolkit: latency/memory measurement + jax.profiler tracing.

Parity target: `/root/reference/src/utils/profiling.py:5-132` (torch
benchmark fwd/bwd latency, peak memory, per-module memory hooks) and the
Timer callback. TPU equivalents:

  * `benchmark(fn, *args)` — wall-clock with proper `block_until_ready`
    semantics and warmup/compile separation;
  * `benchmark_fwd_bwd` — forward and forward+backward latency;
  * `device_memory_stats` — live/peak HBM from the device allocator;
  * `trace(path)` — context manager around `jax.profiler` emitting a
    Perfetto/XPlane trace for op-level attribution;
  * `flops_estimate` — analytic FLOPs for the Hyena LM train step, used for
    MFU / roofline reporting in bench.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


def benchmark(fn: Callable, *args, iters: int = 20, warmup: int = 2, **kwargs) -> Dict[str, float]:
    """Compile + run fn; returns timing stats in ms."""
    out = None
    t_compile0 = time.perf_counter()
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_ms = (time.perf_counter() - t_compile0) * 1e3

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return {
        "mean_ms": sum(times) / len(times),
        "p50_ms": times[len(times) // 2],
        "min_ms": times[0],
        "max_ms": times[-1],
        "warmup_ms": compile_ms,
    }


def benchmark_fwd_bwd(loss_fn: Callable, params, *args, iters: int = 20) -> Dict[str, float]:
    """Latency of forward and forward+backward of a scalar loss fn."""
    fwd = jax.jit(loss_fn)
    bwd = jax.jit(jax.grad(loss_fn))
    return {
        "fwd": benchmark(fwd, params, *args, iters=iters),
        "fwd_bwd": benchmark(bwd, params, *args, iters=iters),
    }


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, int]:
    """bytes_in_use / peak_bytes_in_use from the device allocator (the
    jax analog of torch.cuda.max_memory_allocated)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    return {
        "bytes_in_use": int(stats.get("bytes_in_use", 0)),
        "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", 0)),
        "bytes_limit": int(stats.get("bytes_limit", 0)),
    }


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    """jax.profiler trace context; view with Perfetto / TensorBoard."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_estimate(
    d_model: int,
    n_layer: int,
    d_inner: int,
    seq_len: int,
    vocab_size: int = 16,
    order: int = 2,
    train: bool = True,
) -> float:
    """Analytic FLOPs per token for the Hyena LM (fwd; x3 for train).

    Counts the dense projections (MXU work), the MLP, the lm_head, and the
    FFT conv at 5·N·log2(N) real FLOPs per length-N transform (3 transforms
    per conv, `order-1` convs per layer)."""
    import math

    proj = 2 * d_model * (order + 1) * d_model + 2 * d_model * d_model  # in+out proj
    mlp = 2 * 2 * d_model * d_inner
    short = 2 * 3 * (order + 1) * d_model
    n_fft = 1 << (2 * seq_len - 1).bit_length()
    fft = (order - 1) * 3 * 5 * n_fft * math.log2(n_fft) / seq_len  # per token
    gate = 4 * order * d_model
    per_layer = proj + mlp + short + fft + gate
    head = 2 * d_model * vocab_size
    total = n_layer * per_layer + head
    return total * (3.0 if train else 1.0)
