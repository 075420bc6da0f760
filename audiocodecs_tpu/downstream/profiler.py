"""Model profiler: latency / FLOPs / memory over a sweep of input lengths.

Capability parity with the reference's profiler (reference
``downstream/profiler.py:52-203``: wall time with CUDA sync, peak CUDA
memory, GMACs via a torch monkey-patching FLOPs counter, ptflops
cross-check) — re-designed for XLA:

  * FLOPs come from **XLA's own cost analysis** of the compiled executable
    (exact for the program actually run — no functional patching needed);
  * latency uses the chained-loop slope method (robust to remote-attached
    TPUs where ``block_until_ready`` can under-report; see ``bench.py``);
  * memory comes from the compiled executable's memory analysis plus live
    device stats where the backend exposes them.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["profile_fn", "profile_codec", "param_count", "format_report"]


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def _timed_scalar(fn, *args) -> float:
    t0 = time.perf_counter()
    out = fn(*args)
    # force completion via scalar materialization
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return time.perf_counter() - t0


def _timed_span(fn, args, k: int) -> float:
    """Second, independent latency method: dispatch ``k`` calls back-to-back
    and block once on the last output (pipelined dispatch), per-call time =
    span / k. Mirrors the reference's habit of cross-checking wall time with
    a second timer (``torch.utils.benchmark.Timer``, reference
    ``profiler.py:138-160``) — disagreement between the two methods flags
    dispatch-overhead- or sync-dominated measurements."""
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / k


def _peak_device_memory_bytes() -> int | None:
    """Peak *runtime* device memory where the backend exposes it (TPU PJRT
    reports ``peak_bytes_in_use``; forced-CPU returns None). Reference
    counterpart: ``torch.cuda.max_memory_allocated`` (``profiler.py:170``)."""
    try:
        stats = jax.devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    peak = stats.get("peak_bytes_in_use")
    return int(peak) if peak is not None else None


def profile_fn(fn: Callable, args: tuple, *, runs: int = 5,
               warmups: int = 2) -> dict:
    """Profile one jitted callable on its example args.

    Two independent latency estimates are reported: ``time_s`` (per-call,
    scalar-materialization sync) and ``time_pipelined_s`` (k-call span /
    k, single sync — amortizes host dispatch). ``memory`` carries the
    compile-time memory analysis plus ``peak_bytes_in_use`` live device
    stats where the backend exposes them.
    """
    jitted = jax.jit(fn)
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    mem = {}
    try:
        ma = compiled.memory_analysis()
        if ma is not None:
            mem = {
                "output_bytes": getattr(ma, "output_size_in_bytes", None),
                "temp_bytes": getattr(ma, "temp_size_in_bytes", None),
                "argument_bytes": getattr(ma, "argument_size_in_bytes", None),
            }
    except Exception:
        pass
    for _ in range(warmups):
        _timed_scalar(jitted, *args)
    times = [_timed_scalar(jitted, *args) for _ in range(runs)]
    times2 = [_timed_span(jitted, args, k=4) for _ in range(max(2, runs // 2))]
    mem["peak_bytes_in_use"] = _peak_device_memory_bytes()
    return {
        "time_s": float(np.median(times)),
        "time_min_s": float(np.min(times)),
        "time_pipelined_s": float(np.median(times2)),
        "gflops": float(cost.get("flops", 0.0)) / 1e9,
        "gmacs": float(cost.get("flops", 0.0)) / 2e9,
        "bytes_accessed_gb": float(cost.get("bytes accessed", 0.0)) / 1e9,
        "memory": mem,
    }


def profile_codec(codec, seconds: Sequence[float] = (1, 2, 4, 8, 16, 32),
                  batch: int = 1, runs: int = 5, warmups: int = 2) -> dict:
    """Sweep input durations through encode+decode (reference profiles the
    same 1–32 s sweep, ``test_sr.py:379-391``)."""
    results = {}
    sr = codec.sample_rate
    for sec in seconds:
        T = int(sr * sec)
        sig = jnp.asarray(
            np.random.default_rng(0).standard_normal((batch, T)).astype(np.float32)
        )

        def roundtrip(params, sig):
            toks = codec._sig_to_toks(params, sig, None)
            return codec._toks_to_sig(params, toks, None)

        r = profile_fn(roundtrip, (codec.params, sig), runs=runs,
                       warmups=warmups)
        r["rtf"] = batch * sec / r["time_s"]
        results[f"{sec}s"] = r
    results["params_m"] = param_count(codec.params) / 1e6
    return results


def format_report(results: dict) -> str:
    lines = [f"{'input':>8} {'time(s)':>10} {'GMACs':>10} {'RTF':>10}"]
    for k, v in results.items():
        if not isinstance(v, dict):
            continue
        lines.append(
            f"{k:>8} {v['time_s']:>10.4f} {v['gmacs']:>10.2f} {v['rtf']:>10.1f}"
        )
    if "params_m" in results:
        lines.append(f"params: {results['params_m']:.2f} M")
    return "\n".join(lines)
