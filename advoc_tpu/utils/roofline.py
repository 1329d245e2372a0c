"""Whole-graph MFU / roofline accounting (VERDICT r4 weak #1).

The repo's perf story was ×RT plus one exemplary per-op roofline; this
module makes "is 5000× actually fast?" answerable from the record: for any
jitted computation it extracts FLOPs and HBM bytes from XLA's optimized-HLO
cost analysis, combines them with a measured device time, and reports
achieved TFLOP/s, MFU (fraction of peak MXU), achieved GB/s, fraction of
HBM bandwidth, and the speed-of-light time ``max(flops/peak, bytes/bw)``
— i.e. whether a stage is compute-bound or bandwidth-bound and how far
from its bound it runs.

Peaks are the public TPU v5e numbers (197 bf16 TFLOP/s, 819 GB/s HBM —
Google Cloud TPU docs / the scaling-book's hardware table); MFU is quoted
against the bf16 MXU peak, the standard convention. Caveats, stated where
they bite: (a) XLA's "bytes accessed" is the analytical post-fusion
estimate, not a profiler measurement; (b) FLOPs of a Pallas custom call are
invisible to XLA cost analysis — callers account those by analyzing the
equivalent XLA graph (same algorithm ⇒ same required FLOPs) and noting any
extra passes the kernel does (e.g. split-synthesis hi/lo dots).

No reference analog (the reference ships no perf accounting at all —
SURVEY §6); cited spec: BASELINE.md r2-final stage budget, VERDICT r4
next #1.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable


@dataclasses.dataclass(frozen=True)
class Peaks:
    name: str
    flops_per_s: float  # bf16 MXU peak
    hbm_bytes_per_s: float
    assumed: bool = False  # True when the device kind wasn't recognized


# Public numbers. v5e ("TPU v5 lite"): 197 bf16 TFLOP/s, 16 GB HBM @ 819 GB/s.
_KNOWN = {
    "v5 lite": Peaks("TPU v5e", 197e12, 819e9),
    "v5e": Peaks("TPU v5e", 197e12, 819e9),
    "v5litepod": Peaks("TPU v5e", 197e12, 819e9),
}


def device_peaks(device=None) -> Peaks:
    """Peak FLOP/s + HBM bandwidth for the given (default: first) device."""
    import jax

    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for key, peaks in _KNOWN.items():
        if key in kind:
            return peaks
    # Unknown device (CPU tests, future chips): assume v5e so the math still
    # runs; rows are marked assumed and absolute MFU is not meaningful.
    return Peaks(f"assumed-v5e ({kind or 'unknown'})", 197e12, 819e9, True)


def cost_of(fn: Callable, *args) -> dict:
    """FLOPs / bytes / transcendentals of ``fn`` from compiled cost analysis.

    ``fn`` may be jitted or plain (it is jitted here either way so the
    analysis sees one whole XLA computation).
    """
    import jax

    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device
        ca = ca[0]
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
        "transcendentals": float(ca.get("transcendentals", 0.0)),
        "optimal_seconds": float(ca.get("optimal_seconds", 0.0)),
    }


def cost_of_scan(make_fn: Callable, n_iters: int, *args) -> dict:
    """Trip-count-honest cost of a graph whose hot loop is one ``lax.scan``.

    XLA's cost analysis counts a while-loop body ONCE regardless of trip
    count (verified on this jax: a scan of 30 matmuls reports the flops of
    exactly one). ``make_fn(n)`` must return the graph built with ``n``
    scan iterations; then ``cost(make_fn(0))`` is prologue+epilogue and
    ``cost(make_fn(1)) − cost(make_fn(0))`` is one loop body, so the honest
    total is ``c0 + n_iters × body`` — exact because scan FLOPs/bytes are
    linear in trip count (every iteration runs the same HLO body).
    """
    c0 = cost_of(make_fn(0), *args)
    c1 = cost_of(make_fn(1), *args)
    return {k: c0[k] + n_iters * (c1[k] - c0[k]) for k in c0}


def slope_time(fn: Callable, *args, k_lo: int = 2, k_hi: int = 10,
               trials: int = 3) -> float:
    """True per-call device seconds via chained-call slope timing.

    Runs ``fn`` k_lo× and k_hi× back-to-back (one readback at the end of
    each chain); the per-call cost is the slope (t_hi − t_lo)/(k_hi − k_lo),
    which cancels the axon tunnel's ~30 ms dispatch+readback constant that
    pollutes naive single-call timings (BASELINE.md timing methodology).
    """
    import jax
    import jax.numpy as jnp

    def chain(k: int) -> float:
        out = None
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        first = jax.tree.leaves(out)[0]
        float(jnp.mean(jnp.asarray(first)))
        return time.perf_counter() - t0

    chain(1)  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t_lo, t_hi = chain(k_lo), chain(k_hi)
        best = min(best, (t_hi - t_lo) / (k_hi - k_lo))
    return best


def roofline_row(name: str, flops: float, bytes_: float, seconds: float,
                 peaks: Peaks) -> dict:
    """One roofline table row: achieved rates, fractions of peak, bound.

    A stage whose per-call cost is below the slope-timing noise floor can
    measure ≤ 0 s; rates are not meaningful there, so they are zeroed and
    the ms column keeps the raw (noise) value for honesty.
    """
    sol_compute = flops / peaks.flops_per_s
    sol_bw = bytes_ / peaks.hbm_bytes_per_s
    sol = max(sol_compute, sol_bw)
    if seconds <= 0:  # below timer noise
        return {
            "stage": name, "flops": flops, "bytes": bytes_,
            "ms": seconds * 1e3, "tflops_per_s": 0.0, "mfu": 0.0,
            "gb_per_s": 0.0, "bw_frac": 0.0, "sol_ms": sol * 1e3,
            "sol_headroom": 0.0, "bound": "sub-noise",
        }
    return {
        "stage": name,
        "flops": flops,
        "bytes": bytes_,
        "ms": seconds * 1e3,
        "tflops_per_s": flops / seconds / 1e12 if seconds else 0.0,
        "mfu": flops / seconds / peaks.flops_per_s if seconds else 0.0,
        "gb_per_s": bytes_ / seconds / 1e9 if seconds else 0.0,
        "bw_frac": bytes_ / seconds / peaks.hbm_bytes_per_s if seconds else 0.0,
        "sol_ms": sol * 1e3,
        "sol_headroom": seconds / sol if sol else float("inf"),
        "bound": "compute" if sol_compute >= sol_bw else "bandwidth",
    }


def format_table(rows: list[dict], peaks: Peaks) -> str:
    """Markdown roofline table (the BASELINE.md format)."""
    hdr = (f"| stage | ms | GFLOP | MB | TFLOP/s | MFU | GB/s | %HBM BW "
           f"| SoL ms | ×SoL | bound |\n|---|---|---|---|---|---|---|---|---|---|---|")
    lines = [hdr]
    for r in rows:
        lines.append(
            f"| {r['stage']} | {r['ms']:.2f} | {r['flops']/1e9:.1f} "
            f"| {r['bytes']/1e6:.0f} | {r['tflops_per_s']:.1f} "
            f"| {r['mfu']*100:.1f}% | {r['gb_per_s']:.0f} "
            f"| {r['bw_frac']*100:.0f}% | {r['sol_ms']:.2f} "
            f"| {r['sol_headroom']:.1f}× | {r['bound']} |"
        )
    note = (f"\nPeaks: {peaks.name} — {peaks.flops_per_s/1e12:.0f} bf16 "
            f"TFLOP/s, {peaks.hbm_bytes_per_s/1e9:.0f} GB/s HBM."
            + (" (device kind unrecognized: peaks ASSUMED, fractions not "
               "meaningful)" if peaks.assumed else ""))
    return "\n".join(lines) + note
