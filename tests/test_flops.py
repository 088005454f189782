"""MFU/roofline accounting (utils/flops.py): XLA cost extraction sanity and
roofline classification math (VERDICT r4 #4 — every benchmark needs an
honest FLOP denominator; the reference publishes no perf accounting at all,
BASELINE.md)."""

import jax.numpy as jnp
import numpy as np

from vispeech_tpu.utils.flops import chip_peaks, roofline_row, xla_cost


def test_xla_cost_counts_matmul_flops():
    M, K, N = 64, 128, 256

    def f(a, b):
        return a @ b

    cost = xla_cost(f, jnp.ones((M, K)), jnp.ones((K, N)))
    # XLA convention: 2*M*K*N flops for a dense dot
    assert cost["flops"] == 2 * M * K * N
    # operands + result at f32
    assert cost["bytes"] >= 4 * (M * K + K * N + M * N)


def test_roofline_classification():
    peaks = {"chip": "v5e", "bf16_flops": 200e12, "f32_flops": 100e12,
             "hbm_bytes": 800e9}
    # high intensity -> compute bound; 1e12 flops at peak would take 5 ms
    row = roofline_row(1e12, 1e9, ms=10.0, dtype="bf16", peaks=peaks)
    assert row["bound_by"] == "compute"
    assert np.isclose(row["mfu_pct"], 50.0)  # 1e12/0.01/200e12
    assert np.isclose(row["speed_of_light_ms"], 5.0)
    assert np.isclose(row["roofline_pct"], 50.0)
    # low intensity -> bandwidth bound; 8e9 bytes at 800GB/s = 10 ms
    row = roofline_row(1e9, 8e9, ms=20.0, dtype="f32", peaks=peaks)
    assert row["bound_by"] == "bandwidth"
    assert np.isclose(row["speed_of_light_ms"], 10.0)
    assert np.isclose(row["roofline_pct"], 50.0)
    assert row["intensity"] == round(1e9 / 8e9, 1)


def test_chip_peaks_off_tpu_is_none_or_valid():
    p = chip_peaks()
    if p is not None:
        assert {"bf16_flops", "f32_flops", "hbm_bytes", "chip"} <= set(p)


def test_chip_peaks_known_names():
    for chip in ("v4", "v5e", "v5p", "v6e"):
        p = chip_peaks(chip)
        assert p["bf16_flops"] > 0 and p["hbm_bytes"] > 0
    assert chip_peaks("unknown-chip") is None
