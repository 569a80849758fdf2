"""Speed-of-light accounting: judge measured throughput against hardware
peaks, not only against the driver target.

The quant pipeline does almost no matmul FLOPs — at 788k reads/s the
hash work is ~3 GOP/s, a rounding error against the MXU — so the
relevant rooflines are the VPU (elementwise 32-bit ops: hashing, row
sorts, scans) and HBM bandwidth (the bucket-probe row gather, table
reads/writes).  QuantResult.sizes carries EXACT static counts of the
shapes the device processed (pipeline._match_tables); this module turns
them + phase times into achieved rates and fraction-of-peak.

Peaks (TPU v5e / "v5 lite", public figures):
  HBM bandwidth  ~819 GB/s
  MXU            197 TFLOP/s bf16 / 98.5 TFLOP/s f32 (unused here)
  VPU            ~4 T elementwise f32/i32 op/s (8x128 lanes x 4 ALUs;
                 approximate — used for order-of-magnitude placement)
"""

from __future__ import annotations

from typing import Dict, Optional

V5E_HBM_BYTES_PER_S = 819e9
V5E_VPU_OPS_PER_S = 4e12  # approximate (see module docstring)
V5E_MXU_F32_PER_S = 98.5e12

# Row-sort cost model: a bitonic/merge row sort of width w runs
# O(log^2 w) comparator passes; XLA's v5e row sort measures ~10 lane-ops
# per lane per pass-pair.  We count lanes x log2(w)^2 as "sort lane-ops"
# and fold them into the VPU placement.  This is a model, not a measure.


def _log2(n: int) -> int:
    return max(int(n) - 1, 0).bit_length()


def roofline(
    sizes: Dict[str, int],
    timing: Dict[str, float],
    elapsed_s: float,
    em_iterations: int,
    em_dtype_bytes: int = 4,
) -> Dict[str, dict]:
    """Per-phase achieved rates vs v5e peaks.

    sizes/timing: QuantResult.sizes / .timing from a run with
    SKETCH_TPU_SYNC_PHASES=1 (per-phase attribution; without it the
    async phases drain at the fetch sync and only end-to-end rates are
    meaningful).  elapsed_s: end-to-end quant wall time.
    """
    out: Dict[str, dict] = {}
    t_match = timing.get("match_scan", 0.0) or elapsed_s
    t_em = timing.get("em_assign", 0.0) or elapsed_s

    hash_ops = sizes.get("hash_ops", 0)
    if hash_ops:
        # Each 32-bit window hash XORs k precomputed rotated seeds; the
        # dedup sorts are counted under group_lanes.
        rate = hash_ops / t_match
        out["hash"] = {
            "ops": hash_ops,
            "gops_per_s": round(rate / 1e9, 2),
            "frac_vpu_peak": round(rate / V5E_VPU_OPS_PER_S, 4),
        }
    probe_bytes = sizes.get("probe_bytes", 0)
    if probe_bytes:
        rate = probe_bytes / t_match
        out["probe_gather"] = {
            "bytes": probe_bytes,
            "gb_per_s": round(rate / 1e9, 2),
            "frac_hbm_peak": round(rate / V5E_HBM_BYTES_PER_S, 4),
        }
    group_lanes = sizes.get("group_lanes", 0)
    if group_lanes:
        # One grouping row sort over the expansion window (+ cum scans,
        # ~same order); modeled as log2(w)^2 comparator passes at a
        # nominal 256-lane window width.
        sort_ops = group_lanes * (_log2(256) ** 2) * 10
        out["group_sort"] = {
            "lanes": group_lanes,
            "lanes_per_s": round(group_lanes / t_match / 1e6, 1),  # Mlanes/s
            "modeled_vpu_ops": sort_ops,
            "frac_vpu_peak": round(sort_ops / t_match / V5E_VPU_OPS_PER_S, 4),
        }
    em_lanes = sizes.get("em_lanes", 0)
    if em_lanes and em_iterations:
        # Per iteration per lane: gather pi (4B) + write posterior (4B)
        # + segsum/scatter traffic (~8B) — ~16B/lane of HBM.
        em_bytes = em_lanes * em_iterations * (4 * em_dtype_bytes)
        rate = em_bytes / t_em
        out["em"] = {
            "lanes": em_lanes,
            "iterations": em_iterations,
            "lane_iters_per_s": round(em_lanes * em_iterations / t_em / 1e6, 1),
            "modeled_gb_per_s": round(rate / 1e9, 2),
            "frac_hbm_peak": round(rate / V5E_HBM_BYTES_PER_S, 4),
        }
    # The binding constraint: largest fraction-of-peak across phases.
    bound, frac = None, 0.0
    for name, d in out.items():
        f = max(d.get("frac_hbm_peak", 0.0), d.get("frac_vpu_peak", 0.0))
        if f > frac:
            bound, frac = name, f
    out["summary"] = {
        "dominant_bound": bound,
        "frac_of_peak": round(frac, 4),
        "note": (
            "fractions are against one v5e chip's peaks; low fractions "
            "mean the pipeline is latency/occupancy bound (small kernels, "
            "sorts, syncs), not bandwidth-starved"
        ),
    }
    return out
