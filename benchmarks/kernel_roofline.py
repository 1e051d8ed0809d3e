"""Static roofline / MFU analysis of the fused Pallas chord-BDF2 kernel.

The kernel (pallas_step._build_kernel) is fully unrolled at trace time, so
its work is STATICALLY countable: this script re-executes the identical
kernel body with a counting value shim in place of lane blocks — every
arithmetic/comparison/select on a lane value is one VPU lane-op over the
(8,128)=1024-lane tile; transcendentals (sin/cos/sqrt/div) are counted
separately since they cost multiple VPU passes. HBM traffic is the lane
refs in/out (everything else lives in VMEM for the whole grid step).

Combining the static counts with the measured per-solve time (isolated
fused solve, benchmarks/pallas_ablation.json methodology) gives achieved
FLOP/s and B/s against the v5e ceilings:
  VPU peak (f32): 8x128 lanes x 4 ALUs x ~0.94 GHz ~= 3.85 TFLOP/s/core
  HBM bandwidth: ~819 GB/s
(one TensorCore per v5e chip). The kernel does not touch the MXU by design
— batch-as-tile makes every op elementwise — so VPU f32 peak is the compute
roof. Writes benchmarks/kernel_roofline.json.

Usage: python benchmarks/kernel_roofline.py [--nlinks 12] [--contact]
       [--measure]   (add timed hardware run; otherwise static-only)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

COUNT = {"lane_ops": 0, "lane_trans": 0, "scalar_ops": 0}


class V:
    """Counting value: lane (per-batch) or scalar (shared param)."""

    __slots__ = ("lane",)

    def __init__(self, lane=True):
        self.lane = lane

    def _bin(self, other):
        lane = self.lane or (isinstance(other, V) and other.lane)
        COUNT["lane_ops" if lane else "scalar_ops"] += 1
        return V(lane)

    def _div(self, other):
        lane = self.lane or (isinstance(other, V) and other.lane)
        # divide is multi-pass on the VPU
        COUNT["lane_trans" if lane else "scalar_ops"] += 1
        return V(lane)

    __add__ = __radd__ = __sub__ = __rsub__ = __mul__ = __rmul__ = _bin
    __truediv__ = __rtruediv__ = _div
    __and__ = __rand__ = __or__ = __ror__ = _bin
    __lt__ = __le__ = __gt__ = __ge__ = _bin

    def __invert__(self):
        COUNT["lane_ops" if self.lane else "scalar_ops"] += 1
        return V(self.lane)

    def __neg__(self):
        COUNT["lane_ops" if self.lane else "scalar_ops"] += 1
        return V(self.lane)

    def astype(self, _):
        return V(self.lane)

    def __getitem__(self, i):
        # static param refs are indexed to scalar entries (E0pj_ref[j][a,b])
        return V(self.lane)

    @property
    def dtype(self):
        return np.float32


def _unary(trans=False):
    def f(x, *a, **k):
        lane = isinstance(x, V) and x.lane
        if isinstance(x, V):
            COUNT[("lane_trans" if trans else "lane_ops") if lane
                  else "scalar_ops"] += 1
        return V(lane)
    return f


def _binf(x, y):
    lane = (isinstance(x, V) and x.lane) or (isinstance(y, V) and y.lane)
    COUNT["lane_ops" if lane else "scalar_ops"] += 1
    return V(lane)


class CountXP:
    """Array-namespace shim for _build_kernel's xp."""

    float32 = np.float32
    nan = float("nan")
    cos = staticmethod(_unary(trans=True))
    sin = staticmethod(_unary(trans=True))
    sqrt = staticmethod(_unary(trans=True))
    abs = staticmethod(_unary())
    isfinite = staticmethod(_unary())

    @staticmethod
    def where(c, a, b):
        COUNT["lane_ops"] += 1
        return V(True)

    minimum = staticmethod(_binf)
    maximum = staticmethod(_binf)

    @staticmethod
    def full(shape, v, dtype=None):
        return V(True)

    @staticmethod
    def broadcast_to(x, shape):
        return x if isinstance(x, V) else V(True)


class LaneRef:
    def __init__(self, lane):
        self.lane = lane
        self.dtype = np.float32

    def __getitem__(self, i):
        return V(self.lane)


class OutRef:
    dtype = np.float32

    def __getitem__(self, i):
        return V(True)

    def __setitem__(self, i, v):
        pass


def count_kernel(nlinks, contact, cfg=None):
    from redmax_tpu import integrators, pallas_step
    from redmax_tpu.scenes import scene_chain, scene_chain_ground
    import jax.numpy as jnp

    sc = (scene_chain_ground(nlinks=nlinks) if contact
          else scene_chain(nlinks=nlinks)).compile(dtype=jnp.float32)
    cfg = cfg or integrators.NewtonConfig(
        fixed_iters=3, predictor="quadratic", chord=True,
        hessian="structured", linsolve="gj",
    )
    contact_bodies = tuple(int(f.body) for f in sc.force_fns)
    kernel = pallas_step._build_kernel(
        sc.topo, cfg, "bdf2", lanes=(1024,), xp=CountXP,
        contact_bodies=contact_bodies,
    )
    for k in COUNT:
        COUNT[k] = 0
    nr = sc.topo.nr
    lane_refs = [LaneRef(True) for _ in range(6)]
    static_refs = [LaneRef(False) for _ in range(7)]
    extra = [LaneRef(False)] if contact_bodies else []
    kernel(*lane_refs, *static_refs, *extra, OutRef(), OutRef())
    counts = dict(COUNT)
    counts["nr"] = nr
    # HBM traffic per lane per solve: 6 input refs x nr + (nr + nr^2) out, f32
    counts["hbm_bytes_per_lane"] = 4 * (6 * nr + nr + nr * nr)
    return sc, cfg, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nlinks", type=int, default=12)
    ap.add_argument("--contact", action="store_true")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--measure", action="store_true")
    args = ap.parse_args()

    sc, cfg, counts = count_kernel(args.nlinks, args.contact)
    B = args.batch

    # VPU cost model: 1 pass per lane op; transcendental/divide ~ 4 passes
    TRANS_PASSES = 4
    vpu_passes = counts["lane_ops"] + TRANS_PASSES * counts["lane_trans"]
    flops_per_lane = counts["lane_ops"] + counts["lane_trans"]

    VPU_PEAK = 8 * 128 * 4 * 0.94e9        # ~3.85 TF/s f32 (v5e, 1 core)
    HBM_BW = 819e9
    out = {
        "metric": "fused kernel static roofline (chain-%d%s, B=%d)" % (
            args.nlinks, "+ground-contact" if args.contact else "", B),
        "static_counts_per_lane": counts,
        "flops_per_solve": flops_per_lane * B,
        "vpu_passes_per_lane": vpu_passes,
        "hbm_bytes_per_solve": counts["hbm_bytes_per_lane"] * B,
        "arithmetic_intensity_flops_per_byte": round(
            flops_per_lane / counts["hbm_bytes_per_lane"], 1),
        "compute_bound": True,
        "vpu_peak_flops": VPU_PEAK,
        "hbm_bw_bytes": HBM_BW,
        "time_at_vpu_peak_us": round(vpu_passes * B / VPU_PEAK * 1e6, 2),
        "time_at_hbm_bw_us": round(
            counts["hbm_bytes_per_lane"] * B / HBM_BW * 1e6, 3),
    }

    if args.measure:
        import jax
        import jax.numpy as jnp
        from redmax_tpu import pallas_step

        solve = pallas_step.make_chord_bdf2(
            sc.topo, cfg, interpret=False, force_fns=sc.force_fns
        )
        rng = np.random.default_rng(0)
        nr = sc.topo.nr
        q1 = jnp.asarray(0.3 * rng.normal(size=(B, nr)), jnp.float32)
        qd1 = jnp.asarray(rng.normal(size=(B, nr)), jnp.float32)
        argsv = (sc.params, q1 + 0.01 * qd1, q1 - 0.01 * qd1, qd1, q1, qd1)
        jf = jax.jit(solve)
        jax.block_until_ready(jf(*argsv))
        ts = []
        for _ in range(30):
            t0 = time.perf_counter()
            jax.block_until_ready(jf(*argsv))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        out["measured_us_per_solve"] = round(dt * 1e6, 2)
        out["achieved_gflops"] = round(flops_per_lane * B / dt / 1e9, 1)
        out["achieved_vpu_fraction"] = round(vpu_passes * B / dt / VPU_PEAK, 4)
        out["achieved_hbm_gbps"] = round(
            counts["hbm_bytes_per_lane"] * B / dt / 1e9, 2)
        out["device"] = jax.devices()[0].device_kind

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "kernel_roofline%s.json"
                        % ("_contact" if args.contact else ""))
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
