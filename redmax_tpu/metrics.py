"""First-class performance/correctness counters (SURVEY.md section 5).

The reference records per-step wall time, solve time and CG/Newton
iteration counts (ChronoTimer.h:28-40; SolverDataTracker, Solver.h:19-22;
batchTest aggregation, Scene.cpp:248-287). Equivalents here:

  * ``Timer`` — tic/toc slots (ChronoTimer role), host-side;
  * ``bench_throughput`` — solves/s measurement with compile exclusion;
  * ``energy_drift`` — the PASS/FAIL certificate quantity;
  * iteration counters come back from the solvers themselves
    (newton info dict, PcgResult.iters) and should be reduced with
    jnp.mean over the batch before host transfer.
"""

import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


class Timer:
    """tic/toc multi-slot wall-clock timer (ChronoTimer.h:28-40)."""

    def __init__(self):
        self.t0: Dict[str, float] = {}
        self.total: Dict[str, float] = {}
        self.count: Dict[str, int] = {}

    def tic(self, slot: str = "") -> None:
        self.t0[slot] = time.perf_counter()

    def toc(self, slot: str = "") -> float:
        dt = time.perf_counter() - self.t0[slot]
        self.total[slot] = self.total.get(slot, 0.0) + dt
        self.count[slot] = self.count.get(slot, 0) + 1
        return dt

    def report(self) -> Dict[str, float]:
        return {
            k: {"total_s": v, "count": self.count[k], "avg_s": v / self.count[k]}
            for k, v in self.total.items()
        }


def bench_throughput(fn: Callable, args, n_warmup: int = 1, n_reps: int = 3):
    """(per-call seconds, calls/s) with compile excluded; blocks on results."""
    for _ in range(n_warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_reps
    return dt, 1.0 / dt


def energy_drift(scene, state_final) -> float:
    """H_end = T_end + (V_end - V_0) — the certificate quantity
    (Scene.plotEnergies, matlab-diff/+redmax/Scene.m:164-191)."""
    T0, V0 = scene.energies(scene.state0.q, scene.state0.qdot)
    T, V = scene.energies(state_final.q, state_final.qdot, state_final.aux)
    return float(T) + float(V) - float(V0)
