"""Device-mesh parallelism: batched rollouts sharded over TPU meshes.

The reference is single-process shared-memory (OpenMP over loop-constraint
PCG rows, Solver.cpp:714; MKL threading) — see SURVEY.md section 2.11. The
TPU-native parallelism is different in kind: thousands of independent
rollouts/scenarios (the MPC sampling dimension) sharded over a
``jax.sharding.Mesh``, with ICI collectives (psum/pmean) replacing shared
accumulation for objective and metric reductions.

Axes:
  * "rollout" — data-parallel over tasks/initial states (the big axis).
  * "model"   — reserved for within-scene parallelism (contact-QP blocks,
    ensemble members); kept size-1 for small scenes but present so shardings
    and collectives are exercised on every mesh.
"""

from functools import partial
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map  # type: ignore
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_mesh(n_devices: Optional[int] = None, model: int = 1) -> Mesh:
    """A ("rollout", "model") mesh over the first n devices."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    assert n % model == 0, (n, model)
    arr = np.array(devs[:n]).reshape(n // model, model)
    return Mesh(arr, ("rollout", "model"))


def sharded_batch(
    solve_fn: Callable,
    mesh: Mesh,
    reduce_metrics: bool = True,
):
    """Lift a per-task solve into a mesh-sharded batched solve.

    solve_fn: (params, p0 [np], state0: State, target [3]) -> MpcResult.
    Returns run(params, p0 [B,np], state0 [B,...], targets [B,3]) with the
    batch axis sharded over BOTH mesh axes; per-shard vmap; the objective is
    reduced across the mesh with a weighted psum (finite-lane sum and count
    are psum'd separately, then divided) when reduce_metrics — the psum
    reduction the BASELINE multi-host scaling criterion measures.
    """
    vsolve = jax.vmap(solve_fn, in_axes=(None, 0, 0, 0))
    batch_spec = P(("rollout", "model"))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), batch_spec, batch_spec, batch_spec),
        out_specs=(batch_spec, P()),
        check_vma=False,
    )
    def run(params: Dict, p0, state0, targets):
        res = vsolve(params, p0, state0, targets)
        # Failure masking (SURVEY §5): average only finite lanes so one
        # diverged rollout cannot NaN the fleet-wide metric. Weighted psum
        # (sum / count) keeps the result identical to the unsharded masked
        # mean regardless of how lanes distribute over devices.
        finite = jnp.isfinite(res.objective)
        obj_sum = jnp.sum(jnp.where(finite, res.objective, 0.0))
        n_ok = jnp.sum(finite).astype(obj_sum.dtype)
        if reduce_metrics:
            obj_sum = jax.lax.psum(jax.lax.psum(obj_sum, "rollout"), "model")
            n_ok = jax.lax.psum(jax.lax.psum(n_ok, "rollout"), "model")
        # All-lanes-failed must read as failure (inf), not as a
        # perfect-looking 0/1 = 0.0 objective.
        mean_obj = jnp.where(
            n_ok > 0, obj_sum / jnp.maximum(n_ok, 1.0), jnp.inf
        )
        return res, mean_obj

    return run


def sharded_mpc_batched(solve_batched: Callable, mesh: Mesh):
    """Shard an EXPLICITLY-batched MPC solve (mpc.make_mpc_solver_batched)
    over the ("rollout", "model") mesh.

    The global batch axis splits across both mesh axes; each shard runs the
    batched solve — on TPU hardware that is the fused Pallas chord kernel
    tiling its local lanes (pallas_step.py) — and the fleet objective is the
    weighted psum of finite lanes (identical to the unsharded masked mean).
    run(params, P0 [B,np], state0 [B,...], targets [B,3]) -> (MpcResult, mean).
    """
    batch_spec = P(("rollout", "model"))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), batch_spec, batch_spec, batch_spec),
        out_specs=(batch_spec, P()),
        check_vma=False,
    )
    def run(params: Dict, P0, state0, targets):
        res = solve_batched(params, P0, state0, targets)
        finite = jnp.isfinite(res.objective)
        obj_sum = jnp.sum(jnp.where(finite, res.objective, 0.0))
        n_ok = jnp.sum(finite).astype(obj_sum.dtype)
        obj_sum = jax.lax.psum(jax.lax.psum(obj_sum, "rollout"), "model")
        n_ok = jax.lax.psum(jax.lax.psum(n_ok, "rollout"), "model")
        mean_obj = jnp.where(
            n_ok > 0, obj_sum / jnp.maximum(n_ok, 1.0), jnp.inf
        )
        return res, mean_obj

    return run


def shard_batch_arrays(mesh: Mesh, tree):
    """Device-put a batch pytree with the leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(("rollout", "model")))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
