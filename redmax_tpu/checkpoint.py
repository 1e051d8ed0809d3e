"""Checkpoint / resume (new scope vs. the reference, SURVEY.md section 5:
the reference's closest feature is Scene.history + C++ reset()/reLoad()).

Uses orbax when available (the TPU-native choice) with an npz fallback, so
long MPC/optimization runs can snapshot (state, optimizer state, params,
step counter) and resume bit-exactly. `checkpointed_run` drives a
checkpoint-every-k / resume loop around any jittable iterate function —
the SURVEY section-5 "orbax-style checkpoint per MPC iteration" pattern,
exercised end-to-end in tests/test_io.py::test_mpc_checkpoint_resume.
"""

import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _orbax():
    try:
        import orbax.checkpoint as ocp
    except ImportError:           # orbax genuinely absent -> npz fallback
        return None
    return ocp


def save_checkpoint(path: str, tree: Any, backend: str = "auto") -> str:
    """Save a pytree (state/opt-state/params/counters).

    backend: "auto" (orbax when importable, else npz), "orbax", "npz".
    Serialization errors propagate — a checkpoint that silently failed to
    write is worse than a crash.
    """
    ocp = _orbax() if backend in ("auto", "orbax") else None
    if backend == "orbax" and ocp is None:
        raise ImportError("orbax requested but not importable")
    if ocp is not None:
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(os.path.abspath(path), tree, force=True)
        return path
    flat, _ = jax.tree_util.tree_flatten(tree)
    # Explicit zero-padded keys: load order is fixed by OUR naming, not by
    # numpy's arr_N convention.
    np.savez(path + ".npz",
             **{f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(flat)})
    return path + ".npz"


def load_checkpoint(path: str, like: Any, backend: str = "auto") -> Any:
    """Restore a pytree with the same structure as `like`."""
    ocp = _orbax() if backend in ("auto", "orbax") else None
    if backend == "orbax" and ocp is None:
        raise ImportError("orbax requested but not importable")
    if ocp is not None and (backend == "orbax" or os.path.isdir(path)):
        ckpt = ocp.PyTreeCheckpointer()
        return ckpt.restore(os.path.abspath(path), item=like)
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    flat, treedef = jax.tree_util.tree_flatten(like)
    keys = sorted(k for k in data.files if k.startswith("leaf_"))
    if len(keys) != len(flat):
        raise ValueError(
            f"checkpoint has {len(keys)} leaves, expected {len(flat)}"
        )
    vals = [jnp.asarray(data[k]) for k in keys]
    return jax.tree_util.tree_unflatten(treedef, vals)


def checkpointed_run(
    iterate: Callable,
    carry0: Any,
    n_iters: int,
    ckpt_dir: str,
    every: int = 10,
    backend: str = "auto",
) -> Any:
    """Run `carry = iterate(carry, i)` for i in [start, n_iters), writing a
    checkpoint of (carry, i+1) every `every` iterations, and RESUMING from
    the latest checkpoint in ckpt_dir if one exists (crash-recovery
    semantics: re-invoking after an interrupt continues where the last
    snapshot left off). Returns the final carry.

    The iteration index is stored alongside the carry so a resumed run
    replays no optimizer steps (bit-exact resume is tested in
    tests/test_io.py::test_mpc_checkpoint_resume).
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    tag = os.path.join(ckpt_dir, "latest")
    carry, start = carry0, 0
    if os.path.exists(tag) or os.path.exists(tag + ".npz"):
        carry, it = load_checkpoint(
            tag, (carry0, jnp.zeros((), jnp.int32)), backend=backend
        )
        start = int(it)
    for i in range(start, n_iters):
        carry = iterate(carry, i)
        if (i + 1) % every == 0 or (i + 1) == n_iters:
            save_checkpoint(
                tag, (carry, jnp.asarray(i + 1, jnp.int32)), backend=backend
            )
    return carry
