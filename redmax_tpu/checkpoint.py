"""Checkpoint / resume (new scope vs. the reference, SURVEY.md section 5:
the reference's closest feature is Scene.history + C++ reset()/reLoad()).

Uses orbax when available (the TPU-native choice) with an npz fallback, so
long MPC/optimization runs can snapshot (state, optimizer state, params,
step counter) and resume bit-exactly.
"""

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, tree: Any) -> str:
    """Save a pytree (state/opt-state/params/counters)."""
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(os.path.abspath(path), tree, force=True)
        return path
    except Exception:
        flat, treedef = jax.tree_util.tree_flatten(tree)
        np.savez(
            path + ".npz",
            *[np.asarray(x) for x in flat],
            treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        )
        return path + ".npz"


def load_checkpoint(path: str, like: Any) -> Any:
    """Restore a pytree with the same structure as `like`."""
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        return ckpt.restore(os.path.abspath(path), item=like)
    except Exception:
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        flat, treedef = jax.tree_util.tree_flatten(like)
        keys = [k for k in data.files if k != "treedef"]
        vals = [jnp.asarray(data[k]) for k in sorted(keys, key=lambda s: int(s.split("_")[1]))]
        return jax.tree_util.tree_unflatten(treedef, vals)
