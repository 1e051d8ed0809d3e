"""Test configuration: run everything on a virtual 8-device CPU mesh in f64.

Correctness parity with the MATLAB reference (energy certificates, 1e-6 FD
thresholds) requires float64; the CPU backend provides it natively. The 8
virtual devices let sharding tests validate multi-chip layouts without TPU
hardware (the real-TPU path is exercised by bench.py / __graft_entry__.py).

Note: this container's sitecustomize imports jax and registers the axon TPU
tunnel in every process, so the platform must be overridden via jax.config
(env vars are read at that early import).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: scene x integrator programs are expensive to
# compile on CPU; cache across runs (and across xdist workers).
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
