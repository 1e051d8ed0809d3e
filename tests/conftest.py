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

if os.environ.get("REDMAX_TPU_TESTS"):
    # On-TPU plumbing gate (tests/test_pallas_tpu.py): leave the axon TPU
    # registration in place and stay f32 (the TPU has no f64). Run as
    #   REDMAX_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py -n 0
    pass
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: scene x integrator programs are expensive to
# compile on CPU; cache across runs. Per-xdist-worker directories so two
# workers never read/write the same entry concurrently (a torn zstd read
# segfaults the reader); worker ids (gw0/gw1) are stable across runs, so
# each worker still gets a warm cache.
_worker = os.environ.get("PYTEST_XDIST_WORKER", "main")
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache", _worker)
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _bound_memory_maps():
    """Keep the worker below vm.max_map_count (65530 default).

    Root cause of the historical 'xdist worker crash' at the recursive-ode45
    certificates (it was never an xdist or cache-file race): every giant
    while-loop executable LLVM-JITs ~3-5k memory maps and the executables
    are retained by the jit caches, so a worker that keeps compiling heavy
    programs crosses the map limit after ~a dozen of them and the next mmap
    anywhere — compile, cache read, zstd — fails ('LLVM compilation error:
    Cannot allocate memory', then SIGSEGV/SIGABRT). Reproduced solo with a
    30-iteration compile loop (dies at ~13 with 43k+ maps); jax.clear_caches
    drops the process from ~7000 to ~670 maps. Clearing only when near the
    threshold keeps warm-cache speed for everything else.
    """
    yield
    try:
        with open(f"/proc/{os.getpid()}/maps") as fh:
            nmaps = sum(1 for _ in fh)
    except OSError:
        return
    if nmaps > 30000:
        jax.clear_caches()
