"""Backend-scoped persistent compile cache setup, shared by every entry point.

Why backend-scoped: XLA:CPU persistent-cache entries are AOT machine code that
embeds the COMPILE host's CPU features and reloads anywhere else with only a
warning — observed failure modes are SIGABRT on load after a machine-feature
mismatch and a deadlocked 8-virtual-device collective rendezvous on a 1-core
host (tests/conftest.py has the forensics). Mixing CPU entries into the TPU
cache directory (e.g. by running a CLI with jax_platforms=cpu for a local
check) recreates exactly that hazard, so the CPU cache is split out and
machine-scoped by cpu_count. TXT2VID_JAX_CACHE overrides everything.
"""

import os

import jax

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def setup_compile_cache(root: str = _REPO_ROOT) -> str:
    """Point jax's persistent compile cache at a backend-appropriate directory
    and return it. Call at entry-point import time, after any jax_platforms
    override."""
    path = os.environ.get("TXT2VID_JAX_CACHE")
    if path is None:
        # default_backend() initializes the backend registry (cheap; every
        # caller is about to anyway) and honors a prior jax_platforms update
        backend = jax.default_backend()
        name = ".jax_cache" if backend != "cpu" else f".jax_cache_cpu{os.cpu_count()}"
        path = os.path.join(root, name)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
