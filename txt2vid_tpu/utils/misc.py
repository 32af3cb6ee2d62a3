"""Small host-side helpers (cf. reference txt2vid/util/{misc,pick,dir}.py)."""

import pickle
from pathlib import Path

import numpy as np
import jax


def gen_perm(n: int, rng: np.random.Generator | None = None) -> np.ndarray:
    """Permutation of range(n) that is not the identity (reference util/misc.py:3-8):
    used to pair real videos with mismatched ("fake") captions. For n == 1 the identity
    is unavoidable and returned as-is."""
    if rng is None:
        rng = np.random.default_rng()
    if n <= 1:
        return np.arange(n)
    perm = rng.permutation(n)
    while np.array_equal(perm, np.arange(n)):
        perm = rng.permutation(n)
    return perm


def gen_perm_device(key, n: int):
    """Traced variant of gen_perm for use inside jit: a uniformly random n-cycle.

    Built as sigma . (+1 shift) . sigma^-1 for a random permutation sigma, i.e.
    perm[p[i]] = p[(i+1) % n]. Every n-cycle is a derangement (no fixed point at
    all — strictly stronger than the reference's "not identity" property,
    util/misc.py:3-8), the distribution is uniform over all (n-1)! n-cycles, and
    shapes stay static under jit. n == 1 has no derangement; identity is returned.
    """
    import jax.numpy as jnp

    if n <= 1:
        return jnp.arange(n)
    p = jax.random.permutation(key, n)
    return jnp.zeros((n,), p.dtype).at[p].set(jnp.roll(p, -1))


def count_params(params) -> int:
    """Total number of scalars in a parameter pytree (reference util/misc.py:10-11)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


class _CompatUnpickler(pickle.Unpickler):
    """Unpickler that resolves the reference's module paths onto this package, so
    artifacts pickled by the reference (e.g. a `txt2vid.data.Vocab`,
    /root/reference/txt2vid/data/__init__.py:260-316 — attribute-compatible with our
    Vocab) load directly into our classes."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ModuleNotFoundError, AttributeError):
            if module == "txt2vid" or module.startswith("txt2vid."):
                alias = module.replace("txt2vid", "txt2vid_tpu", 1)
                return super().find_class(alias, name)
            raise


def load_pickle(path: str):
    """Load a pickle file (reference util/pick.py), accepting reference-pickled
    class instances via module aliasing."""
    with open(path, "rb") as f:
        return _CompatUnpickler(f).load()


def ensure_exists(path: str) -> None:
    """mkdir -p (reference util/dir.py)."""
    Path(path).mkdir(parents=True, exist_ok=True)
