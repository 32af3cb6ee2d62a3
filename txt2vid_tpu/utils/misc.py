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
    """Traced variant of gen_perm for use inside jit: a random roll by 1..n-1 positions.

    A cyclic shift by k in [1, n) is always a derangement (no fixed point at all, which
    is strictly stronger than the reference's "not identity" property) and keeps static
    shapes under jit.
    """
    import jax.numpy as jnp

    shift = jax.random.randint(key, (), 1, max(n, 2))
    return (jnp.arange(n) + shift) % n


def count_params(params) -> int:
    """Total number of scalars in a parameter pytree (reference util/misc.py:10-11)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def load_pickle(path: str):
    """Load a pickle file (reference util/pick.py)."""
    with open(path, "rb") as f:
        return pickle.load(f)


def ensure_exists(path: str) -> None:
    """mkdir -p (reference util/dir.py)."""
    Path(path).mkdir(parents=True, exist_ok=True)
