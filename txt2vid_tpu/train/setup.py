"""Run setup: seeding + device report (reference txt2vid/train/setup.py).

JAX needs no cudnn.benchmark / device pinning — XLA autotunes and the platform is
chosen by the runtime; determinism comes from explicit PRNG keys, with numpy/python
seeds set for the host-side pipeline."""

import random

import numpy as np
import jax

from txt2vid_tpu.utils import status


def set_seed(seed=None):
    if seed is None:
        seed = random.randint(0, 2 ** 31 - 1)
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    return seed


def setup(args):
    seed = set_seed(getattr(args, "seed", None))
    status(f"seed: {seed}")
    devices = jax.devices()
    status(f"{len(devices)} {devices[0].platform} device(s) available")
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    return seed, devices
