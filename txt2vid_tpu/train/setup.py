"""Run setup: seeding + device report (reference txt2vid/train/setup.py).

JAX needs no cudnn.benchmark / device pinning — XLA autotunes and the platform is
chosen by the runtime; determinism comes from explicit PRNG keys, with numpy/python
seeds set for the host-side pipeline."""

import random

import numpy as np
import jax

from txt2vid_tpu.utils import status


def maybe_init_distributed(args):
    """Multi-host gating (SURVEY.md §2.8 DCN row): when `--multihost` is set,
    initialize the jax distributed runtime BEFORE the first backend touch so
    every process sees the GLOBAL device set and pjit collectives span hosts.

    On a TPU pod slice `jax.distributed.initialize()` auto-discovers the
    coordinator from the TPU metadata; elsewhere (and in the 2-process CPU test,
    tests/test_multihost.py) pass --coordinator/--num_processes/--process_id
    explicitly. Returns True when distributed mode is active."""
    if not getattr(args, "multihost", False):
        return False
    kw = {}
    if getattr(args, "coordinator", None):
        kw = dict(coordinator_address=args.coordinator,
                  num_processes=args.num_processes,
                  process_id=args.process_id)
    jax.distributed.initialize(**kw)
    status(f"multihost: process {jax.process_index()}/{jax.process_count()}, "
           f"{jax.local_device_count()} local of {jax.device_count()} devices")
    return True


def is_main_process() -> bool:
    """True on the process that owns host-side side effects (checkpoint writes,
    sample dumps, metric logs). Always True single-process."""
    return jax.process_index() == 0


def add_multihost_args(parser):
    parser.add_argument('--multihost', action='store_true', default=False,
                        help='initialize jax.distributed (multi-host training): '
                             'auto-discovery on TPU pods, or explicit '
                             '--coordinator/--num_processes/--process_id. '
                             'Each process feeds batch_size/num_processes '
                             'items; checkpoints/samples/logs are written by '
                             'process 0 only.')
    parser.add_argument('--coordinator', type=str, default=None,
                        help='coordinator address host:port (omit on TPU pods)')
    parser.add_argument('--num_processes', type=int, default=None)
    parser.add_argument('--process_id', type=int, default=None)


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
