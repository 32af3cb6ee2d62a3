"""Test configuration: force the XLA CPU backend with 8 virtual devices so
multi-device sharding tests run without TPU hardware (SURVEY.md §4)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # all 8 virtual devices time-slice ONE host core here; under concurrent
    # host load the default 40 s collective rendezvous deadline can starve and
    # XLA CPU exits fatally (rendezvous.cc) — raise it, it is a liveness
    # watchdog, not a correctness bound
    + " --xla_cpu_collective_call_terminate_timeout_seconds=1800"
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
)
# keep the CPU suite's persistent compile cache separate from the TPU runs'
# .jax_cache (mixed-machine AOT entries can abort on load), and MACHINE-scope
# it by cpu_count: XLA:CPU AOT entries embed the compile host's features and
# reload elsewhere with only a warning — reloaded entries have deadlocked the
# 8-virtual-device collective rendezvous on a 1-core host (threads parked at
# DIFFERENT collectives of one launch; measured 2026-08-18, __graft_entry__.py
# has the forensics). The driver-facing dryrun opts out of persistent caching
# entirely; the suite keeps it for speed, with the 1800 s terminate timeout
# below turning any wedge into a visible fatal exit instead of an infinite
# hang.
os.environ.setdefault(
    "TXT2VID_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 f".jax_cache_cpu{os.cpu_count()}"))

import jax

jax.config.update("jax_platforms", "cpu")
