"""Utility layer (cf. reference txt2vid/util/*: log, metrics, stopwatch, pick, misc, dir)."""

from txt2vid_tpu.utils.logging import status, warn, error
from txt2vid_tpu.utils.metrics import RollingAvg
from txt2vid_tpu.utils.stopwatch import Stopwatch
from txt2vid_tpu.utils.misc import gen_perm, count_params, load_pickle, ensure_exists

__all__ = [
    "status", "warn", "error", "RollingAvg", "Stopwatch",
    "gen_perm", "count_params", "load_pickle", "ensure_exists",
]
