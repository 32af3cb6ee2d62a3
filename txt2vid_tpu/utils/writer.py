"""Scalar metrics writer (reference --use_writer / tensorboardX surface,
trainer.py:123-126 & txt.py:151,179,186).

Primary sink is an append-only JSONL file (robust, dependency-free, machine
readable); if tensorboardX happens to be importable the scalars are mirrored there.
Note the reference's GAN loop instantiated its SummaryWriter but never wrote to it
(trainer.py:123-126) — here the trainer actually logs losses.
"""

import json
import time
from pathlib import Path

from txt2vid_tpu.utils.misc import ensure_exists


class MetricsWriter:
    def __init__(self, log_dir: str, filename: str = "metrics.jsonl"):
        ensure_exists(log_dir)
        self.path = Path(log_dir) / filename
        self._f = open(self.path, "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # optional
            self._tb = SummaryWriter(log_dir)
        except ImportError:
            pass

    def add_scalar(self, tag: str, value: float, step: int):
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step), "ts": time.time()}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
