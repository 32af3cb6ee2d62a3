"""CIFAR-10 image dataset from local python-format batches (reference
data/__init__.py:372-374 wraps torchvision.datasets.CIFAR10; this reads the same
`cifar-10-batches-py` files directly — no download, no torchvision)."""

import pickle
from pathlib import Path

import numpy as np

from txt2vid_tpu.data import transform_frames


class Cifar10Dataset:
    def __init__(self, data_dir, train=True, frame_size=None, num_channels=3):
        root = Path(data_dir)
        batch_dir = root / "cifar-10-batches-py"
        if batch_dir.exists():
            root = batch_dir
        names = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
        xs = []
        for n in names:
            p = root / n
            if not p.exists():
                continue
            with open(p, "rb") as f:
                d = pickle.load(f, encoding="bytes")
            xs.append(np.asarray(d[b"data"], dtype=np.uint8))
        if not xs:
            raise FileNotFoundError(f"no CIFAR-10 batches under {root}")
        self.images = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        self.frame_size = frame_size
        self.num_channels = num_channels

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        img = self.images[idx][None]  # (1, H, W, C) as a 1-frame video
        img = transform_frames(img, self.frame_size, self.num_channels)
        return img[0], None
