"""Model library — flax.linen re-designs of the reference model zoo.

All modules are channel-last: frames (B, H, W, C), videos (B, T, H, W, C).
Every module takes `init_method` ("xavier" | "ortho" | "normal") mirroring the
reference's post-construction `init(model, method)` (util/torch/init.py), including
the sqrt(2) gain on residual inner paths.
"""

from txt2vid_tpu.models import layers, conv_lstm, resnet3d, tganv2, tganv2_cond, tgan, tcwyt, img, txt

__all__ = ["layers", "conv_lstm", "resnet3d", "tganv2", "tganv2_cond", "tgan", "tcwyt", "img", "txt"]
