from txt2vid_tpu.gan import losses
from txt2vid_tpu.gan.cond_gan import CondGan

__all__ = ["losses", "CondGan"]
