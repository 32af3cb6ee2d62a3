"""Conditional TGANv2 (reference txt2vid/models/tganv2_cond/).

Differences from the unconditional family (tganv2_cond/gen.py:39,58 & discrim.py):
the generator fc consumes [z ‖ cond] and the second-to-last additional UpBlock carries
a non-local Attention; the discriminator threads per-scale cond vectors into the
Resnet3D dual heads. Both are parameterizations of txt2vid_tpu.models.tganv2.
"""

from functools import partial

from txt2vid_tpu.models import tganv2

MultiScaleGen = partial(tganv2.MultiScaleGen, width=64, height=64,
                        cond_dim=256, with_non_local=True)
MultiScaleDiscrim = partial(tganv2.MultiScaleDiscrim, cond_dim=256)
