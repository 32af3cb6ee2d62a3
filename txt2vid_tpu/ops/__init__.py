from txt2vid_tpu.ops.initializers import make_kernel_init, fused_gate_init
from txt2vid_tpu.ops.subsample import subsample_video, subsample_rect, multiscale_pyramid
from txt2vid_tpu.ops.pooling import avg_pool_3d_shape_aware, max_pool_2d, max_pool_3d, upsample_nearest_2d

__all__ = [
    "make_kernel_init", "fused_gate_init",
    "subsample_video", "subsample_rect", "multiscale_pyramid",
    "avg_pool_3d_shape_aware", "max_pool_2d", "max_pool_3d", "upsample_nearest_2d",
]
