"""Reference-interop layer: import trained PyTorch checkpoints from the
reference implementation (miguelmartin75/txt2vid) into txt2vid_tpu."""

from txt2vid_tpu.compat.torch_import import (  # noqa: F401
    converter_for,
    img_discrim_vars,
    img_gen_vars,
    multiscale_discrim_vars,
    multiscale_gen_vars,
    seq2seq_vars,
    tcwyt_frame_discrim_vars,
    tcwyt_frame_map_vars,
    tcwyt_gen_vars,
    tcwyt_motion_discrim_vars,
    tcwyt_video_discrim_vars,
    tgan_gen_vars,
)
