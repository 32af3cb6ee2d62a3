"""Reference-interop layer: import trained PyTorch checkpoints from the
reference implementation (miguelmartin75/txt2vid) into txt2vid_tpu."""

from txt2vid_tpu.compat.torch_import import (  # noqa: F401
    multiscale_discrim_vars,
    multiscale_gen_vars,
    seq2seq_vars,
)
