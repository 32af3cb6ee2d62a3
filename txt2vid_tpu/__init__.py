"""txt2vid_tpu — a TPU-native text-to-video GAN framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the PyTorch reference
`miguelmartin75/txt2vid` (see SURVEY.md): the TCWYT / TGAN / TGANv2 model families,
Bi-LSTM caption conditioning with StackGAN++-style dual discriminator heads, the
relativistic GAN loss zoo with gradient penalty, the TGANv2 subsample pyramid, and a
host-side video data pipeline — built as pure-functional jitted programs sharded over a
`jax.sharding.Mesh`, with the non-local attention blocks as fused Pallas TPU kernels.

Layout convention: videos are channel-LAST `(B, T, H, W, C)` and frames `(B, H, W, C)`
throughout the device-side code (TPU/XLA prefers trailing feature dims); the reference's
channel-first `(B, C, T, H, W)` appears only at the host I/O boundary.
"""

__version__ = "0.1.0"
