"""Persistent caption->video generation service — the serving-path counterpart of
the training CLIs. The reference has no serving story at all (its test.py is dead
code, reference test.py:17-23); this is the production-shaped replacement.

TPU-first serving design:

- ONE fixed-shape compiled program per service: requests are tokenized, padded to
  a fixed (batch, max_caption_len) and chunked, so every call hits the same cached
  executable — zero recompiles in the serving path, ever (dynamic shapes are the
  classic XLA serving trap).
- The whole request pipeline — eval-mode Bi-LSTM caption encoding, z draw,
  eval-mode generation (running-stat BN, final scale only, reference
  trainer.py:44-90 semantics), and [-1,1] -> uint8 quantization — is a single
  fused program. Only the final uint8 video crosses back to the host: 4x less
  D2H traffic than f32 frames, which matters on remote transports.
- Optional bf16 generator compute (--bf16), same switch as training.
- `--bench N` measures sustained throughput and prints one JSON line
  (videos/sec, ms/video).
"""

import argparse
import json
import os
import time

import jax

from txt2vid_tpu.utils.cache import setup_compile_cache

setup_compile_cache()  # backend-scoped persistent compile cache (utils/cache.py)

import jax.numpy as jnp
import numpy as np


class GeneratorService:
    """Wraps a trained CondGan + state into a fixed-shape batched generator.

    `generate(sentences)` / `generate(num=n)` accepts any request size: requests
    are chunked/padded to the service batch size, so the one compiled program
    serves them all.
    """

    def __init__(self, gan, state, vocab=None, batch_size: int = 8,
                 max_caption_len: int = 16):
        self.gan = gan
        self.state = state
        self.vocab = vocab
        self.batch_size = batch_size
        self.max_caption_len = max_caption_len
        self._has_cond = (gan.cond_encoder is not None and vocab is not None
                          and state.txt_vars is not None)

        def run(g_vars, txt_vars, toks, lens, key):
            z = jax.random.normal(key, (batch_size, gan.gen.latent_size))
            cond = None
            if self._has_cond:
                cond = gan.encode(txt_vars, toks, lens)
            out = gan.generate(g_vars, z, cond=cond, train=False)
            video = out[-1] if isinstance(out, (list, tuple)) else out
            # quantize ON DEVICE: uint8 is what leaves the chip
            return jnp.clip((video.astype(jnp.float32) + 1.0) * 127.5,
                            0, 255).astype(jnp.uint8)

        self._run = jax.jit(run)

    def _tokenize(self, sentences):
        from txt2vid_tpu.data import encode_caption
        toks = np.zeros((len(sentences), self.max_caption_len), np.int32)
        lens = np.zeros((len(sentences),), np.int32)
        for i, s in enumerate(sentences):
            c = encode_caption(self.vocab, s)[:self.max_caption_len]
            toks[i, :len(c)] = c
            lens[i] = len(c)
        return toks, lens

    def generate(self, sentences=None, num: int = None, seed: int = 0):
        """-> uint8 (N, T, H, W, C). N = len(sentences) or `num`."""
        if sentences is not None:
            n = len(sentences)
            toks, lens = self._tokenize(sentences)
        else:
            n = num if num is not None else self.batch_size
            toks = np.zeros((n, self.max_caption_len), np.int32)
            lens = np.ones((n,), np.int32)

        b = self.batch_size
        pad = (-n) % b
        if pad:
            toks = np.concatenate([toks, np.zeros((pad, toks.shape[1]), np.int32)])
            lens = np.concatenate([lens, np.ones((pad,), np.int32)])

        outs = []
        for i in range(0, n + pad, b):
            key = jax.random.fold_in(jax.random.key(seed), i // b)
            outs.append(self._run(self.state.g_vars, self.state.txt_vars,
                                  jnp.asarray(toks[i:i + b]),
                                  jnp.asarray(lens[i:i + b]), key))
        return np.concatenate([np.asarray(o) for o in outs])[:n]

    @classmethod
    def from_checkpoint(cls, weights, G, D, sent=None, vocab_path=None,
                        frame_sizes=(8, 16, 32, 64), num_frames=16,
                        num_channels=3, batch_size=8, max_caption_len=16,
                        bf16=False, ema=False):
        import optax
        from txt2vid_tpu.config import create_object
        from txt2vid_tpu.gan.cond_gan import CondGan
        from txt2vid_tpu.gan.train_step import TrainConfig, init_state_abstract
        from txt2vid_tpu.utils import load_pickle
        from txt2vid_tpu.utils.checkpoint import restore_state

        vocab = load_pickle(vocab_path) if vocab_path else None
        txt_encoder = None
        cond_dim = 0
        if vocab is not None:
            txt_encoder = create_object(sent or "txt2vid_tpu.models.txt.Seq2Seq",
                                        vocab_size=len(vocab))
            cond_dim = txt_encoder.encoding_size
        kw = {"cond_dim": cond_dim}
        if bf16:
            kw["dtype"] = jnp.bfloat16
        gen = create_object(G, **kw)
        discrims = [create_object(d, cond_dim=cond_dim) for d in D]
        gan = CondGan(gen=gen, discrims=discrims, cond_encoder=txt_encoder)

        config = TrainConfig(frame_sizes=tuple(frame_sizes),
                             latent_size=gan.gen.latent_size)
        batch = {"video": jnp.zeros((batch_size, num_frames, frame_sizes[-1],
                                     frame_sizes[-1], num_channels), jnp.float32)}
        if txt_encoder is not None:
            batch["captions"] = jnp.ones((batch_size, max_caption_len), jnp.int32)
            batch["lengths"] = jnp.full((batch_size,), max_caption_len, jnp.int32)
        opt = optax.adam(1e-4)
        state = init_state_abstract(gan, jax.random.key(0), batch, opt, opt, config)
        state = restore_state(state, weights)
        if ema:
            from txt2vid_tpu.gan.ema import load_ema, with_ema_params
            ema_params = load_ema(weights, state.g_vars["params"])
            assert ema_params is not None, \
                f"ema=True: no sibling {weights}.ema (run trained without --g_ema?)"
            state = state.replace(
                g_vars=with_ema_params(state.g_vars, ema_params))
        return cls(gan, state, vocab=vocab, batch_size=batch_size,
                   max_caption_len=max_caption_len)


def main(args):
    from txt2vid_tpu.gan.trainer import save_frames
    from txt2vid_tpu.utils import status, ensure_exists

    svc = GeneratorService.from_checkpoint(
        args.weights, args.G, args.D, sent=args.sent, vocab_path=args.vocab,
        frame_sizes=tuple(args.frame_sizes), num_frames=args.num_frames,
        num_channels=args.num_channels, batch_size=args.batch_size,
        max_caption_len=args.max_caption_len, bf16=args.bf16,
        ema=getattr(args, "ema", False))

    if args.bench:
        n = args.bench
        sentences = None
        if svc.vocab is not None and args.sentences:
            sentences = (args.sentences * (n // len(args.sentences) + 1))[:n]
        svc.generate(sentences=sentences, num=n, seed=0)        # warm/compile
        t0 = time.perf_counter()
        out = svc.generate(sentences=sentences, num=n, seed=1)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "serve_videos_per_sec", "value": round(n / dt, 3),
            "unit": "videos/sec", "ms_per_video": round(1e3 * dt / n, 2),
            "batch_size": svc.batch_size, "n": n,
            "shape": list(out.shape[1:]), "dtype": "uint8",
            "cond": sentences is not None,
        }))
        return

    out = svc.generate(sentences=args.sentences, num=args.num_samples,
                       seed=args.seed)
    ensure_exists(args.out_samples)
    if args.format == "png":
        for i, v in enumerate(out):
            path = f"{args.out_samples}/serve_{i}.png"
            save_frames(v[None], path)      # uint8 passes through to_grid
            status(f"wrote {path}")
    else:
        from txt2vid_tpu.utils.video import save_video_batch
        for path in save_video_batch(
                out, f"{args.out_samples}/serve_{{i}}.{args.format}",
                fps=args.fps):
            status(f"wrote {path}")


def cli(argv=None):
    """Console-script entry point (pyproject `txt2vid-serve`)."""
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--G", required=True)
    p.add_argument("--D", nargs="+", required=True)
    p.add_argument("--sent", default=None)
    p.add_argument("--vocab", default=None)
    p.add_argument("--sentences", nargs="+", default=None)
    p.add_argument("--frame_sizes", type=int, nargs="+", default=[8, 16, 32, 64])
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--num_channels", type=int, default=3)
    p.add_argument("--num_samples", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_caption_len", type=int, default=16)
    p.add_argument("--bf16", action="store_true", default=False)
    p.add_argument("--ema", action="store_true", default=False,
                   help="serve the sibling <weights>.ema generator average "
                        "instead of the live params (gan/ema.py)")
    p.add_argument("--bench", type=int, default=0,
                   help="measure throughput over N videos, print one JSON line")
    p.add_argument("--format", default="png",
                   choices=["png", "gif", "avi", "mp4", "webm"],
                   help="png = one grid image per sample; video formats = one "
                        "playable clip per sample (utils/video.py)")
    p.add_argument("--fps", type=int, default=8,
                   help="frame rate for video-format export")
    p.add_argument("--out_samples", default="out_samples")
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args(argv))


if __name__ == "__main__":
    cli()
