"""Sample-fidelity metrics.

The reference never implemented quantitative evaluation ("A FID score ... was going to
be utilised, but unfortunately was not incorporated", thesis.tex:557; evaluation was
visual). This module closes that gap with the FID machinery and a self-contained
feature extractor:

  * `frechet_distance` — the standard Frechet distance between Gaussians fit to two
    feature sets (matrix-sqrt via eigendecomposition of the symmetrized product).
  * `RandomConvFeatures` — a fixed random conv feature extractor (random-projection
    FID is a known cheap proxy when a pretrained Inception is unavailable; this
    environment has no network egress). Any (params, apply) pair producing (B, D)
    features can be substituted — e.g. a trained discriminator backbone via
    `Resnet3D` features.
  * `sample_fidelity_report` — FID between real and generated video batches plus
    basic pixel statistics, the round-trip metric for the synthetic-MNIST config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6):
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2*sqrt(S1 S2)), numpy (host-side)."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)
    diff = mu1 - mu2

    # sqrt of S1 S2 via eigendecomposition of the symmetrized problem:
    # sqrt(S1 S2) has the same trace as sqrt(sqrt(S1) S2 sqrt(S1)) (PSD)
    w1, v1 = np.linalg.eigh(sigma1 + eps * np.eye(len(sigma1)))
    sqrt_s1 = (v1 * np.sqrt(np.clip(w1, 0, None))) @ v1.T
    inner = sqrt_s1 @ sigma2 @ sqrt_s1
    w, _ = np.linalg.eigh(inner)
    tr_sqrt = np.sum(np.sqrt(np.clip(w, 0, None)))

    # numerical cancellation can leave a tiny negative for (near-)identical inputs
    return float(max(0.0, diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                     - 2.0 * tr_sqrt))


def fid_from_features(feats_real, feats_fake):
    """FID between two (N, D) feature sets."""
    fr = np.asarray(feats_real, np.float64)
    ff = np.asarray(feats_fake, np.float64)
    mu_r, mu_f = fr.mean(0), ff.mean(0)
    cov_r = np.cov(fr, rowvar=False)
    cov_f = np.cov(ff, rowvar=False)
    return frechet_distance(mu_r, cov_r, mu_f, cov_f)


class RandomConvFeatures(nn.Module):
    """Fixed random 3D conv pyramid -> (B, feature_dim) for videos (B, T, H, W, C)."""

    feature_dim: int = 256

    @nn.compact
    def __call__(self, x):
        for ch in (32, 64, 128):
            x = nn.Conv(ch, (3, 3, 3), strides=(1, 2, 2), use_bias=False)(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2, 3))
        return nn.Dense(self.feature_dim, use_bias=False)(x)


def extract_features(videos, params=None, model=None, batch_size: int = 32):
    """Run the feature extractor over a (N, T, H, W, C) array in chunks."""
    model = model or RandomConvFeatures()
    if params is None:
        params = model.init(jax.random.key(0), jnp.asarray(videos[:1]))
    apply = jax.jit(model.apply)
    feats = []
    for i in range(0, len(videos), batch_size):
        feats.append(np.asarray(apply(params, jnp.asarray(videos[i:i + batch_size]))))
    return np.concatenate(feats), params


import weakref

# weak keys: the cached jitted closure must not pin finished CondGan objects
# alive in long-lived processes
_discrim_fwd_cache = weakref.WeakKeyDictionary()


def discrim_features(gan, state, videos, batch_size: int = 32):
    """(N, T, H, W, C) -> (N, D) features from the TRAINED discriminator backbone
    (Resnet3D global-sum-pooled features, resnet3d.py dual-head input) — the
    'trained Inception' role for FID. Far better dynamic range than the random-conv
    proxy once a trained checkpoint exists."""
    import jax
    import jax.numpy as jnp

    # one jitted forward per gan object: a fresh closure per call would defeat
    # the jit cache and recompile for the real and fake sets separately
    fwd = _discrim_fwd_cache.get(gan)
    if fwd is None:
        def fwd(d_vars, v):
            preds = gan.apply_discrim(0, d_vars, [v], None, train=False)
            return preds[0][2]
        fwd = jax.jit(fwd)
        _discrim_fwd_cache[gan] = fwd

    feats = []
    for i in range(0, len(videos), batch_size):
        feats.append(np.asarray(fwd(state.d_vars[0],
                                    jnp.asarray(videos[i:i + batch_size]))))
    return np.concatenate(feats)


def sample_fidelity_report(real_videos, fake_videos, batch_size: int = 32,
                           feature_fn=None):
    """FID (random-conv features, + trained-feature FID when `feature_fn` is given)
    and pixel statistics between two video sets."""
    fr, params = extract_features(real_videos, batch_size=batch_size)
    ff, _ = extract_features(fake_videos, params=params, batch_size=batch_size)
    real = np.asarray(real_videos, np.float32)
    fake = np.asarray(fake_videos, np.float32)
    report = {
        "fid_random_conv": fid_from_features(fr, ff),
        "real_mean": float(real.mean()), "fake_mean": float(fake.mean()),
        "real_std": float(real.std()), "fake_std": float(fake.std()),
    }
    if feature_fn is not None:
        report["fid_discrim"] = fid_from_features(feature_fn(real_videos),
                                                  feature_fn(fake_videos))
    return report
