"""Reconstruction quality metrics: PSNR / SSIM (+ feature-FID scaffolding).

These back the acceptance gates from BASELINE.md (MingTok recon PSNR 30.77,
SSIM 0.62, rFID 0.54 on ImageNet-val). PSNR/SSIM are exact standard formulas
(SSIM per Wang et al. 2004, gaussian 11x11 sigma=1.5, K1=0.01 K2=0.03 — the
convention scikit-image / reference eval stacks use). FID needs an Inception
embedder + the 50k val set, neither of which is in this image; the statistics
machinery (mean/cov + Frechet distance) is provided so any embedder plugs in.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def psnr(a, b, data_range: float = 2.0) -> float:
    """Peak signal-to-noise ratio; default range 2.0 for [-1, 1] images."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    mse = jnp.mean(jnp.square(a - b))
    return float(10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(a, b, data_range: float = 2.0) -> float:
    """Mean SSIM over channels. a, b: (C, H, W) or (B, C, H, W) in [-range/2, range/2]."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 3:
        a, b = a[None], b[None]
    B, C, H, W = a.shape
    k = _gaussian_kernel()[None, None]  # (1, 1, 11, 11)

    def filt(x):
        x = x.reshape(B * C, 1, H, W)
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
        )
        return y.reshape(B, C, y.shape[-2], y.shape[-1])

    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    mu_a, mu_b = filt(a), filt(b)
    saa = filt(a * a) - mu_a * mu_a
    sbb = filt(b * b) - mu_b * mu_b
    sab = filt(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + C1) * (2 * sab + C2)) / ((mu_a**2 + mu_b**2 + C1) * (saa + sbb + C2))
    return float(jnp.mean(s))


# ---------------------------------------------------------------------------
# Frechet distance over arbitrary feature embeddings (rFID machinery)
# ---------------------------------------------------------------------------


class FeatureStats:
    """Streaming mean/covariance accumulator for FID-style metrics."""

    def __init__(self, dim: int):
        self.n = 0
        self.sum = np.zeros(dim, np.float64)
        self.outer = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray):
        f = np.asarray(feats, np.float64)
        self.n += f.shape[0]
        self.sum += f.sum(axis=0)
        self.outer += f.T @ f

    @property
    def mean(self):
        return self.sum / max(self.n, 1)

    @property
    def cov(self):
        mu = self.mean
        return self.outer / max(self.n - 1, 1) - np.outer(mu, mu) * self.n / max(self.n - 1, 1)


def frechet_distance(stats_a: FeatureStats, stats_b: FeatureStats, eps: float = 1e-6) -> float:
    """Frechet distance between two gaussians fit to feature sets."""
    import scipy.linalg

    mu1, mu2 = stats_a.mean, stats_b.mean
    c1, c2 = stats_a.cov, stats_b.cov
    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(c1 @ c2)
    if not np.isfinite(covmean).all():
        offset = np.eye(c1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((c1 + offset) @ (c2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(c1) + np.trace(c2) - 2 * np.trace(covmean))


def rfid(feature_fn, real_images, recon_images) -> float:
    """rFID over any feature extractor (`feature_fn: (B,3,H,W) -> (B,dim)`) —
    utils.feature_net.TinyConvFeatures runs today; InceptionV3 pool3 features
    reproduce the published number once weights are available."""
    fa = np.asarray(feature_fn(real_images))
    fb = np.asarray(feature_fn(recon_images))
    sa, sb = FeatureStats(fa.shape[1]), FeatureStats(fb.shape[1])
    sa.update(fa)
    sb.update(fb)
    return frechet_distance(sa, sb)


def recon_metrics(original, reconstructed, lpips_params=None) -> dict:
    """The BASELINE.md gate triple. LPIPS is included when `lpips_params` is
    supplied (utils.feature_net: real weights via lpips_params_from_torch, or
    random_lpips_params for pipeline tests)."""
    out = {
        "psnr": psnr(original, reconstructed),
        "ssim": ssim(original, reconstructed),
    }
    if lpips_params is not None:
        from mingunivision_tpu.utils.feature_net import lpips_distance

        out["lpips"] = float(np.mean(np.asarray(lpips_distance(lpips_params, original, reconstructed))))
    return out
