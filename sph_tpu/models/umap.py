"""UMAP gradient descent.

Reference: sph/EmbedUmap.cpp — umappp-backed: NeighborList conversion,
combine_neighbor_sets (fuzzy union), spectral init via normalized_laplacian
with random fallback (:192-202), find_ab / choose_num_epochs /
similarities_to_epochs (:204-221), then per-epoch `status->run` SGD
(:233-269).

TPU-first redesign: umappp's sequential per-edge SGD is replaced by *batched
epoch updates*: every epoch processes all currently-scheduled edges at once
(gather -> force -> scatter-add), with a fixed `negative_sample_rate`
negatives drawn per active edge.  This is the standard data-parallel UMAP
formulation (same as GPU UMAP implementations); per-edge scheduling via
epochs_per_sample is preserved, so strong edges are still sampled
proportionally more often.  Convergence matches sequential SGD statistically
but not bit-for-bit.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sparse import SparseRows, symmetrize_umap
from ..utils.logging import Log


@dataclass
class UmapParameters:
    """Reference: EmbedUmap.hpp:17-23 + umappp::Options defaults."""

    num_epochs: int = 500
    output_dims: int = 2
    min_dist: float = 0.1
    spread: float = 1.0
    negative_sample_rate: int = 5
    initial_alpha: float = 1.0
    seed: int = 123456
    preset_embedding: bool = False


def find_ab(spread: float = 1.0, min_dist: float = 0.1) -> tuple[float, float]:
    """Fit the 1/(1 + a d^{2b}) curve to the target exp decay (reference:
    umappp::find_ab / umap-learn find_ab_params)."""
    from scipy.optimize import curve_fit

    def curve(x, a, b):
        return 1.0 / (1.0 + a * x ** (2 * b))

    xv = np.linspace(0, spread * 3, 300)
    yv = np.zeros_like(xv)
    yv[xv < min_dist] = 1.0
    yv[xv >= min_dist] = np.exp(-(xv[xv >= min_dist] - min_dist) / spread)
    params, _ = curve_fit(curve, xv, yv)
    return float(params[0]), float(params[1])


def choose_num_epochs(requested: int, n: int) -> int:
    """Reference: umappp::choose_num_epochs — requested if >= 0, else 500
    for small data, 200 for large."""
    if requested >= 0:
        return requested
    return 500 if n < 10_000 else 200


def make_epochs_per_sample(weights: np.ndarray, n_epochs: int) -> np.ndarray:
    """Reference: umappp similarities_to_epochs / umap-learn
    make_epochs_per_sample: an edge of weight w is sampled every
    w_max / w epochs."""
    w_max = weights.max()
    out = np.full(weights.shape, np.inf, dtype=np.float64)
    n_samples = n_epochs * (weights / w_max)
    ok = n_samples > 0
    out[ok] = n_epochs / n_samples[ok]
    return out


@functools.partial(jax.jit, static_argnames=("neg_rate",))
def _epoch_update(y, src, dst, eps, next_sample, epoch, alpha, a, b, key,
                  n_valid, neg_rate: int):
    """One batched optimization epoch over all scheduled edges.

    Split-coordinate formulation: all per-edge gathers/scatters are 1-D
    (`y0[src]`, `y0.at[src].add`) — an [E, 2] gather output tile-pads the
    minor dim 2 -> 128 on TPU (64x memory blowup; same pathology as the
    t-SNE attraction, models/tsne.py `_neighbor_diffs`)."""
    active = next_sample <= epoch
    y0, y1 = y[:, 0], y[:, 1]

    d0 = y0[src] - y0[dst]
    d1 = y1[src] - y1[dst]
    d2 = d0 * d0 + d1 * d1

    # attractive (umap-learn rdist gradient)
    gc = jnp.where(d2 > 0,
                   (-2.0 * a * b * d2 ** (b - 1.0))
                   / (a * d2 ** b + 1.0), 0.0)
    amask = jnp.where(active, alpha, 0.0)
    s0 = amask * jnp.clip(gc * d0, -4.0, 4.0)
    s1 = amask * jnp.clip(gc * d1, -4.0, 4.0)
    y0 = y0.at[src].add(s0).at[dst].add(-s0)
    y1 = y1.at[src].add(s1).at[dst].add(-s1)

    # negative sampling: neg_rate random targets per active edge
    for r in range(neg_rate):
        k = jax.random.fold_in(key, r)
        negs = jax.random.randint(k, src.shape, 0, n_valid)
        n0 = y0[src] - y0[negs]
        n1 = y1[src] - y1[negs]
        d2n = n0 * n0 + n1 * n1
        gcn = (2.0 * b) / ((0.001 + d2n) * (a * d2n ** b + 1.0))
        # coincident negative pairs (d2n == 0) get the constant +4 push per
        # dimension, matching umap-learn's else-branch (gcn is always > 0
        # here, so branching on it would leave that arm dead)
        pos = d2n > 0
        dn0 = jnp.where(pos, jnp.clip(gcn * n0, -4.0, 4.0), 4.0)
        dn1 = jnp.where(pos, jnp.clip(gcn * n1, -4.0, 4.0), 4.0)
        nmask = jnp.where(active & (negs != src), alpha, 0.0)
        y0 = y0.at[src].add(nmask * dn0)
        y1 = y1.at[src].add(nmask * dn1)

    next_sample = jnp.where(active, next_sample + eps, next_sample)
    return jnp.stack([y0, y1], axis=1), next_sample


@functools.partial(jax.jit, static_argnames=("neg_rate", "epochs"))
def _run_epochs_scan(y, src, dst, eps, next_sample, epoch0, n_epochs_total,
                     initial_alpha, a, b, key, n_valid, neg_rate: int,
                     epochs: int):
    """`epochs` epoch updates fused into one device program (lax.scan):
    per-epoch Python dispatch costs ~30-45 ms tunnel latency alone, which
    dominates UMAP wall-clock at any size."""
    def body(carry, i):
        y, next_sample = carry
        epoch = epoch0 + i
        ef = epoch.astype(jnp.float32)
        alpha = initial_alpha * (1.0 - ef / n_epochs_total)
        y, next_sample = _epoch_update(
            y, src, dst, eps, next_sample, ef, alpha, a, b,
            jax.random.fold_in(key, epoch), n_valid, neg_rate)
        return (y, next_sample), None

    (y, next_sample), _ = jax.lax.scan(body, (y, next_sample),
                                       jnp.arange(epochs), length=epochs)
    return y, next_sample


class UmapComputation:
    """Reference: sph/EmbedUmap.hpp:34 UmapComputation."""

    def __init__(self, params: Optional[UmapParameters] = None):
        self.params = params or UmapParameters()
        self._p: Optional[SparseRows] = None
        self._graph = None
        self._n = 0
        self._embedding: Optional[np.ndarray] = None
        self._preset = False
        self._should_stop = False
        self.current_epoch = 0

    # ------------------------------------------------------------------

    def set_neighbor_matrix(self, p: SparseRows):
        """probdist path (reference: setNeighborMatrix) — similarities
        already computed upstream; combined with fuzzy union here."""
        self._p = p
        self._graph = None
        self._n = p.num_rows
        self._preset = False

    def set_neighbor_graph(self, indices: np.ndarray, distances: np.ndarray):
        """distance-graph path (reference: setNeighborGraph) — smooth-knn
        similarities are computed here like umappp::initialize."""
        self._graph = (indices, distances)
        self._p = None
        self._n = indices.shape[0]
        self._preset = False

    def set_initial_embedding(self, emb: np.ndarray):
        if emb.shape[0] != self._n:
            Log.warn("UmapComputation: initial embedding wrong size, "
                     "ignoring")
            return
        self._embedding = np.asarray(emb, np.float32).copy()
        self._preset = True

    def stop(self):
        self._should_stop = True

    # ------------------------------------------------------------------

    def _memberships(self) -> SparseRows:
        if self._p is not None:
            # fuzzy union (reference: combine_neighbor_sets with mix 0.5 ->
            # umappp applies the fuzzy set union)
            return symmetrize_umap(self._p)
        import jax.numpy as jnp2
        from ..ops.distributions import smooth_knn_distributions
        idx, dist = self._graph
        mask = idx >= 0
        mask = mask.copy()
        mask[:, 0] = False  # self edge
        sims = smooth_knn_distributions(jnp2.asarray(dist),
                                        jnp2.asarray(mask))
        rows = SparseRows(np.where(mask, idx, -1).astype(np.int32),
                          np.asarray(sims), self._n)
        return symmetrize_umap(rows)

    def _init_embedding(self, memberships: SparseRows):
        if self._preset and self._embedding is not None:
            return
        from ..ops.math import spectral_embedding
        # build padded [N, K] idx/dist-like arrays for the laplacian; use
        # membership weights as affinities
        idx = np.concatenate(
            [np.arange(self._n, dtype=np.int32)[:, None],
             memberships.indices], axis=1)
        val = np.concatenate(
            [np.zeros((self._n, 1), np.float32), memberships.values], axis=1)
        emb, ok = spectral_embedding(idx, val, self.params.output_dims)
        if not ok:
            Log.warn("UmapComputation: spectral init failed, random "
                     "fallback (reference: EmbedUmap.cpp:192-202)")
        rng = np.random.default_rng(self.params.seed)
        noise = rng.standard_normal(emb.shape).astype(np.float32) * 1e-4
        self._embedding = emb + noise

    def init_optimization(self):
        """Prepare memberships, layout init and the edge schedule
        (reference: initProbabilityDistribution, :52-231)."""
        m = self._memberships()
        self._init_embedding(m)

        self._a, self._b = find_ab(self.params.spread, self.params.min_dist)
        self._n_epochs = choose_num_epochs(self.params.num_epochs, self._n)
        Log.info("UMAP: a=%.4f b=%.4f epochs=%d", self._a, self._b,
                 self._n_epochs)

        mask = m.mask & (m.values > 0)
        src = np.broadcast_to(np.arange(self._n)[:, None],
                              m.indices.shape)[mask].astype(np.int32)
        dst = m.indices[mask].astype(np.int32)
        w = m.values[mask]
        eps = make_epochs_per_sample(w, self._n_epochs).astype(np.float32)

        self._y = jnp.asarray(self._embedding)
        self._src = jnp.asarray(src)
        self._dst = jnp.asarray(dst)
        self._eps = jnp.asarray(eps)
        self._next_sample = jnp.asarray(eps.copy())
        self._key = jax.random.PRNGKey(self.params.seed)
        self.current_epoch = 0
        self._initialized = True

    def run_for_epochs(self, epochs: int):
        """Incremental optimization (reference:
        runGradientDescentForEpochs, :271-287)."""
        if not getattr(self, "_initialized", False):
            self.init_optimization()
        end = min(self.current_epoch + epochs, self._n_epochs)
        # chunk epochs per device program: bounded in-flight work (the
        # tunneled runtime kills long programs) while amortizing the
        # per-dispatch latency over many epochs; same budget scheme as
        # t-SNE's continue_gradient_descent
        budget = int(os.environ.get("SPH_UMAP_DISPATCH_BUDGET",
                                    str(1 << 24)))
        cost = max(int(self._src.shape[0])
                   * (1 + self.params.negative_sample_rate), 1)
        per_dispatch = max(1, budget // cost)
        while self.current_epoch < end:
            if self._should_stop:
                break
            step = min(per_dispatch, end - self.current_epoch)
            self._y, self._next_sample = _run_epochs_scan(
                self._y, self._src, self._dst, self._eps,
                self._next_sample, jnp.int32(self.current_epoch),
                jnp.float32(self._n_epochs),
                jnp.float32(self.params.initial_alpha),
                jnp.float32(self._a), jnp.float32(self._b),
                self._key, jnp.int32(self._n),
                self.params.negative_sample_rate, step)
            if self.current_epoch + step < end:
                jax.block_until_ready(self._y)
            self.current_epoch += step
        self._embedding = np.asarray(self._y)

    def compute(self):
        """Reference: UmapComputation::compute (:289-300)."""
        if self._n == 1:
            self._embedding = np.zeros((1, 2), np.float32)
            return
        self._should_stop = False
        self._initialized = False
        self.init_optimization()
        self.run_for_epochs(self._n_epochs)

    # ------------------------------------------------------------------

    @property
    def embedding(self) -> np.ndarray:
        return self._embedding
