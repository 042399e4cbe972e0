"""Cross-library quality checks (reference §4: golden cross-library checks
like the scipy Hausdorff comment).  Here: our t-SNE optimizer must reach a
KL divergence competitive with scikit-learn's Barnes-Hut t-SNE when both
embeddings are scored under the same joint P."""

import numpy as np
import pytest

import jax.numpy as jnp

from sph_tpu.models.tsne import TsneComputation, TsneParameters
from sph_tpu.ops.distributions import gaussian_row_distributions
from sph_tpu.ops.knn import knn_bruteforce
from sph_tpu.ops.sparse import SparseRows, symmetrize_tsne
from sph_tpu.utils.testdata import create_3d_gaussians


def kl_under_p(p: SparseRows, emb: np.ndarray) -> float:
    """Exact KL(P || Q(emb)) over P's support with full-Z normalization."""
    n = p.num_rows
    d2 = ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    w = 1.0 / (1.0 + d2)
    np.fill_diagonal(w, 0.0)
    z = w.sum()
    pv = p.to_dense().astype(np.float64)
    pv /= pv.sum()
    q = np.maximum(w / z, 1e-12)
    mask = pv > 0
    return float((pv[mask] * np.log(pv[mask] / q[mask])).sum())


def test_tsne_quality_vs_sklearn():
    from sklearn.manifold import TSNE as SkTSNE

    n, k, perp = 400, 46, 15.0
    pos, labels = create_3d_gaussians(
        n, random_state=11,
        centers=np.array([[0, 0, 0], [8, 0, 0], [0, 8, 0], [0, 0, 8]]))

    # standard t-SNE P: Gaussian on squared euclidean distances
    idx, dist = knn_bruteforce(pos, k)
    p_cond = gaussian_row_distributions(
        jnp.asarray(dist ** 2), jnp.ones_like(idx, dtype=bool),
        jnp.float32(perp), ignore_first=True)
    p = symmetrize_tsne(SparseRows(idx.astype(np.int32),
                                   np.asarray(p_cond), n))

    mine = TsneComputation(TsneParameters(num_iterations=600), block=128)
    mine.set_probability_distribution(p)
    mine.compute(600, verbose=False)
    kl_mine = kl_under_p(p, mine.embedding)

    sk = SkTSNE(n_components=2, perplexity=perp, init="random",
                random_state=0, max_iter=600)
    emb_sk = sk.fit_transform(pos)
    kl_sk = kl_under_p(p, emb_sk)

    # our exact-repulsion optimizer should do at least as well as
    # Barnes-Hut within a modest margin
    assert np.isfinite(kl_mine) and np.isfinite(kl_sk)
    assert kl_mine < kl_sk * 1.3 + 0.05, (kl_mine, kl_sk)
