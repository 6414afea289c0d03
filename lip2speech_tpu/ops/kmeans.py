"""TPU-native k-means: minibatch training + one-matmul assignment.

Replaces the reference's sklearn MiniBatchKMeans pipeline
(avhubert/clustering/learn_kmeans.py:26-147 + dump_km_label.py): the
assignment step ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 is a single batched
matmul on the MXU; training runs jitted minibatch updates with per-cluster
learning rates (the MiniBatchKMeans update rule).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def assign(x: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """(N, D) features x (K, D) centroids -> (N,) nearest-centroid ids."""
    x2 = jnp.sum(jnp.square(x), axis=1, keepdims=True)
    c2 = jnp.sum(jnp.square(centroids), axis=1)
    d = x2 - 2.0 * (x @ centroids.T) + c2
    return jnp.argmin(d, axis=1).astype(jnp.int32)


@jax.jit
def _minibatch_update(centroids, counts, batch):
    ids = assign(batch, centroids)
    one_hot = jax.nn.one_hot(ids, centroids.shape[0], dtype=batch.dtype)
    batch_counts = one_hot.sum(axis=0)                       # (K,)
    sums = one_hot.T @ batch                                 # (K, D)
    new_counts = counts + batch_counts
    # MiniBatchKMeans: per-sample lr 1/count -> batched closed form
    lr = jnp.where(batch_counts > 0, batch_counts / jnp.maximum(new_counts, 1.0), 0.0)
    means = sums / jnp.maximum(batch_counts[:, None], 1.0)
    new_centroids = centroids + lr[:, None] * (means - centroids)
    inertia = jnp.sum(jnp.square(batch - centroids[ids]))
    return new_centroids, new_counts, inertia


def _kmeans_pp_init(data: np.ndarray, k: int, rng: np.random.Generator,
                    sample_cap: int = 50_000) -> np.ndarray:
    """k-means++ seeding (D^2 sampling) on a subsample — avoids the split/dead
    cluster failure of uniform init (sklearn's default, which the reference's
    MiniBatchKMeans also uses)."""
    if len(data) > sample_cap:
        data = data[rng.choice(len(data), sample_cap, replace=False)]
    data = data.astype(np.float32)
    cents = [data[rng.integers(len(data))]]
    d2 = ((data - cents[0]) ** 2).sum(1)
    for _ in range(1, k):
        probs = d2 / max(d2.sum(), 1e-12)
        idx = rng.choice(len(data), p=probs)
        cents.append(data[idx])
        d2 = np.minimum(d2, ((data - cents[-1]) ** 2).sum(1))
    return np.stack(cents)


def kmeans_fit(
    data: np.ndarray,
    n_clusters: int = 200,
    batch_size: int = 10_000,
    n_steps: int = 500,
    seed: int = 0,
) -> np.ndarray:
    """Minibatch k-means on (N, D) features -> (K, D) float32 centroids."""
    rng = np.random.default_rng(seed)
    n = data.shape[0]
    if n < n_clusters:
        raise ValueError(f"need >= {n_clusters} samples, got {n}")
    centroids = jnp.asarray(_kmeans_pp_init(data, n_clusters, rng), jnp.float32)
    counts = jnp.zeros((n_clusters,), jnp.float32)
    for _ in range(n_steps):
        idx = rng.integers(0, n, min(batch_size, n))
        batch = jnp.asarray(data[idx], jnp.float32)
        centroids, counts, _ = _minibatch_update(centroids, counts, batch)
    return np.asarray(centroids)


def kmeans_apply(features: np.ndarray, centroids: np.ndarray,
                 chunk: int = 100_000) -> np.ndarray:
    """Label (N, D) features -> (N,) int32 unit ids (ApplyKmeans equivalent)."""
    c = jnp.asarray(centroids, jnp.float32)
    out = []
    for i in range(0, len(features), chunk):
        out.append(np.asarray(assign(jnp.asarray(features[i : i + chunk], jnp.float32), c)))
    return np.concatenate(out) if out else np.zeros((0,), np.int32)


def save_km(path, centroids: np.ndarray) -> None:
    np.save(path, centroids.astype(np.float32))


def load_km(path) -> np.ndarray:
    return np.load(path)
