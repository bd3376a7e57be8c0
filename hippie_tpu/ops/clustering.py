"""On-device clustering of latent embeddings (k-means and Gaussian mixtures).

The reference leaves clustering to host-side sklearn/UMAP glue; here
train-to-cluster is one accelerator pass (BASELINE.json north star): k-means++
style initialization + ``lax.scan`` Lloyd iterations, and a diagonal-covariance
GMM fit by EM, all jit-compiled with static iteration counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hippie_tpu.evaluate.knn_eval import pairwise_sq_dists


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans_impl(x, key, *, k: int, iters: int):
    n, d = x.shape

    # k-means++ seeding: iteratively pick centers far from current ones.
    # Unfilled slots are masked out of the min-distance (not inf-filled —
    # inf arithmetic inside the distance matmul would produce NaNs).
    def seed_body(carry, i):
        centers, key = carry
        key, sub = jax.random.split(key)
        dists = pairwise_sq_dists(x, centers)  # [n, k]
        valid = (jnp.arange(k) < i)[None, :]
        mind = jnp.min(jnp.where(valid, dists, jnp.inf), axis=1)
        probs = mind / jnp.maximum(jnp.sum(mind), 1e-12)
        idx = jax.random.choice(sub, n, p=probs)
        centers = centers.at[i].set(x[idx])
        return (centers, key), None

    key, sub = jax.random.split(key)
    first = x[jax.random.randint(sub, (), 0, n)]
    centers0 = jnp.zeros((k, d), x.dtype).at[0].set(first)
    (centers, key), _ = jax.lax.scan(
        seed_body, (centers0, key), jnp.arange(1, k)
    )

    def lloyd(carry, _):
        centers = carry
        dists = pairwise_sq_dists(x, centers)
        assign = jnp.argmin(dists, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # [n, k]
        counts = jnp.sum(onehot, axis=0)  # [k]
        sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
        )
        return new_centers, None

    centers, _ = jax.lax.scan(lloyd, centers, None, length=iters)
    dists = pairwise_sq_dists(x, centers)
    assign = jnp.argmin(dists, axis=1)
    inertia = jnp.sum(jnp.min(dists, axis=1))
    return assign, centers, inertia


def kmeans(x, k: int, *, iters: int = 50, seed: int = 0):
    """Returns (assignments [n], centers [k,d], inertia)."""
    return _kmeans_impl(jnp.asarray(x, jnp.float32), jax.random.PRNGKey(seed), k=int(k), iters=int(iters))


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _gmm_impl(x, key, *, k: int, iters: int):
    n, d = x.shape
    assign, centers, _ = _kmeans_impl(x, key, k=k, iters=10)
    onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)
    counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)
    means = centers
    var = jnp.ones((k, d), x.dtype)
    weights = counts / n

    def log_prob(x, means, var, weights):
        # [n, k] log N(x | mu_k, diag var_k) + log w_k
        diff2 = jnp.square(x[:, None, :] - means[None, :, :]) / var[None, :, :]
        ll = -0.5 * (jnp.sum(diff2, axis=2) + jnp.sum(jnp.log(var), axis=1)[None, :]
                     + d * jnp.log(2 * jnp.pi))
        return ll + jnp.log(weights)[None, :]

    def em(carry, _):
        means, var, weights = carry
        lp = log_prob(x, means, var, weights)
        resp = jax.nn.softmax(lp, axis=1)  # [n, k]
        nk = jnp.maximum(jnp.sum(resp, axis=0), 1e-8)
        new_means = jnp.dot(resp.T, x, preferred_element_type=jnp.float32) / nk[:, None]
        diff2 = jnp.square(x[:, None, :] - new_means[None, :, :])
        new_var = jnp.einsum("nk,nkd->kd", resp, diff2) / nk[:, None] + 1e-6
        new_weights = nk / n
        return (new_means, new_var, new_weights), None

    (means, var, weights), _ = jax.lax.scan(em, (means, var, weights), None, length=iters)
    lp = log_prob(x, means, var, weights)
    assign = jnp.argmax(lp, axis=1)
    ll = jnp.sum(jax.nn.logsumexp(lp, axis=1))
    return assign, means, var, weights, ll


def gmm(x, k: int, *, iters: int = 100, seed: int = 0):
    """Diagonal-covariance GMM via EM. Returns (assign, means, var, weights, log_likelihood)."""
    return _gmm_impl(jnp.asarray(x, jnp.float32), jax.random.PRNGKey(seed), k=int(k), iters=int(iters))
