"""Functional EMA vector quantization (EnCodec-lineage RVQ) for TPU.

Parity targets: reference ``modules/quantization/core_vq.py`` + ``vq.py`` —
kmeans init on the first training batch, nearest-neighbour assignment by
expanded L2, straight-through estimator, EMA cluster/embed updates with
Laplace smoothing, dead-code expiry, and an ``n_q``-deep residual loop.

TPU-first departures:

* All codebook statistics (``inited``, ``cluster_size``, ``embed``,
  ``embed_avg``) live in a flax ``vq_stats`` variable collection and are
  updated functionally — no in-place buffer mutation.
* Under pjit/GSPMD the batch is one global array, so kmeans init, EMA
  statistics and expiry are computed identically on every replica by
  construction.  The reference needs explicit rank-0 codebook broadcasts
  after data-dependent reinit (``core_vq.py:151,169``); that pattern is
  eliminated entirely.
* Dead-code expiry here also refreshes ``embed_avg``/``cluster_size`` so the
  replacement survives the EMA renormalization.  The reference's expiry is
  overwritten in the same step by ``embed = embed_avg / cluster_size``
  (the known EnCodec issue #25 it preserves "for reproducibility");
  set ``fixed_expiry=False`` to reproduce that no-op behaviour.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _sample_vectors(rng: jax.Array, samples: jnp.ndarray, num: int) -> jnp.ndarray:
    n = samples.shape[0]
    if n >= num:
        idx = jax.random.permutation(rng, n)[:num]
    else:
        idx = jax.random.randint(rng, (num,), 0, n)
    return samples[idx]


def _kmeans(rng: jax.Array, samples: jnp.ndarray, num_clusters: int, num_iters: int):
    """Plain Lloyd iterations; returns (means, bin_counts)."""
    dim = samples.shape[-1]
    means = _sample_vectors(rng, samples, num_clusters)

    def body(_, means):
        dists = (
            -(samples**2).sum(-1, keepdims=True)
            + 2 * samples @ means.T
            - (means**2).sum(-1)[None, :]
        )
        buckets = jnp.argmax(dists, axis=-1)
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)
        bins = onehot.sum(0)
        sums = onehot.T @ samples
        new_means = sums / jnp.clip(bins, 1.0, None)[:, None]
        return jnp.where((bins == 0)[:, None], means, new_means)

    means = jax.lax.fori_loop(0, num_iters, body, means)
    dists = (
        -(samples**2).sum(-1, keepdims=True)
        + 2 * samples @ means.T
        - (means**2).sum(-1)[None, :]
    )
    buckets = jnp.argmax(dists, axis=-1)
    bins = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype).sum(0)
    return means, bins


class EuclideanCodebook(nn.Module):
    dim: int
    codebook_size: int
    kmeans_init: bool = True
    kmeans_iters: int = 50
    decay: float = 0.99
    epsilon: float = 1e-5
    threshold_ema_dead_code: float = 2.0
    fixed_expiry: bool = True

    def setup(self):
        init_embed = (
            nn.initializers.zeros
            if self.kmeans_init
            else nn.initializers.kaiming_uniform()
        )
        self.inited = self.variable(
            "vq_stats", "inited",
            lambda: jnp.asarray(0.0 if self.kmeans_init else 1.0, jnp.float32),
        )
        self.cluster_size = self.variable(
            "vq_stats", "cluster_size", lambda: jnp.zeros((self.codebook_size,), jnp.float32)
        )
        self.embed = self.variable(
            "vq_stats", "embed",
            lambda: init_embed(jax.random.PRNGKey(0), (self.codebook_size, self.dim), jnp.float32),
        )
        self.embed_avg = self.variable(
            "vq_stats", "embed_avg", lambda: jnp.array(self.embed.value)
        )

    def _quantize(self, x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
        # dist(x, e) maximized as -(|x|^2 - 2 x.e + |e|^2); fp32 on MXU
        x32 = x.astype(jnp.float32)
        e32 = embed.astype(jnp.float32)
        dist = (
            -(x32**2).sum(-1, keepdims=True)
            + 2.0 * jnp.dot(x32, e32.T, preferred_element_type=jnp.float32)
            - (e32**2).sum(-1)[None, :]
        )
        return jnp.argmax(dist, axis=-1)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = x.shape
        flat = x.reshape(-1, self.dim)
        return self._quantize(flat, self.embed.value).reshape(shape[:-1])

    def decode(self, ind: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.embed.value, ind, axis=0)

    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x: (..., dim) → (quantized (..., dim), codes (...))."""
        shape = x.shape
        flat = x.reshape(-1, self.dim).astype(jnp.float32)

        if train:
            rng = self.make_rng("vq")
            k_rng, e_rng = jax.random.split(rng)

            if self.kmeans_init:
                def do_init(_):
                    means, bins = _kmeans(k_rng, flat, self.codebook_size, self.kmeans_iters)
                    return means, means, bins, jnp.asarray(1.0, jnp.float32)

                def no_init(_):
                    return (
                        self.embed.value,
                        self.embed_avg.value,
                        self.cluster_size.value,
                        self.inited.value,
                    )

                embed, embed_avg, cluster_size, inited = jax.lax.cond(
                    self.inited.value < 0.5, do_init, no_init, None
                )
            else:
                embed, embed_avg, cluster_size, inited = (
                    self.embed.value, self.embed_avg.value,
                    self.cluster_size.value, self.inited.value,
                )

            ind = self._quantize(flat, embed)
            # Dequantize with the PRE-update codebook, as the reference does
            # (core_vq.py:215 runs before expiry/EMA at :217-229).
            quantized = jnp.take(embed, ind, axis=0)
            onehot = jax.nn.one_hot(ind, self.codebook_size, dtype=jnp.float32)

            # dead-code expiry (uses pre-update cluster_size, as the reference)
            if self.threshold_ema_dead_code > 0:
                expired = cluster_size < self.threshold_ema_dead_code
                repl = _sample_vectors(e_rng, flat, self.codebook_size)
                embed = jnp.where(expired[:, None], repl, embed)
                if self.fixed_expiry:
                    embed_avg = jnp.where(expired[:, None], repl, embed_avg)
                    cluster_size = jnp.where(
                        expired, jnp.asarray(self.threshold_ema_dead_code, jnp.float32),
                        cluster_size,
                    )

            # EMA statistics (identical on all replicas under GSPMD)
            d = self.decay
            cluster_size = cluster_size * d + onehot.sum(0) * (1 - d)
            embed_sum = jnp.dot(onehot.T, flat, preferred_element_type=jnp.float32)
            embed_avg = embed_avg * d + embed_sum * (1 - d)
            n = cluster_size.sum()
            smoothed = (
                (cluster_size + self.epsilon)
                / (n + self.codebook_size * self.epsilon)
                * n
            )
            embed = embed_avg / smoothed[:, None]

            self.inited.value = inited
            self.cluster_size.value = cluster_size
            self.embed_avg.value = embed_avg
            self.embed.value = embed
        else:
            ind = self._quantize(flat, self.embed.value)
            quantized = jnp.take(self.embed.value, ind, axis=0)

        return (
            quantized.reshape(shape).astype(x.dtype),
            ind.reshape(shape[:-1]),
        )


class VectorQuantization(nn.Module):
    """Single codebook with straight-through estimator + commitment loss.
    Input/output are channels-last (B, T, D)."""

    dim: int
    codebook_size: int
    decay: float = 0.99
    epsilon: float = 1e-5
    kmeans_init: bool = True
    kmeans_iters: int = 50
    threshold_ema_dead_code: float = 2.0
    commitment_weight: float = 1.0
    fixed_expiry: bool = True

    def setup(self):
        self._codebook = EuclideanCodebook(
            dim=self.dim,
            codebook_size=self.codebook_size,
            kmeans_init=self.kmeans_init,
            kmeans_iters=self.kmeans_iters,
            decay=self.decay,
            epsilon=self.epsilon,
            threshold_ema_dead_code=self.threshold_ema_dead_code,
            fixed_expiry=self.fixed_expiry,
        )

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._codebook.encode(x)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        return self._codebook.decode(codes)

    def __call__(self, x: jnp.ndarray, train: bool = False):
        quantized, codes = self._codebook(x, train=train)
        if train:
            quantized = x + jax.lax.stop_gradient(quantized - x)
            commit_loss = jnp.mean(
                (jax.lax.stop_gradient(quantized) - x).astype(jnp.float32) ** 2
            ) * self.commitment_weight
        else:
            commit_loss = jnp.asarray(0.0, jnp.float32)
        return quantized, codes, commit_loss


class ResidualVectorQuantizer(nn.Module):
    """Residual VQ facade (reference ``vq.py:28``): n_q codebooks applied to
    successive residuals.  forward → (quantized, codes (n_q, ...), commit_loss)."""

    dimension: int = 256
    n_q: int = 1
    bins: int = 1024
    decay: float = 0.99
    kmeans_init: bool = True
    kmeans_iters: int = 50
    threshold_ema_dead_code: float = 2.0
    fixed_expiry: bool = True

    def setup(self):
        self.layers = [
            VectorQuantization(
                dim=self.dimension,
                codebook_size=self.bins,
                decay=self.decay,
                kmeans_init=self.kmeans_init,
                kmeans_iters=self.kmeans_iters,
                threshold_ema_dead_code=self.threshold_ema_dead_code,
                fixed_expiry=self.fixed_expiry,
                name=f"layers_{i}",
            )
            for i in range(self.n_q)
        ]

    def __call__(self, x: jnp.ndarray, train: bool = False):
        quantized_out = jnp.zeros_like(x)
        residual = x
        all_codes, all_losses = [], []
        for layer in self.layers:
            quantized, codes, loss = layer(residual, train=train)
            residual = residual - quantized
            quantized_out = quantized_out + quantized
            all_codes.append(codes)
            all_losses.append(loss)
        return quantized_out, jnp.stack(all_codes), jnp.stack(all_losses).sum()

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        all_codes = []
        for layer in self.layers:
            codes = layer.encode(residual)
            residual = residual - layer.decode(codes)
            all_codes.append(codes)
        return jnp.stack(all_codes)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        out = None
        for i, layer in enumerate(self.layers):
            q = layer.decode(codes[i])
            out = q if out is None else out + q
        return out
