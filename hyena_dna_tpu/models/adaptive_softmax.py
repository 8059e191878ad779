"""Adaptive embedding + projected adaptive log-softmax (transformer-xl style).

Parity target: `/root/reference/src/models/nn/adaptive_softmax.py:37-404` —
`AdaptiveEmbedding` (per-cluster embedding tables of width d_embed/div_val^i,
projected to d_proj, scaled by sqrt(d_proj)) and
`ProjectedAdaptiveLogSoftmax` (shortlist head + cluster tails with
cluster-probability chaining). Consumed by `AdaptiveLMTask`
(`src/tasks/tasks.py:332-379`).

XLA note: the reference gathers tokens per cluster with boolean indexing
(dynamic shapes). Here every cluster computes its (dense) logits and the
per-token contribution is selected with masks — static shapes, fusable, and
at most `len(cutoffs)` small matmuls of extra work.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn


class AdaptiveEmbedding(fnn.Module):
    n_token: int
    d_embed: int
    d_proj: int
    cutoffs: Sequence[int] = ()
    div_val: int = 1
    init_std: float = 0.02
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, inp: jax.Array) -> jax.Array:
        cutoffs = list(self.cutoffs) + [self.n_token]
        cutoff_ends = [0] + cutoffs
        emb_scale = self.d_proj**0.5
        if self.div_val == 1:
            emb = fnn.Embed(
                self.n_token, self.d_embed,
                embedding_init=fnn.initializers.normal(stddev=self.init_std),
                dtype=self.dtype, name="emb_layers_0",
            )(inp)
            if self.d_proj != self.d_embed:
                emb = fnn.Dense(self.d_proj, use_bias=False, dtype=self.dtype,
                                name="emb_projs_0")(emb)
            return emb * emb_scale

        out = jnp.zeros(inp.shape + (self.d_proj,), self.dtype)
        for i in range(len(cutoffs)):
            lo, hi = cutoff_ends[i], cutoff_ends[i + 1]
            d_emb_i = self.d_embed // (self.div_val**i)
            mask = (inp >= lo) & (inp < hi)
            local = jnp.where(mask, inp - lo, 0)
            emb_i = fnn.Embed(
                hi - lo, d_emb_i,
                embedding_init=fnn.initializers.normal(stddev=self.init_std),
                dtype=self.dtype, name=f"emb_layers_{i}",
            )(local)
            emb_i = fnn.Dense(self.d_proj, use_bias=False, dtype=self.dtype,
                              name=f"emb_projs_{i}")(emb_i)
            out = out + jnp.where(mask[..., None], emb_i, 0)
        return out * emb_scale


class ProjectedAdaptiveLogSoftmax(fnn.Module):
    n_token: int
    d_embed: int
    d_proj: int
    cutoffs: Sequence[int] = ()
    div_val: int = 1
    init_std: float = 0.02
    dtype: Any = jnp.float32

    def _cluster_logit(self, hidden, size, d_emb, name):
        h = hidden
        if d_emb != self.d_proj:
            h = fnn.Dense(d_emb, use_bias=False, dtype=self.dtype,
                          name=f"{name}_proj")(h)
        return fnn.Dense(
            size, dtype=self.dtype,
            kernel_init=fnn.initializers.normal(stddev=self.init_std),
            name=f"{name}_out",
        )(h)

    @fnn.compact
    def __call__(self, hidden: jax.Array, target: jax.Array = None) -> jax.Array:
        """hidden (N, d_proj) -> (N, n_token) log-probs, or per-token NLL (N,)
        when `target` is given."""
        logprob = self._compute_logprob(hidden)
        if target is None:
            return logprob
        return -jnp.take_along_axis(logprob, target[:, None], axis=-1)[:, 0]

    def _compute_logprob(self, hidden: jax.Array) -> jax.Array:
        """Full (N, n_token) log-probabilities with cluster chaining."""
        if not self.cutoffs:
            logits = self._cluster_logit(hidden, self.n_token, self.d_embed, "head")
            return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        cutoffs = list(self.cutoffs) + [self.n_token]
        cutoff_ends = [0] + cutoffs
        n_clusters = len(cutoffs) - 1
        shortlist = cutoffs[0]

        head_logits = self._cluster_logit(
            hidden, shortlist + n_clusters, self.d_embed, "head"
        )
        head_logprob = jax.nn.log_softmax(head_logits.astype(jnp.float32), axis=-1)
        pieces = [head_logprob[:, :shortlist]]
        for i in range(1, len(cutoffs)):
            lo, hi = cutoff_ends[i], cutoff_ends[i + 1]
            d_emb_i = self.d_embed // (self.div_val ** i) if self.div_val > 1 else self.d_embed
            tail_logits = self._cluster_logit(hidden, hi - lo, d_emb_i, f"tail_{i}")
            tail_logprob = jax.nn.log_softmax(tail_logits.astype(jnp.float32), axis=-1)
            cluster_lp = head_logprob[:, shortlist + i - 1 : shortlist + i]
            pieces.append(cluster_lp + tail_logprob)
        return jnp.concatenate(pieces, axis=-1)
