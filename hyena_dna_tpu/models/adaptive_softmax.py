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
from typing import Any, Optional, Sequence

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


class AdaptiveLMModel(fnn.Module):
    """Adaptive-embedding LM with tied adaptive softmax, registered
    `adaptive_lm`.

    Parity target: the assembly performed by `AdaptiveLMTask`
    (`/root/reference/src/tasks/tasks.py:332-379`): `AdaptiveEmbedding`
    encoder -> sequence backbone -> `ProjectedAdaptiveLogSoftmax` loss with
    `tie_weights` sharing the per-cluster embedding tables and `tie_projs`
    sharing the d_proj projections. In flax, tying = one `self.param` used in
    both directions, so the encoder/softmax pair is fused into a single
    module; the output is normalized (B, L, n_token) log-probs (standard
    cross-entropy on them is exact: log_softmax is idempotent).
    """

    n_token: int
    d_model: int
    cutoffs: Sequence[int] = ()
    div_val: int = 1
    tie_weights: bool = True
    tie_projs: Optional[Sequence[bool]] = None  # default: False head, True tails
    dropemb: float = 0.0
    backbone: Optional[dict] = None  # SequenceModel kwargs (layer=, n_layers=)
    init_scale: float = 1.0
    init_std: float = 0.02
    dtype: Any = jnp.float32

    def setup(self):
        from hyena_dna_tpu.models.sequence_model import SequenceModel

        cutoffs = list(self.cutoffs) + [self.n_token]
        self._cutoff_ends = [0] + cutoffs
        self._n_clusters = len(cutoffs) - 1
        tie_projs = (
            list(self.tie_projs)
            if self.tie_projs is not None
            else [False] + [True] * self._n_clusters
        )
        init = fnn.initializers.normal(stddev=self.init_std * self.init_scale)
        embs, projs, out_projs, biases = [], [], [], []
        for i in range(len(cutoffs)):
            lo, hi = self._cutoff_ends[i], self._cutoff_ends[i + 1]
            d_emb_i = self.d_embed_i(i)
            embs.append(self.param(f"emb_{i}", init, (hi - lo, d_emb_i)))
            need_proj = d_emb_i != self.d_model or self.div_val > 1
            projs.append(
                self.param(f"proj_{i}", init, (d_emb_i, self.d_model))
                if need_proj else None
            )
            if need_proj and not (tie_projs[i] if i < len(tie_projs) else False):
                out_projs.append(
                    self.param(f"out_proj_{i}", init, (d_emb_i, self.d_model))
                )
            else:
                out_projs.append(None)  # tied (or no proj at all)
            n_out = (hi - lo) + (self._n_clusters if i == 0 else 0)
            biases.append(self.param(f"bias_{i}", fnn.initializers.zeros, (n_out,)))
        self.embs, self.projs, self.out_projs, self.biases = embs, projs, out_projs, biases
        if self.tie_weights:
            self.out_embs = embs
        else:
            self.out_embs = [
                self.param(f"out_emb_{i}", init, e.shape)
                for i, e in enumerate(embs)
            ]
        if self._n_clusters:
            self.cluster_weight = self.param(
                "cluster_weight", init, (self._n_clusters, self.d_model)
            )
        self.core = SequenceModel(
            d_model=self.d_model, dtype=self.dtype, **(self.backbone or {})
        )
        self.emb_dropout = fnn.Dropout(rate=self.dropemb)

    def d_embed_i(self, i: int) -> int:
        return self.d_model // (self.div_val ** i)

    def _embed(self, inp: jax.Array) -> jax.Array:
        scale = self.d_model ** 0.5
        if self._n_clusters == 0 and self.projs[0] is None:
            return jnp.take(self.embs[0], inp, axis=0) * scale
        out = jnp.zeros(inp.shape + (self.d_model,), jnp.float32)
        for i in range(len(self.embs)):
            lo, hi = self._cutoff_ends[i], self._cutoff_ends[i + 1]
            mask = (inp >= lo) & (inp < hi)
            emb_i = jnp.take(self.embs[i], jnp.where(mask, inp - lo, 0), axis=0)
            if self.projs[i] is not None:
                emb_i = emb_i @ self.projs[i]
            out = out + jnp.where(mask[..., None], emb_i, 0)
        return out * scale

    def _tail_weight(self, i: int) -> jax.Array:
        """(d_model, size_i) logit matrix for cluster i, honoring ties."""
        emb = self.out_embs[i]  # (size, d_emb_i)
        if self.projs[i] is None:
            return emb.T
        proj = self.out_projs[i] if self.out_projs[i] is not None else self.projs[i]
        return proj.T @ emb.T  # (d_emb_i, d_model).T @ (d_emb_i, size)

    def __call__(self, inp: jax.Array, state=None, deterministic: bool = True,
                 **kwargs):
        x = self._embed(inp).astype(self.dtype)
        x = self.emb_dropout(x, deterministic=deterministic)
        hidden, _ = self.core(x, deterministic=deterministic)
        h = hidden.astype(jnp.float32)

        if self._n_clusters == 0:
            logits = h @ self._tail_weight(0) + self.biases[0]
            return jax.nn.log_softmax(logits, axis=-1), None

        shortlist = self._cutoff_ends[1]
        head_w = jnp.concatenate(
            [self._tail_weight(0), self.cluster_weight.T], axis=1
        )  # (d_model, shortlist + n_clusters)
        head_logprob = jax.nn.log_softmax(h @ head_w + self.biases[0], axis=-1)
        pieces = [head_logprob[..., :shortlist]]
        for i in range(1, len(self.embs)):
            tail_logits = h @ self._tail_weight(i) + self.biases[i]
            tail_logprob = jax.nn.log_softmax(tail_logits, axis=-1)
            cluster_lp = head_logprob[..., shortlist + i - 1 : shortlist + i]
            pieces.append(cluster_lp + tail_logprob)
        return jnp.concatenate(pieces, axis=-1), None

    @property
    def d_output(self) -> int:
        return self.n_token
