"""GPT2-style embeddings (word + optional learned position).

Parity: flash-attn `GPT2Embeddings` as vendored at
`/root/reference/src/models/sequence/simple_lm.py:150-189`. HyenaDNA configs
use `max_position_embeddings=0` (no position table); position information
comes from the causal conv structure.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn


class GPT2Embeddings(fnn.Module):
    embed_dim: int
    vocab_size: int
    max_position_embeddings: int = 0
    init_std: float = 0.02
    dtype: Any = jnp.float32

    def setup(self):
        self.word_embeddings = fnn.Embed(
            self.vocab_size,
            self.embed_dim,
            embedding_init=fnn.initializers.normal(stddev=self.init_std),
            dtype=self.dtype,
            name="word_embeddings",
        )
        if self.max_position_embeddings > 0:
            self.position_embeddings = fnn.Embed(
                self.max_position_embeddings,
                self.embed_dim,
                embedding_init=fnn.initializers.normal(stddev=self.init_std),
                dtype=self.dtype,
                name="position_embeddings",
            )

    def __call__(
        self, input_ids: jax.Array, position_ids: Optional[jax.Array] = None
    ) -> jax.Array:
        if self.vocab_size <= 64 and not self.is_initializing():
            # one-hot matmul lookup: exact (one nonzero product per row) and
            # turns the embedding BACKWARD from a serialized scatter-add
            # (1.3 ms at the 32k bench shape) into a single MXU matmul
            tbl = self.word_embeddings.embedding.astype(self.dtype)
            emb = jax.nn.one_hot(input_ids, self.vocab_size,
                                 dtype=self.dtype) @ tbl
        else:
            emb = self.word_embeddings(input_ids)
        if self.max_position_embeddings > 0:
            if position_ids is None:
                position_ids = jnp.arange(input_ids.shape[1])
            emb = emb + self.position_embeddings(position_ids)
        return emb

    def attend(self, hidden: jax.Array) -> jax.Array:
        """Weight-tied LM head: logits = hidden @ E^T
        (`long_conv_lm.py:482-485` ties lm_head.weight to the embedding)."""
        return self.word_embeddings.attend(hidden)
