"""LM family: LMBackbone / ConvLMHeadModel / DNAEmbeddingModel.

Parity target: `/root/reference/src/models/sequence/long_conv_lm.py:249-566`
(and the registered duplicate `dna_embedding.py:18-80`):

  * GPT2Embeddings -> n_layer x Block(prenorm, dropout->add->LN) -> final
    dropout + add + LN (`long_conv_lm.py:357-397`).
  * vocab padded up to `pad_vocab_size_multiple` (`long_conv_lm.py:431-434`).
  * lm_head weight-tied to the embedding table (`long_conv_lm.py:482-485`).
  * GPT-2 init: Linear/Embedding std 0.02, zero bias, out_proj/fc2 rescaled by
    1/sqrt(2*n_layer) (`long_conv_lm.py:204-246`) — implemented directly in
    each module's initializers.
  * first block's dropout1 is `embed_dropout`, later blocks use
    `resid_dropout` (`long_conv_lm.py:317`).

TPU-first notes:
  * Tensor/sequence parallelism is NOT hand-threaded through modules (the
    reference wires NCCL process groups through flash-attn layers,
    `long_conv_lm.py:283-295`); instead, parameters and activations get
    PartitionSpecs from `hyena_dna_tpu.parallel.sharding` and GSPMD inserts
    the collectives.
  * `checkpoint_mixer`/`checkpoint_mlp` map to per-block `flax.linen.remat`.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from hyena_dna_tpu.models.blocks import Block
from hyena_dna_tpu.models.embeddings import GPT2Embeddings
from hyena_dna_tpu.ops.layer_norm import LayerNormF32


def _pad_vocab(vocab_size: int, multiple: int) -> int:
    if vocab_size % multiple != 0:
        vocab_size += multiple - (vocab_size % multiple)
    return vocab_size


class LMBackbone(fnn.Module):
    d_model: int
    n_layer: int
    d_inner: int
    vocab_size: int
    layer: Optional[dict] = None  # mixer config (hyena kwargs)
    attn_layer_idx: Optional[tuple] = None
    attn_cfg: Optional[dict] = None
    max_position_embeddings: int = 0
    resid_dropout: float = 0.0
    embed_dropout: float = 0.1
    layer_norm_epsilon: float = 1e-5
    identity_mlp: bool = False
    residual_in_fp32: bool = False
    residual_dtype: Any = None  # overrides residual_in_fp32 (see Block)
    checkpoint_mixer: bool = False
    checkpoint_mlp: bool = False
    remat_residual_only: bool = False
    remat_group_size: int = 1
    # save tagged long-conv outputs across the remat boundary so the
    # backward recompute skips the layer's most expensive op (the conv
    # forward + its filter evaluation feed): +~1 activation tensor per
    # layer of residency for ~a conv-forward per layer per step. See
    # models/filters.py CONV_OUT_TAG.
    remat_save_conv: bool = True
    # additionally save the tagged filter banks (params-only values the
    # replay otherwise regenerates through the whole filter MLP). Off by
    # default: +1 bf16 (C, L) tensor per layer of residency is what
    # separates fitting 1M-token training on a 16 GB chip from OOM.
    remat_save_filter: bool = False
    init_std: float = 0.02
    dtype: Any = jnp.float32
    mesh: Any = None

    def setup(self):
        self.embeddings = GPT2Embeddings(
            embed_dim=self.d_model,
            vocab_size=self.vocab_size,
            max_position_embeddings=self.max_position_embeddings,
            init_std=self.init_std,
            dtype=self.dtype,
            name="embeddings",
        )
        attn_idx = set(self.attn_layer_idx or ())
        block_cls = Block
        if (self.checkpoint_mixer or self.checkpoint_mlp) and not self._residual_cells:
            # TPU-idiomatic activation checkpointing: remat whole blocks and
            # let XLA re-derive intermediates in the backward pass.
            block_cls = fnn.remat(
                Block,
                static_argnums=(3,),
                policy=self._remat_policy,
            )
        self.layers = [
            block_cls(
                d_model=self.d_model,
                layer_cfg=self.layer,
                attn_cfg=self.attn_cfg,
                is_attn=i in attn_idx,
                d_inner=self.d_inner,
                identity_mlp=self.identity_mlp,
                resid_dropout1=self.embed_dropout if i == 0 else self.resid_dropout,
                resid_dropout2=self.resid_dropout,
                residual_in_fp32=self.residual_in_fp32,
                residual_dtype=self.residual_dtype,
                layer_norm_epsilon=self.layer_norm_epsilon,
                n_layer=self.n_layer,
                dtype=self.dtype,
                mesh=self.mesh,
                name=f"layers_{i}",
            )
            for i in range(self.n_layer)
        ]
        self.drop_f = fnn.Dropout(rate=self.resid_dropout, name="drop_f")
        # f32-stats LN emitting the model dtype, with the fused add+LN path
        # for the final residual join; params ("scale"/"bias") interchange
        # with fnn.LayerNorm checkpoints.
        self.ln_f = LayerNormF32(
            epsilon=self.layer_norm_epsilon, out_dtype=self.dtype, name="ln_f"
        )

    @property
    def _remat_policy(self):
        from hyena_dna_tpu.ops.fftconv import CONV_OUT_TAG, FILTER_K_TAG

        names = []
        if self.remat_save_conv:
            names.append(CONV_OUT_TAG)
        if self.remat_save_filter:
            names.append(FILTER_K_TAG)
        if names:
            return jax.checkpoint_policies.save_only_these_names(*names)
        return jax.checkpoint_policies.nothing_saveable

    @property
    def _residual_cells(self) -> bool:
        """Residual-only remat applies when checkpointing is on and every
        block has an MLP (so the boundary hidden = mlp(norm2(residual)) is
        recomputable from the residual alone)."""
        return (
            self.remat_residual_only
            and (self.checkpoint_mixer or self.checkpoint_mlp)
            and not self.identity_mlp
        )

    def _residual_cell(self, carry, i: int, deterministic: bool):
        """Remat cell i spanning [mlp of block i-1, mixer of block i]: the
        ONLY saved value per cell is the f32 residual stream (halves remat
        residency vs whole-block cells, which store hidden+residual)."""
        if i == 0:
            return self.layers[0].pre(carry, None, deterministic)
        hidden = self.layers[i - 1].post(carry)
        return self.layers[i].pre(hidden, carry, deterministic)

    def _final_post(self, residual):
        return self.layers[-1].post(residual)

    def _residual_group(self, carry, i0: int, g: int, deterministic: bool):
        """Nested remat: an outer cell over g consecutive residual cells.
        Persistent checkpoint storage drops to n_layer/g residuals; the
        group's backward transiently re-materializes its g inner boundaries
        (each inner cell is itself remat'd, bounding the working set)."""
        cell = fnn.remat(
            LMBackbone._residual_cell,
            static_argnums=(2, 3),
            policy=self._remat_policy,
        )
        for i in range(i0, i0 + g):
            carry = cell(self, carry, i, deterministic)
        return carry

    def __call__(
        self,
        input_ids: jax.Array,
        deterministic: bool = True,
        inputs_embeds: Optional[jax.Array] = None,
    ) -> jax.Array:
        """inputs_embeds (B, L, d) bypasses the embedding lookup — used by
        soft-prompting evals that splice trainable vectors into the prompt."""
        hidden_states = (
            inputs_embeds if inputs_embeds is not None else self.embeddings(input_ids)
        )
        if self._residual_cells:
            residual = hidden_states
            g = max(1, self.remat_group_size)
            if g > 1:
                group = fnn.remat(
                    LMBackbone._residual_group,
                    static_argnums=(2, 3, 4),
                    policy=self._remat_policy,
                )
                for i0 in range(0, self.n_layer, g):
                    residual = group(self, residual, i0,
                                     min(g, self.n_layer - i0), deterministic)
            else:
                cell = fnn.remat(
                    LMBackbone._residual_cell,
                    static_argnums=(2, 3),
                    policy=self._remat_policy,
                )
                for i in range(self.n_layer):
                    residual = cell(self, residual, i, deterministic)
            final_post = fnn.remat(
                LMBackbone._final_post,
                policy=self._remat_policy,
            )
            hidden_states = final_post(self, residual)
        else:
            residual = None
            for layer in self.layers:
                hidden_states, residual = layer(hidden_states, residual,
                                                deterministic)
        dropped = self.drop_f(hidden_states, deterministic=deterministic)
        if residual is not None:
            hidden_states, _ = self.ln_f(dropped, residual)
        else:
            hidden_states = self.ln_f(dropped)
        return hidden_states


class ConvLMHeadModel(fnn.Module):
    """Causal LM: backbone + weight-tied lm_head -> logits.

    Registered as `lm` in the reference (`src/utils/registry.py:24`)."""

    d_model: int
    n_layer: int
    d_inner: int
    vocab_size: int
    layer: Optional[dict] = None
    attn_layer_idx: Optional[tuple] = None
    attn_cfg: Optional[dict] = None
    max_position_embeddings: int = 0
    resid_dropout: float = 0.0
    embed_dropout: float = 0.1
    layer_norm_epsilon: float = 1e-5
    pad_vocab_size_multiple: int = 1
    identity_mlp: bool = False
    residual_in_fp32: bool = False
    residual_dtype: Any = None  # overrides residual_in_fp32 (see Block)
    checkpoint_mixer: bool = False
    checkpoint_mlp: bool = False
    remat_residual_only: bool = False
    remat_group_size: int = 1
    # save tagged long-conv outputs across the remat boundary so the
    # backward recompute skips the layer's most expensive op (the conv
    # forward + its filter evaluation feed): +~1 activation tensor per
    # layer of residency for ~a conv-forward per layer per step. See
    # models/filters.py CONV_OUT_TAG.
    remat_save_conv: bool = True
    # additionally save the tagged filter banks (params-only values the
    # replay otherwise regenerates through the whole filter MLP). Off by
    # default: +1 bf16 (C, L) tensor per layer of residency is what
    # separates fitting 1M-token training on a 16 GB chip from OOM.
    remat_save_filter: bool = False
    init_std: float = 0.02
    dtype: Any = jnp.float32
    mesh: Any = None

    def setup(self):
        self.backbone = LMBackbone(
            d_model=self.d_model,
            n_layer=self.n_layer,
            d_inner=self.d_inner,
            vocab_size=_pad_vocab(self.vocab_size, self.pad_vocab_size_multiple),
            layer=self.layer,
            attn_layer_idx=self.attn_layer_idx,
            attn_cfg=self.attn_cfg,
            max_position_embeddings=self.max_position_embeddings,
            resid_dropout=self.resid_dropout,
            embed_dropout=self.embed_dropout,
            layer_norm_epsilon=self.layer_norm_epsilon,
            identity_mlp=self.identity_mlp,
            residual_in_fp32=self.residual_in_fp32,
            residual_dtype=self.residual_dtype,
            checkpoint_mixer=self.checkpoint_mixer,
            checkpoint_mlp=self.checkpoint_mlp,
            remat_residual_only=self.remat_residual_only,
            remat_group_size=self.remat_group_size,
            remat_save_conv=self.remat_save_conv,
            remat_save_filter=self.remat_save_filter,
            init_std=self.init_std,
            dtype=self.dtype,
            mesh=self.mesh,
            name="backbone",
        )

    def __call__(
        self,
        input_ids: jax.Array,
        deterministic: bool = True,
        state=None,
        inputs_embeds: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, None]:
        hidden_states = self.backbone(
            input_ids, deterministic=deterministic, inputs_embeds=inputs_embeds
        )
        # weight-tied head: logits = h @ E^T (fp32 for a stable softmax/CE)
        lm_logits = self.backbone.embeddings.attend(hidden_states.astype(jnp.float32))
        return lm_logits, None

    @property
    def d_output(self) -> int:
        return _pad_vocab(self.vocab_size, self.pad_vocab_size_multiple)


class DNAEmbeddingModel(fnn.Module):
    """Backbone that returns final hidden states for downstream heads.

    Registered as `dna_embedding` in the reference (`registry.py:27`,
    `src/models/sequence/dna_embedding.py:18-80`)."""

    d_model: int
    n_layer: int
    d_inner: int
    vocab_size: int
    layer: Optional[dict] = None
    attn_layer_idx: Optional[tuple] = None
    attn_cfg: Optional[dict] = None
    max_position_embeddings: int = 0
    resid_dropout: float = 0.0
    embed_dropout: float = 0.1
    layer_norm_epsilon: float = 1e-5
    pad_vocab_size_multiple: int = 1
    identity_mlp: bool = False
    residual_in_fp32: bool = False
    residual_dtype: Any = None  # overrides residual_in_fp32 (see Block)
    checkpoint_mixer: bool = False
    checkpoint_mlp: bool = False
    remat_residual_only: bool = False
    remat_group_size: int = 1
    # save tagged long-conv outputs across the remat boundary so the
    # backward recompute skips the layer's most expensive op (the conv
    # forward + its filter evaluation feed): +~1 activation tensor per
    # layer of residency for ~a conv-forward per layer per step. See
    # models/filters.py CONV_OUT_TAG.
    remat_save_conv: bool = True
    # additionally save the tagged filter banks (params-only values the
    # replay otherwise regenerates through the whole filter MLP). Off by
    # default: +1 bf16 (C, L) tensor per layer of residency is what
    # separates fitting 1M-token training on a 16 GB chip from OOM.
    remat_save_filter: bool = False
    return_hidden_state: bool = False
    init_std: float = 0.02
    dtype: Any = jnp.float32
    mesh: Any = None

    def setup(self):
        self.backbone = LMBackbone(
            d_model=self.d_model,
            n_layer=self.n_layer,
            d_inner=self.d_inner,
            vocab_size=_pad_vocab(self.vocab_size, self.pad_vocab_size_multiple),
            layer=self.layer,
            attn_layer_idx=self.attn_layer_idx,
            attn_cfg=self.attn_cfg,
            max_position_embeddings=self.max_position_embeddings,
            resid_dropout=self.resid_dropout,
            embed_dropout=self.embed_dropout,
            layer_norm_epsilon=self.layer_norm_epsilon,
            identity_mlp=self.identity_mlp,
            residual_in_fp32=self.residual_in_fp32,
            residual_dtype=self.residual_dtype,
            checkpoint_mixer=self.checkpoint_mixer,
            checkpoint_mlp=self.checkpoint_mlp,
            remat_residual_only=self.remat_residual_only,
            remat_group_size=self.remat_group_size,
            remat_save_conv=self.remat_save_conv,
            remat_save_filter=self.remat_save_filter,
            init_std=self.init_std,
            dtype=self.dtype,
            mesh=self.mesh,
            name="backbone",
        )

    def __call__(
        self,
        input_ids: jax.Array,
        deterministic: bool = True,
        state=None,
        inputs_embeds: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, None]:
        hidden_states = self.backbone(
            input_ids, deterministic=deterministic, inputs_embeds=inputs_embeds
        )
        return hidden_states, None

    @property
    def d_output(self) -> int:
        return self.d_model
