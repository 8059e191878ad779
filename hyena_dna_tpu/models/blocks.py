"""Residual block with the flash-attn "dropout -> add -> LN" ordering.

Parity target: flash-attn `Block` as vendored in
`/root/reference/src/models/sequence/simple_lm.py:213-307` and used by the LM
family (`/root/reference/src/models/sequence/long_conv_lm.py:180-200`):

  prenorm:
    dropped  = dropout1(hidden)
    residual = dropped + residual      (or dropped for the first block)
    hidden   = norm1(residual)         (norm computed in the norm's dtype)
    residual = f32(residual)           if residual_in_fp32
    hidden   = mixer(hidden)
    dropped  = dropout2(hidden)
    residual = dropped + residual
    hidden   = norm2(residual)
    residual = f32(residual)
    hidden   = mlp(hidden)
    return hidden, residual

On TPU the dropout+add+LN chain is elementwise and fused by XLA automatically
(the reference needed a custom CUDA kernel, `long_conv_lm.py:297-305`).
Activation checkpointing (`checkpoint_mixer`/`checkpoint_mlp`,
`long_conv_lm.py:39-45,196-199`) maps to `jax.checkpoint`/`flax.linen.remat`
applied per block by the backbone — the standard JAX remat granularity.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from hyena_dna_tpu.models.attention import MHA
from hyena_dna_tpu.models.hyena import HyenaOperator
from hyena_dna_tpu.ops.layer_norm import LayerNormF32


def make_mixer(
    d_model: int,
    layer_cfg: Optional[dict],
    attn_cfg: Optional[dict],
    is_attn: bool,
    n_layer: int,
    dtype: Any,
    name: str = "mixer",
    mesh: Any = None,
) -> fnn.Module:
    """Mixer factory mirroring `create_mixer_cls`
    (`/root/reference/src/models/sequence/long_conv_lm.py:48-99`): attention at
    indices in attn_layer_idx, otherwise the registered layer (hyena)."""
    if is_attn:
        cfg = dict(attn_cfg or {})
        cfg.pop("use_flash_attn", None)
        cfg.pop("fused_bias_fc", None)
        return MHA(d_model=d_model, n_layer=n_layer, dtype=dtype, name=name, **cfg)
    cfg = dict(layer_cfg or {})
    cfg.pop("_name_", None)
    cfg.pop("fused_bias_fc", None)
    cfg.pop("jit_filter", None)
    cfg.pop("fused_fft_conv", None)
    filter_keys = (
        "emb_dim",
        "w",
        "lr",
        "lr_pos_emb",
        "wd",
        "bias",
        "normalized",
        "num_inner_mlps",
        "modulate",
        "linear_mixer",
        "bidirectional",
        # modulation-window kwargs: the reference threads these through
        # HyenaFilter **kwargs into ExponentialModulation (`hyena.py:202`).
        # NOTE the reference ships two defaults for `shift`: 0.0 in
        # `src/models/sequence/hyena.py:142` but 0.05 in the checkpoint-loading
        # `standalone_hyenadna.py:140` — configs must state it explicitly for
        # published-weight parity.
        "shift",
        "fast_decay_pct",
        "slow_decay_pct",
        "target",
    )
    filter_cfg = dict(cfg.pop("filter_args", {}) or {})
    filter_cfg.pop("seq_len", None)  # derived from l_max by HyenaOperator
    filter_cfg.pop("order", None)  # filter_order flows separately
    filter_cfg.pop("modulation_lr", None)  # deltas lr: frozen either way
    for key in filter_keys:
        if key in cfg:
            val = cfg.pop(key)
            target = {
                "bias": "use_bias",
                "shift": "modulation_shift",
                "target": "modulation_target",
            }.get(key, key)
            filter_cfg[target] = val
    cfg.pop("filter_cls", None)
    return HyenaOperator(
        d_model=d_model,
        n_layer=n_layer,
        dtype=dtype,
        filter_cfg=filter_cfg,
        name=name,
        mesh=mesh,
        **cfg,
    )


class Mlp(fnn.Module):
    """Transformer MLP with tanh-approx GeLU (reference
    `long_conv_lm.py:117-123`: `partial(F.gelu, approximate='tanh')`).

    A fused Pallas kernel (`ops/pallas_mlp.py`, the analog of flash-attn's
    FusedMLP, `long_conv_lm.py:117-178`) is available via `use_fused=True`;
    measured on v5e at the bench shape it matches but does not beat XLA's
    own fusion (4.47 vs 4.10 ms/train-step-layer — XLA already folds the
    gelu into the matmul epilogues), so the default stays on the XLA path.
    Init and ineligible shapes always use the plain Dense path."""

    hidden_features: int
    out_features: Optional[int] = None
    n_layer: int = 1
    init_std: float = 0.02
    dtype: Any = jnp.float32
    use_fused: Optional[bool] = None  # None = off (XLA wins here; see above)

    def setup(self):
        assert self.out_features, "Mlp needs out_features (setup-time Dense)"
        self.fc1 = fnn.Dense(
            self.hidden_features,
            kernel_init=fnn.initializers.normal(stddev=self.init_std),
            bias_init=fnn.initializers.zeros,
            dtype=self.dtype,
        )
        # fc2 gets the GPT-2 1/sqrt(2N) residual rescale (`long_conv_lm.py:225-230`)
        self.fc2 = fnn.Dense(
            self.out_features,
            kernel_init=fnn.initializers.normal(
                stddev=self.init_std / math.sqrt(2 * self.n_layer)
            ),
            bias_init=fnn.initializers.zeros,
            dtype=self.dtype,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        d_out = self.out_features or x.shape[-1]
        fused = bool(self.use_fused)
        if fused and not self.is_initializing():
            from hyena_dna_tpu.ops.pallas_mlp import _pick_tile, mlp_fused

            lead = x.shape[:-1]
            n = math.prod(lead)
            d = x.shape[-1]
            if (_pick_tile(n) is not None and d % 128 == 0
                    and self.hidden_features % 128 == 0 and d_out % 128 == 0):
                w1 = self.fc1.variables["params"]["kernel"]
                b1 = self.fc1.variables["params"]["bias"]
                w2 = self.fc2.variables["params"]["kernel"]
                b2 = self.fc2.variables["params"]["bias"]
                y = mlp_fused(x.reshape(n, d).astype(self.dtype),
                              w1, b1, w2, b2)
                return y.reshape(*lead, d_out)
        x = self.fc1(x)
        x = jax.nn.gelu(x, approximate=True)
        return self.fc2(x)


class Block(fnn.Module):
    """Prenorm residual block: dropout -> add -> LN -> mixer/MLP.

    Split into `pre` (boundary -> post-mixer residual) and `post` (residual
    -> MLP output) so the backbone's residual-only remat mode can re-cut
    checkpoint cells at the residual stream: the boundary hidden state is
    `mlp(norm2(residual))`, a pure function of the stored residual, so only
    the residual needs saving per layer (halves remat memory at long L)."""

    d_model: int
    layer_cfg: Optional[dict] = None
    attn_cfg: Optional[dict] = None
    is_attn: bool = False
    d_inner: Optional[int] = None
    identity_mlp: bool = False
    resid_dropout1: float = 0.0
    resid_dropout2: float = 0.0
    residual_in_fp32: bool = False
    # Explicit residual-stream storage dtype; overrides residual_in_fp32.
    # The f32 stream is ~17% of the 32k train step's HBM traffic
    # (scripts/decompose_32k.py); float16 halves it with 10 mantissa bits
    # (vs bfloat16's 7 — measured loss-curve drift at the hg38 recipe:
    # scripts/resid_drift results in STATUS.md). Adds always compute in f32
    # and round once on store.
    residual_dtype: Any = None
    layer_norm_epsilon: float = 1e-5
    n_layer: int = 1
    dtype: Any = jnp.float32
    mesh: Any = None

    @property
    def _resid_dt(self):
        if self.residual_dtype is not None:
            return jnp.dtype(self.residual_dtype)
        return jnp.float32 if self.residual_in_fp32 else None

    def setup(self):
        # LN: f32 params + stats, but emit the block dtype directly and keep
        # the backward scatter/replay-free (ops/layer_norm.py) — the flax LN
        # at dtype=f32 materializes the normalized f32 (B, L, d) tensor for
        # its backward, an extra 134 MB r/w per norm at the 32k bench shape
        self.dropout1 = fnn.Dropout(rate=self.resid_dropout1)
        self.norm1 = LayerNormF32(epsilon=self.layer_norm_epsilon,
                                  out_dtype=self.dtype)
        self.mixer = make_mixer(
            self.d_model,
            self.layer_cfg,
            self.attn_cfg,
            self.is_attn,
            self.n_layer,
            self.dtype,
            mesh=self.mesh,
            name=None,  # setup: name comes from the attribute
        )
        if not self.identity_mlp:
            self.dropout2 = fnn.Dropout(rate=self.resid_dropout2)
            self.norm2 = LayerNormF32(epsilon=self.layer_norm_epsilon,
                                      out_dtype=self.dtype)
            self.mlp = Mlp(
                hidden_features=self.d_inner or 4 * self.d_model,
                out_features=self.d_model,
                n_layer=self.n_layer,
                dtype=self.dtype,
            )

    def _add_norm(self, norm, hidden: jax.Array,
                  residual: Optional[jax.Array]) -> Tuple[jax.Array, jax.Array]:
        """dropout-output + residual -> (normed, new residual), through the
        fused add+LN unit (`ops/pallas_ln.py`) when a residual exists."""
        dt = self._resid_dt
        if residual is None:
            residual = hidden.astype(dt) if dt is not None else hidden
            return norm(residual), residual
        if dt is not None and residual.dtype != dt:
            residual = residual.astype(dt)
        return norm(hidden, residual)

    def pre(
        self,
        hidden_states: jax.Array,
        residual: Optional[jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        """dropout -> add -> norm1 -> mixer -> dropout -> add: from the block
        boundary to the post-mixer residual (requires an MLP block).

        The second add's LN (norm2) lives in `post` — across the
        residual-only remat boundary — so only the first unit fuses here;
        the non-remat `__call__` path fuses both."""
        assert not self.identity_mlp
        dt = self._resid_dt
        dropped = self.dropout1(hidden_states, deterministic=deterministic)
        hidden_states, residual = self._add_norm(self.norm1, dropped, residual)
        out = self.mixer(hidden_states, deterministic)
        hidden_states = out[0] if isinstance(out, tuple) else out
        dropped = self.dropout2(hidden_states, deterministic=deterministic)
        residual = (dropped.astype(jnp.float32)
                    + residual.astype(jnp.float32)).astype(dt or self.dtype)
        return residual

    def post(self, residual: jax.Array) -> jax.Array:
        """norm2 -> mlp: recompute the boundary hidden state from the
        post-mixer residual."""
        assert not self.identity_mlp
        hidden = self.norm2(residual)
        return self.mlp(hidden)

    def __call__(
        self,
        hidden_states: jax.Array,
        residual: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        if self.identity_mlp:
            dropped = self.dropout1(hidden_states, deterministic=deterministic)
            hidden_states, residual = self._add_norm(self.norm1, dropped,
                                                     residual)
            out = self.mixer(hidden_states, deterministic)
            hidden_states = out[0] if isinstance(out, tuple) else out
            return hidden_states, residual
        dropped = self.dropout1(hidden_states, deterministic=deterministic)
        hidden_states, residual = self._add_norm(self.norm1, dropped, residual)
        out = self.mixer(hidden_states, deterministic)
        hidden_states = out[0] if isinstance(out, tuple) else out
        dropped = self.dropout2(hidden_states, deterministic=deterministic)
        hidden_states, residual = self._add_norm(self.norm2, dropped, residual)
        return self.mlp(hidden_states), residual
