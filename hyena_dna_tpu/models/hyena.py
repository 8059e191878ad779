"""HyenaOperator: the core long-convolution mixer.

Math parity with `/root/reference/src/models/sequence/hyena.py:270-449`:
  u (B, L, d) -> in_proj -> (B, (order+1)*d, L) -> depthwise short conv (k=3,
  causal) -> split into `order` gates x_{order-1}..x_1, x_0 and value v ->
  recurrence over o: v = dropout(v * x_i); v = longconv(v, k[o]) + bias[o]*v
  -> y = activation(v * x_0) -> out_proj.

The filter MLP produces (order-1) stacked filters of head_dim channels
(`hyena.py:373-380,405-412`); per-order bias comes from the filter's `bias`
parameter reshaped to (order-1, head_dim).

TPU-first notes:
  * in_proj / out_proj are large dense matmuls -> MXU. Activations flow
    channel-first (B, C, L) between projections so the FFT (over the last,
    lane-major axis) and the depthwise conv are contiguous.
  * The gating multiply + long conv chain is elementwise + FFT; XLA fuses the
    elementwise ops into the FFT's neighbors.
  * num_blocks (block-diagonal sequence chunking) and multi-head reshapes are
    supported as in the reference.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from hyena_dna_tpu.models.filters import HyenaFilter
from hyena_dna_tpu.models.nn import activation_fn
from hyena_dna_tpu.ops import short_conv_1d
from hyena_dna_tpu.ops.fftconv import tag_conv_out, tag_filter_k
from hyena_dna_tpu.ops.distributed import seq_fftconv, seq_short_conv

# Sequence length from which the long-conv I/O (signal, gate, filter) is kept
# in bf16. Two reasons: (a) throughput — the fused Pallas conv rounds its dot
# inputs to bf16 anyway, so f32 I/O just doubles the HBM traffic of the
# step's largest tensors (~1 ms/layer at the 32k bench shape); (b) memory —
# above ~512k the f32 (B, d, L) operands are what keeps 1M-token training
# off a single 16 GB chip (977 MB each at 1M/d=256). The FFT math inside
# fftconv still accumulates f32. Short lengths stay f32 so checkpoint-parity
# evals (tiny-1k fixed windows) are bit-faithful.
CONV_IO_BF16_MIN_L = 1 << 15


class HyenaOperator(fnn.Module):
    d_model: int
    l_max: int
    order: int = 2
    filter_order: int = 64
    num_heads: int = 1
    inner_factor: int = 1
    num_blocks: int = 1
    outer_mixing: bool = False
    dropout: float = 0.0
    filter_dropout: float = 0.0
    post_order_ffn: bool = False
    short_filter_order: int = 3
    activation: str = "id"
    return_state: bool = False
    filter_cfg: Optional[dict] = None  # extra HyenaFilter kwargs
    n_layer: int = 1  # for GPT-2 1/sqrt(2N) out_proj rescale
    init_std: float = 0.02
    dtype: Any = jnp.float32
    # sequence parallelism: when a mesh with a >1 "seq" axis is given, the
    # conv chain runs sequence-sharded (channel-pencil FFT + halo short conv)
    mesh: Any = None
    seq_axis: str = "seq"
    # Pallas fused front end (proj+transpose+short conv+first gate), see
    # ops/pallas_hyena.py. None = auto (on for TPU when shapes allow).
    use_pallas_front: Any = None
    pallas_interpret: bool = False
    # finer-than-block rematerialization: checkpoint the projection/short-conv
    # front separately so the backward of one block never holds the full
    # (o+1)d-wide activation set at once — needed to FIT 1M-token training
    # in single-chip HBM (the block-level remat alone peaks ~24 GB there)
    inner_remat: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    def setup(self):
        assert self.d_model % self.num_heads == 0
        assert self.l_max % self.num_blocks == 0
        assert self.order >= 2
        d_inner = self.d_model * self.inner_factor

        # GPT-2 init (`long_conv_lm.py:204-246`): all Linear weights std=0.02,
        # zero bias; out_proj rescaled by 1/sqrt(2*n_layer).
        self.in_proj = fnn.Dense(
            (self.order + 1) * self.d_model,
            kernel_init=fnn.initializers.normal(stddev=self.init_std),
            bias_init=fnn.initializers.zeros,
            dtype=self.dtype,
            name="in_proj",
        )
        self.out_proj = fnn.Dense(
            self.d_model,
            kernel_init=fnn.initializers.normal(
                stddev=self.init_std / math.sqrt(2 * self.n_layer)
            ),
            bias_init=fnn.initializers.zeros,
            dtype=self.dtype,
            name="out_proj",
        )

        total_width = d_inner * (self.order + 1)
        # torch Conv1d default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with
        # fan_in = (in_channels/groups) * k = k for depthwise.
        k = self.short_filter_order
        bound = 1.0 / math.sqrt(k)
        conv_init = lambda key, shape, dtype=jnp.float32: jax.random.uniform(
            key, shape, dtype, -bound, bound
        )
        self.short_filter_weight = self.param(
            "short_filter_weight", conv_init, (total_width, k)
        )
        self.short_filter_bias = self.param(
            "short_filter_bias", conv_init, (total_width,)
        )

        filter_kwargs = dict(self.filter_cfg or {})
        self.filter_fn = HyenaFilter(
            d_model=self.head_dim * self.inner_factor * (self.order - 1),
            order=self.filter_order,
            seq_len=self.l_max,
            dropout=self.filter_dropout,
            name="filter_fn",
            **filter_kwargs,
        )

        if self.post_order_ffn:
            self.ord_proj_w = self.param(
                "ord_proj_w",
                lambda key, shape, dtype=jnp.float32: jax.random.normal(
                    key, shape, dtype
                )
                / math.sqrt(self.head_dim),
                (self.order, self.num_heads, self.num_heads),
                jnp.float32,
            )

        self.drop = fnn.Dropout(rate=self.dropout)
        self.act = activation_fn(self.activation)

    def __call__(
        self, u: jax.Array, deterministic: bool = True, **kwargs
    ) -> jax.Array:
        """u: (B, L, d_model) -> (B, L, d_model)."""
        l = u.shape[-2]
        l_filter = min(l, self.l_max)

        seq_parallel = (
            self.mesh is not None and self.mesh.shape.get(self.seq_axis, 1) > 1
        )
        plain_3d = (
            self.num_heads == 1
            and self.num_blocks == 1
            and self.inner_factor == 1
            and not self.outer_mixing
            and not self.post_order_ffn
        )

        if not seq_parallel:
            fused = self._try_pallas_front(u, l, l_filter, deterministic)
            if fused is not None:
                return fused

        if plain_3d and not seq_parallel and self.inner_remat and not self.is_initializing():
            uc = self._front_3d(u)
            return self._tail_3d(uc, l_filter, deterministic, distributed=False)

        u = self.in_proj(u)  # (B, L, (o+1)d)
        u = jnp.swapaxes(u, -1, -2)  # (B, (o+1)d, L)

        if seq_parallel:
            assert plain_3d, (
                "sequence-parallel Hyena supports heads=1, blocks=1 (the DNA configs)"
            )
            uc = seq_short_conv(
                u,
                self.short_filter_weight.astype(u.dtype),
                self.short_filter_bias.astype(u.dtype),
                self.mesh,
                seq_axis=self.seq_axis,
            )
            return self._tail_3d(uc, l_filter, deterministic, distributed=True)

        uc = short_conv_1d(
            u,
            self.short_filter_weight.astype(u.dtype),
            self.short_filter_bias.astype(u.dtype),
        )
        # When l > l_max only the FILTER is truncated (to l_filter); the
        # sequence keeps full length — a causal conv with a shorter kernel
        # is exact for the first l_filter taps. The reference instead crops
        # the sequence itself (`hyena.py:394` uc[..., :l_filter]), which
        # shrinks the layer output and crashes its own residual add — so
        # ICL-style prompts longer than l_max (hg38_hyena_icl) only run here.

        if plain_3d:
            # the DNA configs: stay in (B, C, L) — no head/block reshapes,
            # chunked convs bound the FFT workspace at long L
            return self._tail_3d(uc, l_filter, deterministic, distributed=False)

        # generic path: multi-head / multi-block / outer_mixing / post_order_ffn
        return self._tail_generic(uc, l_filter, deterministic)

    def _front_3d(self, u: jax.Array) -> jax.Array:
        """proj -> transpose -> short conv on (B, L, d) -> (B, (o+1)d, L),
        optionally under its own jax.checkpoint (inner_remat)."""
        w = self.in_proj.variables["params"]["kernel"]
        b = self.in_proj.variables["params"]["bias"]
        wsf = self.short_filter_weight
        bsf = self.short_filter_bias

        def front(u, w, b, wsf, bsf):
            proj = (u @ w.astype(u.dtype)) + b.astype(u.dtype)
            proj = jnp.swapaxes(proj, -1, -2)
            return short_conv_1d(proj, wsf.astype(u.dtype), bsf.astype(u.dtype))

        if self.inner_remat:
            front = jax.checkpoint(front)
        return front(u, w, b, wsf, bsf)

    def _tail_generic(self, uc: jax.Array, l_filter: int, deterministic: bool):
        """Multi-head / multi-block recurrence on the short-conv output.

        uc: (B, (order+1)*d_model, l_filter) -> (B, num_blocks*l_chunk, d_model).

        Parity with the reference forward (`hyena.py:396-443`): the channel
        axis reshapes to (heads, head_dim*(order+1)) and the sequence axis to
        (num_blocks, l_filter/num_blocks); each block convolves independently
        against the shared (truncated) filter, as in the reference where the
        fft over the block length crops the full-length kernel.

        Two conscious deviations from reference *code* (not behavior):
          * the reference splits the per-head channel axis with chunk size
            ``d_model`` (`hyena.py:404`), which for num_heads > 1 produces
            unequal chunks and crashes in the gating multiply; we split into
            (order+1) equal head_dim chunks — the semantics its own rearrange
            comments describe.
          * inner_factor > 1 is rejected: the reference's in_proj emits
            (order+1)*d_model channels while its short_filter expects
            inner_factor*(order+1)*d_model (`hyena.py:352-365`), so that
            configuration cannot run there either.
        """
        if self.inner_factor != 1:
            raise NotImplementedError(
                "inner_factor > 1 is inconsistent in the reference "
                "(in_proj/short_filter width mismatch) and unsupported here"
            )
        # (B, heads, head_dim*(o+1), blocks, L/blocks); the sequence keeps
        # its full length l_seq — only the filter is capped at l_filter
        b = uc.shape[0]
        l_seq = uc.shape[-1]
        z = self.num_blocks
        ho = self.num_heads
        hd = self.head_dim
        o = self.order
        uc = uc.reshape(b, ho, hd * (o + 1), z, l_seq // z)

        # split channel groups: x[0], x[1], ..., x[o-1], v
        splits = jnp.split(uc, o + 1, axis=2)
        *x, v = splits

        k = tag_filter_k(self.filter_fn.filter(l_filter))  # (1, L, (o-1)*hd)
        # (c=1, L, (v o)) -> (o-1, hd, L); reference rearrange
        # "c l (v o) -> c o v l" treats the channel dim as (v, o) with o fastest
        k = k[0].reshape(l_filter, hd, o - 1)  # (L, v, o)
        k = jnp.transpose(k, (2, 1, 0))  # (o-1, v, L)

        bias = self.filter_fn.bias.reshape(hd, o - 1)  # "(v o) -> o v"
        bias = jnp.transpose(bias, (1, 0))  # (o-1, hd)

        for i, x_i in enumerate(reversed(x[1:])):
            if self.outer_mixing:
                # v -> (B, ho, 1, hd, z, l); x_i -> (B, ho, hd, 1, z, l);
                # sum over the x_i channel axis (`hyena.py:415-418`)
                v = v[:, :, None] * x_i[:, :, :, None]
                v = self.drop(v, deterministic=deterministic).sum(axis=2)
            else:
                v = self.drop(v * x_i, deterministic=deterministic)
            # bias broadcast: (1, hd, 1) against v (B, ho, hd, z, L) without L
            v = self.filter_fn(v, l_seq // z, k=k[i], bias=bias[i, None, :, None])

            if self.post_order_ffn:
                # reference mul_sum sums over the FIRST head index of
                # ord_proj_w (`hyena.py:425-429,91-93`): v'[h2] = sum_h1 w[h1,h2] v[h1]
                w = self.ord_proj_w[i]  # (h1, h2)
                v = jnp.einsum("ji,bjvzl->bivzl", w.astype(v.dtype), v)

        y = v * x[0]  # final gate
        # (B, h, v, z, l) -> (B, z*l, h*v)
        y = jnp.transpose(y, (0, 3, 4, 1, 2)).reshape(b, z * (l_seq // z), ho * hd)
        y = self.act(y)
        y = self.out_proj(y)

        if self.return_state:
            return y, None
        return y

    def _try_pallas_front(self, u, l, l_filter, deterministic):
        """Run the fused Pallas front end when eligible (order=2, heads=1,
        blocks=1, full-length, tileable L); None -> caller uses the
        unfused path."""
        import jax as _jax

        eligible = (
            not self.is_initializing()  # init creates params via the unfused path
            and self.order == 2
            and self.num_heads == 1
            and self.num_blocks == 1
            and self.inner_factor == 1
            and not self.outer_mixing
            and not self.post_order_ffn
            and l == l_filter
        )
        if not eligible:
            return None
        use = self.use_pallas_front
        if use is None:
            use = _jax.default_backend() == "tpu"
        if not use and not self.pallas_interpret:
            return None
        # 4-D conv-layout route: when the outer-radix conv covers this fft
        # size, emit the conv operands directly in its (B, d, rows, m)
        # tiling — no pad / relayout copies anywhere in the conv round trip
        y4 = self._try_front4(u, l, l_filter, deterministic)
        if y4 is not None:
            return y4
        tile_l = next((t for t in (512, 256, 128, 64, 32) if l % t == 0), None)
        if tile_l is None:
            return None

        from hyena_dna_tpu.ops.pallas_hyena import fused_proj_conv_gate

        w = self.in_proj.variables["params"]["kernel"].astype(jnp.float32)
        bp = self.in_proj.variables["params"]["bias"].astype(jnp.float32)
        wc = jnp.swapaxes(self.short_filter_weight, 0, 1).astype(jnp.float32)
        bc = self.short_filter_bias.astype(jnp.float32)
        vx, x0 = fused_proj_conv_gate(
            u, w, bp, wc, bc, tile_l, self.pallas_interpret
        )
        vx = self.drop(vx, deterministic=deterministic)

        # anchor the filter generation to this layer's activations at long L
        # so per-cell remat recomputes stay scheduled per-cell (see
        # HyenaFilter.filter docstring)
        # above ~512k tokens the f32 (B, d, L) conv operands dominate HBM
        # (977 MB each at 1M, d=256); keep the conv I/O (signal, gate,
        # filter bank) in bf16 there — the transform itself still runs
        # f32/chunked inside fftconv.
        conv_dt = (jnp.bfloat16 if l_filter >= CONV_IO_BF16_MIN_L
                   else jnp.float32)
        anchor = vx if l_filter >= CONV_IO_BF16_MIN_L else None
        k = self.filter_fn.filter(l_filter, anchor=anchor,
                                  out_dtype=conv_dt)  # (1, L, d)
        k = tag_filter_k(jnp.swapaxes(k[0], 0, 1))  # (d, L)
        bias = self.filter_fn.bias  # (d,)
        # post-gate fused into the conv kernel when a gated plan covers the
        # shape (reference fuses it in csrc/fftconv_cuda.cu; here the gate
        # rides the Pallas conv's epilogue and v never exists in HBM)
        from hyena_dna_tpu.ops import fftconv_gated as _fftconv_gated

        vx = vx.astype(conv_dt)
        x0 = x0.astype(conv_dt)
        y = _fftconv_gated(vx, x0, k, bias.astype(jnp.float32)).astype(u.dtype)
        y = jnp.swapaxes(y, -1, -2)
        y = self.act(y)
        y = self.out_proj(y)
        if self.return_state:
            return y, None
        return y

    def _try_front4(self, u, l, l_filter, deterministic):
        """Fused front + outer-radix conv with the conv operands kept in the
        kernel's native 4-D (B, d, n1//2*r, m) tiling end to end.

        Why built: on TPU the flat (C, Lp) array and the kernel's
        (C, rows, m) view tile differently, so the flat route shows a pad
        + full-array relayout copy per conv operand per call — 71 ms of
        pad+copy families in the 699 ms 450k train-step trace
        (artifacts/profile_families.json). Here the front kernel writes
        the padded 4-D layout directly, the conv consumes/produces it,
        the filter bank is built in it (major-axis pad + one transpose),
        and the flatten back merges into the output transpose the layer
        needs anyway. Math is identical to the flat route (same kernels,
        same padding semantics); only the physical layout changes.

        MEASURED AND REJECTED on v5e (2026-08-21, 450k step, A/B in one
        session; artifacts/front4_ab_450k.json): flat 703 ms vs 4-D
        721 ms. The trace diff shows why the 71 ms never materialized:
        (a) only ~26 ms of the pad/copy families actually disappears —
        XLA was riding much of those bytes inside elementwise fusions
        (the gate multiply re-appears unfused as 22 ms of
        multiply_bitcast fusions at padded length); (b) the front
        kernels pay a block-granularity tax for emitting (rows, m) tiles
        — Mosaic requires 8-row output blocks, so tile stores go through
        revisited blocks + static-switch sub-stores (fwd 1.4 -> 2.6 ms,
        bwd 4.7 -> 6.1 ms per call, +30 ms/step over 8 layers).
        Kept parity-tested (tests/test_front4.py) behind HYENA_FRONT4=1;
        default off."""
        import os as _os

        import jax as _jax

        if _os.environ.get("HYENA_FRONT4", "0") != "1":
            return None
        if self.order != 2 or l != l_filter:
            return None
        import sys as _sys

        import hyena_dna_tpu.ops.fftconv  # noqa: F401 — module registration
        from hyena_dna_tpu.ops.pallas_fftconv_n3 import plan_outer

        # the ops package re-exports the fftconv FUNCTION under the same
        # name; go through sys.modules for the module's live globals
        _F = _sys.modules["hyena_dna_tpu.ops.fftconv"]

        on_tpu = _jax.default_backend() == "tpu"
        if not (on_tpu or (self.pallas_interpret
                           and _F.PALLAS_FFTCONV_INTERPRET)):
            return None
        fft_size = _F.next_fast_fft_size(2 * l)
        spec = plan_outer(fft_size, self.d_model, l, u.shape[0])
        if spec is None:
            return None
        n1, r, m = spec
        rows_pad = (n1 // 2) * r
        lp = rows_pad * m
        tile_l = next((t for t in (512, 256, 128)
                       if l % t == 0 and t % m == 0 and lp % t == 0
                       and 8 % (t // m) == 0), None)
        if tile_l is None or l > lp or rows_pad % 8 != 0:
            return None
        from hyena_dna_tpu.ops.pallas_hyena import fused_proj_conv_gate4

        w = self.in_proj.variables["params"]["kernel"].astype(jnp.float32)
        bp = self.in_proj.variables["params"]["bias"].astype(jnp.float32)
        wc = jnp.swapaxes(self.short_filter_weight, 0, 1).astype(jnp.float32)
        bc = self.short_filter_bias.astype(jnp.float32)
        vx4, x04 = fused_proj_conv_gate4(
            u, w, bp, wc, bc, rows_pad, m, tile_l, self.pallas_interpret
        )
        vx4 = self.drop(vx4, deterministic=deterministic)

        conv_dt = (jnp.bfloat16 if l_filter >= CONV_IO_BF16_MIN_L
                   else jnp.float32)
        anchor = vx4 if l_filter >= CONV_IO_BF16_MIN_L else None
        k = self.filter_fn.filter(l_filter, anchor=anchor,
                                  out_dtype=conv_dt)  # (1, L, d)
        # filter bank straight into the 4-D tiling: pad on the MAJOR (time)
        # axis of (L, d) — cheap, no relayout — then one transpose; the flat
        # route's swapaxes + minor-axis pad + retile was 3 full copies
        kp = jnp.pad(k[0], ((0, lp - l_filter), (0, 0)))  # (lp, d)
        k4 = tag_filter_k(
            jnp.transpose(kp.reshape(rows_pad, m, -1), (2, 0, 1)))
        bias = self.filter_fn.bias
        vx4 = vx4.astype(conv_dt)
        x04 = x04.astype(conv_dt)
        v4 = tag_conv_out(
            _F.fftconv_outer_4d(vx4, k4, bias.astype(jnp.float32), n1, r, m))
        y4 = (v4 * x04).astype(u.dtype)
        # flatten rides the (B, C, rows, m) -> (B, L, C) transpose the layer
        # needs anyway: merging the two major time dims is tiling-free
        y = jnp.transpose(y4, (0, 2, 3, 1)).reshape(
            u.shape[0], lp, y4.shape[1])[:, :l]
        y = self.act(y)
        y = self.out_proj(y)
        if self.return_state:
            return y, None
        return y

    def _tail_3d(
        self, uc: jax.Array, l_filter: int, deterministic: bool, distributed: bool
    ):
        """Gating + long-conv recurrence on (B, C, L) (heads=1, blocks=1).

        distributed=True routes the conv through the sequence-sharded
        channel-pencil kernel; otherwise the local channel-chunked conv
        with the final gate (v * x0) fused into the last conv's kernel."""
        from hyena_dna_tpu.ops.fftconv import fftconv_chunked, fftconv_gated

        d = self.d_model * self.inner_factor
        o = self.order
        splits = jnp.split(uc, o + 1, axis=1)  # (o+1) x (B, d, L)
        *x, v = splits

        k = tag_filter_k(self.filter_fn.filter(l_filter))  # (1, L, (o-1)*d)
        k = k[0].reshape(l_filter, d, o - 1)
        k = jnp.transpose(k, (2, 1, 0))  # (o-1, d, L)
        bias = self.filter_fn.bias.reshape(d, o - 1).T  # (o-1, d)

        gated = False
        for i, x_i in enumerate(reversed(x[1:])):
            v = self.drop(v * x_i, deterministic=deterministic)
            last = i == o - 2
            if distributed:
                v = seq_fftconv(
                    v,
                    k[i].astype(jnp.float32),
                    bias[i].astype(jnp.float32),
                    self.mesh,
                    seq_axis=self.seq_axis,
                ).astype(v.dtype)
                v = tag_conv_out(v)
            elif last:
                v = fftconv_gated(
                    v, x[0].astype(v.dtype), k[i].astype(jnp.float32),
                    bias[i].astype(jnp.float32)
                ).astype(v.dtype)
                gated = True
            else:
                v = fftconv_chunked(
                    v, k[i].astype(jnp.float32), bias[i].astype(jnp.float32), False
                ).astype(v.dtype)
                v = tag_conv_out(v)

        y = v if gated else v * x[0]
        y = jnp.swapaxes(y, -1, -2)  # (B, L, d)
        y = self.act(y)
        y = self.out_proj(y)
        if self.return_state:
            return y, None
        return y

    @property
    def d_output(self) -> int:
        return self.d_model
