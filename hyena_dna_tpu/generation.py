"""Autoregressive generation for Hyena LMs.

Parity target: flash-attn's `GenerationMixin` mixed into the LM classes
(`/root/reference/src/models/sequence/long_conv_lm.py:22,400,505`) — greedy /
temperature / top-k / top-p sampling. The reference's cached recurrence does
not exist for Hyena (`hyena.py:384-386` `recurrence` is NotImplemented; the
mixin only caches attention KV), so generation there, like here, re-runs the
convolution over the prefix each step.

TPU-first shape discipline: one fixed-size (B, L_total) token buffer, a
`lax.fori_loop` over positions inside a single jit — no per-step
recompilation, no dynamic shapes. Causality of every layer guarantees the
suffix of the buffer (future positions) cannot affect the sampled position.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _sample_logits(rng, logits, temperature, top_k, top_p):
    logits = logits.astype(jnp.float32)
    if temperature == 0.0:  # greedy
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k is not None and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob >= top_p; keep at least 1
        cutoff_idx = jnp.sum((cum - probs) < top_p, axis=-1) - 1
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[..., None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def make_generate_fn(
    model,
    max_length: int,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    pad_token_id: int = 4,
):
    """Build a jitted (params, input_ids, prompt_len, rng) -> tokens function.

    input_ids: (B, max_length) buffer with the prompt left-aligned and the
    rest arbitrary (e.g. pad). prompt_len: scalar int (same for the batch).
    Returns the filled (B, max_length) buffer.
    """

    @partial(jax.jit, static_argnums=())
    def generate(params, input_ids, prompt_len, rng):
        b = input_ids.shape[0]
        buf = input_ids

        def body(pos, carry):
            buf, rng = carry
            out = model.apply({"params": params}, buf, deterministic=True)
            logits = (out[0] if isinstance(out, tuple) else out)  # (B, L, V)
            step_logits = jax.lax.dynamic_slice_in_dim(
                logits, pos - 1, 1, axis=1
            )[:, 0]
            rng, sub = jax.random.split(rng)
            nxt = _sample_logits(sub, step_logits, temperature, top_k, top_p)
            # only overwrite positions >= prompt_len
            keep = pos < prompt_len
            cur = jax.lax.dynamic_slice_in_dim(buf, pos, 1, axis=1)[:, 0]
            val = jnp.where(keep, cur, nxt.astype(buf.dtype))
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, val[:, None], pos, axis=1
            )
            return buf, rng

        # start at the first position to fill: positions < prompt_len are
        # prompt (the body would keep them unchanged — iterating them would
        # burn one full forward per PROMPT token, O(L_total) wasted
        # forwards). Traced lower bound lowers to a while_loop.
        start = jnp.maximum(jnp.asarray(prompt_len, jnp.int32), 1)
        buf, _ = jax.lax.fori_loop(start, max_length, body, (buf, rng))
        return buf

    return generate


def generate(
    model,
    params,
    prompt: jnp.ndarray,
    max_new_tokens: int,
    rng: Optional[jax.Array] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    pad_token_id: int = 4,
):
    """Convenience wrapper: prompt (B, P) -> (B, P + max_new_tokens)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    b, p = prompt.shape
    total = p + max_new_tokens
    buf = jnp.full((b, total), pad_token_id, prompt.dtype)
    buf = buf.at[:, :p].set(prompt)
    fn = make_generate_fn(
        model, total, temperature=temperature, top_k=top_k, top_p=top_p,
        pad_token_id=pad_token_id,
    )
    return fn(params, buf, jnp.asarray(p), rng)
