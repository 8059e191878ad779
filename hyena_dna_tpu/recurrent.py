"""O(1)-per-token recurrent generation via modal distillation.

The reference generates by re-running the full Hyena forward for every new
token (its `recurrence` hook is unimplemented — reference
`src/models/sequence/hyena.py:433-435`; same for this repo's fixed-buffer
`generation.py` loop): O(L * FullForward). This module distills each layer's
implicit long filter into a P-mode complex state-space recurrence
(`ops/modal.py`) and steps the WHOLE ConvLMHeadModel token-by-token with
state (per layer: a (K-1)-tap short-conv buffer + (o-1) complex mode banks):
O(d^2 + d*P) per token, constant in position.

Everything is plain functions over the model's own param tree — the
recurrent path shares every weight with the parallel path, so a checkpoint
serves both.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyena_dna_tpu.models.nn import activation_fn
from hyena_dna_tpu.ops.modal import fit_modal_filters, modal_reconstruction


@dataclass(frozen=True)
class RecurrentLM:
    """Distilled recurrent view of a ConvLMHeadModel (order >= 2, heads=1)."""

    params: Any  # the ORIGINAL param tree (backbone/..., shared weights)
    lam_ri: Any  # per layer: (o-1, d, P, 2) f32 pole real/imag
    c_ri: Any    # per layer: (o-1, d, P, 2) f32 amplitude real/imag
    n_layer: int
    order: int
    short_k: int
    d_model: int
    activation: str = "id"
    ln_eps: float = 1e-5
    fit_rel_err: float = 0.0

    # ---- state ------------------------------------------------------------
    def init_state(self, batch: int) -> Dict:
        d, o, P = self.d_model, self.order, self.lam_ri[0].shape[2]
        layer = lambda: {
            "sc": jnp.zeros((batch, (o + 1) * d, self.short_k - 1), jnp.float32),
            "s": jnp.zeros((batch, o - 1, d, P, 2), jnp.float32),
        }
        return {
            "layers": [layer() for _ in range(self.n_layer)],
            "residual": jnp.zeros((batch, d), jnp.float32),
        }

    # ---- one token --------------------------------------------------------
    def step(self, state: Dict, token: jax.Array) -> Tuple[Dict, jax.Array]:
        """token: (B,) int32 -> (new_state, logits (B, V))."""
        p = self.params["backbone"]
        emb = p["embeddings"]["word_embeddings"]["embedding"]
        h = emb[token].astype(jnp.float32)  # (B, d)
        residual = None
        new_layers = []
        act = activation_fn(self.activation)
        for i in range(self.n_layer):
            lp = p[f"layers_{i}"]
            st = state["layers"][i]
            residual = h if residual is None else h + residual
            hn = _ln(residual, lp["norm1"], self.ln_eps)
            y, st = self._mixer_step(hn, st, lp["mixer"],
                                     self.lam_ri[i], self.c_ri[i], act)
            residual = y + residual
            hn2 = _ln(residual, lp["norm2"], self.ln_eps)
            h = _mlp(hn2, lp["mlp"])
            new_layers.append(st)
        residual = h + residual
        hf = _ln(residual, p["ln_f"], self.ln_eps)
        logits = hf @ emb.astype(jnp.float32).T
        return {"layers": new_layers, "residual": residual}, logits

    def _mixer_step(self, x, st, mp, lam_ri, c_ri, act):
        """One Hyena token step: proj -> short-conv (buffered) -> gated modal
        recurrences -> out_proj. x: (B, d)."""
        o = self.order
        d = self.d_model
        w = mp["in_proj"]["kernel"].astype(jnp.float32)
        b = mp["in_proj"]["bias"].astype(jnp.float32)
        proj = x @ w + b  # (B, (o+1)d)

        wsf = mp["short_filter_weight"].astype(jnp.float32)  # ((o+1)d, K)
        bsf = mp["short_filter_bias"].astype(jnp.float32)
        buf = st["sc"]  # (B, (o+1)d, K-1) holds p_{t-K+1..t-1}
        hist = jnp.concatenate([buf, proj[:, :, None]], axis=-1)  # (.., K)
        uc = jnp.einsum("bck,ck->bc", hist, wsf) + bsf
        new_buf = hist[:, :, 1:]

        parts = jnp.split(uc, o + 1, axis=-1)  # (o+1) x (B, d)
        *xg, v = parts
        bias = mp["filter_fn"]["bias"].astype(jnp.float32).reshape(d, o - 1).T

        s = st["s"]  # (B, o-1, d, P, 2)
        new_s = []
        for i, x_i in enumerate(reversed(xg[1:])):
            v = v * x_i
            lr, li = lam_ri[i, ..., 0], lam_ri[i, ..., 1]  # (d, P)
            cr, ci = c_ri[i, ..., 0], c_ri[i, ..., 1]
            sr, si = s[:, i, ..., 0], s[:, i, ..., 1]  # (B, d, P)
            sr, si = (lr * sr - li * si + v[..., None],
                      lr * si + li * sr)
            new_s.append(jnp.stack([sr, si], axis=-1))
            conv = jnp.sum(cr * sr - ci * si, axis=-1)  # Re(sum c*s): (B, d)
            v = conv + bias[i] * v
        y = v * xg[0]
        y = act(y)
        wo = mp["out_proj"]["kernel"].astype(jnp.float32)
        bo = mp["out_proj"]["bias"].astype(jnp.float32)
        st = {"sc": new_buf, "s": jnp.stack(new_s, axis=1)}
        return y @ wo + bo, st

    # ---- sequence APIs ------------------------------------------------------
    def prefill(self, state: Dict, tokens: jax.Array) -> Tuple[Dict, jax.Array]:
        """tokens (B, T): scan the step; returns (state, last logits)."""

        def body(st, tok):
            st, logits = self.step(st, tok)
            return st, logits

        state, logits = jax.lax.scan(body, state, jnp.swapaxes(tokens, 0, 1))
        return state, logits[-1]

    def generate(self, prompt: jax.Array, max_new_tokens: int,
                 rng: jax.Array | None = None, temperature: float = 1.0,
                 top_k: int | None = None) -> jax.Array:
        """prompt (B, T) -> (B, T + max_new_tokens), greedy unless rng."""
        b = prompt.shape[0]
        state, logits = self.prefill(self.init_state(b), prompt)

        def pick(rng, logits):
            if rng is None:
                return jnp.argmax(logits, axis=-1).astype(prompt.dtype)
            lg = logits / max(temperature, 1e-6)
            if top_k:
                kth = jnp.sort(lg, axis=-1)[:, -top_k][:, None]
                lg = jnp.where(lg < kth, -jnp.inf, lg)
            return jax.random.categorical(rng, lg).astype(prompt.dtype)

        def body(carry, _):
            st, lg, rng = carry
            if rng is not None:
                rng, sub = jax.random.split(rng)
            else:
                sub = None
            tok = pick(sub, lg)
            st, lg = self.step(st, tok)
            return (st, lg, rng), tok

        (_, _, _), toks = jax.lax.scan(
            body, (state, logits, rng), None, length=max_new_tokens)
        return jnp.concatenate([prompt, jnp.swapaxes(toks, 0, 1)], axis=1)


jax.tree_util.register_pytree_node(
    RecurrentLM,
    lambda r: ((r.params, r.lam_ri, r.c_ri),
               (r.n_layer, r.order, r.short_k, r.d_model, r.activation,
                r.ln_eps, r.fit_rel_err)),
    lambda aux, ch: RecurrentLM(ch[0], ch[1], ch[2], *aux),
)


def _ln(x, p, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    return xn * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)


def _mlp(x, p):
    h = x @ p["fc1"]["kernel"].astype(jnp.float32) + p["fc1"]["bias"].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True)
    return h @ p["fc2"]["kernel"].astype(jnp.float32) + p["fc2"]["bias"].astype(jnp.float32)


def distill(model, params, n_modes: int = 64, fit_len: int = 8192) -> RecurrentLM:
    """Fit modal recurrences for every layer of a ConvLMHeadModel /
    DNAEmbeddingModel and return the recurrent view (host-side, once per
    checkpoint)."""
    from hyena_dna_tpu.models.blocks import make_mixer

    layer_cfg = dict(model.layer or {})
    n_layer = model.n_layer
    d = model.d_model
    mixer = make_mixer(d, layer_cfg, None, False, n_layer, jnp.float32)
    order = mixer.order
    l_max = mixer.l_max

    lam_all, c_all, errs = [], [], []
    for i in range(n_layer):
        mp = params["backbone"][f"layers_{i}"]["mixer"]
        k = mixer.apply({"params": mp}, l_max,
                        method=lambda m, L: m.filter_fn.filter(L))
        k = np.asarray(k[0], np.float64)  # (L, (o-1)*d)
        k = k.reshape(k.shape[0], d, order - 1).transpose(2, 1, 0)  # (o-1, d, L)
        lam_l, c_l = [], []
        for g in range(order - 1):
            lam, c = fit_modal_filters(k[g], n_modes, fit_len=fit_len)
            rec = modal_reconstruction(lam, c, min(k.shape[-1], fit_len))
            ref = k[g][:, : rec.shape[-1]]
            errs.append(float(np.abs(rec - ref).max() / (np.abs(ref).max() + 1e-12)))
            lam_l.append(np.stack([lam.real, lam.imag], -1))
            c_l.append(np.stack([c.real, c.imag], -1))
        lam_all.append(jnp.asarray(np.stack(lam_l), jnp.float32))
        c_all.append(jnp.asarray(np.stack(c_l), jnp.float32))

    short_k = int(params["backbone"]["layers_0"]["mixer"]
                  ["short_filter_weight"].shape[-1])
    return RecurrentLM(
        params=params, lam_ri=lam_all, c_ri=c_all, n_layer=n_layer,
        order=order, short_k=short_k, d_model=d,
        activation=str(layer_cfg.get("activation", "id")),
        fit_rel_err=max(errs),
    )
