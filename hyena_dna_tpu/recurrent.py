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

import math

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

    def prefill_parallel(self, state: Dict,
                         tokens: jax.Array) -> Tuple[Dict, jax.Array]:
        """Closed-form prefill: O(T log T) parallel forward instead of the
        O(T) sequential scan (round-4 bottleneck: 0.92 s at a 32k prompt).

        The modal state after a prompt is a pole-weighted suffix
        correlation, s_T = sum_t lam^{T-t} v_t, over the gated conv inputs
        v_t — which a PARALLEL forward computes wholesale. This runs the
        same math as `prefill` (the conv uses the MODAL filter
        reconstruction, not the exact implicit filter, so the produced
        state/logits match the scan stepper's to fp error), captures each
        stage's gated input, and contracts it against two-level blocked
        pole powers (block size 256 keeps every phase multiplication under
        ~800 rad, so f32 angles stay accurate at 32k+ prompts).

        Ignores `state` (assumed fresh); returns (state_at_T, last logits).
        """
        p = self.params["backbone"]
        emb = p["embeddings"]["word_embeddings"]["embedding"]
        h = emb[tokens].astype(jnp.float32)  # (B, T, d)
        act = activation_fn(self.activation)
        residual = None
        new_layers = []
        for i in range(self.n_layer):
            lp = p[f"layers_{i}"]
            residual = h if residual is None else h + residual
            hn = _ln(residual, lp["norm1"], self.ln_eps)
            y, st_i = self._mixer_parallel(hn, lp["mixer"], self.lam_ri[i],
                                           self.c_ri[i], act)
            residual = y + residual
            hn2 = _ln(residual, lp["norm2"], self.ln_eps)
            h = _mlp(hn2, lp["mlp"])
            new_layers.append(st_i)
        residual = h + residual
        hf = _ln(residual[:, -1], p["ln_f"], self.ln_eps)
        logits = hf @ emb.astype(jnp.float32).T
        return {"layers": new_layers, "residual": residual[:, -1]}, logits

    def _mixer_parallel(self, x, mp, lam_ri, c_ri, act):
        """Batched mirror of _mixer_step over a whole prompt: x (B, T, d) ->
        (y (B, T, d), state-at-T)."""
        from hyena_dna_tpu.ops.fftconv import fftconv_chunked

        o, d, K = self.order, self.d_model, self.short_k
        B, T, _ = x.shape
        w = mp["in_proj"]["kernel"].astype(jnp.float32)
        b = mp["in_proj"]["bias"].astype(jnp.float32)
        proj = jnp.swapaxes(x @ w + b, 1, 2)  # (B, (o+1)d, T)

        # causal depthwise short conv + the K-1 tap buffer at T
        wsf = mp["short_filter_weight"].astype(jnp.float32)  # ((o+1)d, K)
        bsf = mp["short_filter_bias"].astype(jnp.float32)
        uc = bsf[None, :, None]
        for kk in range(K):
            shift = K - 1 - kk  # tap kk reads p_{t-shift}
            pk = proj if shift == 0 else jnp.pad(
                proj, ((0, 0), (0, 0), (shift, 0)))[:, :, :T]
            uc = uc + wsf[None, :, kk:kk + 1] * pk
        if T >= K - 1:
            buf = proj[:, :, T - (K - 1):]
        else:
            buf = jnp.pad(proj, ((0, 0), (0, 0), (K - 1 - T, 0)))

        parts = jnp.split(uc, o + 1, axis=1)  # (o+1) x (B, d, T)
        *xg, v = parts
        bias = mp["filter_fn"]["bias"].astype(jnp.float32).reshape(d, o - 1).T

        new_s = []
        for i, x_i in enumerate(reversed(xg[1:])):
            vx = v * x_i
            new_s.append(_suffix_state(vx, lam_ri[i]))
            kmod = _modal_kernel(lam_ri[i], c_ri[i], T)  # (d, T)
            conv = fftconv_chunked(vx, kmod, None, False).astype(jnp.float32)
            v = conv + bias[i][None, :, None] * vx
        y = v * xg[0]
        y = act(jnp.swapaxes(y, 1, 2))  # (B, T, d)
        wo = mp["out_proj"]["kernel"].astype(jnp.float32)
        bo = mp["out_proj"]["bias"].astype(jnp.float32)
        st = {"sc": buf, "s": jnp.stack(new_s, axis=1)}
        return y @ wo + bo, st

    def generate(self, prompt: jax.Array, max_new_tokens: int,
                 rng: jax.Array | None = None, temperature: float = 1.0,
                 top_k: int | None = None,
                 parallel_prefill: bool = True) -> jax.Array:
        """prompt (B, T) -> (B, T + max_new_tokens), greedy unless rng.

        parallel_prefill (default): closed-form O(T log T) state
        computation; False restores the O(T) sequential-scan prefill
        (kept as the oracle)."""
        b = prompt.shape[0]
        pre = self.prefill_parallel if parallel_prefill else self.prefill
        state, logits = pre(self.init_state(b), prompt)

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


_POLE_BLOCK = 256  # power-block size: every phase product stays < ~800 rad


def _pole_powers(lam_ri, exps):
    """lam^e for a vector of integer exponents: (re, im) of shape
    lam(..., P) x len(exps). Magnitude via exp(e*log|lam|) with the
    |lam| = 0 / e = 0 corner handled; phase via e*theta (callers keep
    e*theta small by blocking)."""
    lr, li = lam_ri[..., 0], lam_ri[..., 1]
    mag = jnp.sqrt(lr * lr + li * li)
    th = jnp.arctan2(li, lr)
    e = jnp.asarray(exps, jnp.float32)
    logm = jnp.log(jnp.maximum(mag, 1e-30))
    pm = jnp.exp(e * logm[..., None])
    pm = jnp.where((mag[..., None] <= 1e-30) & (e != 0.0), 0.0, pm)
    pm = jnp.where(e == 0.0, 1.0, pm)
    ang = e * th[..., None]
    return pm * jnp.cos(ang), pm * jnp.sin(ang)


def _outer_pole(lam_ri, bk):
    """lam^bk as an (..., 2) pair, phase reduced mod 2pi in f32 while the
    product is still small (bk * |theta| <= ~800 rad)."""
    lr, li = lam_ri[..., 0], lam_ri[..., 1]
    mag = jnp.sqrt(lr * lr + li * li)
    th = jnp.arctan2(li, lr)
    magb = jnp.where(mag <= 1e-30, 0.0, jnp.exp(bk * jnp.log(
        jnp.maximum(mag, 1e-30))))
    angb = jnp.mod(bk * th, 2.0 * math.pi)
    return jnp.stack([magb * jnp.cos(angb), magb * jnp.sin(angb)], axis=-1)


def _suffix_state(vx, lam_ri, bk=_POLE_BLOCK):
    """s_T = sum_t lam^{T-1-t} vx[..., t] -> (B, d, P, 2).

    vx (B, d, T) real; lam_ri (d, P, 2). Front-pads T to a block multiple
    (zeros contribute nothing), contracts inner-block powers then outer
    block powers — two-level so f32 phases stay accurate at any T."""
    B, d, T = vx.shape
    nb = -(-T // bk)
    pad = nb * bk - T
    if pad:
        vx = jnp.pad(vx, ((0, 0), (0, 0), (pad, 0)))
    vb = vx.reshape(B, d, nb, bk)
    # win[d, P, j] = lam^{bk-1-j}
    wr, wi = _pole_powers(lam_ri, np.arange(bk - 1, -1, -1.0))
    pr = jnp.einsum("bdnj,dpj->bdnp", vb, wr)
    pi = jnp.einsum("bdnj,dpj->bdnp", vb, wi)
    # wout[d, P, n] = (lam^bk)^{nb-1-n}
    ob = _outer_pole(lam_ri, bk)
    owr, owi = _pole_powers(ob, np.arange(nb - 1, -1, -1.0))
    sr = jnp.einsum("bdnp,dpn->bdp", pr, owr) - jnp.einsum(
        "bdnp,dpn->bdp", pi, owi)
    si = jnp.einsum("bdnp,dpn->bdp", pr, owi) + jnp.einsum(
        "bdnp,dpn->bdp", pi, owr)
    return jnp.stack([sr, si], axis=-1)


def _modal_kernel(lam_ri, c_ri, T, bk=_POLE_BLOCK):
    """kmod[d, t] = Re sum_p c * lam^t for t = 0..T-1 (the filter the
    recurrence realizes), via the same two-level blocked powers."""
    nb = -(-T // bk)
    wr, wi = _pole_powers(lam_ri, np.arange(0.0, bk))  # (d, P, bk)
    ob = _outer_pole(lam_ri, bk)
    owr, owi = _pole_powers(ob, np.arange(0.0, nb))  # (d, P, nb)
    cr, ci = c_ri[..., 0], c_ri[..., 1]
    # co[n] = c * (lam^bk)^n
    cor = cr[..., None] * owr - ci[..., None] * owi  # (d, P, nb)
    coi = cr[..., None] * owi + ci[..., None] * owr
    k = (jnp.einsum("dpn,dpj->dnj", cor, wr) -
         jnp.einsum("dpn,dpj->dnj", coi, wi))
    return k.reshape(k.shape[0], nb * bk)[:, :T]


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
