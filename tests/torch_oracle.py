"""Independent PyTorch-CPU oracle implementing the HyenaDNA math, written
fresh from the published equations (Hyena paper, arXiv 2302.10866, and the
HyenaDNA model card) to validate the JAX implementation numerically.

This is a test-only dependency; the framework itself never imports torch.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F


def fftconv_oracle(u, k, D=None, gelu=False, bidirectional=False):
    """Causal FFT long convolution: y = conv(u, k) + u*D, optional GeLU.

    u: (..., C, L) torch tensor; k: (C, L); D broadcastable with L appended.
    """
    L = u.shape[-1]
    n = 2 * L
    k_f = torch.fft.rfft(k.float(), n=n)
    if u.ndim > 3:
        k_f = k_f.unsqueeze(1)
    if bidirectional:
        pad_before = L // 2
        u_in = F.pad(u.float(), (pad_before, 0))
    else:
        u_in = u.float()
    u_f = torch.fft.rfft(u_in, n=n)
    y = torch.fft.irfft(u_f * k_f, n=n)[..., :L]
    if D is not None:
        y = y + u.float() * D.unsqueeze(-1)
    if gelu:
        y = F.gelu(y)
    return y.to(u.dtype)


def pos_emb_oracle(emb_dim, seq_len):
    """z, t positional features."""
    bands = (emb_dim - 1) // 2
    t = torch.linspace(0, 1, seq_len)[None, :, None]
    t_rescaled = torch.linspace(0, seq_len - 1, seq_len)[None, :, None]
    w = 2 * math.pi * t_rescaled / seq_len
    f = torch.linspace(1e-4, bands - 1, bands)[None, None]
    z = torch.exp(-1j * f * w)
    z = torch.cat([t, z.real, z.imag], dim=-1)
    return z, t


def hyena_filter_oracle(params, L, seq_len, emb_dim, modulate=True, shift=0.0,
                        normalized=False):
    """Run the implicit filter MLP given a dict of numpy weights.

    params keys: pos_emb_z (1, seq_len, emb_dim); freq (1, order);
    mlp_in_w (order, emb_dim) torch layout, mlp_in_b; mlp_inner_{i}_w/b;
    mlp_out_w (d, order); deltas (1, 1, d).
    """
    z = torch.as_tensor(params["pos_emb_z"])[:, :L].float()
    t = torch.linspace(0, 1, seq_len)[None, :L, None]
    freq = torch.as_tensor(params["freq"]).float()
    h = torch.sin(freq * F.linear(z, torch.as_tensor(params["mlp_in_w"]),
                                  torch.as_tensor(params["mlp_in_b"])))
    i = 0
    while f"mlp_inner_{i}_w" in params:
        h = torch.sin(freq * F.linear(h, torch.as_tensor(params[f"mlp_inner_{i}_w"]),
                                      torch.as_tensor(params[f"mlp_inner_{i}_b"])))
        i += 1
    h = F.linear(h, torch.as_tensor(params["mlp_out_w"]))
    if modulate:
        deltas = torch.as_tensor(params["deltas"]).float()
        h = h * (torch.exp(-t * deltas.abs()) + shift)
    if normalized:
        h = h / torch.norm(h, dim=-1, p=1, keepdim=True)
    return h


def short_conv_oracle(x, w, b):
    """Depthwise causal conv: x (B, C, L), w (C, K), b (C,)."""
    C, K = w.shape
    y = F.conv1d(x, w[:, None, :], b, padding=K - 1, groups=C)
    return y[..., : x.shape[-1]]


def hyena_operator_oracle(params, u, order, d_model, l_max, emb_dim,
                          num_heads=1, num_blocks=1, activation="id",
                          outer_mixing=False, post_order_ffn=False):
    """Full Hyena operator forward given numpy weights.

    params: in_proj_w ((o+1)d, d), in_proj_b; short_w (C, K), short_b (C,);
    filter params as in hyena_filter_oracle prefixed 'filter_'; filter_bias
    ((o-1)*head_dim,); out_proj_w (d, d), out_proj_b (d,); ord_proj_w
    (order, h, h) when post_order_ffn.
    u: (B, L, d) torch tensor.
    """
    t = lambda name: torch.as_tensor(params[name]).float()
    l = u.shape[-2]
    l_filter = min(l, l_max)
    x_proj = F.linear(u, t("in_proj_w"), t("in_proj_b"))  # (B, L, (o+1)d)
    x_proj = x_proj.transpose(-1, -2)  # (B, (o+1)d, L)
    uc = short_conv_oracle(x_proj, t("short_w"), t("short_b"))[..., :l_filter]

    head_dim = d_model // num_heads
    b = uc.shape[0]
    uc = uc.reshape(b, num_heads, head_dim * (order + 1), num_blocks,
                    l_filter // num_blocks)
    chunks = torch.split(uc, head_dim, dim=2)
    x, v = list(chunks[:-1]), chunks[-1]

    fparams = {k[len("filter_"):]: v2 for k, v2 in params.items()
               if k.startswith("filter_") and k != "filter_bias"}
    k_full = hyena_filter_oracle(fparams, l_filter, l_max, emb_dim)  # (1, L, (o-1)*hd)
    k_full = k_full[0].reshape(l_filter, head_dim, order - 1).permute(2, 1, 0)
    bias = t("filter_bias").reshape(head_dim, order - 1).permute(1, 0)

    for o, x_i in enumerate(reversed(x[1:])):
        if outer_mixing:
            # outer product over the channel axis, summed over the x_i index
            # (reference hyena.py:415-418)
            v = (v.unsqueeze(2) * x_i.unsqueeze(3)).sum(dim=2)
        else:
            v = v * x_i
        v = fftconv_oracle(v, k_full[o], bias[o, None, :, None])
        if post_order_ffn:
            # mul_sum(w (1,h1,h2,1,1,1), v (b,h1,1,v,z,l)).sum(dim=1):
            # v'[h2] = sum_h1 w[h1,h2] v[h1]  (reference hyena.py:425-429,91-93)
            w = t("ord_proj_w")[o]  # (h1, h2)
            v = torch.einsum("ji,bjvzl->bivzl", w, v)

    y = v * x[0]
    y = y.permute(0, 3, 4, 1, 2).reshape(b, l_filter, num_heads * head_dim)
    if activation == "gelu":
        y = F.gelu(y)
    y = F.linear(y, t("out_proj_w"), t("out_proj_b"))
    return y
