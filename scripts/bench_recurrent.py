"""Recurrent-stepper measurement on a TRAINED checkpoint.

Two questions VERDICT r2 asked (#5):
  (a) distillation ppl drift — held-out perplexity of the modal-distilled
      recurrent stepper vs the parallel forward, at several mode counts P;
  (b) speed — tokens/s of the O(1)/token stepper vs the fixed-buffer
      re-forward loop (`generation.py`) at several prompt lengths.

Checkpoint: a synthetic-hg38 pretrain at the reference recipe
(runs/drift_f32, d=128 n=2 L=1024 — `python -m hyena_dna_tpu.train
experiment=hg38/hg38_hyena ...`). Eval windows come from the held-out
chr4 tail of the same synthetic genome.

The reference has no recurrent path at all (`hyena.py:384-386` leaves
`recurrence` unimplemented), so (b) is measured against the only
generation mode the reference supports.

Usage:
  python scripts/bench_recurrent.py drift   # CPU-friendly, ppl drift vs P
  python scripts/bench_recurrent.py speed   # on-chip tokens/s comparison

Writes artifacts/recurrent_drift.json / artifacts/recurrent_speed.json.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

ensure_tpu_flags()

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]

FASTA = REPO / "data/hg38/synthetic_hg38.fa"

CFG = dict(d_model=128, n_layer=2, d_inner=512, vocab_size=12,
           pad_vocab_size_multiple=8, residual_in_fp32=True,
           embed_dropout=0.1)

# Two trained checkpoints: the reference-recipe 1k pretrain (round-3 drift
# study) and a 32k-context pretrain (round-4: drift at >=16k windows, where
# modal truncation error accumulates, plus honest re-forward speed — the
# re-forward at long prompts runs the FULL l_max window, not a 1k cap).
PRESETS = {
    "1k": dict(ckpt="runs/drift_f32/checkpoints/best", l_max=1026,
               drift_windows=((1024, 16),), drift_P=(16, 32, 64, 128),
               prompts=(1024, 8192, 32768)),
    "32k": dict(ckpt="runs/rec32k/checkpoints/best", l_max=32770,
                drift_windows=((1024, 16), (4096, 8), (16384, 4),
                               (32768, 4)),
                drift_P=(32, 64), prompts=(1024, 8192, 32768)),
}


def load_model_and_params(preset):
    from hyena_dna_tpu.models import ConvLMHeadModel
    from hyena_dna_tpu.train.checkpoint import restore_params_only

    layer = dict(_name_="hyena", emb_dim=5, filter_order=64,
                 short_filter_order=3, l_max=preset["l_max"], modulate=True,
                 w=10)
    model = ConvLMHeadModel(layer=layer, dtype=jnp.float32, **CFG)
    params = restore_params_only(str(REPO / preset["ckpt"]))
    return model, params


def eval_windows(n_windows=16, length=1024):
    """Held-out windows from the chr4 tail (the bed's test split region).
    Reads the record text directly (robust to any line wrapping) rather
    than through faidx."""
    from hyena_dna_tpu.data.tokenizer import CharacterTokenizer

    tok = CharacterTokenizer(model_max_length=length + 2)
    chunks, active = [], False
    with open(FASTA) as f:
        for line in f:
            if line.startswith(">"):
                active = line[1:].strip() == "chr4"
                continue
            if active:
                chunks.append(line.strip())
    text = "".join(chunks)
    base = 15_500_000  # inside the held-out tail
    xs = []
    for i in range(n_windows):
        seq = text[base + i * length: base + (i + 1) * length].upper()
        ids = tok(seq, add_special_tokens=False)["input_ids"]
        xs.append(np.asarray(ids, np.int32))
    return np.stack(xs)


def exact_ppl_from_logits(logits, targets):
    lg = np.asarray(logits, np.float64)
    lg = lg - lg.max(-1, keepdims=True)
    lp = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
    nll = -np.take_along_axis(lp, targets[..., None], axis=-1)
    return float(np.exp(nll.mean()))


def run_drift(name, preset):
    from hyena_dna_tpu.recurrent import distill

    model, params = load_model_and_params(preset)
    results = {"preset": name, "per_window": {}}
    recs = {P: distill(model, params, n_modes=P) for P in preset["drift_P"]}
    for length, n_windows in preset["drift_windows"]:
        toks = eval_windows(n_windows=n_windows, length=length)
        x, y = toks[:, :-1], toks[:, 1:]

        logits_par, _ = jax.jit(
            lambda p, x: model.apply({"params": p}, x, deterministic=True)
        )(params, jnp.asarray(x))
        ppl_par = exact_ppl_from_logits(logits_par, y)

        entry = {"parallel_ppl": ppl_par, "windows": n_windows, "per_P": {}}
        for P, rec in recs.items():
            @jax.jit
            def all_logits(rec, tokens):
                def body(st, tokcol):
                    st, lg = rec.step(st, tokcol)
                    return st, lg
                _, lgs = jax.lax.scan(body, rec.init_state(tokens.shape[0]),
                                      jnp.swapaxes(tokens, 0, 1))
                return jnp.swapaxes(lgs, 0, 1)  # (B, T, V)

            logits_rec = all_logits(rec, jnp.asarray(x))
            ppl_rec = exact_ppl_from_logits(logits_rec, y)
            entry["per_P"][P] = {
                "recurrent_ppl": ppl_rec,
                "drift_pct": 100.0 * (ppl_rec - ppl_par) / ppl_par,
                "fit_rel_err": rec.fit_rel_err,
            }
            print(f"window {length} P={P}: parallel ppl {ppl_par:.4f} -> "
                  f"recurrent {ppl_rec:.4f} "
                  f"({entry['per_P'][P]['drift_pct']:+.3f}%), "
                  f"fit_rel_err {rec.fit_rel_err:.2e}", flush=True)
        results["per_window"][length] = entry

    suffix = "" if name == "1k" else f"_{name}"
    out = REPO / f"artifacts/recurrent_drift{suffix}.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


def run_speed(name, preset):
    from hyena_dna_tpu.generation import generate as parallel_generate
    from hyena_dna_tpu.recurrent import distill

    model, params = load_model_and_params(preset)
    rec = distill(model, params, n_modes=64)
    results = {"preset": name}
    new_tokens = 256
    for prompt_len in preset["prompts"]:
        rng = np.random.default_rng(0)
        prompt = jnp.asarray(
            rng.integers(7, 11, size=(1, prompt_len)), jnp.int32)

        # recurrent stepper: prefill scan + O(1) generation steps. Timing
        # at TWO generation lengths separates the one-time O(prompt)
        # prefill from the steady per-token rate (at long prompts the
        # prefill dominates a 256-token run and hides the actual
        # generation rate).
        gen_rec = jax.jit(lambda rec, p, n: rec.generate(p, n),
                          static_argnums=2)
        # steady rate from a LONG generation window (the parallel prefill
        # is now ~30 ms, so short windows are all tunnel-floor noise);
        # min-of-3 executions per length
        few, many = 16, 2048
        dts = {}
        for n in (few, new_tokens, many):
            out = gen_rec(rec, prompt, n)
            float(jnp.sum(out))  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = gen_rec(rec, prompt, n)
                float(jnp.sum(out))
                best = min(best, time.perf_counter() - t0)
            dts[n] = best
        dt_rec = dts[new_tokens]
        per_tok = (dts[many] - dts[few]) / (many - few)
        prefill_s = max(dts[few] - few * per_tok, 0.0)

        # fixed-buffer re-forward loop (the only mode the reference has).
        # At long prompts 256 re-forward tokens is a single multi-minute
        # device dispatch, which the tunneled worker kills — measure fewer
        # tokens there and report per-token rates (the loop's per-token
        # cost is constant: every step re-runs the full forward).
        par_tokens = new_tokens if prompt_len <= 8192 else 8
        # build the jitted fn ONCE so the timed call is compile-free (the
        # convenience wrapper makes a fresh closure — and thus a fresh
        # compile — per call, which would unfairly bill the re-forward)
        from hyena_dna_tpu.generation import make_generate_fn

        total = prompt_len + par_tokens
        buf = jnp.full((1, total), 4, prompt.dtype).at[:, :prompt_len].set(prompt)
        fn = make_generate_fn(model, total)
        out = fn(params, buf, jnp.asarray(prompt_len), jax.random.PRNGKey(0))
        float(jnp.sum(out))
        t0 = time.perf_counter()
        out = fn(params, buf, jnp.asarray(prompt_len), jax.random.PRNGKey(1))
        float(jnp.sum(out))
        dt_par = (time.perf_counter() - t0) * (new_tokens / par_tokens)

        par_per_tok = dt_par / new_tokens
        results[prompt_len] = {
            "new_tokens": new_tokens,
            "recurrent_s": round(dt_rec, 3),
            "recurrent_tok_s": round(new_tokens / dt_rec, 1),
            "stepper_prefill_s": round(prefill_s, 3),
            "stepper_steady_tok_s": round(1.0 / per_tok, 1),
            "reforward_s": round(dt_par, 3),
            "reforward_tok_s": round(new_tokens / dt_par, 1),
            "speedup": round(dt_par / dt_rec, 2),
            "steady_speedup": round(par_per_tok / per_tok, 2),
        }
        print(f"prompt {prompt_len}: stepper {new_tokens/dt_rec:.1f} tok/s "
              f"end-to-end (steady {1.0/per_tok:.1f} tok/s after a "
              f"{prefill_s:.2f}s prefill) vs re-forward "
              f"{new_tokens/dt_par:.1f} tok/s "
              f"(e2e {dt_par/dt_rec:.1f}x, steady {par_per_tok/per_tok:.1f}x)",
              flush=True)

    suffix = "" if name == "1k" else f"_{name}"
    out = REPO / f"artifacts/recurrent_speed{suffix}.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "drift"
    which = sys.argv[2] if len(sys.argv) > 2 else "1k"
    preset = PRESETS[which]
    (run_drift if mode == "drift" else run_speed)(which, preset)
