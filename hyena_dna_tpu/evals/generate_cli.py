"""Sampling CLI: generate nucleotide sequences from a trained checkpoint.

The serving-surface analog of the reference's `GenerationMixin.generate`
usage (`/root/reference/src/models/sequence/long_conv_lm.py:400,505`).

Usage:
  python -m hyena_dna_tpu.evals.generate_cli --ckpt runs/.../best \
      --prompt ACGTACGT --max_new_tokens 64 --temperature 0.8 --top_k 4
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from hyena_dna_tpu.data.tokenizer import CharacterTokenizer
from hyena_dna_tpu.evals.hg38_inference import build_model, load_params
from hyena_dna_tpu.generation import generate


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--prompt", default="ACGT")
    ap.add_argument("--max_new_tokens", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--top_k", type=int, default=None)
    ap.add_argument("--top_p", type=float, default=None)
    ap.add_argument("--d_model", type=int, default=128)
    ap.add_argument("--n_layer", type=int, default=2)
    ap.add_argument("--max_length", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--recurrent", action="store_true",
                    help="O(1)-per-token modal-distilled stepper "
                         "(hyena_dna_tpu.recurrent) instead of full "
                         "re-forward per token")
    ap.add_argument("--n_modes", type=int, default=64)
    args = ap.parse_args(argv)

    tok = CharacterTokenizer(model_max_length=args.max_length + 2)
    model = build_model(args.d_model, args.n_layer, args.max_length)
    sample = jnp.zeros((1, args.max_length), jnp.int32)
    params = load_params(args.ckpt, model, sample)

    prompt_ids = jnp.asarray(tok.encode(args.prompt))[None]
    if args.recurrent:
        from hyena_dna_tpu.recurrent import distill

        rec = distill(model, params, n_modes=args.n_modes)
        out = rec.generate(
            prompt_ids, args.max_new_tokens,
            rng=(jax.random.PRNGKey(args.seed)
                 if args.temperature != 0 else None),
            temperature=args.temperature, top_k=args.top_k,
        )
    else:
        out = generate(
            model, params, prompt_ids,
            max_new_tokens=args.max_new_tokens,
            rng=jax.random.PRNGKey(args.seed),
            temperature=args.temperature,
            top_k=args.top_k,
            top_p=args.top_p,
        )
    text = tok.decode(out[0])
    print(text)
    return text


if __name__ == "__main__":
    main()
