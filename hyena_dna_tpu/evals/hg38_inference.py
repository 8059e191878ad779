"""hg38 inference eval: load a checkpoint and report next-token loss/ppl on
fixed genome windows.

Parity target: `/root/reference/evals/hg38_inference.py:30-125` (LM logits
loop from yaml+ckpt) and the fixed-window eval sets
(`src/dataloaders/datasets/hg38_fixed_dataset.py`). Accepts either an Orbax
checkpoint from this framework or a torch .ckpt/LongSafari dir (imported via
`hyena_dna_tpu.utils.torch_import`).

Usage:
  python -m hyena_dna_tpu.evals.hg38_inference \
      --ckpt runs/hg38_hyena/checkpoints/best \
      --fasta data/hg38/hg38.ml.fa --max_length 1024 \
      --chr_ranges chr14:19726402-106677047
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from hyena_dna_tpu.data.hg38 import HG38FixedDataset
from hyena_dna_tpu.data.loader import DataLoader
from hyena_dna_tpu.models import ConvLMHeadModel
from hyena_dna_tpu.tasks import metrics as M


def build_model(d_model, n_layer, max_length, vocab_size=12):
    layer = dict(
        _name_="hyena", emb_dim=5, filter_order=64, short_filter_order=3,
        l_max=max_length + 2, modulate=True, w=10,
    )
    return ConvLMHeadModel(
        d_model=d_model, n_layer=n_layer, d_inner=4 * d_model,
        vocab_size=vocab_size, pad_vocab_size_multiple=8,
        residual_in_fp32=True, layer=layer,
    )


def load_params(ckpt: str, model, sample):
    """Orbax run checkpoint, torch .ckpt, or LongSafari dir."""
    if ckpt.endswith((".ckpt", ".pt")):
        from hyena_dna_tpu.utils.torch_import import import_pretrained

        return jax.tree_util.tree_map(jnp.asarray, import_pretrained(ckpt))
    import os

    if os.path.isdir(ckpt) and os.path.exists(os.path.join(ckpt, "weights.ckpt")):
        from hyena_dna_tpu.pretrained import from_pretrained

        _, params, _ = from_pretrained(ckpt)
        return {"backbone": params["model"]["backbone"]}
    from hyena_dna_tpu.train.checkpoint import restore_params_only

    return jax.tree_util.tree_map(jnp.asarray, restore_params_only(ckpt))


def run_eval(model, params, loader):
    @jax.jit
    def step(params, x, y):
        logits, _ = model.apply({"params": params}, x, deterministic=True)
        return M.cross_entropy_stats(logits, y)

    ppl = M.Perplexity()
    for x, y in loader:
        nll, cnt = step(params, jnp.asarray(x), jnp.asarray(y))
        ppl.update(nll, cnt)
    return ppl


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--fasta", required=True)
    ap.add_argument("--preset", default=None,
                    help="configs/evals yaml with a model: block (e.g. "
                         "hyena_dna_512ksl) — builds the model from it")
    ap.add_argument("--max_length", type=int, default=1024)
    ap.add_argument("--d_model", type=int, default=128)
    ap.add_argument("--n_layer", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument(
        "--chr_ranges", nargs="+", default=["chr14:19726402-106677047"],
        help="chrN:start-end windows for the fixed eval set",
    )
    ap.add_argument("--limit_batches", type=int, default=None)
    args = ap.parse_args(argv)

    chr_ranges = {}
    for spec in args.chr_ranges:
        name, rng = spec.split(":")
        start, end = rng.split("-")
        chr_ranges[name] = (int(start), int(end))

    ds = HG38FixedDataset(
        fasta_file=args.fasta, chr_ranges=chr_ranges,
        max_length=args.max_length, add_eos=True,
    )
    loader = DataLoader(ds, batch_size=args.batch_size, shuffle=False,
                        drop_last=False, process_index=0, process_count=1)
    if args.preset:
        from hyena_dna_tpu.evals.presets import (build_model_from_preset,
                                                 load_eval_preset)

        model = build_model_from_preset(load_eval_preset(args.preset)["model"])
    else:
        model = build_model(args.d_model, args.n_layer, args.max_length)
    sample = jnp.zeros((1, args.max_length), jnp.int32)
    params = load_params(args.ckpt, model, sample)

    if args.limit_batches:
        from itertools import islice

        inner = loader  # capture BEFORE rebinding (else __iter__ recurses)

        class _Limited:
            def __iter__(self_inner):
                return islice(iter(inner), args.limit_batches)

        loader = _Limited()

    ppl = run_eval(model, params, loader)
    result = {
        "loss": float(np.log(ppl.compute())),
        "ppl": ppl.compute(),
        "tokens": ppl.count,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
