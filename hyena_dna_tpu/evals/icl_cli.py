"""ICL eval CLI: soft prompting or instruction tuning on k-shot genomic
prompts from a pretrained checkpoint.

Mirrors the entry points of `/root/reference/evals/soft_prompting_genomics.py`
and `instruction_tuned_genomics.py`.

Usage:
  python -m hyena_dna_tpu.evals.icl_cli --mode soft_prompting \
      --ckpt runs/hg38_hyena/checkpoints/best \
      --dest_path data/genomic_benchmark --dataset_name human_nontata_promoters \
      --shots 2 --steps 500
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from hyena_dna_tpu.data.datamodules import ICLGenomicsDataModule
from hyena_dna_tpu.evals.hg38_inference import build_model, load_params
from hyena_dna_tpu.evals.instruction_tuned import evaluate as it_evaluate
from hyena_dna_tpu.evals.instruction_tuned import instruction_tune
from hyena_dna_tpu.evals.soft_prompting import evaluate_soft_prompt, tune_soft_prompt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default=None,
                    help="configs/evals yaml (e.g. soft_prompting_genomics) "
                         "supplying mode + tuning defaults; explicit flags win")
    ap.add_argument("--mode", choices=["soft_prompting", "instruction_tuned"],
                    default="soft_prompting")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dest_path", required=True)
    ap.add_argument("--dataset_name", default="human_nontata_promoters")
    ap.add_argument("--shots", type=int, default=2)
    ap.add_argument("--max_length", type=int, default=256)
    ap.add_argument("--d_model", type=int, default=128)
    ap.add_argument("--n_layer", type=int, default=2)
    ap.add_argument("--n_soft", type=int, default=16)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch_size", type=int, default=16)
    args = ap.parse_args(argv)
    if args.preset:
        import sys as _sys

        from hyena_dna_tpu.evals.presets import (apply_icl_preset,
                                                 load_eval_preset)

        raw = argv if argv is not None else _sys.argv[1:]
        explicit = {t.lstrip("-").split("=")[0]
                    for t in raw if t.startswith("--")}
        apply_icl_preset(args, load_eval_preset(args.preset), explicit)

    dm = ICLGenomicsDataModule(
        dataset_name=args.dataset_name, dest_path=args.dest_path,
        shots=args.shots, max_length=args.max_length, add_eos=True,
        batch_size=args.batch_size,
    )
    dm.setup()
    train_loader = dm.train_dataloader()
    val_loader = dm.val_dataloader()

    # prompt length: shots x classes x (seq + eos + label + eos) + test
    model = build_model(args.d_model, args.n_layer,
                        max_length=args.max_length * (2 * args.shots + 2))
    sample = jnp.zeros((1, args.max_length), jnp.int32)
    params = load_params(args.ckpt, model, sample)

    if args.mode == "soft_prompting":
        _, predict = tune_soft_prompt(
            model, params, train_loader, n_soft=args.n_soft,
            d_model=args.d_model, lr=args.lr or 1e-3, steps=args.steps,
        )
        acc = evaluate_soft_prompt(predict, val_loader)
    else:
        _, predict = instruction_tune(
            model, params, train_loader, lr=args.lr or 1e-4, steps=args.steps,
        )
        acc = it_evaluate(predict, val_loader)

    result = {"mode": args.mode, "dataset": args.dataset_name,
              "shots": args.shots, "accuracy": acc}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
