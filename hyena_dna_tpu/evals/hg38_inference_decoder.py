"""Inference CLI for a fine-tuned backbone + classification decoder head.

Parity target: `/root/reference/evals/hg38_inference_decoder.py:28-206`
(HG38Inference: DNAEmbeddingModel backbone + SequenceDecoder pool head,
loaded from a Lightning fine-tune checkpoint, driven either over a list of
raw sequences or over a GenomicBenchmark / NucleotideTransformer test
loader).

Usage:
  python -m hyena_dna_tpu.evals.hg38_inference_decoder \
      --ckpt outputs/.../accuracy.ckpt --d_output 2 \
      --dataset_name human_nontata_promoters --dest_path data/gb \
      --max_length 500
  # or ad-hoc sequences:
  python -m hyena_dna_tpu.evals.hg38_inference_decoder \
      --ckpt ... --d_output 2 --seqs ACGTACGT... TTGACA...
"""

from __future__ import annotations

import argparse
import json
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyena_dna_tpu.data.tokenizer import CharacterTokenizer
from hyena_dna_tpu.models.heads import SequenceDecoder
from hyena_dna_tpu.models.lm import DNAEmbeddingModel

GENOMIC_BENCHMARK_DATASETS = (
    "dummy_mouse_enhancers_ensembl", "demo_coding_vs_intergenomic_seqs",
    "demo_human_or_worm", "human_enhancers_cohn", "human_enhancers_ensembl",
    "human_ensembl_regulatory", "human_nontata_promoters", "human_ocr_ensembl",
)


def build_model(d_model: int, n_layer: int, max_length: int, d_output: int,
                vocab_size: int = 12, mode: str = "pool"):
    """Backbone + pool decoder matching the reference's fine-tune stack
    (`hg38_inference_decoder.py:117-133`)."""
    layer = dict(
        _name_="hyena", emb_dim=5, filter_order=64, short_filter_order=3,
        l_max=max_length + 2, modulate=True, w=10,
    )
    backbone = DNAEmbeddingModel(
        d_model=d_model, n_layer=n_layer, d_inner=4 * d_model,
        vocab_size=vocab_size, pad_vocab_size_multiple=8,
        residual_in_fp32=True, layer=layer,
    )
    decoder = SequenceDecoder(d_model=d_model, d_output=d_output,
                              l_output=0, mode=mode)
    return backbone, decoder


class HG38Inference:
    """Backbone+decoder inference wrapper (reference class at
    `evals/hg38_inference_decoder.py:28-166`)."""

    def __init__(self, backbone, decoder, backbone_params, decoder_params,
                 tokenizer: Optional[CharacterTokenizer] = None,
                 max_length: int = 500):
        self.backbone = backbone
        self.decoder = decoder
        self.backbone_params = backbone_params
        self.decoder_params = decoder_params
        self.max_length = max_length
        self.tokenizer = tokenizer or CharacterTokenizer(
            model_max_length=max_length + 2)

        @jax.jit
        def _predict(bp, dp, ids):
            h, _ = self.backbone.apply({"params": bp}, ids)
            return self.decoder.apply({"params": dp}, h)

        self._predict = _predict

    def predict_on_list(self, seqs: Sequence[str]) -> np.ndarray:
        """Raw string sequences -> (N, d_output) logits
        (`hg38_inference_decoder.py:63-86`)."""
        preds = []
        for seq in seqs:
            out = self.tokenizer(seq, add_special_tokens=False,
                                 padding="max_length",
                                 max_length=self.max_length, truncation=True)
            ids = jnp.asarray(out["input_ids"][None], jnp.int32)
            preds.append(np.asarray(
                self._predict(self.backbone_params, self.decoder_params, ids)))
        return np.concatenate(preds, axis=0)

    def predict_from_loader(self, loader) -> Tuple[np.ndarray, np.ndarray]:
        """Iterate a test loader -> (argmax preds, labels)
        (`hg38_inference_decoder.py:88-115`)."""
        all_preds: List[np.ndarray] = []
        all_labels: List[np.ndarray] = []
        for batch in loader:
            x, y = batch[0], batch[1]
            logits = self._predict(self.backbone_params, self.decoder_params,
                                   jnp.asarray(x, jnp.int32))
            all_preds.append(np.argmax(np.asarray(logits), axis=-1))
            all_labels.append(np.asarray(y))
        return np.concatenate(all_preds), np.concatenate(all_labels)


def load_checkpoint(ckpt: str, backbone, decoder, max_length: int):
    """Torch Lightning fine-tune .ckpt (backbone + `decoder.0.*` keys,
    `hg38_inference_decoder.py:135-158`) or an Orbax run checkpoint."""
    if ckpt.endswith((".ckpt", ".pt")):
        from hyena_dna_tpu.utils.torch_import import import_pretrained

        tree = jax.tree_util.tree_map(jnp.asarray, import_pretrained(ckpt))
        return {"backbone": tree["backbone"]}, tree["decoder"]
    from hyena_dna_tpu.train.checkpoint import restore_params_only

    tree = jax.tree_util.tree_map(jnp.asarray, restore_params_only(ckpt))
    # trainer layout: {"encoder": ..., "model": ..., "decoder": ...}
    model_params = tree.get("model", tree)
    dec = tree.get("decoder", {}).get("decoder_0", tree.get("decoder"))
    return model_params, dec


def build_loader(args):
    from hyena_dna_tpu.data.loader import DataLoader

    common = dict(split="test", max_length=args.max_length,
                  dataset_name=args.dataset_name, d_output=args.d_output,
                  dest_path=args.dest_path, use_padding=True)
    if args.dataset_name in GENOMIC_BENCHMARK_DATASETS:
        from hyena_dna_tpu.data.classification import GenomicBenchmarkDataset

        ds = GenomicBenchmarkDataset(**common)
    else:
        from hyena_dna_tpu.data.classification import NucleotideTransformerDataset

        ds = NucleotideTransformerDataset(**common)
    return DataLoader(ds, batch_size=args.batch_size, shuffle=False,
                      drop_last=False, process_index=0, process_count=1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--d_model", type=int, default=128)
    ap.add_argument("--n_layer", type=int, default=2)
    ap.add_argument("--d_output", type=int, required=True)
    ap.add_argument("--max_length", type=int, default=500)
    ap.add_argument("--mode", default="pool")
    ap.add_argument("--dataset_name", default=None)
    ap.add_argument("--dest_path", default=None)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--seqs", nargs="*", default=None,
                    help="ad-hoc raw sequences instead of a dataset")
    ap.add_argument("--output_path", default=None)
    args = ap.parse_args(argv)

    backbone, decoder = build_model(args.d_model, args.n_layer,
                                    args.max_length, args.d_output,
                                    mode=args.mode)
    backbone_params, decoder_params = load_checkpoint(
        args.ckpt, backbone, decoder, args.max_length)
    infer = HG38Inference(backbone, decoder, backbone_params, decoder_params,
                          max_length=args.max_length)

    if args.seqs:
        logits = infer.predict_on_list(args.seqs)
        result = {"preds": np.argmax(logits, axis=-1).tolist(),
                  "logits": logits.tolist()}
    else:
        assert args.dataset_name and args.dest_path, \
            "--dataset_name/--dest_path required without --seqs"
        preds, labels = infer.predict_from_loader(build_loader(args))
        result = {"accuracy": float((preds == labels).mean()),
                  "n": int(labels.size)}

    print(json.dumps(result))
    if args.output_path:
        with open(args.output_path, "w") as f:
            json.dump(result, f)
    return result


if __name__ == "__main__":
    main()
