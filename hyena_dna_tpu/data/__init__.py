from hyena_dna_tpu.data.tokenizer import CharacterTokenizer, string_reverse_complement
from hyena_dna_tpu.data.fasta import FastaFile, FastaInterval
from hyena_dna_tpu.data.hg38 import HG38Dataset, HG38FixedDataset, LMDataset
from hyena_dna_tpu.data.classification import (
    GenomicBenchmarkDataset,
    NucleotideTransformerDataset,
)
from hyena_dna_tpu.data.loader import DataLoader, shard_batch

__all__ = [
    "CharacterTokenizer",
    "string_reverse_complement",
    "FastaFile",
    "FastaInterval",
    "HG38Dataset",
    "HG38FixedDataset",
    "LMDataset",
    "GenomicBenchmarkDataset",
    "NucleotideTransformerDataset",
    "DataLoader",
    "shard_batch",
]
