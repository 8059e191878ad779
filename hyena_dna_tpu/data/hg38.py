"""HG38 pretraining datasets: bed-interval sampling, fixed eval windows, and a
contiguous-token LM chunker.

Parity targets:
  * `HG38Dataset`  — `/root/reference/src/dataloaders/datasets/hg38_dataset.py:126-225`
  * `HG38FixedDataset` — `/root/reference/src/dataloaders/datasets/hg38_fixed_dataset.py:16-110`
  * `LMDataset`    — `/root/reference/src/dataloaders/datasets/lm_dataset.py:10-33`

All items are numpy int32 `(data, target)` next-token pairs: the dataset
tokenizes to `max_length` ids (eos included when `add_eos`), then returns
`(seq[:-1], seq[1:])` (`hg38_dataset.py:222-224`). Augmentation randomness
comes from an explicit `np.random.Generator` passed by the loader so that
every sample is a pure function of (seed, epoch, index) — this is what makes
checkpoint/resume exactly reproducible, replacing the reference's
fault-tolerant sampler RNG checkpointing.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from hyena_dna_tpu.data.fasta import FastaInterval
from hyena_dna_tpu.data.tokenizer import CharacterTokenizer


def read_bed(bed_file: str, split: Optional[str] = None):
    """Parse a 4-column bed file (chr, start, end, split) into a list of
    (chr_name, start, end) for the requested split."""
    rows = []
    with open(bed_file) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 4 or parts[0] == "chr_name":
                continue
            if split is None or parts[3] == split:
                rows.append((parts[0], int(parts[1]), int(parts[2])))
    return rows


class HG38Dataset:
    """Sample intervals listed in a bed file from a reference genome."""

    def __init__(
        self,
        split: str,
        bed_file: str,
        fasta_file: str,
        max_length: int,
        pad_max_length: Optional[int] = None,
        tokenizer: Optional[CharacterTokenizer] = None,
        tokenizer_name: str = "char",
        add_eos: bool = False,
        shift_augs: Optional[Tuple[int, int]] = None,
        rc_aug: bool = False,
        replace_N_token: bool = False,
        pad_interval: bool = False,
    ):
        self.max_length = max_length
        self.pad_max_length = pad_max_length or max_length
        self.tokenizer = tokenizer or CharacterTokenizer(model_max_length=max_length + 2)
        self.tokenizer_name = tokenizer_name
        self.add_eos = add_eos
        self.replace_N_token = replace_N_token
        self.shift_augs = shift_augs
        self.rc_aug = rc_aug
        self.pad_interval = pad_interval
        self.intervals = read_bed(bed_file, split)
        self.fasta = FastaInterval(
            fasta_file=fasta_file,
            shift_augs=shift_augs,
            rc_aug=rc_aug,
            pad_interval=pad_interval,
        )
        # native fused fetch+tokenize path (see native/hyena_data.cpp);
        # '.'-pad-interval and non-default tokenizers stay on the python path
        self._native = None
        if (
            not pad_interval
            and tokenizer_name == "char"
            and self.tokenizer.padding_side == "left"
            and tuple(self.tokenizer.characters) == ("A", "C", "G", "T", "N")
        ):
            try:
                from hyena_dna_tpu.data.native import NativeFasta

                self._native = NativeFasta(fasta_file)
            except Exception:
                self._native = None

    def close(self):
        """Release fasta handles (needed before seqlen-warmup re-init,
        reference `genomics.py:117-124`)."""
        self.fasta.close()
        if self._native is not None:
            self._native.close()
            self._native = None

    def __len__(self) -> int:
        return len(self.intervals)

    def _native_item(self, idx: int, rng: Optional[np.random.Generator]):
        """Fused C++ fetch+tokenize mirroring FastaInterval's interval math
        (`hg38_dataset.py:70-117`)."""
        chr_name, start, end = self.intervals[idx]
        chromosome_length = self.fasta.chr_lens[chr_name]
        interval_length = end - start
        if self.shift_augs is not None:
            min_shift, max_shift = self.shift_augs
            max_shift += 1
            min_shift = max(start + min_shift, 0) - start
            max_shift = min(end + max_shift, chromosome_length) - end
            shift = int((rng or np.random.default_rng()).integers(min_shift, max_shift))
            start += shift
            end += shift
        if interval_length < self.max_length:
            extra = self.max_length - interval_length
            start -= extra // 2
            end += extra - extra // 2
        if interval_length > self.max_length:
            end = start + self.max_length
        rc = self.rc_aug and (rng or np.random.default_rng()).random() > 0.5
        return self._native.fetch_tokens(
            chr_name, start, end, self.max_length,
            add_eos=self.add_eos, rc=rc, pad_left=True, uppercase=False,
        )

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        if self._native is not None:
            ids = self._native_item(idx, rng)
            if self.replace_N_token:
                n_id = self.tokenizer.get_vocab()["N"]
                ids = np.where(ids == n_id, self.tokenizer.pad_token_id, ids)
            return ids[:-1].astype(np.int32), ids[1:].astype(np.int32)
        chr_name, start, end = self.intervals[idx]
        seq = self.fasta(chr_name, start, end, max_length=self.max_length, rng=rng)
        out = self.tokenizer(
            seq,
            add_special_tokens=self.add_eos,
            padding="max_length",
            max_length=self.max_length,
            truncation=True,
        )
        # HF fast tokenizers (the BPE route) return lists; char returns arrays
        ids = np.asarray(out["input_ids"])
        if self.replace_N_token:
            n_id = self.tokenizer.get_vocab()["N"]
            ids = np.where(ids == n_id, self.tokenizer.pad_token_id, ids)
        return ids[:-1].astype(np.int32), ids[1:].astype(np.int32)


class HG38FixedDataset:
    """Deterministic non-overlapping max_length windows over chromosome ranges
    for a stable test perplexity (`hg38_fixed_dataset.py:50-71`)."""

    def __init__(
        self,
        fasta_file: str,
        chr_ranges: Dict[str, Tuple[int, int]],
        max_length: int,
        pad_max_length: Optional[int] = None,
        tokenizer: Optional[CharacterTokenizer] = None,
        add_eos: bool = False,
    ):
        self.max_length = max_length
        self.pad_max_length = pad_max_length or max_length
        self.tokenizer = tokenizer or CharacterTokenizer(model_max_length=max_length + 2)
        self.add_eos = add_eos
        self.intervals = []
        for chr_name, (start, end) in chr_ranges.items():
            for i in range(start, end, max_length):
                self.intervals.append((chr_name, i, min(i + max_length, end)))
        self.fasta = FastaInterval(fasta_file=fasta_file)

    def close(self):
        self.fasta.close()

    def __len__(self) -> int:
        return len(self.intervals)

    def __getitem__(self, idx: int, rng=None):
        chr_name, start, end = self.intervals[idx]
        seq = self.fasta.fasta.fetch(chr_name, start, end).upper()
        out = self.tokenizer(
            seq,
            add_special_tokens=False,
            padding="max_length",
            max_length=self.pad_max_length,
            truncation=True,
        )
        # HF fast tokenizers (the BPE route) return lists; char returns arrays
        ids = np.asarray(out["input_ids"])
        if self.add_eos:
            ids = np.concatenate([ids, [self.tokenizer.sep_token_id]]).astype(np.int32)
        return ids[:-1].astype(np.int32), ids[1:].astype(np.int32)


class LMDataset:
    """Chunk a contiguous token array into (data, target) pairs without
    padding the last block (`lm_dataset.py:10-33`)."""

    def __init__(self, tokens: np.ndarray, seq_len: int, drop_last: bool = True):
        self.seq_len = seq_len
        ntokens = len(tokens)
        if drop_last:
            ntokens = ((ntokens - 1) // seq_len) * seq_len + 1
        self.ntokens = ntokens
        self.tokens = tokens
        self.total_sequences = math.ceil((self.ntokens - 1) / self.seq_len)

    def __len__(self) -> int:
        return self.total_sequences

    def __getitem__(self, idx: int, rng=None):
        start = idx * self.seq_len
        n = min(self.seq_len, self.ntokens - 1 - start)
        chunk = np.asarray(self.tokens[start : start + n + 1], dtype=np.int32)
        return chunk[:-1], chunk[1:].copy()
