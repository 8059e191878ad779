"""Chromatin-profile prediction dataset (DeepSEA-style 919-way multilabel).

Parity target: `ChromatinProfileDataset`
(`/root/reference/src/dataloaders/datasets/chromatin_profile_dataset.py:113-260`):
coordinates + boolean targets from a CSV with columns `Chr_No` (0-based),
`Start`, `End` and `y_*` label columns; 1000bp windows symmetrically widened
to `max_length`; '.'-padding past chromosome edges; sequence uppercased
before tokenization.

hg19->hg38 liftover (reference `convert_coordinates`, needs the `liftover`
package) is not bundled; coordinates must match the reference genome version
(the reference saves converted CSVs once, so the hg38 CSV is the common
input anyway).
"""

from __future__ import annotations

import csv
from typing import Optional

import numpy as np

from hyena_dna_tpu.data.fasta import FastaInterval
from hyena_dna_tpu.data.tokenizer import CharacterTokenizer


class ChromatinProfileDataset:
    def __init__(
        self,
        max_length: int,
        ref_genome_path: str = None,
        ref_genome_version: str = "hg38",
        coords_target_path: str = None,
        tokenizer: Optional[CharacterTokenizer] = None,
        tokenizer_name: str = "char",
        use_padding: bool = True,
        add_eos: bool = False,
        rc_aug: bool = False,
    ):
        assert max_length % 2 == 0, "window must be divisible by 2"
        self.max_length = max_length
        self.use_padding = use_padding
        self.tokenizer = tokenizer or CharacterTokenizer(model_max_length=max_length + 2)
        self.add_eos = add_eos
        self.rc_aug = rc_aug

        fname = str(coords_target_path).rsplit("/", 1)[-1]
        if ref_genome_version not in ("hg19", "hg38"):
            raise ValueError('ref_genome_version must be "hg19" or "hg38"')
        if ref_genome_version not in fname:
            raise ValueError(
                f"coordinate file {fname!r} does not match genome version "
                f"{ref_genome_version!r}; run the reference liftover once and "
                f"point at the converted CSV"
            )

        self.ref_genome = FastaInterval(fasta_file=ref_genome_path, pad_interval=True)
        self._load_csv(coords_target_path)
        # widen the 1000bp windows to max_length (`:176-178`)
        pad = (max_length - 1000) // 2
        self.coords[:, 1] -= pad
        self.coords[:, 2] += pad

    def _load_csv(self, path):
        with open(path) as f:
            reader = csv.reader(f)
            header = next(reader)
            idx = {name: i for i, name in enumerate(header)}
            target_cols = [i for i, col in enumerate(header) if col[:2] == "y_"]
            coord_cols = [idx["Chr_No"], idx["Start"], idx["End"]]
            coords, targets = [], []
            for row in reader:
                coords.append([int(row[c]) for c in coord_cols])
                targets.append([int(row[c] in ("1", "True", "true")) for c in target_cols])
        self.coords = np.asarray(coords, dtype=np.int64)
        self.targets = np.asarray(targets, dtype=np.int32)
        self.d_output = self.targets.shape[1]

    def close(self):
        self.ref_genome.close()

    def __len__(self) -> int:
        return len(self.coords)

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        chr_no, start, end = self.coords[idx]
        seq = self.ref_genome(
            f"chr{chr_no + 1}", int(start), int(end), max_length=self.max_length, rng=rng
        )
        out = self.tokenizer(
            seq.upper(),
            add_special_tokens=self.add_eos,
            padding="max_length" if self.use_padding else "do_not_pad",
            max_length=self.max_length,
            truncation=True,
        )
        return out["input_ids"].astype(np.int32), self.targets[idx]
