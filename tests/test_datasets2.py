"""Tests for chromatin-profile, species, and ICL datasets on synthetic data."""

import gzip

import numpy as np
import pytest

from hyena_dna_tpu.data.chromatin_profile import ChromatinProfileDataset
from hyena_dna_tpu.data.icl import ICLGenomicsDataset
from hyena_dna_tpu.data.species import SpeciesDataset


def _write_fasta(path, records):
    with open(path, "w") as f:
        for name, seq in records.items():
            f.write(f">{name}\n")
            for i in range(0, len(seq), 60):
                f.write(seq[i : i + 60] + "\n")


# --------------------------------------------------------------------------
# chromatin profile
# --------------------------------------------------------------------------


@pytest.fixture
def chromatin_fixture(tmp_path):
    rng = np.random.default_rng(0)
    genome = {f"chr{i+1}": "".join(rng.choice(list("ACGT"), size=3000)) for i in range(2)}
    fa = tmp_path / "genome.fa"
    _write_fasta(fa, genome)
    csv_path = tmp_path / "train_hg38_coords_targets.csv"
    with open(csv_path, "w") as f:
        f.write("Chr_No,Start,End,y_a,y_b,y_c\n")
        for i in range(6):
            chr_no = i % 2
            start = 500 + i * 100
            f.write(f"{chr_no},{start},{start+1000},{i%2},{(i+1)%2},1\n")
    return fa, csv_path, genome


def test_chromatin_profile_dataset(chromatin_fixture):
    fa, csv_path, genome = chromatin_fixture
    ds = ChromatinProfileDataset(
        max_length=1000,
        ref_genome_path=str(fa),
        ref_genome_version="hg38",
        coords_target_path=str(csv_path),
    )
    assert len(ds) == 6
    assert ds.d_output == 3
    x, y = ds[0]
    assert x.shape == (1000,)
    np.testing.assert_array_equal(y, [0, 1, 1])
    # sequence content matches the genome slice
    expected = genome["chr1"][500:1500]
    assert ds.tokenizer.decode(x) == expected


def test_chromatin_profile_window_widening(chromatin_fixture):
    fa, csv_path, _ = chromatin_fixture
    ds = ChromatinProfileDataset(
        max_length=1200,
        ref_genome_path=str(fa),
        ref_genome_version="hg38",
        coords_target_path=str(csv_path),
    )
    x, _ = ds[0]
    assert x.shape == (1200,)


def test_chromatin_profile_version_mismatch(chromatin_fixture):
    fa, csv_path, _ = chromatin_fixture
    with pytest.raises(ValueError):
        ChromatinProfileDataset(
            max_length=1000,
            ref_genome_path=str(fa),
            ref_genome_version="hg19",
            coords_target_path=str(csv_path),
        )


# --------------------------------------------------------------------------
# species
# --------------------------------------------------------------------------


@pytest.fixture
def species_fixture(tmp_path):
    rng = np.random.default_rng(1)
    for spec in ("human", "mouse"):
        d = tmp_path / spec
        d.mkdir()
        chroms = ["1", "3", "12", "13"]  # the 'valid' split for both
        for c in chroms + ["2", "4", "5", "7", "9", "10", "11", "6", "8", "14",
                           "15", "16", "17", "18", "19", "20", "21", "22", "X", "Y"]:
            seq = "".join(rng.choice(list("ACGT"), size=600))
            _write_fasta(d / f"chr{c}.fa", {f"chr{c}": seq})
    return tmp_path


def test_species_dataset_classification(species_fixture):
    ds = SpeciesDataset(
        species=["human", "mouse"],
        species_dir=str(species_fixture),
        split="valid",
        max_length=128,
        total_size=16,
    )
    assert len(ds) == 16
    labels = set()
    for i in range(16):
        x, y = ds.__getitem__(i, rng=np.random.default_rng(i))
        assert x.shape == (128,)
        labels.add(int(y))
    assert labels <= {0, 1} and len(labels) == 2  # both species sampled


def test_species_dataset_next_token(species_fixture):
    ds = SpeciesDataset(
        species=["human"],
        species_dir=str(species_fixture),
        split="valid",
        max_length=64,
        total_size=4,
        task="next_token_pred",
    )
    x, y = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert x.shape == (63,) and y.shape == (63,)
    np.testing.assert_array_equal(x[1:], y[:-1])


def test_species_npad_at_chromosome_end(species_fixture):
    ds = SpeciesDataset(
        species=["human"],
        species_dir=str(species_fixture),
        split="valid",
        max_length=1024,  # longer than the 600bp synthetic chromosome
        total_size=2,
    )
    x, _ = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert x.shape == (1024,)
    n_id = ds.tokenizer.get_vocab()["N"]
    assert (x == n_id).sum() >= 1024 - 600


def test_species_gz_decompression(tmp_path):
    rng = np.random.default_rng(2)
    d = tmp_path / "human"
    d.mkdir()
    for c in ["1", "3", "12", "13"]:
        seq = "".join(rng.choice(list("ACGT"), size=200))
        raw = f">chr{c}\n{seq}\n".encode()
        with gzip.open(d / f"chr{c}.fna.gz", "wb") as f:
            f.write(raw)
    ds = SpeciesDataset(
        species=["human"], species_dir=str(tmp_path), split="valid",
        max_length=64, total_size=2,
    )
    x, y = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert x.shape == (64,)


# --------------------------------------------------------------------------
# ICL
# --------------------------------------------------------------------------


@pytest.fixture
def icl_fixture(tmp_path):
    rng = np.random.default_rng(3)
    root = tmp_path / "toy" / "train"
    for label in ("neg", "pos"):
        d = root / label
        d.mkdir(parents=True)
        for i in range(8):
            (d / f"{i}.txt").write_text("".join(rng.choice(list("ACGT"), size=20)))
    return tmp_path


def test_icl_zero_shot(icl_fixture):
    ds = ICLGenomicsDataset(
        split="train", shots=0, max_length=20, dataset_name="toy",
        dest_path=str(icl_fixture), use_padding=False, add_eos=True,
    )
    x, y = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert x.shape == (21,)  # 20 chars + eos
    assert y.shape == (1,)
    assert int(y[0]) == ds.tokenizer.get_vocab()["[UNK]"] or int(y[0]) >= 0


def test_icl_k_shot_prompt_structure(icl_fixture):
    ds = ICLGenomicsDataset(
        split="train", shots=2, max_length=20, dataset_name="toy",
        dest_path=str(icl_fixture), use_padding=False, add_eos=True,
    )
    x, y = ds.__getitem__(0, rng=np.random.default_rng(0))
    # 2 shots x 2 classes x (20 seq + 1 eos + 1 label + 1 eos) + test (20+1)
    assert x.shape == (4 * 23 + 21,)
    assert y.shape == (1,)


def test_icl_deterministic_given_rng(icl_fixture):
    ds = ICLGenomicsDataset(
        split="train", shots=1, max_length=20, dataset_name="toy",
        dest_path=str(icl_fixture), use_padding=False,
    )
    a, _ = ds.__getitem__(3, rng=np.random.default_rng(42))
    b, _ = ds.__getitem__(3, rng=np.random.default_rng(42))
    np.testing.assert_array_equal(a, b)
