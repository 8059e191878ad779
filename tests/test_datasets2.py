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
# liftover (native UCSC chain-file converter)
# --------------------------------------------------------------------------


def _write_chain(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_chainfile_forward_and_gaps(tmp_path):
    from hyena_dna_tpu.data.liftover import ChainFile

    # chr1: [100, 150) -> [200, 250); gap of 10 on target, 5 on query;
    # then [160, 200) -> [255, 295)
    chain = tmp_path / "t.chain"
    _write_chain(chain, [
        "chain 1000 chr1 3000 + 100 200 chr1 4000 + 200 295 1",
        "50 10 5",
        "40",
    ])
    cf = ChainFile(str(chain))
    assert cf.convert("chr1", 100) == ("chr1", 200, "+")
    assert cf.convert("chr1", 149) == ("chr1", 249, "+")
    assert cf.convert("chr1", 155) is None  # inside the gap
    assert cf.convert("chr1", 160) == ("chr1", 255, "+")
    assert cf.convert("chr1", 199) == ("chr1", 294, "+")
    assert cf.convert("chr1", 200) is None  # past chain end
    assert cf.convert("chr2", 100) is None  # unknown chromosome

    pos, ok = cf.convert_batch("chr1", np.asarray([100, 149, 155, 160, 5000]))
    np.testing.assert_array_equal(pos, [200, 249, -1, 255, -1])
    np.testing.assert_array_equal(ok, [True, True, False, True, False])


def test_chainfile_negative_strand(tmp_path):
    from hyena_dna_tpu.data.liftover import ChainFile

    # q on '-' strand: strand-pos 10..30 map to qSize-1-sp = 989..969
    chain = tmp_path / "t.chain"
    _write_chain(chain, [
        "chain 1000 chr1 3000 + 50 70 chrX 1000 - 10 30 2",
        "20",
    ])
    cf = ChainFile(str(chain))
    assert cf.convert("chr1", 50) == ("chrX", 989, "-")
    assert cf.convert("chr1", 69) == ("chrX", 970, "-")


def test_chromatin_liftover_end_to_end(tmp_path):
    """hg19-labelled CSV + hg38 genome + chain shifting everything by +37:
    rows lift, one unmappable row is filtered, saved CSV is hg38-labelled."""
    rng = np.random.default_rng(1)
    genome = {"chr1": "".join(rng.choice(list("ACGT"), size=4000))}
    fa = tmp_path / "genome.fa"
    _write_fasta(fa, genome)
    csv_path = tmp_path / "train_hg19_coords_targets.csv"
    with open(csv_path, "w") as f:
        f.write("Chr_No,Start,End,y_a,y_b\n")
        f.write("0,500,1500,1,0\n")
        f.write("0,700,1700,0,1\n")
        f.write("0,2600,3600,1,1\n")  # end falls outside the chain -> dropped
    chain = tmp_path / "hg19ToHg38.over.chain"
    _write_chain(chain, [
        "chain 1000 chr1 4000 + 0 3000 chr1 4000 + 37 3037 1",
        "3000",
    ])
    ds = ChromatinProfileDataset(
        max_length=1000,
        ref_genome_path=str(fa),
        ref_genome_version="hg38",
        coords_target_path=str(csv_path),
        liftover_chain_path=str(chain),
        save_liftover=True,
    )
    assert len(ds) == 2
    np.testing.assert_array_equal(ds.coords[:, 1], [537, 737])
    x, y = ds[0]
    assert ds.tokenizer.decode(x) == genome["chr1"][537:1537]
    np.testing.assert_array_equal(y, [1, 0])
    # saved converted CSV reloads directly as hg38
    saved = tmp_path / "train_hg38_coords_targets.csv"
    assert saved.exists()
    ds2 = ChromatinProfileDataset(
        max_length=1000, ref_genome_path=str(fa), ref_genome_version="hg38",
        coords_target_path=str(saved),
    )
    assert len(ds2) == 2
    np.testing.assert_array_equal(ds2.coords, ds.coords)


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


def test_bpe_tokenizer_path(tmp_path):
    """Exercise the BPE tokenizer route end-to-end (reference
    `genomics.py:102-111` loads the AIRI gena-lm BPE via AutoTokenizer):
    build a tiny local BPE snapshot (zero-egress stand-in for the gena-lm
    download), point `bpe_tokenizer_path` at it, and pull real batches."""
    tokenizers = pytest.importorskip("tokenizers")
    transformers = pytest.importorskip("transformers")
    from tokenizers import Tokenizer, models, trainers

    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT"), size=8192))
    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(seq), 60):
            f.write(seq[i : i + 60] + "\n")
    bed = tmp_path / "g.bed"
    with open(bed, "w") as f:
        for i in range(8):
            f.write(f"chr1\t{i * 512}\t{i * 512 + 256}\ttrain\n")
        f.write("chr1\t4096\t4352\tvalid\n")
        f.write("chr1\t6000\t6256\ttest\n")

    tok = Tokenizer(models.BPE(unk_token="[UNK]"))
    trainer = trainers.BpeTrainer(
        vocab_size=64, special_tokens=["[PAD]", "[UNK]", "[SEP]"])
    corpus = ["".join(rng.choice(list("ACGT"), size=512)) for _ in range(16)]
    tok.train_from_iterator(corpus, trainer)
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="[UNK]", pad_token="[PAD]",
        sep_token="[SEP]")
    snap = tmp_path / "bpe_tok"
    fast.save_pretrained(str(snap))

    from hyena_dna_tpu.data.datamodules import HG38DataModule

    dm = HG38DataModule(
        bed_file=str(bed), fasta_file=str(fa), tokenizer_name="bpe",
        bpe_tokenizer_path=str(snap), max_length=64, batch_size=4,
        add_eos=False, shuffle=False)
    dm.setup()
    assert dm.vocab_size == len(fast)
    x, y = next(iter(dm.train_dataloader()))
    assert x.shape == (4, 63) and y.shape == (4, 63)
    assert x.dtype == np.int32
    assert int(x.max()) < dm.vocab_size
    # next-token shift invariant holds under BPE ids too
    np.testing.assert_array_equal(x[:, 1:], y[:, :-1])
