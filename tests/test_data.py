"""Data-layer tests: tokenizer id parity, FASTA indexing, HG38 dataset
semantics, and fault-tolerant loader resume."""

import numpy as np
import pytest

from hyena_dna_tpu.data import (
    CharacterTokenizer,
    DataLoader,
    FastaFile,
    FastaInterval,
    HG38Dataset,
    HG38FixedDataset,
    LMDataset,
    string_reverse_complement,
)


# --------------------------------------------------------------------------
# tokenizer
# --------------------------------------------------------------------------


def test_tokenizer_exact_vocab_ids():
    tok = CharacterTokenizer()
    # reference vocab (`hg38_char_tokenizer.py:58-68`)
    assert tok.vocab_size == 12
    assert tok.get_vocab() == {
        "[CLS]": 0, "[SEP]": 1, "[BOS]": 2, "[MASK]": 3, "[PAD]": 4,
        "[RESERVED]": 5, "[UNK]": 6, "A": 7, "C": 8, "G": 9, "T": 10, "N": 11,
    }
    np.testing.assert_array_equal(tok.encode("ACGTN"), [7, 8, 9, 10, 11])
    np.testing.assert_array_equal(tok.encode("ACX"), [7, 8, 6])  # unk
    np.testing.assert_array_equal(tok.encode("AC", add_special_tokens=True), [7, 8, 1])


def test_tokenizer_left_padding_and_mask():
    tok = CharacterTokenizer()
    out = tok("ACGT", add_special_tokens=True, padding="max_length", max_length=8)
    np.testing.assert_array_equal(out["input_ids"], [4, 4, 4, 7, 8, 9, 10, 1])
    np.testing.assert_array_equal(out["attention_mask"], [0, 0, 0, 1, 1, 1, 1, 1])


def test_tokenizer_right_padding():
    tok = CharacterTokenizer(padding_side="right")
    out = tok("ACGT", add_special_tokens=False, padding="max_length", max_length=6)
    np.testing.assert_array_equal(out["input_ids"], [7, 8, 9, 10, 4, 4])


def test_tokenizer_truncation_keeps_prefix_plus_eos():
    tok = CharacterTokenizer()
    out = tok("ACGTACGT", add_special_tokens=True, max_length=5, truncation=True)
    np.testing.assert_array_equal(out["input_ids"], [7, 8, 9, 10, 1])
    out = tok("ACGTACGT", add_special_tokens=False, max_length=5, truncation=True)
    np.testing.assert_array_equal(out["input_ids"], [7, 8, 9, 10, 7])


def test_tokenizer_decode_roundtrip():
    tok = CharacterTokenizer()
    assert tok.decode(tok.encode("ACGTN", add_special_tokens=True)) == "ACGTN"


def test_reverse_complement():
    assert string_reverse_complement("ACGTN") == "NACGT"
    assert string_reverse_complement("AAcc.") == ".ggTT"


# --------------------------------------------------------------------------
# fasta
# --------------------------------------------------------------------------


@pytest.fixture
def tiny_fasta(tmp_path):
    # two records, 60-char lines
    chr1 = "ACGT" * 30  # 120 bases
    chr2 = "TTGGCCAA" * 10  # 80 bases
    path = tmp_path / "tiny.fa"
    with open(path, "w") as f:
        f.write(">chr1 some description\n")
        for i in range(0, len(chr1), 60):
            f.write(chr1[i : i + 60] + "\n")
        f.write(">chr2\n")
        for i in range(0, len(chr2), 60):
            f.write(chr2[i : i + 60] + "\n")
    return path, chr1, chr2


def test_fasta_fetch(tiny_fasta):
    path, chr1, chr2 = tiny_fasta
    fa = FastaFile(path)
    assert set(fa.keys()) == {"chr1", "chr2"}
    assert fa.length("chr1") == 120
    assert fa.fetch("chr1", 0, 120) == chr1
    assert fa.fetch("chr1", 55, 70) == chr1[55:70]  # crosses a line break
    assert fa.fetch("chr2", 0, 80) == chr2
    assert fa.fetch("chr2", 75, 200) == chr2[75:]  # clipped at end
    # .fai round-trip: second open reads the cached index
    fa2 = FastaFile(path)
    assert fa2.fetch("chr1", 10, 20) == chr1[10:20]


def test_fasta_interval_padding_semantics(tiny_fasta):
    path, chr1, _ = tiny_fasta
    fi = FastaInterval(fasta_file=path, pad_interval=True)
    # short interval extends symmetrically (`hg38_dataset.py:93-101`)
    seq = fi("chr1", 50, 60, max_length=20)
    assert seq == chr1[45:65]
    # extension past the start pads with '.'
    seq = fi("chr1", 0, 10, max_length=20)
    assert seq == "." * 5 + chr1[:15]
    # long interval truncates to max_length from the start
    seq = fi("chr1", 0, 120, max_length=16)
    assert seq == chr1[:16]


def test_fasta_interval_rc_aug_deterministic(tiny_fasta):
    path, chr1, _ = tiny_fasta
    fi = FastaInterval(fasta_file=path, rc_aug=True)
    outs = {fi("chr1", 0, 16, max_length=16, rng=np.random.default_rng(s)) for s in range(8)}
    assert chr1[:16] in outs
    assert string_reverse_complement(chr1[:16]) in outs


# --------------------------------------------------------------------------
# datasets
# --------------------------------------------------------------------------


@pytest.fixture
def tiny_bed(tmp_path, tiny_fasta):
    path, _, _ = tiny_fasta
    bed = tmp_path / "tiny.bed"
    with open(bed, "w") as f:
        for i in range(4):
            f.write(f"chr1\t{i * 16}\t{i * 16 + 16}\ttrain\n")
        f.write("chr2\t0\t16\tvalid\n")
    return bed


def test_hg38_dataset_next_token_pair(tiny_fasta, tiny_bed):
    path, chr1, _ = tiny_fasta
    ds = HG38Dataset(
        split="train", bed_file=str(tiny_bed), fasta_file=str(path),
        max_length=16, add_eos=True,
    )
    assert len(ds) == 4
    data, target = ds[0]
    assert data.shape == (15,) and target.shape == (15,)
    tok = ds.tokenizer
    full = tok(chr1[:16], add_special_tokens=True, padding="max_length",
               max_length=16, truncation=True)["input_ids"]
    np.testing.assert_array_equal(data, full[:-1])
    np.testing.assert_array_equal(target, full[1:])
    assert target[-1] == tok.sep_token_id  # eos included in targets


def test_hg38_fixed_dataset_windows(tiny_fasta):
    path, chr1, _ = tiny_fasta
    ds = HG38FixedDataset(
        fasta_file=str(path), chr_ranges={"chr1": (0, 64)}, max_length=16, add_eos=True,
    )
    assert len(ds) == 4
    d0, t0 = ds[0]
    assert d0.shape == (16,)  # 16 ids + eos, minus the shift
    tok = ds.tokenizer
    expected = np.concatenate([tok.encode(chr1[:16]), [tok.sep_token_id]])
    np.testing.assert_array_equal(d0, expected[:-1])
    np.testing.assert_array_equal(t0, expected[1:])


def test_lm_dataset_chunks():
    tokens = np.arange(23, dtype=np.int32)
    ds = LMDataset(tokens, seq_len=8)
    # drop_last: ntokens -> 17, two full sequences
    assert len(ds) == 2
    d, t = ds[1]
    np.testing.assert_array_equal(d, np.arange(8, 16))
    np.testing.assert_array_equal(t, np.arange(9, 17))


# --------------------------------------------------------------------------
# loader
# --------------------------------------------------------------------------


class _ArangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, idx, rng=None):
        return np.full(4, idx, dtype=np.int32), np.asarray(idx, dtype=np.int32)


def test_loader_deterministic_shuffle_and_resume():
    ds = _ArangeDataset(32)
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=7,
                    process_index=0, process_count=1)
    epoch0 = [b[1].copy() for b in dl]
    assert len(epoch0) == 8
    assert dl.epoch == 1

    # fresh loader, fast-forward into epoch 0 after 3 batches
    dl2 = DataLoader(ds, batch_size=4, shuffle=True, seed=7,
                     process_index=0, process_count=1)
    dl2.load_state_dict({"epoch": 0, "batches_served": 3, "seed": 7})
    resumed = [b[1].copy() for b in dl2]
    assert len(resumed) == 5
    for a, b in zip(epoch0[3:], resumed):
        np.testing.assert_array_equal(a, b)

    # different epochs give different orders
    epoch1 = [b[1].copy() for b in dl]
    assert not all(np.array_equal(a, b) for a, b in zip(epoch0, epoch1))


def test_loader_multihost_split_disjoint():
    ds = _ArangeDataset(32)
    seen = []
    for rank in range(4):
        dl = DataLoader(ds, batch_size=2, shuffle=True, seed=3,
                        process_index=rank, process_count=4)
        for batch in dl:
            seen.extend(batch[1].tolist())
    assert sorted(seen) == list(range(32))  # disjoint cover


def test_loader_propagates_worker_errors():
    class _Boom:
        def __len__(self):
            return 8

        def __getitem__(self, idx, rng=None):
            if idx == 3:
                raise ValueError("bad sample")
            return np.zeros(2, np.int32), np.asarray(idx, np.int32)

    dl = DataLoader(_Boom(), batch_size=2, shuffle=False,
                    process_index=0, process_count=1)
    with pytest.raises(ValueError, match="bad sample"):
        for _ in dl:
            pass
