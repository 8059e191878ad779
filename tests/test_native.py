"""Native (C++) data-path parity: fused fetch+tokenize must match the
numpy/python pipeline exactly, including augmentations and padding."""

import numpy as np
import pytest

from hyena_dna_tpu.data import CharacterTokenizer, FastaInterval, HG38Dataset
from hyena_dna_tpu.data.native import NativeFasta, load_library, tokenize

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native library unavailable"
)


@pytest.fixture
def genome(tmp_path):
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGTN"), size=5000, p=[0.24, 0.24, 0.24, 0.24, 0.04]))
    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        f.write(">chr1 desc\n")
        for i in range(0, len(seq), 61):  # odd line width exercises wrapping
            f.write(seq[i : i + 61] + "\n")
    return fa, seq


def test_tokenize_bytes_matches_python():
    tok = CharacterTokenizer()
    for text in ("ACGTN", "ACGTXacgt", "A" * 100):
        out = tokenize(text, 32, add_eos=True, pad_left=True, uppercase=False)
        ref = tok(text, add_special_tokens=True, padding="max_length",
                  max_length=32, truncation=True)["input_ids"]
        np.testing.assert_array_equal(out, ref, err_msg=text)


def test_native_fetch_matches_python_pipeline(genome):
    fa_path, seq = genome
    nf = NativeFasta(fa_path)
    tok = CharacterTokenizer()
    assert nf.length("chr1") == 5000
    for start, end, L in [(100, 200, 100), (0, 50, 100), (4950, 5100, 200),
                          (100, 1000, 64)]:
        out = nf.fetch_tokens("chr1", start, end, L, add_eos=True, uppercase=False)
        s, e = max(0, start), min(5000, end)
        ref = tok(seq[s:e], add_special_tokens=True, padding="max_length",
                  max_length=L, truncation=True)["input_ids"]
        np.testing.assert_array_equal(out, ref, err_msg=f"{start}:{end}")
    nf.close()


def test_native_rc_matches_python(genome):
    fa_path, seq = genome
    from hyena_dna_tpu.data.tokenizer import string_reverse_complement

    nf = NativeFasta(fa_path)
    tok = CharacterTokenizer()
    out = nf.fetch_tokens("chr1", 100, 164, 64, add_eos=False, rc=True, uppercase=False)
    ref = tok(string_reverse_complement(seq[100:164]), padding="max_length",
              max_length=64, truncation=True)["input_ids"]
    np.testing.assert_array_equal(out, ref)
    nf.close()


def test_hg38_dataset_native_vs_python(genome, tmp_path):
    fa_path, _ = genome
    bed = tmp_path / "b.bed"
    with open(bed, "w") as f:
        for i in range(8):
            f.write(f"chr1\t{i * 300}\t{i * 300 + 128}\ttrain\n")

    ds_native = HG38Dataset(split="train", bed_file=str(bed), fasta_file=str(fa_path),
                            max_length=128, add_eos=True, rc_aug=True)
    assert ds_native._native is not None
    ds_python = HG38Dataset(split="train", bed_file=str(bed), fasta_file=str(fa_path),
                            max_length=128, add_eos=True, rc_aug=True)
    ds_python._native = None  # force python path

    for i in range(8):
        for seed in (0, 1):
            a = ds_native.__getitem__(i, rng=np.random.default_rng((seed, i)))
            b = ds_python.__getitem__(i, rng=np.random.default_rng((seed, i)))
            np.testing.assert_array_equal(a[0], b[0], err_msg=f"idx {i} seed {seed}")
            np.testing.assert_array_equal(a[1], b[1])


def test_hg38_dataset_native_shift_aug_parity(genome, tmp_path):
    fa_path, _ = genome
    bed = tmp_path / "b.bed"
    with open(bed, "w") as f:
        f.write("chr1\t1000\t1128\ttrain\n")
    kw = dict(split="train", bed_file=str(bed), fasta_file=str(fa_path),
              max_length=128, add_eos=False, shift_augs=(-3, 3))
    ds_native = HG38Dataset(**kw)
    ds_python = HG38Dataset(**kw)
    ds_python._native = None
    for seed in range(5):
        a = ds_native.__getitem__(0, rng=np.random.default_rng(seed))
        b = ds_python.__getitem__(0, rng=np.random.default_rng(seed))
        np.testing.assert_array_equal(a[0], b[0], err_msg=f"seed {seed}")
