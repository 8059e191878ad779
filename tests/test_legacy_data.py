"""Legacy data-surface tests: ETT time-series windows and word vocabulary."""

import numpy as np
import pytest

from hyena_dna_tpu.data.timeseries import InformerDataset, StandardScaler
from hyena_dna_tpu.data.vocabulary import Vocab


@pytest.fixture
def ett_csv(tmp_path):
    rng = np.random.default_rng(0)
    path = tmp_path / "ett.csv"
    with open(path, "w") as f:
        f.write("date,HUFL,HULL,OT\n")
        for i in range(500):
            h = i % 24
            d = 1 + (i // 24) % 28
            f.write(f"2016-07-{d:02d} {h:02d}:00:00,"
                    f"{rng.normal():.4f},{rng.normal():.4f},{rng.normal():.4f}\n")
    return path


def test_informer_dataset_shapes(ett_csv):
    ds = InformerDataset(str(ett_csv), flag="train", size=(48, 24, 24),
                         features="S", target="OT")
    assert len(ds) > 0
    x, y, extra = ds[0]
    assert x.shape == (48 + 24, 1)  # seq_len + zero-padded pred_len
    np.testing.assert_allclose(x[48:], 0.0)  # forecast region zeroed
    assert y.shape == (24, 1)
    assert extra["mark"].shape == (72, 4)
    assert extra["mask"].shape == (72, 1)
    assert ds.d_input == 1 and ds.d_output == 1
    assert ds.n_tokens_time == [13, 32, 7, 24]


def test_informer_multivariate_and_scaling(ett_csv):
    ds = InformerDataset(str(ett_csv), flag="train", size=(48, 24, 24),
                         features="M")
    assert ds.d_input == 3
    x, y, _ = ds[0]
    assert x.shape == (72, 3) and y.shape == (24, 3)
    # scaled stats roughly standardized on the train split
    assert abs(float(ds.data_x.mean())) < 0.5


def test_standard_scaler_roundtrip():
    rng = np.random.default_rng(1)
    data = rng.normal(3.0, 2.0, size=(100, 4))
    sc = StandardScaler()
    sc.fit(data)
    z = sc.transform(data)
    np.testing.assert_allclose(sc.inverse_transform(z), data, rtol=1e-10)
    np.testing.assert_allclose(z.mean(0), 0.0, atol=1e-10)


def test_vocab_build_and_encode(tmp_path):
    corpus = tmp_path / "c.txt"
    corpus.write_text("the cat sat\nthe dog sat on the mat\n")
    v = Vocab(special=["<unk>"], lower_case=True)
    v.count_file(corpus)
    v.build_vocab()
    assert v.get_idx("<unk>") == 0
    assert v.get_idx("the") == 1  # most frequent first
    assert v.get_idx("zebra") == 0  # unk fallback
    ids = v.encode_file(corpus, ordered=True)
    assert ids.dtype == np.int64
    # 3 + eos + 6 + eos tokens
    assert len(ids) == 11
    assert v.get_sym(int(ids[0])) == "the"


def test_vocab_min_freq_and_max_size(tmp_path):
    corpus = tmp_path / "c.txt"
    corpus.write_text("a a a b b c\n")
    v = Vocab(special=["<unk>"], min_freq=2, add_eos=False)
    v.count_file(corpus)
    v.build_vocab()
    assert "c" not in v.sym2idx
    assert "a" in v.sym2idx and "b" in v.sym2idx
