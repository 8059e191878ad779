"""Callback tests: seqlen-warmup curriculum reshapes data + recompiles, and
profiling utilities report sane numbers."""

import json
from pathlib import Path

import numpy as np
import pytest

from hyena_dna_tpu.train.trainer import Trainer
from hyena_dna_tpu.utils.profiling import benchmark, device_memory_stats, flops_estimate


@pytest.fixture
def tiny_genome(tmp_path):
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT"), size=8192))
    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(seq), 60):
            f.write(seq[i : i + 60] + "\n")
    bed = tmp_path / "g.bed"
    with open(bed, "w") as f:
        for i in range(16):
            f.write(f"chr1\t{i * 256}\t{i * 256 + 128}\ttrain\n")
        for i in range(4):
            f.write(f"chr1\t{4096 + i * 128}\t{4096 + i * 128 + 128}\tvalid\n")
        f.write(f"chr1\t6000\t6128\ttest\n")
    return fa, bed


def test_seqlen_warmup_curriculum(tmp_path, tiny_genome):
    fa, bed = tiny_genome
    cfg = {
        "train": {"seed": 0, "run_dir": str(tmp_path / "warmup_run")},
        "mesh": {"data": 1},
        "trainer": {"max_epochs": 4, "precision": "32", "log_every_n_steps": 2},
        "dataset": {"_name_": "hg38", "bed_file": str(bed), "fasta_file": str(fa),
                    "batch_size": 4, "max_length": 32, "add_eos": True},
        "task": {"_name_": "lm", "loss": "cross_entropy"},
        # l_max covers the LARGEST stage (reference note at SURVEY §3.4)
        "model": {"_name_": "lm", "d_model": 16, "n_layer": 1, "d_inner": 64,
                  "vocab_size": 12, "pad_vocab_size_multiple": 8,
                  "layer": {"_name_": "hyena", "emb_dim": 5, "filter_order": 16,
                            "l_max": 130, "w": 10}},
        "optimizer": {"lr": 1e-3},
        "callbacks": {"seqlen_warmup_reload": {"stage_params": [
            {"seq_len": 32, "epochs": 2, "batch_size": 4},
            {"seq_len": 64, "epochs": 1, "batch_size": 2},
            {"seq_len": 128, "epochs": 1, "batch_size": 2},
        ]}},
    }
    trainer = Trainer(cfg)
    final = trainer.fit()
    assert np.isfinite(final["test/ppl"])
    lines = [json.loads(l) for l in open(Path(cfg["train"]["run_dir"]) / "metrics.jsonl")]
    stages = [l for l in lines if "curriculum/seq_len" in l]
    seqs = [l["curriculum/seq_len"] for l in stages]
    assert 64 in seqs and 128 in seqs
    # final test ran at the last stage's length
    assert trainer.datamodule.max_length == 128


def test_profiling_utils():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: (x @ x).sum())
    stats = benchmark(f, jnp.ones((64, 64)), iters=3)
    assert stats["mean_ms"] > 0 and stats["min_ms"] <= stats["mean_ms"]
    mem = device_memory_stats()
    assert set(mem) == {"bytes_in_use", "peak_bytes_in_use", "bytes_limit"}
    flops = flops_estimate(d_model=256, n_layer=8, d_inner=1024, seq_len=32768)
    assert 1e6 < flops < 1e9  # per-token train FLOPs for the small model


def test_ema_evaluation(tmp_path, tiny_genome):
    fa, bed = tiny_genome
    cfg = {
        "train": {"seed": 0, "run_dir": str(tmp_path / "ema_run"), "ema": 0.9},
        "mesh": {"data": 1},
        "trainer": {"max_epochs": 2, "precision": "32", "log_every_n_steps": 4},
        "dataset": {"_name_": "hg38", "bed_file": str(bed), "fasta_file": str(fa),
                    "batch_size": 4, "max_length": 32, "add_eos": True},
        "task": {"_name_": "lm", "loss": "cross_entropy"},
        "model": {"_name_": "lm", "d_model": 16, "n_layer": 1, "d_inner": 64,
                  "vocab_size": 12, "pad_vocab_size_multiple": 8,
                  "layer": {"_name_": "hyena", "emb_dim": 5, "filter_order": 16,
                            "l_max": 34, "w": 10}},
        "optimizer": {"lr": 1e-3},
        "callbacks": {},
    }
    trainer = Trainer(cfg)
    trainer.fit()
    lines = [json.loads(l) for l in open(Path(cfg["train"]["run_dir"]) / "metrics.jsonl")]
    keys = set().union(*(l.keys() for l in lines))
    assert "val_ema/ppl" in keys and "val/ppl" in keys


def test_progressive_resizing_stages():
    """ProgressiveResizing (reference
    `src/callbacks/progressive_resizing.py:8-118`): per-epoch stage lookup
    mutates the datamodule's `resolution`, reinitializes datasets, resets
    loaders, and logs the change — exactly once per stage change."""
    from hyena_dna_tpu.train.callbacks import ProgressiveResizing

    class FakeDM:
        resolution = None
        inits = 0

        def init_datasets(self):
            self.inits += 1

    class FakeTrainer:
        def __init__(self):
            self.datamodule = FakeDM()
            self.epoch = 0
            self.resets = 0
            self.logged = []

        def reset_dataloaders(self):
            self.resets += 1

        def log(self, m):
            self.logged.append(m)

    cb = ProgressiveResizing(stage_params=[
        {"resolution": 4, "epochs": 2},
        {"resolution": 2, "epochs": 2},
        {"resolution": 1, "epochs": 1},
    ])
    tr = FakeTrainer()
    seen = []
    for epoch in range(5):
        tr.epoch = epoch
        cb.on_epoch_start(tr)
        seen.append(tr.datamodule.resolution)
    assert seen == [4, 4, 2, 2, 1]
    assert tr.datamodule.inits == 3  # once per stage change only
    assert tr.resets == 3
    assert [m["curriculum/resolution"] for m in tr.logged] == [4, 2, 1]


def test_wandb_sink(tmp_path, tiny_genome, monkeypatch):
    """The wandb sink (reference train.py:72-121) activates when a `wandb`
    config key is present and the package imports; every metrics flush goes
    to run.log with the global step."""
    import sys
    import types

    calls = []

    fake = types.ModuleType("wandb")

    class _Run:
        def log(self, metrics, step=None):
            calls.append((dict(metrics), step))

    def _init(**kw):
        fake.init_kwargs = kw
        return _Run()

    fake.init = _init
    monkeypatch.setitem(sys.modules, "wandb", fake)

    fa, bed = tiny_genome
    cfg = {
        "train": {"seed": 0, "run_dir": str(tmp_path / "wandb_run")},
        "wandb": {"project": "unit", "mode": "offline"},
        "mesh": {"data": 1},
        "trainer": {"max_epochs": 1, "precision": "32", "log_every_n_steps": 2},
        "dataset": {"_name_": "hg38", "bed_file": str(bed), "fasta_file": str(fa),
                    "batch_size": 4, "max_length": 32, "add_eos": True},
        "task": {"_name_": "lm", "loss": "cross_entropy"},
        "model": {"_name_": "lm", "d_model": 16, "n_layer": 1, "d_inner": 64,
                  "vocab_size": 12, "pad_vocab_size_multiple": 8,
                  "layer": {"_name_": "hyena", "emb_dim": 5, "filter_order": 16,
                            "l_max": 34, "w": 10}},
        "optimizer": {"lr": 1e-3},
        "callbacks": {},
    }
    from hyena_dna_tpu.train.trainer import Trainer as _Trainer

    trainer = _Trainer(cfg)
    assert trainer._wandb is not None
    assert fake.init_kwargs["project"] == "unit"
    assert fake.init_kwargs["mode"] == "offline"
    trainer.fit()
    assert calls, "wandb.log never called"
    keys = set().union(*(set(m) for m, _ in calls))
    assert "loss" in keys or any("ppl" in k for k in keys)
