"""End-to-end Trainer tests on synthetic data: config composition, hg38 LM
pretraining loop, classification fine-tune with decoder head, checkpoint
save/restore + backbone loading."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyena_dna_tpu.train.__main__ import build_config
from hyena_dna_tpu.train.trainer import Trainer
from hyena_dna_tpu.utils.config import (
    apply_overrides,
    deep_merge,
    load_config,
    resolve_interpolations,
)


# --------------------------------------------------------------------------
# config system
# --------------------------------------------------------------------------


def test_config_interpolation_and_overrides():
    cfg = {
        "model": {"d_model": 128, "d_inner": "${eval:4 * 128}",
                  "layer": {"l_max": "${eval:${dataset.max_length} + 2}",
                            "lr": "${optimizer.lr}"}},
        "dataset": {"max_length": 1024},
        "optimizer": {"lr": 6e-4},
        "accum": "${div_up:256,32}",
    }
    cfg = resolve_interpolations(cfg)
    assert cfg["model"]["d_inner"] == 512
    assert cfg["model"]["layer"]["l_max"] == 1026
    assert cfg["model"]["layer"]["lr"] == 6e-4
    assert cfg["accum"] == 8

    cfg = apply_overrides(cfg, ["optimizer.lr=1e-3", "model.n_layer=4", "dataset.new=true"])
    assert cfg["optimizer"]["lr"] == 1e-3
    assert cfg["model"]["n_layer"] == 4
    assert cfg["dataset"]["new"] is True


def test_experiment_config_composes():
    cfg = build_config(["experiment=hg38/hg38_hyena", "dataset.max_length=512",
                        "trainer.max_epochs=1"])
    assert cfg["model"]["_name_"] == "lm"
    assert cfg["model"]["layer"]["l_max"] == 514
    assert cfg["model"]["layer"]["lr"] == 6e-4
    assert cfg["callbacks"]["model_checkpoint"]["monitor"] == "val/loss"
    assert cfg["scheduler"]["lr_min"] == pytest.approx(6e-5)


def test_all_experiment_configs_compose():
    """Every shipped experiment file must compose without errors (catches
    stale keys when model/module signatures evolve)."""
    from pathlib import Path

    root = Path(__file__).resolve().parents[1] / "configs" / "experiment"
    files = sorted(p.relative_to(root).with_suffix("") for p in root.rglob("*.yaml"))
    assert files
    for f in files:
        cfg = build_config([f"experiment={f}"])
        assert "_name_" in cfg["model"], f
        assert "dataset" in cfg, f


def test_unsafe_eval_rejected():
    with pytest.raises(ValueError):
        resolve_interpolations({"x": "${eval:__import__('os').system('true')}"})


# --------------------------------------------------------------------------
# end-to-end LM training
# --------------------------------------------------------------------------


@pytest.fixture
def tiny_genome(tmp_path):
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT"), size=4096))
    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(seq), 60):
            f.write(seq[i : i + 60] + "\n")
    bed = tmp_path / "g.bed"
    with open(bed, "w") as f:
        for i in range(32):
            f.write(f"chr1\t{i * 128}\t{i * 128 + 64}\ttrain\n")
        for i in range(4):
            f.write(f"chr1\t{i * 64}\t{i * 64 + 64}\tvalid\n")
        for i in range(4):
            f.write(f"chr1\t{2048 + i * 64}\t{2048 + i * 64 + 64}\ttest\n")
    return fa, bed


def _lm_config(tmp_path, fa, bed, **extra_train):
    return {
        "train": {"seed": 1, "run_dir": str(tmp_path / "run"), **extra_train},
        "mesh": {"data": 2},
        "trainer": {"max_epochs": 2, "precision": "32", "gradient_clip_val": 1.0,
                    "log_every_n_steps": 4},
        "dataset": {"_name_": "hg38", "bed_file": str(bed), "fasta_file": str(fa),
                    "batch_size": 4, "max_length": 64, "add_eos": True},
        "task": {"_name_": "hg38", "loss": "cross_entropy"},
        "model": {"_name_": "lm", "d_model": 32, "n_layer": 2, "d_inner": 128,
                  "vocab_size": 12, "pad_vocab_size_multiple": 8,
                  "layer": {"_name_": "hyena", "emb_dim": 5, "filter_order": 16,
                            "l_max": 66, "w": 10, "lr": 6e-4, "wd": 0.0,
                            "lr_pos_emb": 0.0}},
        "optimizer": {"lr": 3e-3, "weight_decay": 0.1},
        "scheduler": {"_name_": "cosine_warmup_timm", "t_initial": 64,
                      "warmup_t": 4, "lr_min": 3e-4, "warmup_lr_init": 1e-6},
        "callbacks": {"timer": {}, "params": {},
                      "model_checkpoint": {"monitor": "val/loss", "mode": "min"}},
    }


def test_lm_end_to_end(tmp_path, tiny_genome):
    fa, bed = tiny_genome
    cfg = _lm_config(tmp_path, fa, bed)
    trainer = Trainer(cfg)
    final = trainer.fit()
    assert "test/ppl" in final and np.isfinite(final["test/ppl"])
    # metrics stream exists and contains params + val entries
    lines = [json.loads(l) for l in open(Path(cfg["train"]["run_dir"]) / "metrics.jsonl")]
    keys = set().union(*(l.keys() for l in lines))
    assert "params/total" in keys and "val/ppl" in keys
    # checkpoints written
    assert (Path(cfg["train"]["run_dir"]) / "checkpoints" / "last").exists()


def test_resume_from_checkpoint(tmp_path, tiny_genome):
    fa, bed = tiny_genome
    cfg = _lm_config(tmp_path, fa, bed)
    t1 = Trainer(cfg)
    t1.fit()
    step_after = int(t1.global_step)

    cfg2 = _lm_config(tmp_path, fa, bed,
                      ckpt=str(Path(cfg["train"]["run_dir"]) / "checkpoints" / "last"))
    cfg2["trainer"]["max_epochs"] = 3
    t2 = Trainer(cfg2)
    t2.fit()
    # resume continues with EXACTLY the remaining epoch (not a replay of the
    # finished one): 2 epochs done, max 3 => one epoch of extra steps
    steps_per_epoch = step_after // 2
    assert int(t2.state.step) == step_after + steps_per_epoch
    assert t2.epoch == 3


def test_limit_train_batches_advances_data_order(tmp_path, tiny_genome):
    """Step-bounded epochs must still advance the loader's epoch (and hence
    the shuffle permutation) — regression test for the silent data replay."""
    fa, bed = tiny_genome
    cfg = _lm_config(tmp_path, fa, bed)
    cfg["trainer"]["limit_train_batches"] = 2
    cfg["trainer"]["max_epochs"] = 3
    cfg["callbacks"] = {}
    seen_epochs = []
    t = Trainer(cfg)
    orig_shard = t._shard

    def record_shard(batch):
        seen_epochs.append(t._train_loader.epoch)
        return orig_shard(batch)

    t._shard = record_shard
    t.fit()
    assert sorted(set(seen_epochs)) == [0, 1, 2], seen_epochs


def test_freeze_backbone_freezes(tmp_path, tiny_genome, tiny_benchmark):
    """freeze_backbone must stop optimizer updates to backbone params while
    the scratch head keeps training (reference long_conv_lm.py:612-621)."""
    import jax
    from flax import traverse_util

    fa, bed = tiny_genome
    lm_cfg = _lm_config(tmp_path, fa, bed)
    lm_cfg["trainer"]["max_epochs"] = 1
    t1 = Trainer(lm_cfg)
    t1.fit()
    ckpt = str(Path(lm_cfg["train"]["run_dir"]) / "checkpoints" / "last")

    cfg = {
        "train": {"seed": 0, "run_dir": str(tmp_path / "frz_run"),
                  "pretrained_model_path": ckpt,
                  "pretrained_model_state_hook": {"_name_": "load_backbone",
                                                  "freeze_backbone": True}},
        "mesh": {"data": 2},
        "trainer": {"max_epochs": 1, "precision": "32"},
        "dataset": {"_name_": "genomic_benchmark", "dataset_name": "toy_task",
                    "dest_path": str(tiny_benchmark), "d_output": 2,
                    "batch_size": 8, "max_length": 32},
        "task": {"_name_": "multiclass", "loss": "cross_entropy",
                 "metrics": ["accuracy"]},
        "model": {"_name_": "dna_embedding", "d_model": 32, "n_layer": 2,
                  "d_inner": 128, "vocab_size": 12, "pad_vocab_size_multiple": 8,
                  "layer": {"_name_": "hyena", "emb_dim": 5, "filter_order": 16,
                            "l_max": 66, "w": 10}},
        "decoder": {"_name_": "sequence", "mode": "pool", "l_output": 0},
        "optimizer": {"lr": 1e-3},
        "callbacks": {},
    }
    t2 = Trainer(cfg)
    before = traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.array, t2.state.params)
    )
    t2.fit()
    after = traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.array, t2.state.params)
    )
    backbone_changed = [
        "/".join(p) for p in before
        if p[0] == "backbone" and not np.array_equal(before[p], after[p])
    ]
    head_changed = [
        "/".join(p) for p in before
        if p[0] != "backbone" and not np.array_equal(before[p], after[p])
    ]
    assert not backbone_changed, f"frozen backbone params moved: {backbone_changed[:5]}"
    assert head_changed, "scratch head received no updates"


# --------------------------------------------------------------------------
# classification fine-tune
# --------------------------------------------------------------------------


@pytest.fixture
def tiny_benchmark(tmp_path):
    rng = np.random.default_rng(1)
    root = tmp_path / "bench" / "toy_task"
    for split in ("train", "test"):
        for label, motif in (("pos", "ACGTACGT"), ("neg", "TTTTCCCC")):
            d = root / split / label
            d.mkdir(parents=True)
            n = 32 if split == "train" else 8
            for i in range(n):
                pad = "".join(rng.choice(list("ACGT"), size=24))
                (d / f"{i}.txt").write_text(motif + pad)
    return tmp_path / "bench"


def test_classification_end_to_end(tmp_path, tiny_benchmark):
    cfg = {
        "train": {"seed": 0, "run_dir": str(tmp_path / "cls_run")},
        "mesh": {"data": 2},
        "trainer": {"max_epochs": 4, "precision": "32", "log_every_n_steps": 8},
        "dataset": {"_name_": "genomic_benchmark", "dataset_name": "toy_task",
                    "dest_path": str(tiny_benchmark), "d_output": 2,
                    "batch_size": 8, "max_length": 32, "use_padding": True},
        "task": {"_name_": "multiclass", "loss": "cross_entropy",
                 "metrics": ["accuracy"], "host_metrics": ["mcc", "f1_macro"]},
        "model": {"_name_": "dna_embedding", "d_model": 32, "n_layer": 2,
                  "d_inner": 128, "vocab_size": 12, "pad_vocab_size_multiple": 8,
                  "layer": {"_name_": "hyena", "emb_dim": 5, "filter_order": 16,
                            "l_max": 34, "w": 10}},
        "decoder": {"_name_": "sequence", "mode": "pool", "l_output": 0},
        "optimizer": {"lr": 1e-3, "weight_decay": 0.0},
        "callbacks": {},
    }
    trainer = Trainer(cfg)
    final = trainer.fit()
    assert final["test/accuracy"] > 0.9  # trivially separable motifs
    assert "test/mcc" in final and "test/f1_macro" in final


def test_load_backbone_finetune(tmp_path, tiny_genome, tiny_benchmark):
    fa, bed = tiny_genome
    lm_cfg = _lm_config(tmp_path, fa, bed)
    lm_cfg["trainer"]["max_epochs"] = 1
    t1 = Trainer(lm_cfg)
    t1.fit()
    ckpt = str(Path(lm_cfg["train"]["run_dir"]) / "checkpoints" / "last")

    cfg = {
        "train": {"seed": 0, "run_dir": str(tmp_path / "ft_run"),
                  "pretrained_model_path": ckpt,
                  "pretrained_model_state_hook": {"_name_": "load_backbone"}},
        "mesh": {"data": 2},
        "trainer": {"max_epochs": 1, "precision": "32"},
        "dataset": {"_name_": "genomic_benchmark", "dataset_name": "toy_task",
                    "dest_path": str(tiny_benchmark), "d_output": 2,
                    "batch_size": 8, "max_length": 32},
        "task": {"_name_": "multiclass", "loss": "cross_entropy", "metrics": ["accuracy"]},
        "model": {"_name_": "dna_embedding", "d_model": 32, "n_layer": 2,
                  "d_inner": 128, "vocab_size": 12, "pad_vocab_size_multiple": 8,
                  "layer": {"_name_": "hyena", "emb_dim": 5, "filter_order": 16,
                            "l_max": 66, "w": 10}},
        "decoder": {"_name_": "sequence", "mode": "pool", "l_output": 0},
        "optimizer": {"lr": 1e-3},
        "callbacks": {},
    }
    t2 = Trainer(cfg)
    final = t2.fit()
    assert "test/accuracy" in final


def test_trainer_sequence_parallel(tmp_path, tiny_genome):
    """End-to-end training with mesh seq=2: the conv chain runs through the
    shard_map channel-pencil/halo kernels and the loss matches a data-only
    mesh run bitwise at step 1."""
    fa, bed = tiny_genome
    base = _lm_config(tmp_path, fa, bed)
    base["dataset"]["max_length"] = 65  # LM pairs are L-1 = 64, seq-divisible
    base["model"]["layer"]["l_max"] = 67
    base["trainer"]["max_epochs"] = 1

    cfg_sp = json.loads(json.dumps(base))
    cfg_sp["mesh"] = {"data": 2, "seq": 2}
    cfg_sp["train"]["run_dir"] = str(tmp_path / "sp_run")
    t_sp = Trainer(cfg_sp)
    final_sp = t_sp.fit()

    cfg_dp = json.loads(json.dumps(base))
    cfg_dp["mesh"] = {"data": 2, "seq": 1}
    cfg_dp["train"]["run_dir"] = str(tmp_path / "dp_run")
    t_dp = Trainer(cfg_dp)
    final_dp = t_dp.fit()

    assert np.isfinite(final_sp["test/ppl"])
    assert abs(final_sp["test/ppl"] - final_dp["test/ppl"]) < 0.05 * final_dp["test/ppl"]


def test_masked_classification_end_to_end(tmp_path, tiny_benchmark):
    """return_mask=True flows the attention mask through loader -> step ->
    decoder masked pooling."""
    cfg = {
        "train": {"seed": 0, "run_dir": str(tmp_path / "masked_run")},
        "mesh": {"data": 2},
        "trainer": {"max_epochs": 2, "precision": "32", "log_every_n_steps": 8},
        "dataset": {"_name_": "genomic_benchmark", "dataset_name": "toy_task",
                    "dest_path": str(tiny_benchmark), "d_output": 2,
                    "batch_size": 8, "max_length": 48, "use_padding": True,
                    "return_mask": True},
        "task": {"_name_": "masked_multiclass", "loss": "cross_entropy",
                 "metrics": ["accuracy"]},
        "model": {"_name_": "dna_embedding", "d_model": 32, "n_layer": 2,
                  "d_inner": 128, "vocab_size": 12, "pad_vocab_size_multiple": 8,
                  "layer": {"_name_": "hyena", "emb_dim": 5, "filter_order": 16,
                            "l_max": 50, "w": 10}},
        "decoder": {"_name_": "sequence", "mode": "pool", "l_output": 0},
        "optimizer": {"lr": 1e-3, "weight_decay": 0.0},
        "callbacks": {},
    }
    trainer = Trainer(cfg)
    final = trainer.fit()
    assert "test/accuracy" in final and np.isfinite(final["test/accuracy"])


def test_fixed_len_val_datamodule(tmp_path, tiny_genome):
    fa, bed = tiny_genome
    from hyena_dna_tpu.data.datamodules import HG38DataModule

    dm = HG38DataModule(bed_file=str(bed), fasta_file=str(fa), max_length=64,
                        use_fixed_len_val=True, batch_size=2)
    # tiny genome: point the fixed ranges inside it
    dm.setup()
    from hyena_dna_tpu.data.hg38 import HG38FixedDataset

    dm.dataset_val = HG38FixedDataset(
        fasta_file=str(fa), chr_ranges={"chr1": (0, 512)}, max_length=64,
        tokenizer=dm.tokenizer, add_eos=True,
    )
    loader = dm.val_dataloader()
    batches = list(loader)
    assert len(batches) == 4  # 8 windows / batch 2
    x, y = batches[0]
    assert x.shape == (2, 64)


def test_load_backbone_from_torch_checkpoint(tmp_path, tiny_benchmark):
    """pretrained_model_path can point at a torch .ckpt (key surgery runs)."""
    import torch

    from hyena_dna_tpu.models import DNAEmbeddingModel
    from tests.test_torch_import import _flax_to_torch_sd

    layer = {"_name_": "hyena", "emb_dim": 5, "filter_order": 16, "l_max": 34, "w": 10}
    donor = DNAEmbeddingModel(d_model=32, n_layer=2, d_inner=128, vocab_size=12,
                              pad_vocab_size_multiple=8, layer=dict(layer))
    donor_params = donor.init(jax.random.PRNGKey(5), jnp.zeros((1, 32), jnp.int32))["params"]
    sd = _flax_to_torch_sd(donor_params)
    ckpt = tmp_path / "weights.ckpt"
    torch.save({"state_dict": {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}},
               ckpt)

    cfg = {
        "train": {"seed": 0, "run_dir": str(tmp_path / "torch_ft"),
                  "pretrained_model_path": str(ckpt),
                  "pretrained_model_state_hook": {"_name_": "load_backbone"}},
        "mesh": {"data": 2},
        "trainer": {"max_epochs": 1, "precision": "32"},
        "dataset": {"_name_": "genomic_benchmark", "dataset_name": "toy_task",
                    "dest_path": str(tiny_benchmark), "d_output": 2,
                    "batch_size": 8, "max_length": 32},
        "task": {"_name_": "multiclass", "loss": "cross_entropy"},
        "model": {"_name_": "dna_embedding", "d_model": 32, "n_layer": 2,
                  "d_inner": 128, "vocab_size": 12, "pad_vocab_size_multiple": 8,
                  "layer": dict(layer)},
        "decoder": {"_name_": "sequence", "mode": "pool", "l_output": 0},
        "optimizer": {"lr": 1e-3},
        "callbacks": {},
    }
    t = Trainer(cfg)
    # verify backbone weights equal the donor's
    from flax import traverse_util

    flat_t = traverse_util.flatten_dict(jax.tree_util.tree_map(np.array, t.state.params))
    flat_d = traverse_util.flatten_dict(jax.tree_util.tree_map(np.array, donor_params))
    key = ("backbone", "embeddings", "word_embeddings", "embedding")
    np.testing.assert_array_equal(flat_t[("backbone",) + key], flat_d[key])


# --------------------------------------------------------------------------
# chromatin profile: end-to-end multilabel fine-tune with streaming AUROC
# --------------------------------------------------------------------------


def test_chromatin_profile_multilabel_e2e(tmp_path):
    """Drive the chromatin_profile experiment preset through the Trainer on
    synthetic coords: BCE loss descends and the epoch metrics include the
    streamed multilabel AUROC (macro + median over tasks) without any
    gather-all-logits pass."""
    rng = np.random.default_rng(0)
    genome = {"chr1": "".join(rng.choice(list("ACGT"), size=6000)),
              "chr2": "".join(rng.choice(list("ACGT"), size=6000))}
    fa = tmp_path / "genome.fa"
    with open(fa, "w") as f:
        for name, seq in genome.items():
            f.write(f">{name}\n")
            for i in range(0, len(seq), 60):
                f.write(seq[i:i + 60] + "\n")
    # label 0 = GC-content > .5 over the window (learnable), labels 1-2 noise
    for split, n in (("train", 48), ("val", 16), ("test", 16)):
        with open(tmp_path / f"{split}_hg38_coords_targets.csv", "w") as f:
            f.write("Chr_No,Start,End,y_0,y_1,y_2\n")
            for i in range(n):
                chr_no = i % 2
                start = int(rng.integers(300, 4500))
                seq = genome[f"chr{chr_no+1}"][start:start + 1000]
                gc = int((seq.count("G") + seq.count("C")) / len(seq) > 0.5)
                f.write(f"{chr_no},{start},{start+1000},{gc},"
                        f"{int(rng.integers(0, 2))},{int(rng.integers(0, 2))}\n")

    cfg = build_config([
        "experiment=hg38/chromatin_profile",
        f"dataset.ref_genome_path={fa}",
        f"dataset.data_path={tmp_path}",
        "dataset.d_output=3", "dataset.max_length=128",
        "dataset.batch_size=8", "dataset.num_workers=0",
        "model.d_model=32", "model.d_inner=128", "model.layer.l_max=130",
        "model.layer.filter_order=16",
        "trainer.max_epochs=2", "trainer.precision=32",
        f"train.run_dir={tmp_path / 'run'}",
    ])
    cfg["mesh"] = {"data": 2}
    t = Trainer(cfg)
    final = t.fit()
    metrics = json.loads(
        (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()[-2])
    # the val epoch logs streamed multilabel metrics
    run_log = (tmp_path / "run" / "metrics.jsonl").read_text()
    assert '"val/auroc_macro"' in run_log and '"val/auroc_median"' in run_log
    assert "test/auroc_macro" in final
    assert 0.0 <= final["test/auroc_macro"] <= 1.0
    assert np.isfinite(final["test/loss"])


# --------------------------------------------------------------------------
# experiment preset smoke runs (reference config-surface parity)
# --------------------------------------------------------------------------


def test_hg38_fixed_test_only_preset(tmp_path, tiny_genome):
    """hg38_fixed_test: `train.test: true` skips the training loop and
    evaluates fixed non-overlapping windows (reference hg38_fixed_test.yaml
    semantics)."""
    fa, _ = tiny_genome
    cfg = build_config([
        "experiment=hg38/hg38_fixed_test",
        f"dataset.fasta_file={fa}",
        "dataset.max_length=64", "dataset.batch_size=4",
        "dataset.num_workers=0",
        "model.d_model=32", "model.d_inner=128", "model.layer.l_max=66",
        "model.layer.filter_order=16",
        "trainer.precision=32",
        f"train.run_dir={tmp_path / 'run'}",
    ])
    cfg["dataset"]["chr_ranges"] = {"chr1": [0, 512]}
    cfg["mesh"] = {"data": 2}
    t = Trainer(cfg)
    final = t.fit()
    assert t.global_step == 0  # no training happened
    assert "test/ppl" in final and np.isfinite(final["test/ppl"])
    # 512 bases / 64-length windows -> 8 fixed windows
    assert len(t.datamodule.dataset_test.intervals) == 8


def test_icl_preset_smoke(tmp_path, tiny_benchmark):
    """hg38_hyena_icl: k-shot prompt LM training composes and steps."""
    cfg = build_config([
        "experiment=hg38/hg38_hyena_icl",
        "dataset.dataset_name=toy_task",
        f"dataset.dest_path={tiny_benchmark}",
        "dataset.max_length=64", "dataset.batch_size=4", "dataset.shots=1",
        "dataset.num_workers=0",
        "model.d_model=32", "model.d_inner=128", "model.layer.l_max=66",
        "model.layer.filter_order=16",
        "trainer.max_epochs=1", "trainer.precision=32",
        f"train.run_dir={tmp_path / 'run'}",
    ])
    cfg["mesh"] = {"data": 2}
    t = Trainer(cfg)
    final = t.fit()
    assert t.global_step > 0
    assert np.isfinite(final.get("test/loss", np.nan))


def test_attention_preset_smoke(tmp_path, tiny_genome):
    """hg38_attention: the pure-MHA backbone preset trains end-to-end."""
    fa, bed = tiny_genome
    cfg = build_config([
        "experiment=hg38/hg38_attention",
        f"dataset.fasta_file={fa}", f"dataset.bed_file={bed}",
        "dataset.max_length=64", "dataset.batch_size=4",
        "dataset.num_workers=0",
        "model.d_model=32", "model.d_inner=128", "model.layer.l_max=66",
        "model.layer.filter_order=16", "model.attn_cfg.num_heads=4",
        "trainer.max_epochs=1", "trainer.precision=32",
        f"train.run_dir={tmp_path / 'run'}",
    ])
    cfg["mesh"] = {"data": 2}
    t = Trainer(cfg)
    final = t.fit()
    assert t.global_step > 0
    assert np.isfinite(final.get("test/ppl", np.nan))
