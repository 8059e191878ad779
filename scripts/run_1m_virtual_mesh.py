"""Integrated multi-chip runs of the flagship 1M config on the virtual mesh.

Drives `configs/experiment/hg38/hg38_large_1m.yaml` through the REAL
Trainer — config compose, HG38 datamodule, (data x seq) mesh sharding,
residual-remat blocks, channel-pencil sequence-sharded conv, checkpoint
save — on an 8-virtual-device CPU mesh
(`xla_force_host_platform_device_count`).

Three modes close the gap between "all components exist" (unit-tested)
and "the flagship config runs end-to-end sharded":

  plain  — 3 steps at a fixed L >= 256k + checkpoint save/restore/resume
           (the round-3 demonstration).
  stages — trainer.fit() with the seqlen_warmup_reload callback KEPT,
           crossing a stage boundary on the (data=2 x seq=4) mesh: the
           boundary mutates dataset.max_length/batch_size, rebuilds the
           loaders, re-shards the batch over the seq axis at the new L
           ((L-1) % seq == 0 per stage) and re-jits the step. This is the
           warmup-curriculum x sequence-sharded-mesh interplay
           (`/root/reference/src/callbacks/seqlen_warmup_reload.py:50-152`
           + README.md:551-608) that no unit test exercises.
  full   — ONE step at the full flagship L=1,000,001 final-stage shape
           (d_model shrunk for CPU memory), proving the full-L graph
           traces + executes sequence-sharded.

Reference anchor: the workload the reference needs 8x A100-80GB for
(`/root/reference/huggingface.py:150-151`).

Usage: python scripts/run_1m_virtual_mesh.py [--mode plain|stages|full]
Merges results into artifacts/virtual_1m_run.json.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from hyena_dna_tpu.train.__main__ import build_config
from hyena_dna_tpu.train.trainer import Trainer

REPO = Path(__file__).resolve().parents[1]


def base_overrides(args, seq_len):
    fa = REPO / "data/hg38/synthetic_hg38.fa"
    bed = REPO / "data/hg38/synthetic_hg38.bed"
    assert fa.exists(), "run scripts/make_synthetic_genome.py data/hg38 first"
    return [
        "experiment=hg38/hg38_large_1m",
        f"dataset.fasta_file={fa}", f"dataset.bed_file={bed}",
        f"dataset.max_length={seq_len}",
        "dataset.batch_size=2", "dataset.num_workers=0",
        f"model.d_model={args.d_model}", f"model.n_layer={args.n_layer}",
        f"model.d_inner={4 * args.d_model}",
        "trainer.log_every_n_steps=1",
        "trainer.accumulate_grad_batches=1",
        f"train.run_dir={args.run_dir}",
    ]


def merge_artifact(update):
    out = REPO / "artifacts" / "virtual_1m_run.json"
    data = json.loads(out.read_text()) if out.exists() else {}
    if "losses" in data:  # round-3 flat layout -> nest it under "plain"
        data = {"plain": data}
    data.update(update)
    out.write_text(json.dumps(data, indent=2))
    print(json.dumps(update))


def run_plain(args):
    cfg = build_config(base_overrides(args, args.seq_len) + [
        "trainer.max_epochs=1",
        f"trainer.limit_train_batches={args.steps}",
    ])
    cfg["mesh"] = {"data": 2, "seq": 4, "model": 1}
    cfg.get("callbacks", {}).pop("seqlen_warmup_reload", None)

    t0 = time.perf_counter()
    trainer = Trainer(cfg)
    assert trainer.mesh.shape["seq"] == 4 and trainer.mesh.shape["data"] == 2
    losses = []
    loader = trainer.datamodule.train_dataloader()
    rng = jax.random.PRNGKey(0)
    for i, batch in enumerate(loader):
        if i >= args.steps:
            break
        batch = trainer._shard(batch)
        rng, step_rng = jax.random.split(rng)
        trainer.state, metrics = trainer.train_step(trainer.state, batch, step_rng)
        trainer.global_step += 1
        losses.append(float(metrics["loss"]))
        print(f"step {i}: loss={losses[-1]:.4f} "
              f"({time.perf_counter() - t0:.1f}s elapsed)", flush=True)

    # checkpoint round trip on the sharded state
    from hyena_dna_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    ckpt_dir = Path(args.run_dir) / "checkpoints" / "virtual_1m"
    save_checkpoint(str(ckpt_dir), trainer.state, step=trainer.global_step,
                    metadata={"epoch": 0})
    restored, _, _ = restore_checkpoint(str(ckpt_dir), trainer.state)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(restored.step)),
        np.asarray(jax.device_get(trainer.state.step)))
    trainer.state = restored

    batch = trainer._shard(next(iter(loader)))
    rng, step_rng = jax.random.split(rng)
    trainer.state, metrics = trainer.train_step(trainer.state, batch, step_rng)
    post_resume_loss = float(metrics["loss"])
    print(f"post-resume step: loss={post_resume_loss:.4f}", flush=True)

    ok = (np.isfinite(losses).all() and post_resume_loss < losses[0]
          and losses[-1] < losses[0])
    merge_artifact({"plain": {
        "config": "hg38/hg38_large_1m",
        "mesh": {"data": 2, "seq": 4},
        "seq_len": args.seq_len,
        "d_model": args.d_model,
        "n_layer": args.n_layer,
        "losses": losses,
        "post_resume_loss": post_resume_loss,
        "wallclock_s": round(time.perf_counter() - t0, 1),
        "ok": bool(ok),
    }})
    return 0 if ok else 1


def run_stages(args):
    """trainer.fit() across a seqlen-warmup stage boundary on the mesh."""
    stage_lens = [131073, 262145]  # (L-1) % seq == 0 for both
    cfg = build_config(base_overrides(args, stage_lens[0]) + [
        "trainer.max_epochs=2",
        "trainer.limit_train_batches=3",
        "trainer.limit_val_batches=1",
        # the flagship schedule starts at lr 1e-6 with a 1000-step warmup;
        # a 6-step smoke at that lr cannot show learning — use the real lr
        "scheduler.warmup_t=1",
        "scheduler.warmup_lr_init=2e-4",
    ])
    cfg["mesh"] = {"data": 2, "seq": 4, "model": 1}
    cfg["callbacks"]["seqlen_warmup_reload"] = {"stage_params": [
        {"seq_len": stage_lens[0], "epochs": 1, "batch_size": 2},
        {"seq_len": stage_lens[1], "epochs": 1, "batch_size": 2},
    ]}
    cfg["callbacks"].pop("model_checkpoint", None)  # bounded wallclock

    stale = Path(args.run_dir) / "metrics.jsonl"  # don't mix runs' records
    if stale.exists():
        stale.unlink()

    t0 = time.perf_counter()
    trainer = Trainer(cfg)
    assert trainer.mesh.shape["seq"] == 4 and trainer.mesh.shape["data"] == 2
    trainer.fit()
    wall = round(time.perf_counter() - t0, 1)

    # the callback must have crossed into stage 2 (mutated the datamodule)
    crossed = trainer.datamodule.max_length == stage_lens[1]
    records = [json.loads(line) for line in
               (Path(args.run_dir) / "metrics.jsonl").read_text().splitlines()]
    stage_logs = [r for r in records if "curriculum/stage" in r]
    losses = [r["train/loss"] for r in records if "train/loss" in r]
    ok = bool(crossed and len(stage_logs) >= 1
              and np.isfinite(losses).all() and losses[-1] < losses[0])
    merge_artifact({"stages": {
        "config": "hg38/hg38_large_1m",
        "mesh": {"data": 2, "seq": 4},
        "stage_seq_lens": stage_lens,
        "stages_crossed": len(stage_logs),
        "d_model": args.d_model,
        "n_layer": args.n_layer,
        "train_losses": losses,
        "wallclock_s": wall,
        "ok": ok,
    }})
    return 0 if ok else 1


def run_full(args):
    """One step at the full flagship L=1,000,001 final-stage shape."""
    L = 1000001
    cfg = build_config(base_overrides(args, L) + [
        "trainer.max_epochs=1",
        "trainer.limit_train_batches=1",
    ])
    cfg["mesh"] = {"data": 2, "seq": 4, "model": 1}
    cfg.get("callbacks", {}).pop("seqlen_warmup_reload", None)

    t0 = time.perf_counter()
    trainer = Trainer(cfg)
    loader = trainer.datamodule.train_dataloader()
    batch = trainer._shard(next(iter(loader)))
    rng = jax.random.PRNGKey(0)
    trainer.state, metrics = trainer.train_step(trainer.state, batch, rng)
    loss = float(metrics["loss"])
    wall = round(time.perf_counter() - t0, 1)
    print(f"full-L step: loss={loss:.4f} ({wall}s)", flush=True)
    ok = bool(np.isfinite(loss))
    merge_artifact({"full_l": {
        "config": "hg38/hg38_large_1m",
        "mesh": {"data": 2, "seq": 4},
        "seq_len": L,
        "d_model": args.d_model,
        "n_layer": args.n_layer,
        "loss": loss,
        "wallclock_s": wall,
        "ok": ok,
    }})
    return 0 if ok else 1


def run_full8(args):
    """One full-L step on the flagship's own declared mesh FACTORIZATION
    width: seq=8 ((data=1, seq=8) on the 8-device virtual mesh), so the
    channel-pencil conv runs the REAL 8-way split (C/8 channels per
    pencil, 8-way all_to_all) rather than the seq<=4 splits every other
    virtual run uses. Matches configs/experiment/hg38/hg38_large_1m.yaml
    mesh (data=2 x seq=8) up to the data axis this 8-device host can't
    also fit."""
    L = 1000001
    cfg = build_config(base_overrides(args, L) + [
        "trainer.max_epochs=1",
        "trainer.limit_train_batches=1",
        "dataset.batch_size=1",
    ])
    cfg["mesh"] = {"data": 1, "seq": 8, "model": 1}
    cfg.get("callbacks", {}).pop("seqlen_warmup_reload", None)

    t0 = time.perf_counter()
    trainer = Trainer(cfg)
    assert trainer.mesh.shape["seq"] == 8
    loader = trainer.datamodule.train_dataloader()
    batch = trainer._shard(next(iter(loader)))
    rng = jax.random.PRNGKey(0)
    trainer.state, metrics = trainer.train_step(trainer.state, batch, rng)
    loss = float(metrics["loss"])
    wall = round(time.perf_counter() - t0, 1)
    print(f"full-L seq=8 step: loss={loss:.4f} ({wall}s)", flush=True)
    ok = bool(np.isfinite(loss))
    merge_artifact({"full_l_seq8": {
        "config": "hg38/hg38_large_1m",
        "mesh": {"data": 1, "seq": 8},
        "seq_len": L,
        "d_model": args.d_model,
        "n_layer": args.n_layer,
        "loss": loss,
        "wallclock_s": wall,
        "ok": ok,
    }})
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["plain", "stages", "full", "full8"],
                    default="plain")
    ap.add_argument("--seq-len", type=int, default=262145)
    ap.add_argument("--d-model", type=int, default=64)
    ap.add_argument("--n-layer", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--run-dir", default="runs/virtual_1m")
    args = ap.parse_args()
    if args.mode == "stages":
        args.run_dir = args.run_dir + "_stages"
        return run_stages(args)
    if args.mode == "full":
        args.run_dir = args.run_dir + "_full"
        if args.d_model > 32:
            args.d_model = 32
        return run_full(args)
    if args.mode == "full8":
        args.run_dir = args.run_dir + "_full8"
        # 8 device threads on 4 host cores: larger shapes straggle past
        # XLA CPU's hard 40 s collective-rendezvous timeout (measured:
        # d=32/n=2 dies, d=16/n=1 runs in 60 s)
        if args.d_model > 16:
            args.d_model = 16
        args.n_layer = min(args.n_layer, 1)
        return run_full8(args)
    return run_plain(args)


if __name__ == "__main__":
    sys.exit(main())
