"""Integrated multi-chip run of the flagship 1M config on the virtual mesh.

Drives `configs/experiment/hg38/hg38_large_1m.yaml` through the REAL
Trainer — config compose, HG38 datamodule, (data x seq) mesh sharding,
residual-remat blocks, channel-pencil sequence-sharded conv, checkpoint
save — then restores the checkpoint and trains further, all on an
8-virtual-device CPU mesh (`xla_force_host_platform_device_count`).

This closes the gap between "all components exist" (unit-tested) and "the
flagship config runs end-to-end sharded": same code path the real pod
would execute, shrunk only in d_model/n_layer/steps (L stays >= 256k and
the mesh stays data=2 x seq=4).

Reference anchor: the workload the reference needs 8x A100-80GB for
(`/root/reference/huggingface.py:150-151`).

Usage: python scripts/run_1m_virtual_mesh.py [--seq-len 262145]
Writes artifacts/virtual_1m_run.json.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq-len", type=int, default=262145)
    ap.add_argument("--d-model", type=int, default=64)
    ap.add_argument("--n-layer", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--run-dir", default="runs/virtual_1m")
    args = ap.parse_args()

    repo = Path(__file__).resolve().parents[1]
    fa = repo / "data/hg38/synthetic_hg38.fa"
    bed = repo / "data/hg38/synthetic_hg38.bed"
    assert fa.exists(), "run scripts/make_synthetic_genome.py data/hg38 first"

    cfg = build_config([
        "experiment=hg38/hg38_large_1m",
        f"dataset.fasta_file={fa}", f"dataset.bed_file={bed}",
        f"dataset.max_length={args.seq_len}",
        "dataset.batch_size=2", "dataset.num_workers=0",
        f"model.d_model={args.d_model}", f"model.n_layer={args.n_layer}",
        f"model.d_inner={4 * args.d_model}",
        "trainer.max_epochs=1",
        f"trainer.limit_train_batches={args.steps}",
        "trainer.log_every_n_steps=1",
        "trainer.accumulate_grad_batches=1",
        f"train.run_dir={args.run_dir}",
    ])
    # the flagship mesh shrunk to 8 virtual devices: data=2 x seq=4
    cfg["mesh"] = {"data": 2, "seq": 4, "model": 1}
    # the seqlen-warmup curriculum is exercised by its own tests; here we
    # run the final-stage shape directly
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

    # one more step from the restored state
    batch = trainer._shard(next(iter(loader)))
    rng, step_rng = jax.random.split(rng)
    trainer.state, metrics = trainer.train_step(trainer.state, batch, step_rng)
    post_resume_loss = float(metrics["loss"])
    print(f"post-resume step: loss={post_resume_loss:.4f}", flush=True)

    ok = (np.isfinite(losses).all() and post_resume_loss < losses[0]
          and losses[-1] < losses[0])
    result = {
        "config": "hg38/hg38_large_1m",
        "mesh": {"data": 2, "seq": 4},
        "seq_len": args.seq_len,
        "d_model": args.d_model,
        "n_layer": args.n_layer,
        "losses": losses,
        "post_resume_loss": post_resume_loss,
        "wallclock_s": round(time.perf_counter() - t0, 1),
        "ok": bool(ok),
    }
    out = repo / "artifacts" / "virtual_1m_run.json"
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
