"""Checkpoint/resume via Orbax + fine-tuning state hooks.

Parity targets:
  * full-run resume: PL `trainer.fit(ckpt_path=...)`
    (`/root/reference/train.py:669-672`) -> `save_checkpoint`/`restore_checkpoint`
    of {params, opt_state, step} + loader state + metadata;
  * pretrained-backbone load with scratch head kept:
    `load_backbone` model-state hook
    (`/root/reference/src/models/sequence/long_conv_lm.py:569-627`);
  * TP resharding (`long_conv_lm.py:630-690`) is free: Orbax restores into
    any `NamedSharding` layout under GSPMD.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import traverse_util


def save_checkpoint(
    ckpt_dir: str | Path,
    state,
    step: int,
    loader_state: Optional[dict] = None,
    metadata: Optional[dict] = None,
    keep: int = 2,
) -> None:
    """Write {params, opt_state, step} plus host-side loader/meta state."""
    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    with ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    ) as mngr:
        payload = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
        mngr.save(step, args=ocp.args.StandardSave(payload))
    host = {"loader_state": loader_state or {}, "metadata": metadata or {}, "step": step}
    with open(ckpt_dir / f"host_state_{step}.json", "w") as f:
        json.dump(host, f)


def latest_step(ckpt_dir: str | Path) -> Optional[int]:
    ckpt_dir = Path(ckpt_dir).resolve()
    if not ckpt_dir.exists():
        return None
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        return mngr.latest_step()


def restore_checkpoint(ckpt_dir: str | Path, state, step: Optional[int] = None):
    """Restore into the (possibly sharded) structure of `state`.

    Returns (state, loader_state, metadata)."""
    ckpt_dir = Path(ckpt_dir).resolve()
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        step = step if step is not None else mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        template = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
        restored = mngr.restore(step, args=ocp.args.StandardRestore(template))
    state = state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    host_file = Path(ckpt_dir) / f"host_state_{step}.json"
    loader_state, metadata = {}, {}
    if host_file.exists():
        host = json.loads(host_file.read_text())
        loader_state, metadata = host.get("loader_state", {}), host.get("metadata", {})
    return state, loader_state, metadata


def restore_params_only(ckpt_dir: str | Path, step: Optional[int] = None) -> Dict:
    """Restore just the params tree from a checkpoint directory (accepts the
    run's `checkpoints/best` / `checkpoints/last` layout or a direct
    CheckpointManager dir)."""
    ckpt_dir = Path(ckpt_dir).resolve()
    for cand in (ckpt_dir, ckpt_dir / "best", ckpt_dir / "last"):
        if cand.exists():
            with ocp.CheckpointManager(cand) as mngr:
                s = step if step is not None else mngr.latest_step()
                if s is None:
                    continue
                restored = mngr.restore(s, args=ocp.args.StandardRestore())
                return restored["params"]
    raise FileNotFoundError(f"no checkpoint found under {ckpt_dir}")


# --------------------------------------------------------------------------
# fine-tuning: load pretrained backbone, keep scratch head
# --------------------------------------------------------------------------


def load_backbone_hook(params: Dict, pretrained_params: Dict, freeze_backbone: bool = False):
    """Copy every `backbone/...` entry from the pretrained tree into the
    scratch tree, keeping scratch decoder/head weights
    (reference `load_backbone`, `long_conv_lm.py:569-627`).

    Returns (params, frozen_label_overrides) — the overrides mark backbone
    params "frozen" for the optimizer when freeze_backbone is set.
    """
    def canonical(path):
        """Collapse repeated leading 'backbone' wrappers: a fine-tune model
        may nest DNAEmbeddingModel (itself rooted at 'backbone') under a
        decoder wrapper's 'backbone' field."""
        i = 0
        while i + 1 < len(path) and path[i] == "backbone" and path[i + 1] == "backbone":
            i += 1
        return path[i:]

    flat = traverse_util.flatten_dict(params)
    flat_pre = {
        canonical(p): v for p, v in traverse_util.flatten_dict(pretrained_params).items()
    }
    loaded, skipped = 0, []
    for path in list(flat.keys()):
        if path[0] != "backbone":
            skipped.append("/".join(path))
            continue
        cpath = canonical(path)
        if cpath in flat_pre:
            src, dst = flat_pre[cpath], flat[path]
            assert np.shape(src) == np.shape(dst), (
                f"shape mismatch at {'/'.join(path)}: {np.shape(src)} vs {np.shape(dst)}"
            )
            flat[path] = src
            loaded += 1
        else:
            skipped.append("/".join(path))
    assert loaded > 0, (
        "load_backbone matched NO tensors — checkpoint/model structure mismatch"
    )
    params = traverse_util.unflatten_dict(flat)
    frozen = None
    if freeze_backbone:
        frozen = {
            path: ("frozen" if path[0] == "backbone" else None)
            for path in flat
        }
    return params, {"loaded": loaded, "scratch": skipped, "frozen": frozen}
