"""Export golden parity values from the reference's own torch standalone.

Runs `/root/reference/standalone_hyenadna.py` (the code that loads the
published LongSafari checkpoints) at the tiny-1k shape with a fixed seed,
and stores into `tests/golden/reference_parity.npz`:
  * the exact torch state dict (raw key names, numpy arrays),
  * the input tokens,
  * the reference backbone hidden states and weight-tied LM logits.

`tests/test_reference_parity_golden.py` then asserts our framework
reproduces these numbers WITHOUT torch installed — the e2e parity check
survives any environment. Regenerate only if the reference network itself
changes (python scripts/export_golden_parity.py).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def main():
    import torch

    from test_reference_parity import TINY_CFG, TINY_LAYER, REF  # noqa: F401
    import test_reference_parity as trp

    # reuse the test module's torchvision stub + loader
    class _Req:
        def __init__(self):
            self.mod = None

    import importlib.util
    import types

    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tv_ops = types.ModuleType("torchvision.ops")
        tv_ops.__spec__ = importlib.machinery.ModuleSpec("torchvision.ops", None)

        class StochasticDepth(torch.nn.Module):
            def __init__(self, p, mode):
                super().__init__()
                assert p == 0.0

            def forward(self, x):
                return x

        tv_ops.StochasticDepth = StochasticDepth
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops

    spec = importlib.util.spec_from_file_location("standalone_hyenadna", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    model = mod.HyenaDNAModel(layer=dict(TINY_LAYER), use_head=False,
                              **TINY_CFG)
    model.eval()

    rng = np.random.default_rng(0)
    tokens = rng.integers(7, 11, size=(2, 1024), dtype=np.int64)

    with torch.inference_mode():
        hidden = model(torch.from_numpy(tokens)).numpy()
        emb = model.backbone.embeddings.word_embeddings.weight
        logits = (torch.from_numpy(hidden) @ emb.T).numpy()

    payload = {"tokens": tokens.astype(np.int32),
               "hidden": hidden.astype(np.float32),
               "logits": logits.astype(np.float32)}
    for k, v in model.state_dict().items():
        payload[f"sd::{k}"] = v.detach().cpu().numpy()

    out = Path(__file__).resolve().parents[1] / "tests/golden/reference_parity.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, **payload)
    print(f"wrote {out} ({out.stat().st_size / 1e6:.2f} MB, "
          f"{len(payload) - 3} state-dict tensors)")


if __name__ == "__main__":
    main()
