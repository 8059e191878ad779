"""Per-regime roofline table: % of the measured-hardware bound at each
context length (the BASELINE ">=70% of roofline" target, argued per regime
instead of only at 32k).

For each long-context regime (64k/128k/256k/450k/1M, B=1 — the exact
bench_long_context.py configurations including remat + conv routing):
  * compile the train step and read XLA's cost model (bytes accessed;
    custom-call operand/output bytes ARE counted, so Pallas conv HBM
    traffic is included);
  * add conv MXU flops analytically (XLA sees custom calls as zero-flop);
  * floors vs the chip calibration measured by scripts/roofline_32k.py
    (asymptotic stream rate + matmul rate);
  * % of roofline = max(floor) / measured ms (measured numbers from
    artifacts/long_context_r04.json — this script does not re-time).

Writes artifacts/roofline_regimes.json.

Usage: python scripts/roofline_regimes.py [64k 128k 256k 450k 1m]
(one process per regime is fine too — results merge into the artifact).
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

MODES = {
    # L, remat(residual-only, group), chunk_budget
    "64k": dict(L=65534, rro=False, group=1, chunk=None, pallas=None),
    "128k": dict(L=131070, rro=False, group=1, chunk=None, pallas=None),
    "256k": dict(L=262142, rro=False, group=1, chunk=None, pallas=None),
    "450k": dict(L=450048, rro=False, group=1, chunk=None, pallas=True),
    "1m": dict(L=1000448, rro=True, group=1, chunk=1 << 26, pallas=None),
}
# measured in round 5 with the Hermitian-halved outer conv
# (scripts/bench_long_context.py, 2026-08-20)
MEASURED_MS = {"64k": 113, "128k": 228, "256k": 475, "450k": 699,
               "1m": 1655}
# chip calibration (scripts/calibrate.py -> artifacts/hbm_calibration.json;
# round 4's 438/148 anchors were timing-harness artifacts — see that
# script's docstring for the three corrected bugs)
BW_GBS = 650.9
MXU_TF = 193.5

want = sys.argv[1:] or list(MODES)
ensure_tpu_flags(max_seq_len=max(MODES[m]["L"] for m in want))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from hyena_dna_tpu.models import ConvLMHeadModel
from hyena_dna_tpu.tasks import LMTask
from hyena_dna_tpu.train import build_optimizer, create_train_state
from hyena_dna_tpu.train.step import make_train_step

REPO = Path(__file__).resolve().parents[1]
d, nl, B, C = 256, 8, 1, 256


def conv_flops(L, remat_fwd_twice: bool):
    """Analytic MXU flops of the 8 convs per train step under the routed
    plan at this size (see ops/pallas_fftconv_n3.py / pallas_fftconv.py).

    Outer-radix kernels (all these regimes at B=1): per (batch, channel)
    row each transform costs n * 3*(r+m) Karatsuba MACs (n1 dense complex
    2-factor sub-FFTs; stage-1 is VPU). Transform count per conv train:
    forward = u-transform + inverse (x2 when the mixer is rematerialized);
    backward = u-retransform + dy-transform + du-inverse; filter fft + dk
    inverse add ~2 C-row transform sets.
    """
    import hyena_dna_tpu.ops.fftconv as _  # noqa: F401
    from hyena_dna_tpu.ops.pallas_fftconv_n3 import plan_outer
    from hyena_dna_tpu.ops.fftconv import next_fast_fft_size

    n = next_fast_fft_size(2 * L)
    spec = plan_outer(n, C, L, B)
    if spec is None:
        return 0.0, "chain/chunked (supplement omitted: flops ride XLA ops)"
    n1, r, m = spec
    fwd_t = 2 * (2 if remat_fwd_twice else 1)
    bwd_t = 3
    # Hermitian halving: each transform computes hq = n1/2 + 1 of the n1
    # q1 blocks (hq * r * m spectrum points at 3*(r+m) Karatsuba MACs)
    hq = n1 // 2 + 1
    per_row_macs = hq * r * m * 3 * (r + m)
    macs = (B * C * (fwd_t + bwd_t) + 2 * C) * per_row_macs
    return 2.0 * macs * nl, f"outer({n1},{r},{m})h{hq}"


def analyze(mode):
    cfg = MODES[mode]
    L = cfg["L"]
    if cfg["chunk"] is not None:
        import hyena_dna_tpu.ops.fftconv as FF

        FF.FFTCONV_CHUNK_BUDGET = cfg["chunk"]
    layer = dict(_name_="hyena", emb_dim=5, filter_order=64,
                 short_filter_order=3, l_max=L + 2, modulate=True, w=10,
                 use_pallas_front=cfg["pallas"])
    model = ConvLMHeadModel(d_model=d, n_layer=nl, d_inner=4 * d,
                            vocab_size=12, pad_vocab_size_multiple=8,
                            residual_in_fp32=False, layer=layer,
                            checkpoint_mixer=True, checkpoint_mlp=True,
                            remat_residual_only=cfg["rro"],
                            remat_group_size=cfg["group"],
                            dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, jnp.zeros((1, L), jnp.int32))["params"]
    tx, _ = build_optimizer(params, lr=6e-4)
    state = create_train_state(model, tx, rng, jnp.zeros((1, L), jnp.int32),
                               params=params)
    x = jnp.tile(jnp.asarray((np.arange(L) % 4 + 7), jnp.int32), (B, 1))
    y = jnp.roll(x, -1, axis=1)
    step = make_train_step(LMTask())
    ca = step.lower(state, (x, y), rng).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    bytes_step = float(ca.get("bytes accessed", 0.0))
    cf, plan = conv_flops(L, remat_fwd_twice=True)
    flops = float(ca.get("flops", 0.0)) + cf
    ms = MEASURED_MS[mode]
    floor_hbm = bytes_step / (BW_GBS * 1e9) * 1e3
    floor_mxu = flops / (MXU_TF * 1e12) * 1e3
    entry = {
        "L": L,
        "conv_plan": plan,
        "bytes_gb": round(bytes_step / 1e9, 2),
        "flops_t": round(flops / 1e12, 2),
        "floor_hbm_ms": round(floor_hbm, 1),
        "floor_mxu_ms": round(floor_mxu, 1),
        "measured_ms": ms,
        "tok_per_s": round(B * L / ms * 1e3),
        "pct_of_roofline": round(100 * max(floor_hbm, floor_mxu) / ms, 1),
    }
    print(mode, json.dumps(entry), flush=True)
    return entry


out_path = REPO / "artifacts/roofline_regimes.json"
data = json.loads(out_path.read_text()) if out_path.exists() else {
    "calibration": {"bw_gbs": BW_GBS, "mxu_tf": MXU_TF,
                    "source": "artifacts/roofline_32k.json"}}
for mode in want:
    data[mode] = analyze(mode)
out_path.write_text(json.dumps(data, indent=2))
print("wrote", out_path)
