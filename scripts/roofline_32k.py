"""Re-derived roofline attribution for the 32k bench step (round 4).

The round-2 BASELINE.md band (95-125 ms) was derived from an assumed
819 GB/s HBM and the f32-residual traffic budget. Both assumptions are
stale: residuals are bf16 since round 3, and this chip's MEASURED stream
rate is far below spec. This script replaces assumptions with
measurements:

 1. calibrate the chip: sustained elementwise HBM rate at model-sized
    tensors (self-carry scan: traffic per iter is exactly r+w), asymptotic
    rate at 0.5 GB arrays, and the bf16 matmul rate;
 2. compile the EXACT bench train step and read XLA's own cost model
    (`compiled.cost_analysis()`): bytes accessed + flops. Pallas custom
    calls contribute their real HBM operand/output bytes but zero flops,
    so conv MXU flops are supplemented analytically from the kernel plan
    (3-matmul Karatsuba passes: 3*(r/2 + m) MACs/point fwd,
    3*(m + r/2) inverse, x2 flops/MAC, one packed complex transform per
    two batch rows);
 3. time the step (20-step scan, hard float() sync, best of 3 windows);
 4. floors: bytes / measured-BW and flops / measured-TF; report
    step-time / max(floor) = % of the measured-hardware roofline.

Writes artifacts/roofline_32k.json.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

ensure_tpu_flags()
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
try:
    jax.config.update("jax_default_prng_impl", "rbg")
except Exception:
    pass

REPO = Path(__file__).resolve().parents[1]
L, d, nl, B = 32768, 256, 8, 4
REPS = 20


def _time_selfcarry(f, x, reps=50):
    @jax.jit
    def loop(x):
        def body(c, _):
            return f(c), jnp.ravel(c)[0].astype(jnp.float32)

        c, acc = jax.lax.scan(body, x, None, length=reps)
        return jnp.sum(acc) + jnp.ravel(c)[0].astype(jnp.float32)

    float(loop(x))
    t0 = time.perf_counter()
    float(loop(x))
    return (time.perf_counter() - t0) / reps


def calibrate():
    out = {}
    # sustained elementwise rate at the model's tensor size (B, C, L) bf16
    x = jnp.ones((B, d, L), jnp.bfloat16)
    dt = _time_selfcarry(lambda c: c + jnp.bfloat16(1.0), x)
    out["bw_eltwise_model_tensor_gbs"] = 2 * x.size * 2 / dt / 1e9
    # asymptotic rate at a 1 GB round trip
    x = jnp.ones((512 * 1024 * 1024,), jnp.bfloat16)
    dt = _time_selfcarry(lambda c: c + jnp.bfloat16(1.0), x, reps=20)
    out["bw_eltwise_512m_gbs"] = 2 * x.size * 2 / dt / 1e9
    # matmul rate
    a = jnp.ones((8192, 8192), jnp.bfloat16)
    dt = _time_selfcarry(lambda c: (c @ a) * jnp.bfloat16(1e-4), a, reps=20)
    out["mxu_tflops"] = 2 * 8192 ** 3 / dt / 1e12
    return out


def build_step():
    from hyena_dna_tpu.models import ConvLMHeadModel
    from hyena_dna_tpu.tasks import LMTask
    from hyena_dna_tpu.train import build_optimizer, create_train_state
    from hyena_dna_tpu.train.step import make_multistep_train_step

    layer = dict(_name_="hyena", emb_dim=5, filter_order=64,
                 short_filter_order=3, l_max=L + 2, modulate=True, w=10,
                 lr=6e-4, wd=0.0, lr_pos_emb=0.0)
    model = ConvLMHeadModel(d_model=d, n_layer=nl, d_inner=4 * d,
                            vocab_size=12, pad_vocab_size_multiple=8,
                            residual_in_fp32=False, layer=layer,
                            dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, L), jnp.int32)
    params = jax.jit(model.init)(rng, sample)["params"]
    tx, _ = build_optimizer(params, lr=6e-4, weight_decay=0.1)
    state = create_train_state(model, tx, rng, sample, params=params)
    x = jnp.asarray(np.tile((np.arange(L) % 4 + 7).astype(np.int32), (B, 1)))
    y = jnp.roll(x, -1, axis=1)
    step = make_multistep_train_step(LMTask(), steps_per_call=REPS)
    xs = jnp.broadcast_to(x, (REPS, *x.shape))
    ys = jnp.broadcast_to(y, (REPS, *y.shape))
    return state, step, (xs, ys)


def conv_flops_supplement():
    """MXU flops per train step inside the Pallas conv custom calls (XLA's
    cost model sees custom calls as zero-flop). Plan at this shape:
    r = m = 256, packed (two batch rows per complex transform),
    spectrum-saving backward.

    Per packed transform over rows=(B/2)*C, n=r*m points/row:
      fwd pass1 contracts r/2 (causal zero pad), pass2 contracts m,
      Karatsuba x3 matmuls: MACs = n * 3*(r/2 + m)
      inverse: pass1 contracts m, pass2 emits r/2 rows: same 3*(m + r/2)
    Step count per conv train: fwd transform + fwd inverse (forward pass)
    + dy transform + du inverse (backward) + filter fft (C rows, amortized)
    + dk inverse (C rows).
    """
    r = m = 256
    n = r * m
    rows_packed = (B // 2) * d
    macs_per_row = n * 3 * (r // 2 + m)
    big = 4 * rows_packed * macs_per_row  # fwd T, fwd inv, dy T, du inv
    small = 2 * d * macs_per_row          # filter fft + dk inverse (C rows)
    per_conv = 2 * (big + small)          # flops = 2 * MACs
    return nl * per_conv


def main():
    cal = calibrate()
    print("calibration:", {k: round(v, 1) for k, v in cal.items()}, flush=True)

    state, step, (xs, ys) = build_step()
    rng = jax.random.PRNGKey(0)

    # Cost-model the SINGLE step (XLA's cost analysis counts a while-loop
    # body once, so analyzing the 20-step scan under-reports by ~REPS x);
    # time the 20-step scan (dispatch amortization, same as bench.py).
    from hyena_dna_tpu.tasks import LMTask
    from hyena_dna_tpu.train.step import make_train_step

    one = make_train_step(LMTask())
    ca1 = one.lower(state, (xs[0], ys[0]), rng).compile().cost_analysis()
    if isinstance(ca1, list):
        ca1 = ca1[0]
    bytes_step = float(ca1.get("bytes accessed", 0.0))
    xla_flops = float(ca1.get("flops", 0.0))
    flops_step = xla_flops + conv_flops_supplement()

    compiled = step.lower(state, (xs, ys), rng).compile()

    state, mtr = compiled(state, (xs, ys), rng)
    float(mtr["loss"][-1])
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        state, mtr = compiled(state, (xs, ys), jax.random.PRNGKey(w))
        float(mtr["loss"][-1])
        best = min(best, time.perf_counter() - t0)
    ms_step = best / REPS * 1e3
    tok_s = B * L / (best / REPS)

    bw_lo = cal["bw_eltwise_model_tensor_gbs"]
    bw_hi = cal["bw_eltwise_512m_gbs"]
    floor_hbm_ms_hi = bytes_step / (bw_lo * 1e9) * 1e3   # conservative BW
    floor_hbm_ms_lo = bytes_step / (bw_hi * 1e9) * 1e3   # optimistic BW
    floor_mxu_ms = flops_step / (cal["mxu_tflops"] * 1e12) * 1e3
    floor_ms = max(floor_hbm_ms_lo, floor_mxu_ms)
    result = {
        "round": 4,
        "shape": {"B": B, "L": L, "d_model": d, "n_layer": nl,
                  "residuals": "bf16"},
        "calibration": {k: round(v, 1) for k, v in cal.items()},
        "xla_cost_analysis": {
            "bytes_accessed_per_step_gb": round(bytes_step / 1e9, 2),
            "xla_flops_per_step_g": round(xla_flops / 1e9, 1),
            "pallas_conv_flops_supplement_g": round(
                conv_flops_supplement() / 1e9, 1),
            "total_flops_per_step_g": round(flops_step / 1e9, 1),
        },
        "measured_ms_per_step": round(ms_step, 2),
        "tokens_per_sec": round(tok_s, 0),
        "floors_ms": {
            "hbm_at_sustained_model_bw": round(floor_hbm_ms_hi, 1),
            "hbm_at_asymptotic_bw": round(floor_hbm_ms_lo, 1),
            "mxu": round(floor_mxu_ms, 1),
        },
        "pct_of_roofline": {
            "vs_max_floor_asymptotic_bw": round(100 * floor_ms / ms_step, 1),
            "vs_max_floor_sustained_bw": round(
                100 * max(floor_hbm_ms_hi, floor_mxu_ms) / ms_step, 1),
        },
        "note": ("bytes from XLA's own cost model on the compiled step "
                 "(custom-call operands/outputs included); conv MXU flops "
                 "added analytically (XLA sees custom calls as zero-flop). "
                 "BW calibration is measured on THIS chip, not the v5e "
                 "datasheet: the 819 GB/s spec rate is not observable here "
                 "(asymptotic measured rate at 1 GB round trips is "
                 "~0.55 TB/s; model-tensor-sized streams sustain ~0.27)."),
    }
    (REPO / "artifacts/roofline_32k.json").write_text(
        json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
