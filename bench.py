"""Throughput benchmark: tokens/sec/chip for a HyenaDNA training step.

Runs on whatever single accelerator is available (real TPU chip under the
driver; CPU locally) and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "tokens/s/chip", "vs_baseline": N}

Model: hyenadna-small-32k shape scaled to the benchmark sequence length —
d_model=256, 8 layers (reference `configs/evals/hyena_dna_512ksl.yaml:4-7`),
bf16 activations, full train step (fwd+bwd+AdamW update), which is the
reference's headline workload (hg38 pretraining, `README.md:205`).

`vs_baseline` compares against the A100-80GB reference estimate recorded in
BASELINE_NUMBERS below (tokens/s for the same shape on the reference CUDA
stack); update as real measurements land in BENCH_r*.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

ensure_tpu_flags()  # must precede TPU backend init (scoped-vmem budget)

import jax

def _enable_compile_cache():
    """Persistent XLA compilation cache: long-context programs take minutes
    to compile; cache survives process restarts (seqlen-warmup stages, bench
    reruns)."""
    import os

    import jax as _jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    try:
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass


_enable_compile_cache()
# Hardware RNG for dropout masks: threefry generates the (B, L, d) embed-
# dropout mask in software (~33.5M counters/step at the bench shape); the
# TPU's rbg PRNG produces the same-quality stream from the hardware
# generator at a fraction of the cost. Same knob the reference's CUDA
# dropout kernels turn (curand), expressed the JAX way.
try:
    jax.config.update("jax_default_prng_impl", "rbg")
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

# Reference-stack throughput anchor: tokens/s for the same train step
# (d=256 x 8 layers, L=32768, bf16) on one A100-80GB with the reference
# torch+cuFFT stack (its fused fftconv CUDA kernel caps at seqlen 8192, so
# this shape runs the torch.fft fallback). Roofline-derived: ~118 GB HBM
# traffic/step at ~72% of the A100's 2.0 TB/s => 1.6M tokens/s — generous
# to the reference (a >60-launch eager chain rarely sustains 72%). Full
# derivation: BASELINE.md "Roofline-derived throughput anchor".
BASELINE_NUMBERS = {
    "small-32k-trainstep": 1_600_000.0,
}


def main():
    # fallback ladder: if the device stalls/errors at a shape, retry smaller.
    # Each shape gets 2 attempts: remote-compile 500s through the tunnel are
    # frequently transient, and the persistent compile cache makes the second
    # attempt cheap if the first died after partial compilation.
    for shape in ((32768, 256, 8, 4), (32768, 256, 8, 1), (16384, 256, 8, 1),
                  (8192, 256, 8, 1), (1024, 128, 2, 1)):
        for attempt in range(2):
            try:
                return run_bench(*shape)
            except Exception as e:  # tunnel hiccups / OOM: degrade, never crash
                print(f"# bench shape {shape} attempt {attempt} failed: "
                      f"{str(e)[:200]}", file=sys.stderr)
                time.sleep(5)
    print(json.dumps({"metric": "hg38_trainstep_tokens_per_sec_chip",
                      "value": 0.0, "unit": "tokens/s/chip", "vs_baseline": 0.0}))
    return 0


def run_bench(seq_len, d_model, n_layer, batch):
    backend = jax.default_backend()
    if backend == "cpu":
        # local smoke run: shrink so the bench finishes quickly
        seq_len, d_model, n_layer, batch = 4096, 128, 2, 1

    from hyena_dna_tpu.models import ConvLMHeadModel
    from hyena_dna_tpu.tasks import LMTask
    from hyena_dna_tpu.train import build_optimizer, create_train_state
    from hyena_dna_tpu.train.step import make_train_step

    layer = dict(
        _name_="hyena", emb_dim=5, filter_order=64, short_filter_order=3,
        l_max=seq_len + 2, modulate=True, w=10, lr=6e-4, wd=0.0, lr_pos_emb=0.0,
    )
    # Residual-stream dtype: the f32 residual+LN glue is ~20.7 ms of the
    # 120 ms step at 32k (scripts/decompose_32k.py) and runs at ~85% of its
    # traffic floor — the lever is halving the stream itself. bf16 residuals
    # (f32 master weights stay in the optimizer) showed no measurable
    # loss-curve drift at the reference hg38 recipe (scripts/resid_drift.py,
    # results in STATUS.md), so the bench defaults to bf16; set
    # BENCH_RESIDUAL_F32=1 for the reference-parity f32 stream.
    resid_f32 = os.environ.get("BENCH_RESIDUAL_F32", "0") == "1"
    model = ConvLMHeadModel(
        d_model=d_model, n_layer=n_layer, d_inner=4 * d_model, vocab_size=12,
        pad_vocab_size_multiple=8, residual_in_fp32=resid_f32, layer=layer,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, seq_len), jnp.int32)
    params = jax.jit(model.init)(rng, sample)["params"]
    tx, _ = build_optimizer(params, lr=6e-4, weight_decay=0.1)
    state = create_train_state(model, tx, rng, sample, params=params)

    from hyena_dna_tpu.train.step import make_multistep_train_step

    x = jnp.asarray(np.tile((np.arange(seq_len) % 4 + 7).astype(np.int32), (batch, 1)))
    y = jnp.roll(x, -1, axis=1)

    # K steps per dispatch (lax.scan inside one executable) so the number
    # measures device throughput, not per-dispatch tunnel latency; float()
    # forces a device->host readback as the hard sync
    iters = 20 if backend != "cpu" else 2
    step = make_multistep_train_step(LMTask(), steps_per_call=iters)
    xs = jnp.broadcast_to(x, (iters, *x.shape))
    ys = jnp.broadcast_to(y, (iters, *y.shape))

    state, m = step(state, (xs, ys), jax.random.PRNGKey(0))  # compile+warm
    float(m["loss"][-1])

    windows = 3 if backend != "cpu" else 1
    best_dt = float("inf")
    for w in range(windows):
        t0 = time.perf_counter()
        state, m = step(state, (xs, ys), jax.random.PRNGKey(w))
        float(m["loss"][-1])  # hard sync
        best_dt = min(best_dt, time.perf_counter() - t0)

    tokens_per_sec = batch * seq_len * iters / best_dt
    baseline = BASELINE_NUMBERS["small-32k-trainstep"]
    result = {
        "metric": f"hg38_trainstep_tokens_per_sec_chip_L{seq_len}_d{d_model}x{n_layer}",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tokens_per_sec / baseline, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
