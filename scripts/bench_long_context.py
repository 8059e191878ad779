"""Long-context single-chip benchmark: train-step throughput at 450k / 1M.

Run detached (compiles take >10 min):
  nohup python scripts/bench_long_context.py > /tmp/bench_long.log 2>&1 &
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

# Must run before the backend initializes: without the raised scoped-vmem
# budget the narrow (2^19) fused conv kernels pass their compile-time check
# (per-kernel CompilerParams) but CRASH the TPU worker at runtime. The
# 450k/1m modes (fft >= 2^20, chain conv) keep the DEFAULT budget — the
# raised one makes the chain ~15% slower (1.447 -> 1.667 s/step at 450k).
_MODE_SEQ = {"450k": 450048, "1m": 1000448, "1m_fwd": 1000448,
             "1m_remat": 1000448, "64k": 65534, "128k": 131070,
             "256k": 262142}
ensure_tpu_flags(max_seq_len=_MODE_SEQ.get(
    sys.argv[1] if len(sys.argv) > 1 else "450k", 65534))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from hyena_dna_tpu.models import ConvLMHeadModel
from hyena_dna_tpu.tasks import LMTask
from hyena_dna_tpu.train import build_optimizer, create_train_state
from hyena_dna_tpu.train.step import make_train_step
from hyena_dna_tpu.utils.profiling import device_memory_stats


def run(L, pallas, iters=5, inner_remat=False, rro=False, group=1,
        chunk_budget=None, save_filter=False):
    if chunk_budget is not None:
        import hyena_dna_tpu.ops.fftconv  # noqa: F401
        sys.modules["hyena_dna_tpu.ops.fftconv"].FFTCONV_CHUNK_BUDGET = chunk_budget
    d, nl, B = 256, 8, 1
    # bf16 residual stream is the bench default since round 3 (drift study in
    # STATUS.md round-3); BENCH_RESIDUAL_F32=1 restores the reference-parity
    # f32 stream, matching bench.py's knob.
    resid_f32 = os.environ.get("BENCH_RESIDUAL_F32", "0") == "1"
    layer = dict(_name_="hyena", emb_dim=5, filter_order=64, short_filter_order=3,
                 l_max=L + 2, modulate=True, w=10, use_pallas_front=pallas,
                 inner_remat=inner_remat)
    model = ConvLMHeadModel(d_model=d, n_layer=nl, d_inner=4 * d, vocab_size=12,
                            pad_vocab_size_multiple=8, residual_in_fp32=resid_f32,
                            layer=layer, checkpoint_mixer=True, checkpoint_mlp=True,
                            remat_residual_only=rro, remat_group_size=group,
                            remat_save_filter=save_filter,
                            dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, jnp.zeros((1, L), jnp.int32))["params"]
    tx, _ = build_optimizer(params, lr=6e-4)
    state = create_train_state(model, tx, rng, jnp.zeros((1, L), jnp.int32), params=params)
    x = jnp.tile(jnp.asarray((np.arange(L) % 4 + 7), jnp.int32), (B, 1))
    y = jnp.roll(x, -1, axis=1)
    step = make_train_step(LMTask())
    t0 = time.perf_counter()
    state, m = step(state, (x, y), rng)
    loss0 = float(m["loss"])
    print(f"L={L} pallas={pallas}: compile+step1 {time.perf_counter()-t0:.0f}s "
          f"loss {loss0:.3f}", flush=True)
    print("  mem:", {k: f"{v/1e9:.2f}GB" for k, v in device_memory_stats().items()},
          flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, (x, y), jax.random.PRNGKey(i))
    loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"L={L} pallas={pallas}: {dt*1e3:.0f} ms/step = {B*L/dt/1e6:.3f} M tok/s "
          f"loss {loss:.3f}", flush=True)


def run_fwd(L, iters=3):
    """Inference-only forward at L (reference: 1M inference fits A100-40GB,
    huggingface.py:145)."""
    d, nl, B = 256, 8, 1
    layer = dict(_name_="hyena", emb_dim=5, filter_order=64, short_filter_order=3,
                 l_max=L + 2, modulate=True, w=10)
    model = ConvLMHeadModel(d_model=d, n_layer=nl, d_inner=4 * d, vocab_size=12,
                            pad_vocab_size_multiple=8, residual_in_fp32=True,
                            layer=layer, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, jnp.zeros((1, L), jnp.int32))["params"]
    x = jnp.tile(jnp.asarray((np.arange(L) % 4 + 7), jnp.int32), (B, 1))
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, deterministic=True)[0]
                  .astype(jnp.float32).mean())
    t0 = time.perf_counter()
    out = fwd(params, x)
    jax.block_until_ready(out)
    print(f"L={L} fwd: compile+run1 {time.perf_counter()-t0:.0f}s out {float(out):.4f}",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"L={L} fwd: {dt*1e3:.0f} ms = {B*L/dt/1e6:.2f} M tok/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "450k"
    if which == "450k":
        run(450048, True, save_filter=True)
    elif which == "450k_nosf":
        run(450048, True)
        run(450048, False)
    elif which == "64k":
        # fft size 2^17: the fused 2-pass Pallas conv engages here (cb=8 +
        # 96 MB per-kernel VMEM cap; measured 2.2x over the XLA chain at
        # the conv level)
        run(65534, None, iters=8)
    elif which == "128k":
        # fft size 2^18: the SPLIT-backward fused conv (du kernel + dk-from-
        # specs kernel; scripts/bench_conv_2e18.py measured 21.7 vs 32.3 ms
        # per conv value_and_grad against the XLA chain at B=1, C=256)
        run(131070, None, iters=8)
    elif which == "256k":
        # fft size 2^19: the single-channel narrow fused conv (2-D kernels;
        # scripts/bench_conv_narrow.py measured 45.1 vs 100.4 ms per conv
        # value_and_grad against the XLA chain at B=1, C=256). This is the
        # medium-160k..256k model-zoo context range.
        run(262142, None, iters=6)
    elif which == "1m":
        # single-chip 1M training: residual-only remat cells (group=1 wins
        # once remat_save_conv keeps the conv outputs: 1655 vs group=2's
        # 1717 ms; group=1 + save_filter OOMs by 222 MB) + 64 MB conv
        # chunk budget
        run(1000448, None, rro=True, group=1, chunk_budget=1 << 26)
    elif which == "1m_g1":
        # group=1: more saved residual boundaries (+2 GB) but each cell's
        # backward recomputes one layer instead of two
        run(1000448, None, rro=True, group=1, chunk_budget=1 << 26)
    elif which == "1m_sf":
        run(1000448, None, rro=True, group=2, chunk_budget=1 << 26,
            save_filter=True)
    elif which == "1m_g1sf":
        run(1000448, None, rro=True, group=1, chunk_budget=1 << 26,
            save_filter=True)
    elif which == "1m_fwd":
        run_fwd(1000448)
    elif which == "1m_remat":
        run(1000448, False, inner_remat=True)
    print("DONE", flush=True)
