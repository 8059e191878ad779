"""Profile one long-context train step with the JAX profiler and print a
per-op table aggregated from the device trace (works on the axon
platform: verified the trace carries device op events).

Usage: python scripts/profile_step.py [450k|1m|64k...] [out.json]
"""
import glob
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

_MODE_SEQ = {"450k": 450048, "1m": 1000448, "64k": 65534,
             "128k": 131070, "256k": 262142}
mode = sys.argv[1] if len(sys.argv) > 1 else "450k"
L = _MODE_SEQ[mode]
ensure_tpu_flags(max_seq_len=L)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from hyena_dna_tpu.models import ConvLMHeadModel
from hyena_dna_tpu.tasks import LMTask
from hyena_dna_tpu.train import build_optimizer, create_train_state
from hyena_dna_tpu.train.step import make_train_step

d, nl, B = 256, 8, 1
rro = mode == "1m"
if mode == "1m":
    import hyena_dna_tpu.ops.fftconv as FF

    FF.FFTCONV_CHUNK_BUDGET = 1 << 26
layer = dict(_name_="hyena", emb_dim=5, filter_order=64,
             short_filter_order=3, l_max=L + 2, modulate=True, w=10,
             use_pallas_front=(True if mode == "450k" else None))
model = ConvLMHeadModel(d_model=d, n_layer=nl, d_inner=4 * d, vocab_size=12,
                        pad_vocab_size_multiple=8, residual_in_fp32=False,
                        layer=layer, checkpoint_mixer=True,
                        checkpoint_mlp=True, remat_residual_only=rro,
                        remat_group_size=1,
                        dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
params = jax.jit(model.init)(rng, jnp.zeros((1, L), jnp.int32))["params"]
tx, _ = build_optimizer(params, lr=6e-4)
state = create_train_state(model, tx, rng, jnp.zeros((1, L), jnp.int32),
                           params=params)
x = jnp.tile(jnp.asarray((np.arange(L) % 4 + 7), jnp.int32), (B, 1))
y = jnp.roll(x, -1, axis=1)
step = make_train_step(LMTask())
t0 = time.perf_counter()
state, m = step(state, (x, y), rng)
jax.block_until_ready(m["loss"])
print(f"compile+step1 {time.perf_counter()-t0:.0f}s", flush=True)

trace_dir = f"/tmp/jaxtrace_{mode}"
with jax.profiler.trace(trace_dir):
    for i in range(2):
        state, m = step(state, (x, y), jax.random.PRNGKey(i))
    jax.block_until_ready(m["loss"])

# parse newest trace
paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
d0 = json.load(gzip.open(paths[-1]))
evs = d0["traceEvents"]
agg = {}
for e in evs:
    if e.get("ph") != "X":
        continue
    nm = e.get("name", "")
    if nm.startswith("$") or nm.startswith("PjitFunction") or \
       nm.startswith("Pjit") or "jit_train_step" in nm or nm.startswith("jit_"):
        continue
    a = agg.setdefault(nm, [0, 0.0])
    a[0] += 1
    a[1] += e.get("dur", 0)

rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
total = sum(v[1] for _, v in rows)
print(f"{'us_total':>10} {'count':>6}  name   (2 steps; total {total/1e3:.1f} ms)")
out = []
for nm, (c, dur) in rows[:60]:
    print(f"{dur:10.0f} {c:6d}  {nm[:90]}")
    out.append({"name": nm, "count": c, "us": dur})
for nm, (c, dur) in rows[60:]:
    out.append({"name": nm, "count": c, "us": dur})
if len(sys.argv) > 2:
    Path(sys.argv[2]).write_text(json.dumps(
        {"mode": mode, "steps": 2, "rows": out}, indent=2))
