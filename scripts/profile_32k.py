"""Trace the 32k bench train step and print a per-op device-time table.

Usage: python scripts/profile_32k.py [trace_dir]
Parses the xplane proto from jax.profiler.trace via tensorflow's
profiler analysis if available, else falls back to summing XLA op
durations from the trace-events json.
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

ensure_tpu_flags()
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from hyena_dna_tpu.models import ConvLMHeadModel
from hyena_dna_tpu.tasks import metrics as M
from hyena_dna_tpu.train import build_optimizer
from hyena_dna_tpu.train.step import make_train_step
from flax.training.train_state import TrainState

L, d, nl, B = 32768, 256, 8, 4
layer = dict(_name_="hyena", emb_dim=5, filter_order=64, short_filter_order=3,
             l_max=L, modulate=True, w=10)
model = ConvLMHeadModel(d_model=d, n_layer=nl, d_inner=4 * d, vocab_size=12,
                        pad_vocab_size_multiple=8, residual_in_fp32=True,
                        layer=layer, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
params = jax.jit(model.init)(rng, jnp.zeros((1, L), jnp.int32))["params"]
x = jnp.tile(jnp.asarray((np.arange(L) % 4 + 7), jnp.int32), (B, 1))
y = jnp.roll(x, -1, axis=1)

tx, _ = build_optimizer(params, lr=6e-4)
state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)


@jax.jit
def step(state, x, y):
    def loss_fn(p):
        logits, _ = model.apply({"params": p}, x, deterministic=True)
        return M.cross_entropy(logits, y)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads), loss


state, loss = step(state, x, y)
float(loss)
t0 = time.perf_counter()
for _ in range(5):
    state, loss = step(state, x, y)
float(loss)
wall = (time.perf_counter() - t0) / 5
print(f"wall/step: {wall*1e3:.1f} ms  ({B*L/wall/1e3:.0f}k tok/s)", flush=True)

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace32k"
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        state, loss = step(state, x, y)
    float(loss)

# parse trace.json.gz: SELF-time per op on device lanes (events nest; a
# parent's self time = dur - sum(direct children))
paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
ev = json.loads(gzip.open(paths[-1]).read())["traceEvents"]
dev_pids = set()
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        nm = e["args"].get("name", "")
        if "TPU" in nm and "host" not in nm.lower():
            dev_pids.add(e["pid"])

lanes = defaultdict(list)
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in dev_pids and e.get("dur"):
        lanes[(e["pid"], e.get("tid"))].append(e)

self_time = defaultdict(float)
for lane in lanes.values():
    lane.sort(key=lambda e: (e["ts"], -e["dur"]))
    stack = []  # (end_ts, event, child_sum)
    for e in lane:
        ts, dur = e["ts"], e["dur"]
        while stack and ts >= stack[-1][0] - 1e-9:
            end, pe, csum = stack.pop()
            self_time[pe["name"]] += pe["dur"] - csum
        if stack:
            stack[-1][2] += dur
        stack.append([ts + dur, e, 0.0])
    while stack:
        end, pe, csum = stack.pop()
        self_time[pe["name"]] += pe["dur"] - csum

def bucket(nm):
    if nm.startswith(("fusion", "loop_fusion", "input_fusion", "output_fusion")):
        return "fusion"
    if "custom-call" in nm or "tpu_custom_call" in nm or "custom_call" in nm:
        return "pallas"
    if nm.startswith(("dot", "convolution")) or "matmul" in nm:
        return "matmul"
    if nm.startswith("fft"):
        return "fft"
    if nm.startswith(("copy", "transpose", "bitcast", "reshape")):
        return "copy/transpose"
    if nm.startswith(("while", "body", "condition")) or nm[:1].isdigit():
        return "loop-overhead"
    if nm.startswith("jit_"):
        return "dispatch-gap"
    return "other"

n_steps = 3
buckets = defaultdict(float)
for nm, v in self_time.items():
    buckets[bucket(nm)] += v
total = sum(buckets.values())
for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
    print(f"{k:24s} {v/1e3/n_steps:8.1f} ms/step  {100*v/total:5.1f}%")
print(f"{'TOTAL device':24s} {total/1e3/n_steps:8.1f} ms/step")

print("\ntop ops (self time):")
for k, v in sorted(self_time.items(), key=lambda kv: -kv[1])[:25]:
    print(f"  {v/1e3/n_steps:8.2f} ms/step  {k[:110]}")
