"""Dump the optimized HLO of a long-context train step and attribute the
non-custom-call op families (convolution/pad/copy/fusion) to their JAX
source locations via op metadata.

Usage: python scripts/hlo_attrib.py [450k|1m|...] [out.txt]

Why: the device trace (scripts/profile_step.py) gives per-family ms but
the family names (convolution_add_fusion, pad, copy) don't say WHICH
model line emits them; the metadata in the compiled module does.
"""
import re
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

_MODE_SEQ = {"450k": 450048, "1m": 1000448, "64k": 65534,
             "128k": 131070, "256k": 262142, "32k": 32768}
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
lowered = jax.jit(step).lower(state, (x, y), rng)
compiled = lowered.compile()
print(f"compile {time.perf_counter()-t0:.0f}s", flush=True)
txt = compiled.as_text()
out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/hlo_{mode}.txt"
Path(out).write_text(txt)
print(f"wrote {out} ({len(txt)/1e6:.1f} MB)", flush=True)

# ---- attribution: per top-level op kind, group by metadata op_name ----
# entry computation ops look like: "  %name = type op(...) ... metadata={op_name=...}"
kind_of = defaultdict(lambda: defaultdict(int))
shapes_of = defaultdict(lambda: defaultdict(set))
op_re = re.compile(r"= ([a-z0-9\[\],\{\} ]+?) (convolution|pad|copy|transpose|reshape|slice|convert|reduce)\(")
meta_re = re.compile(r"op_name=\"([^\"]+)\"")
for line in txt.splitlines():
    m = op_re.search(line)
    if not m:
        continue
    shape, kind = m.group(1).strip(), m.group(2)
    mm = meta_re.search(line)
    name = mm.group(1) if mm else "<no-meta>"
    # compress the name: strip jit prefixes, keep trailing 3 segments
    segs = name.split("/")
    short = "/".join(segs[-4:])
    kind_of[kind][short] += 1
    shapes_of[kind][short].add(shape)

for kind in ("convolution", "pad", "copy", "transpose", "slice", "convert"):
    print(f"\n=== {kind} ===")
    for name, cnt in sorted(kind_of[kind].items(), key=lambda kv: -kv[1])[:20]:
        ss = "; ".join(sorted(shapes_of[kind][name]))[:160]
        print(f"  {cnt:4d}x {name}\n        {ss}")
