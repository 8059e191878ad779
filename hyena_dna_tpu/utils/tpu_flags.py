"""Process-level TPU runtime flags.

The fused Pallas conv kernel (`ops/pallas_fftconv.py`) holds a full
channel-block spectrum in VMEM; at the 32k bench shape its per-program
working set is ~20 MB, above libtpu's default 16 MB scoped-vmem budget,
which kills compilation with a "kernel-vmem-stack-oom". v5e has 128 MB of
VMEM per core, so raising the scoped budget is safe and lets the compiler
hold bigger fusions too. The flag lives in LIBTPU_INIT_ARGS (it is a libtpu
flag, not a client XLA_FLAGS flag) and must be set BEFORE the TPU backend
initializes — call :func:`ensure_tpu_flags` first thing in every CLI entry
point.
"""

from __future__ import annotations

import os

SCOPED_VMEM_KIB = 65536  # 64 MB of the v5e's 128 MB VMEM

# Above this context length the convs run at fft >= 2^20, where every
# fused Pallas conv is measured-and-gated-off (the XLA chain wins on
# 3-factor FLOP scaling) — and the raised scoped-vmem budget makes the
# CHAIN ~15% slower (450k step 1.447 -> 1.667 s with the 64 MB flag:
# libtpu picks worse fusion/scheduling with a larger scoped region). So
# long-context entry points should pass max_seq_len and let the default
# budget stand.
SCOPED_VMEM_MAX_SEQ = 262144


def ensure_tpu_flags(scoped_vmem_kib: int = SCOPED_VMEM_KIB,
                     max_seq_len: int | None = None) -> None:
    """Append TPU runtime flags to LIBTPU_INIT_ARGS if not already present.

    Idempotent; preserves any flags the launcher already set. Must run
    before jax initializes its backend (harmless, but ineffective, after).

    With `max_seq_len` above SCOPED_VMEM_MAX_SEQ the scoped-vmem raise is
    skipped: those runs use the XLA chain conv (no Pallas conv kernel needs
    the budget) and measure ~15% faster under the default budget.
    """
    if max_seq_len is not None and max_seq_len > SCOPED_VMEM_MAX_SEQ:
        return
    flag = f"--xla_tpu_scoped_vmem_limit_kib={scoped_vmem_kib}"
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "--xla_tpu_scoped_vmem_limit_kib" not in cur:
        os.environ["LIBTPU_INIT_ARGS"] = (cur + " " + flag).strip()
