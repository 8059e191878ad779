"""Pin the conv-dispatch routing table.

The dispatch surface is five-way (XLA chain / chain-matmul / packed fused
/ narrow / outer-radix) across ops/fftconv.py, ops/pallas_fftconv.py and
ops/pallas_fftconv_n3.py, gated by size, batch parity, channel count and
context length. Every cell below was BENCHMARKED on v5e (the measured
winner recorded next to it); this test asserts the plan precedence still
selects it, so a future refactor cannot silently de-route a measured
winner. The precedence here mirrors `_fftconv_fwd`
(ops/fftconv.py:508-560) branch-for-branch; behavioral engagement of the
outer path through the public custom_vjp is covered by
tests/test_fftconv_outer.py::test_routed_custom_vjp_grads.
"""

import jax
import pytest

import hyena_dna_tpu.ops.fftconv  # noqa: F401
import sys

F = sys.modules["hyena_dna_tpu.ops.fftconv"]
import hyena_dna_tpu.ops.pallas_fftconv as PF
import hyena_dna_tpu.ops.pallas_fftconv_n3 as PO


@pytest.fixture
def on_tpu(monkeypatch):
    # the plan gates check the backend; route statically as if on TPU
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def route(n, B, C, L):
    """Mirror of _fftconv_fwd's branch precedence, returning a label."""
    assert not F.ENABLE_PACKED_MXU  # measured-and-rejected experiment
    spec = PO.plan_outer(n, C, L, B)
    if spec is not None:
        return ("outer", spec)
    p = PF.plan(n, C, L, F._nat_chain(n))
    if p is not None and p[2] < 8:
        return ("narrow", p)
    if F._use_mxu_fft(n, B * C):
        if p is not None:
            if PF.needs_split_bwd(n):
                return ("fused_split", p)
            return ("fused_packed" if B % 2 == 0 else "fused", p)
        return ("chain",)
    return ("xla",)


# (fft size, B, C, seqlen) -> expected route. Measurements: ROADMAP.md +
# ops/pallas_fftconv_n3.py table (v5e, B=1 C=256 unless stated).
CELLS = [
    # 32k bench shape: packed fused kernel (two real batch rows per
    # complex transform), split-less backward, spectrum-saving
    ((1 << 16), 4, 256, 32768, "fused_packed"),
    ((1 << 16), 1, 256, 32768, "fused"),
    # 64k regime: odd batch -> outer (9.8 ms train vs packed 13.8);
    # even batch keeps the packed kernel (pairing wins)
    ((1 << 17), 1, 256, 65534, "outer"),
    ((1 << 17), 3, 256, 65534, "outer"),
    ((1 << 17), 2, 256, 65534, "fused_packed"),
    # 128k: odd -> outer (17.7 vs packed-split 22.5); even -> split bwd
    # when the row budget allows (B*C = 256 rows); at B=2 x C=256 the
    # 4*rows*n*8 MXU-fft workspace exceeds the 3 GB budget and the conv
    # falls to the XLA path (fftconv_chunked then halves C per chunk)
    ((1 << 18), 1, 256, 131070, "outer"),
    ((1 << 18), 2, 128, 131070, "fused_split"),
    ((1 << 18), 2, 256, 131070, "xla"),
    # 256k/450k/1M: outer for every batch (no fused alternative at these
    # sizes; reference's CUDA kernel caps at fft 16384)
    ((1 << 19), 1, 256, 262142, "outer"),
    ((1 << 19), 2, 256, 262142, "outer"),
    ((1 << 20), 1, 256, 450048, "outer"),
    ((1 << 21), 1, 256, 1000448, "outer"),
]


@pytest.mark.parametrize("n,B,C,L,expect", CELLS)
def test_routing_cell(n, B, C, L, expect, on_tpu):
    label, *plan = route(n, B, C, L)
    assert label == expect, (n, B, C, L, label, plan)
    if expect == "outer":
        assert plan[0] == PO._OUTER_BY_N[n]


def test_outer_capacity_gate(on_tpu):
    # seqlen past the causal-zero-pad capacity must not plan outer
    n = 1 << 20
    n1, r, m = PO._OUTER_BY_N[n]
    cap = (n1 // 2) * r * m
    assert route(n, 1, 256, cap)[0] == "outer"
    assert route(n, 1, 256, cap + 1)[0] != "outer"
