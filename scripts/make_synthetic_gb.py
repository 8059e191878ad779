"""Synthetic GenomicBenchmarks-format classification task (zero-egress
stand-in for `human_nontata_promoters`; same on-disk layout the reference's
`genomic_benchmark` package downloads: dest/<name>/<split>/<class>/*.txt).

Class `positive`: promoter-like sequences — a CpG-island-like GC-rich core
plus degenerate initiator/CCAAT motifs at loosely fixed offsets.
Class `negative`: background genomic composition. A model must combine
motif AND composition cues, so accuracy meaningfully reflects learning.

Usage: python scripts/make_synthetic_gb.py OUT_DIR [--n-train 8000]
"""
import argparse
from pathlib import Path

import numpy as np

BASES = np.array(list("ACGT"))


def degenerate(motif: str, rng, p_mut=0.15) -> str:
    s = list(motif)
    for i in range(len(s)):
        if rng.random() < p_mut:
            s[i] = str(rng.choice(BASES))
    return "".join(s)


def background(n: int, rng, gc=0.41) -> np.ndarray:
    p = np.array([(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2])
    return rng.choice(BASES, size=n, p=p)


def positive(length: int, rng) -> str:
    seq = background(length, rng, gc=0.41)
    # GC-rich core (CpG island surrogate) in the middle third
    core_len = length // 3
    c0 = length // 3
    seq[c0 : c0 + core_len] = background(core_len, rng, gc=0.65)
    # CCAAT box ~ -80 and initiator ~ -2 relative to the 3' end
    for motif, off in (("CCAAT", 80), ("TCAGTT", 30), ("GGGCGG", 55)):
        p = length - off - len(motif) + int(rng.integers(-5, 6))
        p = max(0, min(length - len(motif), p))
        seq[p : p + len(motif)] = list(degenerate(motif, rng))
    return "".join(seq)


def negative(length: int, rng) -> str:
    return "".join(background(length, rng, gc=0.41))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--name", default="synthetic_promoters")
    ap.add_argument("--n-train", type=int, default=8000)
    ap.add_argument("--n-test", type=int, default=2000)
    ap.add_argument("--length", type=int, default=251)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    for split, n in (("train", args.n_train), ("test", args.n_test)):
        for cls, gen in (("positive", positive), ("negative", negative)):
            d = Path(args.out_dir) / args.name / split / cls
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n // 2):
                (d / f"{i}.txt").write_text(gen(args.length, rng))
        print(f"{split}: {n} sequences", flush=True)
    print(f"wrote {Path(args.out_dir) / args.name}")


if __name__ == "__main__":
    main()
