"""Generate a synthetic hg38 surrogate (fasta + bed) for end-to-end runs.

Zero-egress stand-in for the real hg38 download the reference uses
(`/root/reference/README.md:180-199`): same file formats, same datamodule
path. The sequence has learnable structure so LM loss demonstrably drops
below the iid 2-bit floor:
  * GC isochores (smoothed random GC content, 30-60%)
  * Alu-like ~300 bp repeat family (~10% of the genome, 10% point mutations)
  * microsatellite expansions (ACn / CAGn)
  * N runs (centromere/telomere surrogate)

Usage: python scripts/make_synthetic_genome.py OUT_DIR [--bases 64000000]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

BASES = np.frombuffer(b"ACGT", np.uint8)


def make_chrom(n: int, rng: np.random.Generator) -> np.ndarray:
    # GC isochores: piecewise-constant GC over 50kb blocks, smoothed
    nblk = n // 50_000 + 1
    gc = np.clip(0.45 + 0.12 * rng.standard_normal(nblk), 0.30, 0.60)
    gc = np.repeat(gc, 50_000)[:n]
    u = rng.random(n)
    # P(G or C) = gc; within each pair, uniform
    is_gc = u < gc
    u2 = rng.random(n)
    seq = np.where(is_gc, np.where(u2 < 0.5, ord("G"), ord("C")),
                   np.where(u2 < 0.5, ord("A"), ord("T"))).astype(np.uint8)

    # Alu-like repeat family
    alu = BASES[rng.integers(0, 4, 300)]
    n_copies = int(n * 0.10 / 300)
    pos = rng.integers(0, n - 300, n_copies)
    for p in pos:
        copy = alu.copy()
        mut = rng.random(300) < 0.10
        copy[mut] = BASES[rng.integers(0, 4, int(mut.sum()))]
        seq[p : p + 300] = copy

    # microsatellites
    for motif in (b"AC", b"CAG", b"AT"):
        m = np.frombuffer(motif, np.uint8)
        for _ in range(n // 2_000_000 + 1):
            p = int(rng.integers(0, n - 600))
            reps = int(rng.integers(20, 200))
            tract = np.tile(m, reps)[: min(600, n - p)]
            seq[p : p + len(tract)] = tract

    # N runs at the ends and one centromere
    tel = min(10_000, n // 100)
    seq[:tel] = ord("N")
    seq[-tel:] = ord("N")
    c = n // 2
    seq[c : c + min(50_000, n // 50)] = ord("N")
    return seq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--bases", type=int, default=64_000_000)
    ap.add_argument("--chroms", type=int, default=4)
    ap.add_argument("--window", type=int, default=1024,
                    help="bed interval size (the dataset crops the interval "
                         "head to max_length, so intervals ARE the samples)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    per = args.bases // args.chroms
    fa = out / "synthetic_hg38.fa"
    bed = out / "synthetic_hg38.bed"
    with open(fa, "w") as ff, open(bed, "w") as bf:
        for ci in range(args.chroms):
            name = f"chr{ci + 1}"
            seq = make_chrom(per, rng)
            ff.write(f">{name}\n")
            # one uniform 80-col wrap over the WHOLE record: faidx assumes
            # every line but the last has identical length, so chunked
            # wrapping (the old 2^16-byte chunks left a short line per
            # chunk) silently breaks coordinate math in any faidx reader
            text = seq.tobytes().decode()
            for j in range(0, per, 80):
                ff.write(text[j : j + 80] + "\n")
            # splits like the reference bed: most of each chrom train, a
            # held-out tail split into valid/test windows
            train_end = int(per * 0.90)
            val_end = int(per * 0.95)
            win = args.window
            for s in range(0, train_end - win, win):
                bf.write(f"{name}\t{s}\t{s + win}\ttrain\n")
            for s in range(train_end, val_end - win, win):
                bf.write(f"{name}\t{s}\t{s + win}\tvalid\n")
            for s in range(val_end, per - win, win):
                bf.write(f"{name}\t{s}\t{s + win}\ttest\n")
            print(f"{name}: {per} bases", flush=True)
    print(f"wrote {fa} and {bed}")


if __name__ == "__main__":
    main()
