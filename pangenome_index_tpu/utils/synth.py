"""Synthetic pangenome generator for benchmarks and scale tests.

Generates a base "contig" plus N haplotypes (mutated copies), yielding the
run-length structure real pangenome BWTs have (runs scale with mutations, not
text length). The BWT is computed with the oracle's rotation sort; the result
(index arrays) is cached on disk because the bench rebuilds are deterministic.
"""

from __future__ import annotations

import hashlib
import os
import pathlib

import numpy as np

from ..formats.rlbwt import RLBWT, rlbwt_from_text
from ..models.oracle import oracle_from_lines
from ..models.rindex import RIndex, build_rindex_from_sa


def synth_haplotypes(base_len: int, n_haps: int, snp_rate: float = 0.002,
                     seed: int = 0) -> list[bytes]:
    rng = np.random.default_rng(seed)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    base = alphabet[rng.integers(0, 4, base_len)]
    lines = []
    for h in range(n_haps):
        hap = base.copy()
        n_mut = rng.binomial(base_len, snp_rate)
        pos = rng.choice(base_len, size=n_mut, replace=False)
        hap[pos] = alphabet[(np.searchsorted(alphabet, hap[pos]) + rng.integers(1, 4, n_mut)) % 4]
        lines.append(hap.tobytes())
    return lines


def synth_reads(lines: list[bytes], n_reads: int, read_len: int,
                error_rate: float = 0.01, seed: int = 1) -> list[bytes]:
    rng = np.random.default_rng(seed)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    reads = []
    for _ in range(n_reads):
        line = lines[int(rng.integers(len(lines)))]
        a = int(rng.integers(0, len(line) - read_len))
        read = np.frombuffer(line[a : a + read_len], np.uint8).copy()
        n_err = rng.binomial(read_len, error_rate)
        if n_err:
            pos = rng.choice(read_len, size=n_err, replace=False)
            read[pos] = alphabet[rng.integers(0, 4, n_err)]
        reads.append(read.tobytes())
    return reads


def build_synth_index(base_len: int, n_haps: int, snp_rate: float = 0.002,
                      seed: int = 0, cache_dir: str | None = None) -> tuple[RIndex, list[bytes]]:
    """Build (and cache) an r-index over a synthetic pangenome."""
    key = hashlib.sha1(f"{base_len}-{n_haps}-{snp_rate}-{seed}-v1".encode()).hexdigest()[:16]
    cache = pathlib.Path(cache_dir) / f"synth_{key}.npz" if cache_dir else None
    lines = synth_haplotypes(base_len, n_haps, snp_rate, seed)
    if cache is not None and cache.exists():
        z = np.load(cache)
        idx = RIndex(
            run_sym=z["run_sym"], run_start=z["run_start"], run_len=z["run_len"],
            cum=z["cum"], C=z["C"], n=int(z["n"]), n_seq=int(z["n_seq"]),
            max_len=int(z["max_len"]), samples=z["samples"],
            last_sorted=z["last_sorted"], last_to_run=z["last_to_run"],
        )
        return idx, lines
    try:
        from .. import native

        if not native.available():
            raise RuntimeError
        bwt, da, sa_pos, seq_lengths = native.build_bwt_native(lines)
    except Exception:
        oracle = oracle_from_lines(lines)
        bwt, da, sa_pos, seq_lengths = (oracle.bwt, oracle.da, oracle.sa_pos,
                                        oracle.seq_lengths)
    rlbwt = rlbwt_from_text(bwt.tobytes())
    idx = build_rindex_from_sa(rlbwt, da, sa_pos, seq_lengths)
    if cache is not None:
        cache.parent.mkdir(parents=True, exist_ok=True)
        np.savez(  # uncompressed: compression dominated build time at scale
            cache, run_sym=idx.run_sym, run_start=idx.run_start, run_len=idx.run_len,
            cum=idx.cum, C=idx.C, n=idx.n, n_seq=idx.n_seq, max_len=idx.max_len,
            samples=idx.samples, last_sorted=idx.last_sorted, last_to_run=idx.last_to_run,
        )
    return idx, lines
