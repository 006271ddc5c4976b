"""Genome indexing for locate / map / view -g: code -> locations.

Reference: unikmer/cmd/locate.go:143-231 (code -> [(seqIdx,pos)...]) and
util.go:344-393 loadHash2Loc (hash -> one (seqIdx,pos)).

TPU-first design: instead of a Go map of slices, the index is a sorted
coordinate table: encode every window of every sequence on device
(models/count.window_codes), then argsort by code.  Lookups are
vectorized binary searches returning [start,end) ranges per query; the
stable sort keeps genome order within each code's range.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..io.fastx import read_fastx
from ..ops import codec
from .count import CountConfig, linear_codes_step, pad_bases


@dataclass
class GenomeIndex:
    codes: np.ndarray  # sorted uint64
    seq_idx: np.ndarray  # int32, parallel to codes
    pos: np.ndarray  # int64, parallel to codes
    sequences: list[bytes]  # possibly circular-extended
    ids: list[bytes]
    seq_file: np.ndarray  # int32 genome-file index per sequence
    k: int


def build_genome_index(
    genome_files,
    k: int,
    hashed: bool,
    circular: bool = False,
    name_filters=None,
) -> GenomeIndex:
    """Index every (canonical) window of the genomes."""
    cfg = CountConfig(k=k, canonical=True, hashed=hashed, circular=False)
    sequences: list[bytes] = []
    ids: list[bytes] = []
    seq_file: list[int] = []
    all_codes: list[np.ndarray] = []
    all_idx: list[np.ndarray] = []
    all_pos: list[np.ndarray] = []
    for fi, gf in enumerate(genome_files):
        for rec in read_fastx(gf):
            if name_filters and any(r.search(rec.name) for r in name_filters):
                continue
            if len(rec.seq) < k:
                continue
            seq = rec.seq
            if circular:
                seq = seq + seq[: k - 1]
            bases = codec.BASE_LUT[np.frombuffer(seq, dtype=np.uint8)]
            codes, valid = linear_codes_step(pad_bases(bases), cfg)
            codes = np.asarray(codes)
            valid = np.asarray(valid)
            npos = len(seq) - k + 1
            positions = np.flatnonzero(valid[:npos])
            all_codes.append(codes[positions])
            all_idx.append(np.full(len(positions), len(sequences), np.int32))
            all_pos.append(positions.astype(np.int64))
            sequences.append(seq)
            ids.append(rec.id)
            seq_file.append(fi)
    if all_codes:
        codes = np.concatenate(all_codes)
        seq_idx = np.concatenate(all_idx)
        pos = np.concatenate(all_pos)
        order = np.argsort(codes, kind="stable")
        codes, seq_idx, pos = codes[order], seq_idx[order], pos[order]
    else:
        codes = np.zeros(0, np.uint64)
        seq_idx = np.zeros(0, np.int32)
        pos = np.zeros(0, np.int64)
    return GenomeIndex(
        codes=codes,
        seq_idx=seq_idx,
        pos=pos,
        sequences=sequences,
        ids=ids,
        seq_file=np.asarray(seq_file, np.int32),
        k=k,
    )


def lookup_ranges(index: GenomeIndex, queries: np.ndarray):
    """[start, end) range in the index for each query code."""
    start = np.searchsorted(index.codes, queries, side="left")
    end = np.searchsorted(index.codes, queries, side="right")
    return start, end


def load_hash2loc(genome_files, k: int):
    """view -g support: hash -> one (seqIdx, pos).  Returns
    (sequences, GenomeIndex limited to first occurrence)."""
    idx = build_genome_index(genome_files, k, hashed=True, circular=False)
    return idx.sequences, idx


def lookup_hashes(index: GenomeIndex, queries: np.ndarray):
    """(found, seq_idx, pos) per query hash (first genome occurrence)."""
    start, end = lookup_ranges(index, queries)
    found = start < end
    s = np.where(found, start, 0)
    return found, index.seq_idx[s], index.pos[s]
