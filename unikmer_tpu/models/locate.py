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

from .. import native
from ..io.fastx import read_fastx
from ..ops import codec
from .count_host import linear_windows_host

# NOTE: models.count (device pipeline) is imported lazily — with the
# native library present the genome index builds jax-free, so locate /
# map / view -g keep the 0.4 s host CLI startup.


@dataclass
class GenomeIndex:
    codes: np.ndarray  # sorted uint64
    seq_idx: np.ndarray  # int32, parallel to codes
    pos: np.ndarray  # int64, parallel to codes
    sequences: list[bytes]  # possibly circular-extended
    ids: list[bytes]
    seq_file: np.ndarray  # int32 genome-file index per sequence
    k: int
    _blob: np.ndarray | None = None
    _blob_offs: np.ndarray | None = None

    def seq_blob(self):
        """(concatenated sequence bytes, per-sequence start offsets) for
        vectorized substring gathers (view -g bulk decode)."""
        if self._blob is None:
            self._blob = np.frombuffer(b"".join(self.sequences), np.uint8)
            lens = np.fromiter(
                (len(s) for s in self.sequences), np.int64,
                len(self.sequences),
            )
            offs = np.zeros(len(lens), np.int64)
            np.cumsum(lens[:-1], out=offs[1:])
            self._blob_offs = offs
        return self._blob, self._blob_offs

    def gather_kmers(self, seq_idx: np.ndarray, pos: np.ndarray) -> np.ndarray:
        """(n, k) ASCII matrix of the genome k-mers at (seq_idx, pos)."""
        blob, offs = self.seq_blob()
        start = offs[seq_idx] + pos
        return blob[start[:, None] + np.arange(self.k, dtype=np.int64)]


def build_genome_index(
    genome_files,
    k: int,
    hashed: bool,
    circular: bool = False,
    name_filters=None,
) -> GenomeIndex:
    """Index every (canonical) window of the genomes."""
    sequences: list[bytes] = []
    ids: list[bytes] = []
    seq_file: list[int] = []
    for fi, gf in enumerate(genome_files):
        for rec in read_fastx(gf):
            if name_filters and any(r.search(rec.name) for r in name_filters):
                continue
            if len(rec.seq) < k:
                continue
            seq = rec.seq
            if circular:
                seq = seq + seq[: k - 1]
            sequences.append(seq)
            ids.append(rec.id)
            seq_file.append(fi)
    if sequences:
        # one packed buffer, ONE device pass for every window of every
        # sequence (was one device invocation per record — pathological
        # for multi-contig assemblies); separators mask cross-record
        # windows exactly like the count pipeline
        joined = b"\n".join(sequences) + b"\n"
        bases = codec.BASE_LUT[np.frombuffer(joined, dtype=np.uint8)]
        starts = np.zeros(len(sequences), np.int64)
        lens = np.fromiter((len(s) for s in sequences), np.int64,
                           len(sequences))
        np.cumsum(lens[:-1] + 1, out=starts[1:])
        res = linear_windows_host(bases, k, True, hashed)
        if res is not None:
            codes, flat = res
        else:  # no native toolchain: device pipeline
            from .count import CountConfig, linear_codes_all

            cfg = CountConfig(k=k, canonical=True, hashed=hashed,
                              circular=False)
            codes, flat = linear_codes_all(bases, cfg)
        seq_idx = (
            np.searchsorted(starts, flat, side="right") - 1
        ).astype(np.int32)
        pos = flat - starts[seq_idx]
        codes, order = native.host_argsort(codes)
        seq_idx, pos = seq_idx[order], pos[order]
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
