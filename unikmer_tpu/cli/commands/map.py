"""map (alias uniqs): map k-mers to genomes and extract maximal
consecutively-matching regions as BED3 or FASTA.

Reference: unikmer/cmd/map.go — a region is a run of matched k-mer
starts, optionally tolerating up to -X gaps of at most -x consecutive
unmatched k-mers, ending at the last match; multiply-mapped k-mers
terminate regions unless -M; min region length -m; circular genomes scan
a doubled sequence with the end clamped to one full length.

The membership and multi-mapping masks are computed vectorized (device
encode + sorted-array search); the region state machine then runs over
match RUNS (not positions), which is tiny.
"""

from __future__ import annotations

import re
import sys

import numpy as np

from ...io.fastx import read_fastx
from ...ops import codec
from ...utils.log import die, log
from ..opts import out_text_stream
from ._common import add_files_arg, new_command, open_reader, unik_inputs


def register(subparsers):
    p = new_command(
        subparsers, "map",
        "Mapping k-mers back to the genome and extracting successive regions/subsequences",
        aliases=["uniqs"],
    )
    add_files_arg(p)
    p.add_argument("-B", "--seq-name-filter", action="append", default=[],
                   help="regular expressions for filtering out sequences by header/name, case ignored")
    p.add_argument("-o", "--out-prefix", default="-",
                   help='out file prefix ("-" for stdout)')
    p.add_argument("-g", "--genome", action="append", default=[],
                   help="genomes in (gzipped) fasta file(s)")
    p.add_argument("-m", "--min-len", type=int, default=200,
                   help="minimum length of subsequence")
    p.add_argument("-M", "--allow-multiple-mapped-kmers", action="store_true",
                   help="allow multiple mapped k-mers")
    p.add_argument("-W", "--seqs-in-a-file-as-one-genome", action="store_true",
                   help="treat seqs in a genome file as one genome")
    p.add_argument("-a", "--output-fasta", action="store_true",
                   help="output fasta format instead of BED3")
    p.add_argument("-x", "--max-gap-size", type=int, default=0,
                   help="max gap size (the number of consecutive unmapped k-mers)")
    p.add_argument("-X", "--max-gap-num", type=int, default=0,
                   help="max number of gaps (consecutive unmapped k-mers)")
    p.add_argument("--circular", action="store_true", help="circular genome")
    p.set_defaults(func=run)


def run(args) -> int:
    opt, files = unik_inputs(args)
    if not args.genome:
        die("flag -g/--genome needed")
    name_res = []
    for kw in args.seq_name_filter:
        if "(?i)" not in kw:
            kw = "(?i)" + kw
        name_res.append(re.compile(kw.encode()))

    # load query k-mer set from .unik files
    k = None
    hashed = False
    qsets = []
    for f in files:
        with open_reader(f) as r:
            if k is None:
                k = r.header.k
                hashed = r.header.is_hashed
                if not r.header.is_canonical:
                    die(f"{f}: 'canonical' flag is needed")
            elif r.header.k != k:
                die(f"k mismatch: {f}")
            codes, _ = r.read_all()
            qsets.append(codes)
    query = np.unique(np.concatenate(qsets)) if qsets else np.zeros(0, np.uint64)
    if opt.verbose:
        log.info(f"{len(query)} k-mers loaded")


    # pre-scan genomes for multiply-mapped query k-mers per genome unit
    # (map.go:172-284); a unit is one sequence, or one file with -W
    multi_per_unit: list[np.ndarray] = []
    unit_records: list[list] = []
    if not args.allow_multiple_mapped_kmers:
        for gf in args.genome:
            unit_codes: list[np.ndarray] = []
            for rec in read_fastx(gf):
                if name_res and any(r.search(rec.name) for r in name_res):
                    continue
                if len(rec.seq) < k:
                    continue
                codes = _seq_codes(rec.seq, k, hashed, args.circular)
                if args.seqs_in_a_file_as_one_genome:
                    unit_codes.append(codes)
                else:
                    multi_per_unit.append(_multi_mapped(codes, query))
            if args.seqs_in_a_file_as_one_genome and unit_codes:
                multi_per_unit.append(_multi_mapped(np.concatenate(unit_codes), query))

    out, _ = out_text_stream(args.out_prefix, opt.compression_level)
    try:
        unit = 0
        for gf in args.genome:
            if opt.verbose:
                log.info(f"reading genome file: {gf}")
            file_unit = unit
            for rec in read_fastx(gf):
                if name_res and any(r.search(rec.name) for r in name_res):
                    continue
                if len(rec.seq) < k:
                    continue
                if args.allow_multiple_mapped_kmers:
                    m2 = None
                else:
                    ui = file_unit if args.seqs_in_a_file_as_one_genome else unit
                    m2 = multi_per_unit[ui] if ui < len(multi_per_unit) else None
                _map_one(rec, k, hashed, query, m2, args, out)
                if not args.seqs_in_a_file_as_one_genome:
                    unit += 1
            if args.seqs_in_a_file_as_one_genome:
                unit += 1
    finally:
        out.flush()
        if out is not sys.stdout:
            out.close()
    return 0


def _seq_codes(seq: bytes, k: int, hashed: bool,
               circular: bool) -> np.ndarray:
    from ...models.count_host import linear_windows_host

    if circular:
        seq = seq + seq  # doubled (map.go:338-340)
    bases = codec.BASE_LUT[np.frombuffer(seq, dtype=np.uint8)]
    res = linear_windows_host(bases, k, True, hashed)
    if res is not None:
        codes, pos = res
    else:  # no native toolchain: device pipeline
        from ...models.count import CountConfig, linear_codes_all

        codes, pos = linear_codes_all(
            bases, CountConfig(k=k, canonical=True, hashed=hashed))
    n = len(seq) - k + 1
    out = np.full(n, np.uint64(codec.CODE_SENTINEL), np.uint64)
    keep = pos < n
    out[pos[keep]] = codes[keep]
    return out


def _multi_mapped(codes: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Sorted array of query codes occurring >= 2 times in this unit."""
    hits = codes[_member(query, codes)]
    if len(hits) == 0:
        return np.zeros(0, np.uint64)
    u, c = np.unique(hits, return_counts=True)
    return u[c >= 2]


def _member(sorted_ref: np.ndarray, vals: np.ndarray) -> np.ndarray:
    if len(sorted_ref) == 0:
        return np.zeros(len(vals), bool)
    idx = np.minimum(np.searchsorted(sorted_ref, vals), len(sorted_ref) - 1)
    return sorted_ref[idx] == vals


def _map_one(rec, k, hashed, query, m2, args, out):
    length0 = len(rec.seq)
    codes = _seq_codes(rec.seq, k, hashed, args.circular)
    match = _member(query, codes)
    term = (
        _member(m2, codes) & match if m2 is not None and len(m2) else
        np.zeros(len(codes), bool)
    )
    seq = rec.seq + rec.seq if args.circular else rec.seq
    rid = rec.id.decode()

    def emit(start: int, lastmatch: int):
        if start < 0 or lastmatch - start + k < args.min_len:
            return
        if args.circular and lastmatch - start + k > length0:
            lastmatch = length0 - k + start
        if args.output_fasta:
            sub = seq[start : lastmatch + k].decode()
            wrapped = "\n".join(sub[i : i + 60] for i in range(0, len(sub), 60))
            out.write(f">{rid}:{start + 1}-{lastmatch + k}\n{wrapped}\n")
        else:
            out.write(f"{rid}\t{start}\t{lastmatch + k}\n")

    # run-level state machine over match runs split by terminators
    n = len(codes)
    match_eff = match & ~term
    # find runs of consecutive effective matches
    padded = np.zeros(n + 2, bool)
    padded[1:-1] = match_eff
    starts = np.flatnonzero(padded[1:] & ~padded[:-1])
    ends = np.flatnonzero(padded[:-1] & ~padded[1:]) - 1  # inclusive end
    term_pos = np.flatnonzero(term)

    cur_start = -1
    cur_last = -1
    gapn = 0
    ti = 0
    for s, e in zip(starts, ends):
        # terminators strictly between cur_last and s close the region
        while ti < len(term_pos) and term_pos[ti] < s:
            if cur_start >= 0 and term_pos[ti] > cur_last:
                emit(cur_start, cur_last)
                cur_start, cur_last, gapn = -1, -1, 0
            ti += 1
        if args.circular and s >= length0 and cur_start < 0:
            break
        if cur_start < 0:
            cur_start, cur_last, gapn = int(s), int(e), 0
            continue
        gap = int(s) - cur_last - 1
        if gap == 0:
            cur_last = int(e)
        elif gap <= args.max_gap_size and gapn + 1 <= args.max_gap_num:
            gapn += 1
            cur_last = int(e)
        else:
            emit(cur_start, cur_last)
            if args.circular and s >= length0:
                cur_start, cur_last, gapn = -1, -1, 0
                break
            cur_start, cur_last, gapn = int(s), int(e), 0
    if cur_start >= 0:
        emit(cur_start, cur_last)
