"""grep: search k-mers from binary files.

Reference: unikmer/cmd/grep.go — queries are k-mers (encoded to
CANONICAL codes, or ntHash following the first file's flags) or taxids
(-t, exact match); results optionally inverted, sorted, uniqued, or
split into per-input output files (-m).
"""

from __future__ import annotations

import itertools
import os
import shutil
import sys

import numpy as np

from ... import native
from ...io import unik
from ...ops import codec
from ...ops.nthash import nthash_kmer
from ...pipeline import extsort
from ...utils.log import die, log
from ..opts import ensure_unik_suffix, out_binary_stream
from ._common import (
    add_files_arg,
    check_taxid_info_match,
    effective_taxids,
    log_saved,
    new_command,
    open_reader,
    unik_inputs,
)

DEFAULT_OUT_SUFFIX = ".grep"

# IUPAC degenerate bases (reference util.go:173-245 extendDegenerateSeq)
IUPAC = {
    "A": "A", "C": "C", "G": "G", "T": "T", "U": "T",
    "M": "AC", "R": "AG", "W": "AT", "S": "CG", "Y": "CT", "K": "GT",
    "V": "ACG", "H": "ACT", "D": "AGT", "B": "CGT", "N": "ACGT",
}


def extend_degenerate(q: str) -> list[str]:
    pools = []
    for ch in q.upper():
        if ch not in IUPAC:
            die(f"invalid degenerate base '{ch}' in query: {q}")
        pools.append(IUPAC[ch])
    n = 1
    for p in pools:
        n *= len(p)
        if n > 100000:
            die(f"too many degenerate expansions for query: {q}")
    return ["".join(t) for t in itertools.product(*pools)]


def register(subparsers):
    p = new_command(subparsers, "grep", "Search k-mers from binary files")
    add_files_arg(p)
    p.add_argument("-o", "--out-prefix", default="-",
                   help='out file prefix ("-" for stdout)')
    p.add_argument("-q", "--query", action="append", default=[],
                   help="query k-mers/taxids (multiple values delimited by comma supported)")
    p.add_argument("-f", "--query-file", action="append", default=[],
                   help="query file (one k-mer/taxid per line)")
    p.add_argument("-F", "--query-unik-file", action="append", default=[],
                   help="query file in .unik format")
    p.add_argument("-t", "--query-is-taxid", action="store_true", help="queries are taxids")
    p.add_argument("-D", "--degenerate", action="store_true",
                   help="query k-mers contain degenerate bases")
    p.add_argument("-v", "--invert-match", action="store_true",
                   help="invert the sense of matching, to select non-matching records")
    p.add_argument("-m", "--multiple-outfiles", action="store_true",
                   help="write results into separated files for multiple input files")
    p.add_argument("-O", "--out-dir", default="unikmer-grep", help="output directory")
    p.add_argument("-S", "--out-suffix", default=DEFAULT_OUT_SUFFIX, help="output suffix")
    p.add_argument("--force", action="store_true", help="overwrite output directory")
    p.add_argument("-s", "--sort", action="store_true",
                   help="sort k-mers. Overrides -c/--compact")
    p.add_argument("-u", "--unique", action="store_true", help="remove duplicate k-mers")
    p.add_argument("-d", "--repeated", action="store_true", help="only print duplicate k-mers")
    p.set_defaults(func=run)


def _collect_query_strings(args) -> list[str]:
    queries: list[str] = []
    for q in args.query:
        queries.extend(s for s in q.split(",") if s)
    for f in args.query_file:
        if not f:
            continue
        with open(f, "rb") as fh:
            for line in fh:
                s = line.strip().decode()
                if s:
                    queries.append(s)
    return queries


def run(args) -> int:
    opt, files = unik_inputs(args)
    if args.unique and args.repeated:
        die("flag -u/--unique and -d/--repeated are not compatible")
    query_strings = _collect_query_strings(args)

    query_taxids = None
    if args.query_is_taxid:
        try:
            query_taxids = np.unique(
                np.array([int(q) for q in query_strings], dtype=np.uint32)
            )
        except ValueError:
            die("query taxid should be a positive integer")
        if len(query_taxids) == 0:
            log.warning("0 taxids loaded")

    # query codes from .unik files (hashed-ness follows those files);
    # query files must agree on k/canonical/hashed/scaled among
    # themselves (grep.go:229-240 checkCompatibility between them)
    unik_query_codes = []
    unik_query_hashed = None
    unik_query_k = None
    hq0 = None
    for f in args.query_unik_file:
        if not f:
            continue
        with open_reader(f) as r:
            h = r.header
            if hq0 is None:
                hq0 = h
                unik_query_hashed = h.is_hashed
                unik_query_k = h.k
            elif (
                h.k != hq0.k
                or h.is_canonical != hq0.is_canonical
                or h.is_hashed != hq0.is_hashed
                or h.is_scaled != hq0.is_scaled
            ):
                die(
                    f"query file incompatible with previous query files "
                    f"(k/canonical/hashed/scaled must match): {f}"
                )
            codes, _ = r.read_all()
            unik_query_codes.append(codes)

    kmer_queries: list[str] = []
    if not args.query_is_taxid:
        for q in query_strings:
            if args.degenerate:
                kmer_queries.extend(extend_degenerate(q))
            else:
                kmer_queries.append(q.upper())

    multi = args.multiple_outfiles
    if multi:
        if os.path.exists(args.out_dir):
            if args.force:
                shutil.rmtree(args.out_dir)
            elif os.listdir(args.out_dir):
                die(f"outdir not empty: {args.out_dir}, use --force to overwrite")
        os.makedirs(args.out_dir, exist_ok=True)

    query_set = None  # sorted uint64 array, built lazily from first file
    writer = None
    h0 = None
    has_taxid = False
    out_codes: list[np.ndarray] = []
    out_tax: list[np.ndarray] = []
    n_total = 0
    out_file = ensure_unik_suffix(args.out_prefix)

    for i, file in enumerate(files):
        with open_reader(file) as r:
            h = r.header
            if not args.query_is_taxid and unik_query_k is not None \
                    and h.k != unik_query_k:
                # grep.go:553-554: input k must equal the -F query k
                die(
                    f"K ({h.k}) of binary file '{file}' not equal to "
                    f"query K ({unik_query_k})"
                )
            if h0 is None:
                h0 = h
                has_taxid = not opt.ignore_taxid and h.has_taxid_info
                if not args.query_is_taxid:
                    query_set = _build_query_set(
                        kmer_queries, unik_query_codes, unik_query_hashed, h
                    )
                else:
                    if not h.has_taxid_info:
                        die(f"no taxids found in file: {file}")
            elif not args.query_is_taxid and h.k != h0.k:
                die(f"k-mer length mismatch: {file}")
            if h0 is not h:
                check_taxid_info_match(h0, h, file, opt)  # grep.go:556-562

            f_codes, f_tax = [], []
            for codes, taxids in r.iter_blocks():
                taxids = effective_taxids(r, len(codes), taxids, opt.ignore_taxid)
                if args.query_is_taxid:
                    t = taxids if taxids is not None else np.zeros(len(codes), np.uint32)
                    ok = np.isin(t, query_taxids)
                else:
                    look = codes
                    if not h.is_canonical and not h.is_hashed:
                        look = codec.canonical_np(codes, h.k)
                    idx = np.searchsorted(query_set, look)
                    idx = np.minimum(idx, max(len(query_set) - 1, 0))
                    ok = (
                        query_set[idx] == look
                        if len(query_set)
                        else np.zeros(len(codes), bool)
                    )
                hit = ~ok if args.invert_match else ok
                f_codes.append(codes[hit])
                if has_taxid:
                    t = taxids if taxids is not None else np.zeros(len(codes), np.uint32)
                    f_tax.append(t[hit])

            if multi:
                base = "stdin" if file == "-" else os.path.basename(file)
                path = os.path.join(args.out_dir, base + args.out_suffix + unik.EXT)
                n = _write_result(
                    path, opt, h, f_codes, f_tax, has_taxid, args
                )
                n_total += n
                if opt.verbose:
                    log.info(f"[file {i+1}/{len(files)}] {n} k-mers saved to {path}")
            else:
                out_codes.extend(f_codes)
                out_tax.extend(f_tax)

    if not multi:
        n_total = _write_result(
            out_file, opt, h0, out_codes, out_tax, has_taxid, args
        )
        log_saved(opt, n_total, out_file)
    return 0


def _build_query_set(kmer_queries, unik_query_codes, unik_query_hashed, h):
    codes = []
    hashed = h.is_hashed if unik_query_hashed is None else unik_query_hashed
    for q in kmer_queries:
        if hashed:
            if len(q) != h.k:
                die(f"length of query '{q}' ({len(q)}) != k ({h.k})")
            codes.append(nthash_kmer(q, canonical=h.is_canonical))
        else:
            if len(q) != h.k:
                die(f"length of query '{q}' ({len(q)}) != k ({h.k})")
            try:
                code = codec.encode_kmer(q)
            except ValueError as e:
                die(f"fail to encode query '{q}': {e}")
            codes.append(int(codec.canonical_np(code, h.k)))
    arr = np.array(codes, dtype=np.uint64)
    if unik_query_codes:
        arr = np.concatenate([arr] + unik_query_codes)
    arr = np.unique(arr)
    if len(arr) == 0:
        log.warning("0 k-mers loaded")
        sys.exit(0)
    return arr


def _write_result(path, opt, h, code_parts, tax_parts, has_taxid, args):
    codes = (
        np.concatenate(code_parts) if code_parts else np.zeros(0, np.uint64)
    )
    taxids = (
        np.concatenate(tax_parts)
        if has_taxid and tax_parts
        else (np.zeros(0, np.uint32) if has_taxid else None)
    )
    mode = "unique" if args.unique else "repeated" if args.repeated else "none"
    if args.sort or mode != "none":
        if taxids is not None:
            codes, taxids = native.host_sort_kv(codes, taxids)
        else:
            codes = native.host_sort(codes)
        codes, taxids = extsort.collapse_batch(
            codes, taxids, mode, None, final_round=True
        )
    flag = 0
    if args.sort:
        flag |= unik.SORTED
    elif opt.compact and not h.is_hashed:
        flag |= unik.COMPACT
    if h.is_canonical:
        flag |= unik.CANONICAL
    if has_taxid:
        flag |= unik.INCLUDE_TAXID
    if h.is_hashed:
        flag |= unik.HASHED
    out, _ = out_binary_stream(path)
    with unik.UnikWriter(
        out,
        k=h.k,
        flag=flag,
        number=len(codes),
        max_taxid=opt.max_taxid,
        compress=opt.compress,
        compression_level=opt.compression_level,
        threads=opt.threads,
    ) as w:
        w.write_codes(codes, taxids)
    return len(codes)
