"""locate: locate k-mers in genomes, output BED6.

Reference: unikmer/cmd/locate.go — build a code->locations index over the
genomes, then stream .unik files and print
``id  pos  pos+k  kmer  0  .`` for every location of every (not yet
seen) code; the k-mer column is the genome substring at that position.
"""

from __future__ import annotations

import re

import numpy as np

from ...utils.log import die, log
from ..opts import out_text_stream
from ._common import add_files_arg, new_command, open_reader, unik_inputs


def register(subparsers):
    p = new_command(subparsers, "locate", "Locate k-mers in genome")
    add_files_arg(p)
    p.add_argument("-B", "--seq-name-filter", action="append", default=[],
                   help="regular expressions for filtering out sequences by header/name, case ignored")
    p.add_argument("-o", "--out-prefix", default="-",
                   help='out file prefix ("-" for stdout)')
    p.add_argument("-g", "--genome", action="append", default=[], required=False,
                   help="genomes in (gzipped) fasta file(s)")
    p.add_argument("--circular", action="store_true", help="circular genome")
    p.set_defaults(func=run)


def run(args) -> int:
    from ...models.locate import (  # deferred: pulls jax (~2.3 s)
        build_genome_index,
        lookup_ranges,
    )

    opt, files = unik_inputs(args)
    if not args.genome:
        die("flag -g/--genome needed")
    name_res = []
    for kw in args.seq_name_filter:
        if "(?i)" not in kw:
            kw = "(?i)" + kw
        name_res.append(re.compile(kw.encode()))

    # pre-read headers: all must be canonical + compatible
    k = None
    hashed = False
    for f in files:
        with open_reader(f) as r:
            if k is None:
                k = r.header.k
                hashed = r.header.is_hashed
                if not r.header.is_canonical:
                    die(f"{f}: 'canonical' flag is needed")
            elif r.header.k != k:
                die(f"k mismatch: {f}")

    if opt.verbose:
        log.info(f"indexing {len(args.genome)} genome file(s)")
    index = build_genome_index(
        args.genome, k, hashed=hashed, circular=args.circular, name_filters=name_res
    )

    out, _ = out_text_stream(args.out_prefix, opt.compression_level)
    seen_runs = np.zeros(len(index.codes), bool)  # mark consumed codes by run start
    try:
        for f in files:
            with open_reader(f) as r:
                for codes, _ in r.iter_blocks():
                    if len(index.codes) == 0:
                        continue
                    # duplicate codes within a block must print once
                    # (the reference deletes a code from its map at the
                    # first hit, locate.go:274-285); keep first
                    # occurrences in record order
                    _, first_idx = np.unique(codes, return_index=True)
                    if len(first_idx) != len(codes):
                        codes = codes[np.sort(first_idx)]
                    start, end = lookup_ranges(index, codes)
                    found = (start < end) & ~seen_runs[np.minimum(start, len(seen_runs) - 1)]
                    if not found.any():
                        continue
                    seen_runs[start[found]] = True
                    # expand ranges, preserving .unik record order
                    f_start = start[found]
                    f_len = (end - start)[found]
                    total = int(f_len.sum())
                    # index positions: start_i, start_i+1, ..., end_i-1
                    base = np.repeat(f_start, f_len)
                    offs = np.arange(total) - np.repeat(
                        np.cumsum(f_len) - f_len, f_len
                    )
                    sel = base + offs
                    sidx = index.seq_idx[sel]
                    pos = index.pos[sel]
                    for si, pj in zip(sidx, pos):
                        seq = index.sequences[si]
                        kmer = seq[pj : pj + k].decode()
                        out.write(
                            f"{index.ids[si].decode()}\t{pj}\t{pj + k}\t{kmer}\t0\t.\n"
                        )
    finally:
        out.flush()
        import sys

        if out is not sys.stdout:
            out.close()
    return 0
