"""view: read and output binary format to plain text.

Reference: unikmer/cmd/view.go (output formats at view.go:187-217).
"""

from __future__ import annotations

import numpy as np

from ...ops.codec import decode_codes
from ...utils.log import die, log
from ..opts import out_text_stream
from ._common import (
    add_files_arg,
    effective_taxids,
    new_command,
    open_reader,
    unik_inputs,
)


def register(subparsers):
    p = new_command(subparsers, "view", "Read and output binary format to plain text")
    add_files_arg(p)
    p.add_argument("-o", "--out-file", default="-",
                   help='out file ("-" for stdout, suffix .gz for gzipped out)')
    p.add_argument("-n", "--show-code", action="store_true",
                   help="show encoded integer along with k-mer")
    p.add_argument("-N", "--show-code-only", action="store_true",
                   help="only show encoded integers")
    p.add_argument("-a", "--fasta", action="store_true",
                   help="output in FASTA format, with encoded integer as FASTA header")
    p.add_argument("-q", "--fastq", action="store_true",
                   help="output in FASTQ format, with encoded integer as FASTQ header")
    p.add_argument("-t", "--show-taxid", action="store_true", help="show taxid")
    p.add_argument("-T", "--show-taxid-only", action="store_true", help="show taxid only")
    p.add_argument("-g", "--genome", action="append", default=[],
                   help="genomes in (gzipped) fasta file(s) for decoding hashed k-mers")
    p.set_defaults(func=run)


def run(args) -> int:
    opt, files = unik_inputs(args)
    show_taxid = args.show_taxid and not opt.ignore_taxid

    out, _ = out_text_stream(args.out_file, opt.compression_level)
    hash2loc = None
    sequences = None
    first = True
    k = None
    try:
        for file in files:
            with open_reader(file) as r:
                h = r.header
                if first:
                    first = False
                    k = h.k
                    if show_taxid and not h.has_taxid_info:
                        log.warning(
                            "flag -t/--show-taxid ignored when no taxids found in input"
                        )
                        show_taxid = False
                    if args.genome:
                        if not h.is_hashed:
                            log.warning("-g/--genome ignored since k-mers not hashed")
                        elif not h.is_canonical:
                            log.warning(
                                "-g/--genome ignored since 'canonical' flag is off"
                            )
                        else:
                            from ...models.locate import load_hash2loc

                            sequences, hash2loc = load_hash2loc(args.genome, k)
                quality = "g" * h.k
                for codes, taxids in r.iter_blocks():
                    taxids = effective_taxids(r, len(codes), taxids, opt.ignore_taxid)
                    if taxids is None:
                        taxids = np.zeros(len(codes), np.uint32)
                    kmers = _kmer_strings(codes, h, k, sequences, hash2loc)
                    _emit(out, args, show_taxid, codes, taxids, kmers, quality)
    finally:
        out.flush()
        if out.name != "<stdout>":
            out.close()
    return 0


def _kmer_strings(codes, h, k, sequences, hash2loc):
    if not h.is_hashed:
        arr = decode_codes(codes, k)
        # contiguous (n,k) bytes -> one fixed-width bytes string per row
        rows = np.ascontiguousarray(arr).view(f"S{k}")[:, 0]
        return rows.astype(str)
    if hash2loc is not None:
        from ...models.locate import lookup_hashes

        found, seq_idx, pos = lookup_hashes(hash2loc, codes)
        out = []
        for i in range(len(codes)):
            if found[i]:
                s = sequences[seq_idx[i]]
                out.append(s[pos[i] : pos[i] + k].decode())
            else:
                log.warning(
                    f"fail to decode hash: {int(codes[i])}, which is not found in given genomes"
                )
                out.append(str(int(codes[i])))
        return out
    return [str(int(c)) for c in codes]


def _emit(out, args, show_taxid, codes, taxids, kmers, quality):
    w = out.write
    if args.fasta:
        if show_taxid:
            for i, km in enumerate(kmers):
                w(f">{int(codes[i])} {int(taxids[i])}\n{km}\n")
        else:
            for i, km in enumerate(kmers):
                w(f">{int(codes[i])}\n{km}\n")
    elif args.fastq:
        if show_taxid:
            for i, km in enumerate(kmers):
                w(f"@{int(codes[i])} {int(taxids[i])}\n{km}\n+\n{quality}\n")
        else:
            for i, km in enumerate(kmers):
                w(f"@{int(codes[i])}\n{km}\n+\n{quality}\n")
    elif show_taxid:
        for i, km in enumerate(kmers):
            w(f"{km}\t{int(taxids[i])}\n")
    elif args.show_taxid_only:
        for t in taxids:
            w(f"{int(t)}\n")
    elif args.show_code_only:
        for c in codes:
            w(f"{int(c)}\n")
    elif args.show_code:
        for i, km in enumerate(kmers):
            w(f"{km}\t{int(codes[i])}\n")
    else:
        w("\n".join(kmers))
        w("\n")
