"""Global options + shared CLI helpers.

Mirrors the reference's persistent flags and Options struct
(unikmer/cmd/root.go:98-111, util.go:52-109) and file-list assembly
(util-cli.go:192-264).
"""

from __future__ import annotations

import argparse
import gzip
import os
import sys
from dataclasses import dataclass

from ..io.unik import EXT, UnikReader, check_compatibility
from ..utils.log import check_error, die, init_logging

DEFAULT_DATA_DIR = os.path.expanduser("~/.unikmer/")


@dataclass
class Options:
    threads: int = 4
    verbose: bool = False
    compress: bool = True
    compact: bool = False
    compression_level: int = 5
    max_taxid: int = (1 << 32) - 1
    ignore_taxid: bool = False
    data_dir: str = DEFAULT_DATA_DIR
    skip_flag_check: bool = False
    skip_file_check: bool = False
    mesh: int = 0  # >= 2: shard count/union/inter/diff across N devices


def add_global_flags(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group("global flags")
    g.add_argument("-j", "--threads", type=int, default=min(os.cpu_count() or 4, 4),
                   help="number of host worker threads")
    g.add_argument("--verbose", action="store_true", help="print verbose information")
    g.add_argument("-C", "--no-compress", action="store_true",
                   help="do not compress binary file (not recommended)")
    g.add_argument("--compression-level", type=int, default=5,
                   help="compression level")
    g.add_argument("-c", "--compact", action="store_true",
                   help="write compact binary file with little loss of speed")
    g.add_argument("-i", "--infile-list", default="",
                   help="file of input files list (one file per line), appended to cli args")
    g.add_argument("--max-taxid", type=int, default=(1 << 32) - 1,
                   help="for smaller TaxIds, use less space to store TaxIds")
    g.add_argument("-I", "--ignore-taxid", action="store_true",
                   help="ignore taxonomy information")
    g.add_argument("--data-dir", default=None,
                   help="directory containing NCBI Taxonomy nodes.dmp etc.")
    g.add_argument("--skip-flag-check", action="store_true",
                   help="do not check binary file flags")
    g.add_argument("--skip-file-check", action="store_true",
                   help="skip checking input file existence")
    g.add_argument("--mesh", type=int,
                   default=int(os.environ.get("UNIKMER_TPU_MESH", "0")),
                   help="shard count/union/inter/diff across a device mesh "
                        "of this many chips (0 = single-device path; 1 = "
                        "trivial 1-device mesh, same sharded programs; "
                        "needs >= N attached devices; no TPU scope: taxid "
                        "columns, sketches, -l/linear order)")


def get_options(args: argparse.Namespace) -> Options:
    # $UNIKMER_DB overrides data-dir unless the flag was given (util.go:74-83)
    data_dir = args.data_dir
    if data_dir is None:
        data_dir = os.environ.get("UNIKMER_DB") or DEFAULT_DATA_DIR
    if args.threads <= 0:
        die(f"invalid threads: {args.threads}")
    from .. import native

    native.set_threads(args.threads)  # -j caps native kernel threads too
    opt = Options(
        threads=args.threads,
        verbose=args.verbose,
        compress=not args.no_compress,
        compact=args.compact,
        compression_level=args.compression_level,
        max_taxid=args.max_taxid,
        ignore_taxid=args.ignore_taxid,
        data_dir=data_dir,
        skip_flag_check=args.skip_flag_check,
        skip_file_check=args.skip_file_check,
        mesh=args.mesh,
    )
    init_logging(opt.verbose)
    return opt


def get_file_list(args: argparse.Namespace, check_exists: bool = True) -> list[str]:
    """Positional files + -i list file; '-' (stdin) when none given
    (reference util-cli.go:192-264)."""
    files = list(getattr(args, "files", []) or [])
    infile_list = getattr(args, "infile_list", "")
    if infile_list:
        opener = open
        try:
            with (sys.stdin.buffer if infile_list == "-" else open(infile_list, "rb")) as f:
                for line in f:
                    line = line.strip().decode()
                    if line and line != "-":
                        files.append(line)
        except OSError as e:
            die(f"reading infile list: {e}")
    if not files:
        return ["-"]
    if check_exists:
        for f in files:
            if f != "-" and not os.path.exists(f):
                die(f"file not found: {f}")
    return files


def check_file_suffix(files: list[str], skip: bool = False) -> None:
    """Enforce .unik extension (reference util.go:247-261)."""
    if skip:
        return
    for f in files:
        if f != "-" and not f.endswith(EXT):
            die(f"input should be stdin or file with suffix {EXT}: {f}")


def ensure_unik_suffix(path: str) -> str:
    if path != "-" and not path.endswith(EXT):
        return path + EXT
    return path


def out_binary_stream(path: str):
    """Binary out stream; '-' = stdout."""
    if path == "-":
        return sys.stdout.buffer, False
    return open(path, "wb"), True


def out_text_stream(path: str, compression_level: int = 5):
    """Text out stream; .gz suffix gzips (reference view -o)."""
    if path == "-":
        return sys.stdout, False
    if path.lower().endswith(".gz"):
        import io as _io

        return (
            _io.TextIOWrapper(
                gzip.open(path, "wb", compresslevel=compression_level),
                encoding="utf-8",
            ),
            True,
        )
    return open(path, "w"), True


def open_readers(files: list[str], opt: Options):
    """Open all inputs as UnikReaders and check cross-file compatibility."""
    readers = []
    h0 = None
    for f in files:
        r = UnikReader(sys.stdin.buffer if f == "-" else f)
        if h0 is None:
            h0 = r.header
        elif not opt.skip_flag_check:
            try:
                check_compatibility(h0, r.header, f)
            except ValueError as e:
                check_error(e)
        readers.append(r)
    return readers


def check_taxid_consistency(readers, files, opt: Options) -> bool:
    """All inputs must agree on having taxid info unless -I
    (reference e.g. union.go:176-184). Returns has_taxid."""
    if opt.ignore_taxid:
        return False
    has = readers[0].header.has_taxid_info
    for r, f in zip(readers[1:], files[1:]):
        if r.header.has_taxid_info != has:
            if r.header.has_taxid_info:
                die(f"taxid information not found in previous files, but found in this: {f}")
            die(f"taxid information found in previous files, but missing in this: {f}")
    return has
