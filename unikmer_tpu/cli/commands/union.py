"""union: union of multiple binary files, TaxIds merged by LCA.

Reference: unikmer/cmd/union.go.
"""

from __future__ import annotations

from ...ops import sets
from ._common import add_files_arg, log_saved, new_command, unik_inputs
from ._setops import load_inputs, maybe_taxonomy, write_result


def register(subparsers):
    p = new_command(subparsers, "union",
                    "Union of multiple binary files (k-mers deduplicated, TaxIds merged by LCA)")
    add_files_arg(p)
    p.add_argument("-o", "--out-prefix", default="-",
                   help='out file prefix ("-" for stdout)')
    p.add_argument("-s", "--sort", action="store_true",
                   help="sort k-mers, significantly reduces file size for k<=25. Overrides -c/--compact")
    p.set_defaults(func=run)


def run(args) -> int:
    opt, files = unik_inputs(args)
    headers, code_arrays, taxid_arrays, has_taxid = load_inputs(files, opt)
    taxdb = maybe_taxonomy(opt, has_taxid and len(files) > 1)
    codes, taxids = sets.union(code_arrays, taxid_arrays, taxdb)
    out_file = write_result(
        args.out_prefix, opt, headers[0], codes, taxids, sort_flag=args.sort
    )
    log_saved(opt, len(codes), out_file)
    return 0
