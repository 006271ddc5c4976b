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
    if taxid_arrays is None and opt.mesh >= 2:
        codes, taxids = _mesh_codes("union", code_arrays, headers[0], opt), None
    else:
        taxdb = maybe_taxonomy(opt, has_taxid and len(files) > 1)
        codes, taxids = sets.union(code_arrays, taxid_arrays, taxdb)
    out_file = write_result(
        args.out_prefix, opt, headers[0], codes, taxids, sort_flag=args.sort
    )
    log_saved(opt, len(codes), out_file)
    return 0


def _mesh_codes(op, code_arrays, h0, opt):
    """Route a taxid-free set op through the sharded mesh engine
    (parallel/sharded.mesh_set_op; --mesh N)."""
    import jax

    from ...utils.log import die

    if jax.device_count() < opt.mesh:
        die(f"--mesh {opt.mesh} needs {opt.mesh} devices, "
            f"found {jax.device_count()}")
    from ...parallel.sharded import mesh_set_op

    return mesh_set_op(
        op, code_arrays, opt.mesh,
        code_bits=64 if h0.is_hashed else 2 * h0.k,
    )
