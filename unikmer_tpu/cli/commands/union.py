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
        res = None
        if taxdb is not None and _device_taxid_wanted(code_arrays):
            # on-device LCA union through the compact-closure table
            # (ops/device_sets.union_taxids_compact; falls back to the
            # host engine on unknown taxids / oversized vocabularies)
            from ...ops.device_sets import union_taxids_device

            res = union_taxids_device(code_arrays, taxid_arrays, taxdb)
        if res is not None:
            codes, taxids = res
        else:
            codes, taxids = sets.union(code_arrays, taxid_arrays, taxdb)
    out_file = write_result(
        args.out_prefix, opt, headers[0], codes, taxids, sort_flag=args.sort
    )
    log_saved(opt, len(codes), out_file)
    return 0


def _device_taxid_wanted(code_arrays) -> bool:
    """Route the taxid-carrying union through the device?
    UNIKMER_TPU_DEVICE_TAXID: 1 = whenever the closure guards pass,
    0 = never, auto (default) = only when a real accelerator is
    attached AND the merged input is large enough that one device
    program beats the host merge (the dev tunnel's 6 MB/s fetch makes
    small unions host-bound)."""
    import os

    knob = os.environ.get("UNIKMER_TPU_DEVICE_TAXID", "auto")
    if knob == "0":
        return False
    if knob == "1":
        return True
    import jax

    if jax.default_backend() == "cpu":
        return False
    total = sum(len(c) for c in code_arrays)
    return total >= int(os.environ.get(
        "UNIKMER_TPU_DEVICE_TAXID_MIN", str(1 << 22)))


def _mesh_codes(op, code_arrays, h0, opt, threshold=None):
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
        threshold=threshold,
    )
