"""union: union of multiple binary files, TaxIds merged by LCA.

Reference: unikmer/cmd/union.go.
"""

from __future__ import annotations

from ...ops import sets
from ._common import add_files_arg, log_saved, new_command, unik_inputs
from ._setops import (
    load_inputs, maybe_taxonomy, mesh_codes, mesh_codes_taxids, write_result,
)


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
    route_device = _device_taxid_requested(files)
    if route_device:
        # restore the relay pool (launcher starts union dial-free) —
        # may re-exec; must happen before any input is consumed
        from .count import _ensure_device_env

        _ensure_device_env()
    headers, code_arrays, taxid_arrays, has_taxid = load_inputs(files, opt)
    if taxid_arrays is None and opt.mesh >= 1:
        codes, taxids = mesh_codes("union", code_arrays, headers[0], opt), None
    elif taxid_arrays is not None and opt.mesh >= 1 and (
        res := mesh_codes_taxids(
            "union", code_arrays, taxid_arrays, headers[0], opt)
    ) is not None:
        codes, taxids = res
    else:
        taxdb = maybe_taxonomy(opt, has_taxid and len(files) > 1)
        res = None
        if taxdb is not None and route_device and _backend_is_device():
            # on-device LCA union through the compact-closure table
            # (ops/device_sets.union_taxids_compact; falls back to the
            # host engine on unknown taxids / oversized vocabularies)
            from ...ops.device_sets import union_taxids_device

            h0 = headers[0]
            res = union_taxids_device(
                code_arrays, taxid_arrays, taxdb,
                code_bits=64 if h0.is_hashed else 2 * h0.k)
        if res is not None:
            codes, taxids = res
        else:
            codes, taxids = sets.union(code_arrays, taxid_arrays, taxdb)
    out_file = write_result(
        args.out_prefix, opt, headers[0], codes, taxids, sort_flag=args.sort
    )
    log_saved(opt, len(codes), out_file)
    return 0


def _device_taxid_requested(files) -> bool:
    """Pre-jax routing decision for the device taxid union, taken
    BEFORE inputs are read (a launcher re-exec must not lose consumed
    stdin).  UNIKMER_TPU_DEVICE_TAXID: 1 = yes (closure guards may
    still host-fall-back), 0 = never, auto (default) = only for inputs
    totaling >= UNIKMER_TPU_DEVICE_TAXID_MIN_MB (default 32) of .unik
    bytes — the dev tunnel's 6 MB/s fetch makes small unions
    host-bound."""
    import os

    knob = os.environ.get("UNIKMER_TPU_DEVICE_TAXID", "auto")
    if knob == "0":
        return False
    if knob == "1":
        return True
    if any(f == "-" for f in files):
        return False  # stdin cannot survive a re-exec
    try:
        total = sum(os.path.getsize(f) for f in files)
    except OSError:
        return False
    return total >= float(os.environ.get(
        "UNIKMER_TPU_DEVICE_TAXID_MIN_MB", "32")) * (1 << 20)


def _backend_is_device() -> bool:
    import jax

    return jax.default_backend() != "cpu"
