"""Device sort / dedupe machinery over uint64 code arrays.

The reference accumulates k-mers in a Go hash map and (optionally) runs a
parallel radix sort (unikmer/cmd/count.go:227-264,580-584; SURVEY.md §3.1).
TPU-first replacement: bulk sorts with XLA's on-device sort, with
dedupe/unique/repeated collapse expressed as shifted-compare + a second
compaction sort, so the distinct set is a dense sorted prefix and only a
scalar count crosses back to the host.

All functions are jit-friendly (static shapes; masks + counts instead of
dynamic sizes).  Invalid slots use an explicit validity column rather than
a sentinel value, so a real hash equal to 2^64-1 is still handled exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .codec import CODE_SENTINEL


def sort_codes(codes: jnp.ndarray) -> jnp.ndarray:
    """Plain ascending sort of uint64 codes."""
    return jax.lax.sort(codes)


@partial(jax.jit, static_argnames=("mode",))
def collapse_sorted(codes: jnp.ndarray, valid: jnp.ndarray, mode: str = "distinct"):
    """Sort + collapse a masked code array.

    mode:
      'distinct'  keep one copy of every distinct code (count -s behavior)
      'unique'    keep codes that occur exactly once  (count -u)
      'repeated'  keep one copy of codes occurring >1 time (count -d)

    Returns (compacted, n): ``compacted`` is uint64 with the kept codes in
    ascending order as a dense prefix of length ``n`` (invalid tail is
    CODE_SENTINEL-filled for debuggability, but only ``n`` is meaningful).
    """
    invalid = (~valid).astype(jnp.uint8)
    # Sort by (code, invalid): valid entries first among equal codes.
    s_codes, s_invalid = jax.lax.sort((codes, invalid), num_keys=2)
    s_valid = s_invalid == 0
    first = jnp.concatenate(
        [jnp.ones((1,), bool), s_codes[1:] != s_codes[:-1]]
    )
    # A run of equal codes may end with invalid slots; runs are delimited
    # by `first`.  Count only valid members per run.
    if mode == "distinct":
        keep = first & s_valid
    else:
        # run id per element; count valid members of each run
        run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
        n_runs = codes.shape[0]
        counts = jnp.zeros((n_runs,), jnp.int32).at[run_id].add(
            s_valid.astype(jnp.int32)
        )
        run_count = counts[run_id]
        if mode == "unique":
            keep = first & s_valid & (run_count == 1)
        elif mode == "repeated":
            keep = first & s_valid & (run_count > 1)
        else:
            raise ValueError(f"unknown mode: {mode}")
    return _compact(s_codes, keep)


def _compact(codes: jnp.ndarray, keep: jnp.ndarray):
    """Stable-compact kept codes to a dense ascending prefix via one sort."""
    drop = (~keep).astype(jnp.uint8)
    c_drop, c_codes = jax.lax.sort((drop, codes), num_keys=2)
    n = jnp.sum(keep.astype(jnp.int64))
    idx = jnp.arange(codes.shape[0], dtype=jnp.int64)
    out = jnp.where(idx < n, c_codes, jnp.uint64(CODE_SENTINEL))
    return out, n


@jax.jit
def collapse_sorted_taxid(codes: jnp.ndarray, taxids: jnp.ndarray, valid: jnp.ndarray,
                          lca_parent_tables):
    """Distinct-collapse with LCA merge of the taxid column.

    ``lca_parent_tables`` is the preprocessed taxonomy from
    taxonomy.taxdump (see there); the LCA of all taxids sharing a code is
    produced by a segmented pairwise-LCA reduction (log rounds).
    """
    from ..taxonomy.lca import lca_pairs_segments

    invalid = (~valid).astype(jnp.uint8)
    s_codes, s_invalid, s_tax = jax.lax.sort((codes, invalid, taxids), num_keys=2)
    s_valid = s_invalid == 0
    first = jnp.concatenate([jnp.ones((1,), bool), s_codes[1:] != s_codes[:-1]])
    merged = lca_pairs_segments(s_codes, s_tax, s_valid, lca_parent_tables)
    keep = first & s_valid
    drop = (~keep).astype(jnp.uint8)
    c_drop, c_codes, c_tax = jax.lax.sort((drop, s_codes, merged), num_keys=2)
    n = jnp.sum(keep.astype(jnp.int64))
    idx = jnp.arange(codes.shape[0], dtype=jnp.int64)
    out_codes = jnp.where(idx < n, c_codes, jnp.uint64(CODE_SENTINEL))
    out_tax = jnp.where(idx < n, c_tax, jnp.uint32(0))
    return out_codes, out_tax, n


def merge_sorted_np(chunks: list[np.ndarray]) -> np.ndarray:
    """Host-side k-way merge of sorted arrays (numpy fallback for the
    external-sort spill path; device path is ops/sets.py)."""
    if not chunks:
        return np.zeros(0, np.uint64)
    if len(chunks) == 1:
        return chunks[0]
    out = np.concatenate(chunks)
    out.sort(kind="stable")
    return out
