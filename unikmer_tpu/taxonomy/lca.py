"""Device-side (jnp) LCA: taxonomy tables in HBM, vectorized lifting.

The host Taxonomy (taxdump.py) flattens NCBI nodes.dmp into dense
parent/depth arrays; uploaded once, LCA of whole taxid arrays becomes
pure gather math inside jitted programs (SURVEY.md §7.1), replacing the
reference's per-pair map lookups (`taxondb.LCA(a,b)`).

All loops are static-bounded by the tree depth (NCBI ~<=42), expressed
as masked fori_loops — no data-dependent control flow.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def device_tables(taxdb):
    """(parent int32, depth int32, max_depth) device-ready tables."""
    parent = jnp.asarray(taxdb.parent.astype(np.int32))
    depth = jnp.asarray(taxdb.depth.astype(np.int32))
    max_depth = int(taxdb.depth.max())
    return parent, depth, max_depth


@partial(jax.jit, static_argnames=("max_depth",))
def lca_pairs_device(a, b, parent, depth, max_depth: int):
    """Elementwise LCA with 0 as identity; unknown taxids -> 0.

    ``a``/``b`` uint32 arrays; parent/depth from device_tables.
    """
    n_tax = parent.shape[0]
    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)
    in_range_a = (a > 0) & (a < n_tax)
    in_range_b = (b > 0) & (b < n_tax)
    da = jnp.where(in_range_a, depth[jnp.clip(a, 0, n_tax - 1)], -1)
    db = jnp.where(in_range_b, depth[jnp.clip(b, 0, n_tax - 1)], -1)
    known_a = da >= 0
    known_b = db >= 0

    x = jnp.where(known_a, a, 0)
    y = jnp.where(known_b, b, 0)

    def lift_deeper(_, carry):
        x, y, dx, dy = carry
        mx = dx > dy
        my = dy > dx
        x = jnp.where(mx, parent[x], x)
        dx = jnp.where(mx, dx - 1, dx)
        y = jnp.where(my, parent[y], y)
        dy = jnp.where(my, dy - 1, dy)
        return x, y, dx, dy

    x, y, _, _ = jax.lax.fori_loop(
        0, max_depth, lift_deeper, (x, y, jnp.maximum(da, 0), jnp.maximum(db, 0))
    )

    def walk_up(_, carry):
        x, y = carry
        m = x != y
        return jnp.where(m, parent[x], x), jnp.where(m, parent[y], y)

    x, y = jax.lax.fori_loop(0, max_depth, walk_up, (x, y))

    both = known_a & known_b
    res = jnp.where(both, x, 0)
    res = jnp.where(known_a & (b == 0), a, res)
    res = jnp.where(known_b & (a == 0), b, res)
    return res.astype(jnp.uint32)


@partial(jax.jit, static_argnames=("max_depth", "rounds"))
def lca_collapse_device(codes, taxids, valid, parent, depth,
                        max_depth: int, rounds: int):
    """Sorted distinct collapse with LCA-merged taxid column, on device.

    ``rounds`` bounds the segmented reduction: ceil(log2(max number of
    entries sharing one code)) — e.g. number of input files for a union.
    Returns (codes, taxids, keep_mask) aligned to the sorted order.
    """
    invalid = (~valid).astype(jnp.uint8)
    s_codes, s_inv, s_tax = jax.lax.sort(
        (codes, invalid, taxids.astype(jnp.uint32)), num_keys=2
    )
    s_valid = s_inv == 0
    n = codes.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), s_codes[1:] != s_codes[:-1]])
    # run start per element (cummax of masked index)
    start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, idx, 0)
    )
    tax = jnp.where(s_valid, s_tax, 0)
    for r in range(rounds):
        d = 1 << r
        shifted = jnp.concatenate(
            [tax[d:], jnp.zeros((d,), tax.dtype)]
        )
        same_run = jnp.concatenate(
            [start[d:] == start[:-d] if d < n else jnp.zeros((0,), bool),
             jnp.zeros((min(d, n),), bool)]
        )
        merged = lca_pairs_device(tax, shifted, parent, depth, max_depth)
        tax = jnp.where(same_run, merged, tax)
    keep = first & s_valid
    return s_codes, tax, keep


# ---------------------------------------------------------------------
# Compact-vocabulary LCA: the TPU-fit representation
# ---------------------------------------------------------------------
#
# Tree-walking LCA (above) costs 2*max_depth dependent gathers per
# merge round — fine on CPU meshes, pathological on this TPU backend
# (random gather ~85M elem/s).  But a batch's taxid VOCABULARY is tiny
# (<= #records), and the meet-closure of V nodes in a tree has at most
# 2V-1 members (the LCA of any set equals the LCA of one PAIR of its
# extremal members, so the all-pairs meet set is closed under meet).
# Precompute the closure's all-pairs LCA table on host once; every
# device merge round is then ONE gather into a (C, C) table instead of
# 2*max_depth tree steps.  Reference analog: the mt[code]=LCA(...) map
# loops (count.go:405-410, union.go:195-202).


def lca_closure(taxdb, taxids):
    """(closure uint32 sorted (0 first), lca_tab int32 (C, C)) for the
    taxid vocabulary ``taxids``.  lca_tab[i, j] = compact id of
    LCA(closure[i], closure[j]) with the host identity/unknown
    semantics (0 identity; unknown -> 0)."""
    vocab = np.unique(
        np.concatenate([np.asarray(taxids, np.uint32).reshape(-1),
                        np.zeros(1, np.uint32)])
    )
    ii, jj = np.meshgrid(vocab, vocab, indexing="ij")
    pair_lca = taxdb.lca_pairs(ii.reshape(-1), jj.reshape(-1))
    closure = np.unique(np.concatenate([vocab, pair_lca]))
    ci, cj = np.meshgrid(closure, closure, indexing="ij")
    tab = taxdb.lca_pairs(ci.reshape(-1), cj.reshape(-1))
    ids = np.searchsorted(closure, tab).astype(np.int32)
    return closure, ids.reshape(len(closure), len(closure))


def compact_ids(closure: np.ndarray, taxids: np.ndarray) -> np.ndarray:
    """Map taxids (all members of the vocabulary) to compact ids."""
    return np.searchsorted(closure, np.asarray(taxids, np.uint32)).astype(
        np.int32
    )


@jax.jit
def lca_pairs_compact(ca, cb, lca_tab):
    """Elementwise LCA over COMPACT ids: one gather."""
    c = lca_tab.shape[0]
    return lca_tab.reshape(-1)[ca.astype(jnp.int32) * c + cb.astype(jnp.int32)]


_VALID_BIT = 1 << 30  # packed alongside compact ids (closure << 2^23)


@partial(jax.jit, static_argnames=("rounds",))
def lca_collapse_compact(codes, ctax, valid, lca_tab, rounds: int):
    """Device sorted-distinct collapse with LCA-merged COMPACT-id taxid
    column: the TPU-fit twin of lca_collapse_device (one table gather
    per doubling round; rounds = ceil(log2(n)) is always convergent).

    ONE sort key only: the validity bit rides packed inside the i32
    payload (compact ids are tiny), because every extra TPU sort
    operand/key multiplies AOT compile time (ops/sort.py).  A run's
    first slot may then be an invalid entry, so 'keep' tests
    run-has-any-valid instead of first-slot validity.

    Returns (sorted codes, merged compact ids, keep mask, valid mask)
    aligned to the sorted order.
    """
    payload = jnp.where(
        valid, ctax.astype(jnp.int32) | jnp.int32(_VALID_BIT), jnp.int32(0)
    )
    s_codes, s_pay = jax.lax.sort((codes, payload), num_keys=1)
    s_valid = s_pay >= jnp.int32(_VALID_BIT)
    n = codes.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), s_codes[1:] != s_codes[:-1]])
    start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, 0))
    tax = jnp.where(s_valid, s_pay & jnp.int32(_VALID_BIT - 1), 0)
    c = lca_tab.shape[0]
    flat = lca_tab.reshape(-1)
    for r in range(rounds):
        d = 1 << r
        if d >= n:
            break
        shifted = jnp.concatenate([tax[d:], jnp.zeros((d,), tax.dtype)])
        same_run = jnp.concatenate(
            [start[d:] == start[:-d], jnp.zeros((d,), bool)]
        )
        merged = flat[tax * c + shifted]
        tax = jnp.where(same_run, merged, tax)
    # any valid member in the run? (cumsum difference over run bounds)
    v = s_valid.astype(jnp.int32)
    csum = jnp.cumsum(v)
    last = jnp.concatenate([s_codes[1:] != s_codes[:-1], jnp.ones((1,), bool)])
    end = jax.lax.associative_scan(
        jnp.minimum, jnp.where(last, idx + 1, n)[::-1]
    )[::-1]
    run_valid = csum[end - 1] - csum[start] + v[start]
    keep = first & (run_valid > 0)
    return s_codes, tax, keep, s_valid


def closure_for_vocab(taxdb, taxids):
    """(closure, lca_tab) for a taxid vocabulary, or None when the
    compact representation cannot own the semantics: unknown NONZERO
    taxids (the host engine's unknown-merge rule is order-dependent,
    taxdump.lca_pairs), or a vocabulary/meet-closure beyond
    UNIKMER_TPU_TAXID_VOCAB_MAX (default 4096 / 2x for the closure).
    The single admission guard shared by count -T and the taxid union
    device routes."""
    import os

    vocab = np.unique(np.asarray(taxids, np.uint32).reshape(-1))
    if not np.all(taxdb.has(vocab) | (vocab == 0)):
        return None
    cap = int(os.environ.get("UNIKMER_TPU_TAXID_VOCAB_MAX", "4096"))
    if len(vocab) > cap:
        return None
    closure, lca_tab = lca_closure(taxdb, vocab)
    if len(closure) > 2 * cap:
        return None
    return closure, lca_tab
