"""Pallas encode kernel: interpret-mode equivalence vs the jnp path.

(On-hardware validation is in the kernel docstring: compiled on v5e with
identical checksums; CI here runs the interpreter.)
"""

from functools import partial

import numpy as np
import jax.numpy as jnp
import pytest

from unikmer_tpu.ops import codec
from unikmer_tpu.ops.pallas_encode import encode_canonical_pallas
from tests.conftest import random_dna


@pytest.mark.parametrize("k", [5, 23, 31, 32])
@pytest.mark.parametrize("canonical", [False, True])
def test_pallas_encode_matches_jnp(rng, k, canonical):
    bases = codec.BASE_LUT[
        np.frombuffer(random_dna(rng, 3000, p_invalid=0.02), np.uint8)
    ]
    c1, v1 = encode_canonical_pallas(jnp.asarray(bases), k, canonical, interpret=True)
    c2 = codec.kmer_codes(jnp.asarray(bases), k)
    if canonical:
        c2 = codec.canonical_code(c2, k)
    v2 = codec.window_valid(jnp.asarray(bases), k)
    c1, v1, c2, v2 = map(np.asarray, (c1, v1, c2, v2))
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(c1[v1], c2[v2])


def test_pallas_encode_row_boundaries(rng):
    # windows spanning the 512-base row boundary must be exact (halo path)
    k = 31
    bases = codec.BASE_LUT[np.frombuffer(random_dna(rng, 1200), np.uint8)]
    c1, v1 = encode_canonical_pallas(jnp.asarray(bases), k, True, interpret=True)
    c2 = codec.canonical_code(codec.kmer_codes(jnp.asarray(bases), k), k)
    for i in range(480, 540):
        assert bool(np.asarray(v1)[i])
        assert int(np.asarray(c1)[i]) == int(np.asarray(c2)[i]), i


# ---------------------------------------------------------------------
# VMEM-blocked bitonic sort (ops/pallas_sort.py), interpret mode
# ---------------------------------------------------------------------

from unikmer_tpu.ops.pallas_sort import sort_codes_pallas


@pytest.mark.parametrize(
    "n,blk",
    [
        (1024, 1024),      # single block
        (2048, 1024),      # one merge round
        (16384, 1024),     # 16 blocks, 4 rounds
        (8192, 2048),      # bigger rows
        (5000, 1024),      # non-pow2 -> sentinel padding
        (1, 1024),         # degenerate
    ],
)
def test_pallas_sort_matches_numpy(rng, n, blk):
    a = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    if n >= 16:
        a[:8] = [0, 1, 0xFFFFFFFFFFFFFFFF, 0x8000000000000000,
                 0x7FFFFFFFFFFFFFFF, 5, 5, 1 << 32]
    got = np.asarray(sort_codes_pallas(jnp.asarray(a), block_elems=blk,
                                       interpret=True))
    np.testing.assert_array_equal(got, np.sort(a))


def test_pallas_sort_dup_heavy(rng):
    # low-cardinality keys stress equal-pair exchanges
    a = rng.integers(0, 7, size=4096, dtype=np.uint64) * np.uint64(1 << 45)
    got = np.asarray(sort_codes_pallas(jnp.asarray(a), block_elems=1024,
                                       interpret=True))
    np.testing.assert_array_equal(got, np.sort(a))


def test_pallas_sort_in_collapse_pipeline(rng, monkeypatch):
    # collapse_sorted routed through the pallas sort == the lax.sort path
    import unikmer_tpu.ops.pallas_sort as ps
    from unikmer_tpu.ops import sort as sort_mod

    n = 4096
    codes = rng.integers(0, 1 << 46, size=n, dtype=np.uint64)
    codes[100:200] = codes[0]  # force repeats
    valid = rng.random(n) < 0.9
    want_out, want_n = sort_mod.collapse_sorted(
        jnp.asarray(codes), jnp.asarray(valid), "distinct"
    )
    monkeypatch.setenv("UNIKMER_TPU_PALLAS_SORT", "1")
    monkeypatch.setenv("UNIKMER_TPU_PALLAS_SORT_BLOCK", "1024")
    monkeypatch.setattr(
        ps, "sort_codes_pallas",
        partial(ps.sort_codes_pallas.__wrapped__, interpret=True),
    )
    got_out, got_n = sort_mod.collapse_sorted.__wrapped__(
        jnp.asarray(codes), jnp.asarray(valid), "distinct"
    )
    assert int(got_n) == int(want_n)
    np.testing.assert_array_equal(np.asarray(got_out), np.asarray(want_out))


@pytest.mark.parametrize(
    "n,blk",
    [
        (1024, 1024),      # single looped block
        (4096, 1024),      # cross-block rounds + looped merges
        (8192, 2048),      # bigger rows
        (8192, 8192),      # one big looped block (the compile-cliff fix)
        (5000, 1024),      # sentinel padding
    ],
)
def test_pallas_sort_looped_matches_numpy(rng, n, blk):
    """The fori_loop/switch kernel variant must agree bit-for-bit with
    numpy (and hence with the unrolled variant)."""
    a = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    a[:4] = [0, 0xFFFFFFFFFFFFFFFF, 5, 5]
    got = np.asarray(sort_codes_pallas(jnp.asarray(a), block_elems=blk,
                                       interpret=True, looped=True))
    np.testing.assert_array_equal(got, np.sort(a))


def test_pallas_sort_kv_looped(rng):
    from unikmer_tpu.ops.pallas_sort import sort_codes_taxids_pallas

    n, blk = 4096, 2048
    codes = rng.integers(0, 1 << 46, size=n, dtype=np.uint64)
    codes[: n // 4] = codes[0]
    tax = rng.integers(1, 1 << 20, size=n, dtype=np.uint32)
    c, t = sort_codes_taxids_pallas(
        jnp.asarray(codes), jnp.asarray(tax), block_elems=blk,
        interpret=True, looped=True,
    )
    c, t = np.asarray(c), np.asarray(t)
    np.testing.assert_array_equal(c, np.sort(codes))
    got = np.stack([c, t.astype(np.uint64)], 1)
    order = np.argsort(codes, kind="stable")
    want = np.stack([codes[order], tax[order].astype(np.uint64)], 1)
    got = got[np.lexsort((got[:, 1], got[:, 0]))]
    want = want[np.lexsort((want[:, 1], want[:, 0]))]
    np.testing.assert_array_equal(got, want)


def test_pallas_sort_kv_taxids(rng):
    from unikmer_tpu.ops.pallas_sort import sort_codes_taxids_pallas

    for n, blk in [(1024, 1024), (4096, 1024), (3000, 1024)]:
        codes = rng.integers(0, 1 << 46, size=n, dtype=np.uint64)
        codes[: n // 4] = codes[0]  # heavy ties: values may permute
        tax = rng.integers(1, 1 << 20, size=n, dtype=np.uint32)
        c, t = sort_codes_taxids_pallas(
            jnp.asarray(codes), jnp.asarray(tax), block_elems=blk,
            interpret=True,
        )
        c, t = np.asarray(c), np.asarray(t)
        np.testing.assert_array_equal(c, np.sort(codes))
        # the (code, taxid) multiset must be exactly preserved
        got = np.stack([c, t.astype(np.uint64)], 1)
        order = np.argsort(codes, kind="stable")
        want = np.stack([codes[order], tax[order].astype(np.uint64)], 1)
        got = got[np.lexsort((got[:, 1], got[:, 0]))]
        want = want[np.lexsort((want[:, 1], want[:, 0]))]
        np.testing.assert_array_equal(got, want)


def test_pallas_sort_kernels_carry_no_int64():
    """Mosaic regression guard: with x64 enabled, a Python-int
    fori_loop bound gives an int64 induction variable inside the
    kernel (fori_loop lowers to scan with a weak-int index), and the
    i64->i32 convert that lax.switch then needs sends this jax
    version's Mosaic _convert_helper into infinite mutual recursion at
    AOT-lowering time (chip-diagnosed 2026-08-18).  Interpret mode
    cannot see that, but the jaxpr can: this traced program must
    contain NO 64-bit scalars at all (its only legitimate 64-bit
    values are the u64 code vectors outside the kernels).  The pre-fix
    revision's jaxpr contains 17 `i64[]` scalars — the guard was
    verified to fail there."""
    import jax

    def run(codes):
        return sort_codes_pallas(codes, block_elems=1024, interpret=True,
                                 looped=True)

    s = str(jax.make_jaxpr(run)(jnp.zeros((4096,), jnp.uint64)))
    # u64[] scalars are legitimate outside kernels (shift constants on
    # the u64 codes); the killer class is signed-64 loop indices.
    for bad in ("i64[]", "s64[]"):
        assert bad not in s, f"64-bit scalar {bad} leaked into the program"


@pytest.mark.parametrize("looped", [False, True])
@pytest.mark.parametrize(
    "n,blk", [(4096, 1024), (8192, 2048), (5000, 1024)]
)
def test_pallas_sort_sub_layout_matches_numpy(rng, n, blk, looped):
    """The sublane-major layout (consecutive elements down sublanes;
    round-2 chip winner at 2^16 unrolled blocks) must agree bit-for-bit
    with numpy in both kernel forms."""
    a = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    a[:4] = [0, 0xFFFFFFFFFFFFFFFF, 7, 7]
    got = np.asarray(sort_codes_pallas(jnp.asarray(a), block_elems=blk,
                                       interpret=True, looped=looped,
                                       layout="sub"))
    np.testing.assert_array_equal(got, np.sort(a))


def test_pallas_sort_kv_sub_layout(rng):
    from unikmer_tpu.ops.pallas_sort import sort_codes_taxids_pallas

    n, blk = 4096, 1024
    codes = rng.integers(0, 1 << 46, size=n, dtype=np.uint64)
    codes[: n // 3] = codes[0]
    tax = rng.integers(1, 1 << 20, size=n, dtype=np.uint32)
    c, t = sort_codes_taxids_pallas(
        jnp.asarray(codes), jnp.asarray(tax), block_elems=blk,
        interpret=True, layout="sub",
    )
    c, t = np.asarray(c), np.asarray(t)
    np.testing.assert_array_equal(c, np.sort(codes))
    got = np.stack([c, t.astype(np.uint64)], 1)
    order = np.argsort(codes, kind="stable")
    want = np.stack([codes[order], tax[order].astype(np.uint64)], 1)
    got = got[np.lexsort((got[:, 1], got[:, 0]))]
    want = want[np.lexsort((want[:, 1], want[:, 0]))]
    np.testing.assert_array_equal(got, want)
