"""Bisect WHICH fragment of the taxid-union graph starves the remote
compile helper (BENCH_NOTES round-3: the full program grinds >40 min
at 2^23 while count_step compiles in ~40 s).

Compiles cumulative fragments F1..F5 in ONE process, sequentially,
each under the phase watchdog (NO alarms — an abandoned compile
poisons the queue; if a fragment sticks, the log shows which and the
session simply stays occupied).  Run only when no other device work
is pending.
"""

import sys
import time

import numpy as np

import unikmer_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from functools import partial

from unikmer_tpu.models.count import phase_watchdog

N = 1 << 23
CODE_BITS = 46
C = 16  # closure size
IB = 5  # id bits (16 ids -> 4, +1 headroom)


def data():
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 1 << CODE_BITS, N, dtype=np.uint64)
    ctax = rng.integers(0, C, N, dtype=np.int64).astype(np.int32)
    valid = codes != np.uint64(0xFFFFFFFFFFFFFFFF)
    tab = np.zeros((C, C), np.int32)
    return (jnp.asarray(codes), jnp.asarray(ctax), jnp.asarray(valid),
            jnp.asarray(tab))


def frag_sort(codes, ctax, valid, tab):
    from unikmer_tpu.taxonomy.lca import _collapse_sort

    s_codes, tax, s_valid = _collapse_sort(codes, ctax, valid, C, CODE_BITS)
    return s_codes[0] + tax[0].astype(jnp.uint64) + s_valid[0]


def frag_bounds(codes, ctax, valid, tab):
    from unikmer_tpu.taxonomy.lca import _collapse_sort

    s_codes, tax, s_valid = _collapse_sort(codes, ctax, valid, C, CODE_BITS)
    n = s_codes.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool),
                             s_codes[1:] != s_codes[:-1]])
    start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, 0))
    return s_codes[0] + start[-1].astype(jnp.uint64) + tax[0].astype(
        jnp.uint64)


def frag_rounds(codes, ctax, valid, tab):
    from unikmer_tpu.taxonomy.lca import lca_collapse_compact

    s_codes, tax, keep, s_valid = lca_collapse_compact(
        codes, ctax, valid, tab, 23, CODE_BITS)
    return s_codes[0] + tax[0].astype(jnp.uint64) + keep[0]


def frag_union(codes, ctax, valid, tab):
    from unikmer_tpu.ops.device_sets import union_taxids_compact

    out_c, out_t, nn = union_taxids_compact(codes, ctax, tab, 23,
                                            "table", CODE_BITS)
    return out_c[0] + out_t[0].astype(jnp.uint64) + nn.astype(jnp.uint64)


def frag_union_z(codes, ctax, valid, tab):
    from unikmer_tpu.ops.device_sets import _union_taxids_compact_z

    z = _union_taxids_compact_z(codes, ctax, tab, 23, "table", CODE_BITS)
    return z[0][0].astype(jnp.uint64) + z[4].astype(jnp.uint64)


def main():
    print(f"# backend={jax.default_backend()} N=2^23", flush=True)
    args = data()
    for name, f in (("F1 collapse-sort", frag_sort),
                    ("F2 +run-bounds", frag_bounds),
                    ("F3 full collapse (fori rounds)", frag_rounds),
                    ("F4 union (+threshold+compact)", frag_union),
                    ("F5 union + z-egress", frag_union_z)):
        jf = jax.jit(f)
        t0 = time.time()
        with phase_watchdog(f"bisect {name}"):
            v = int(np.asarray(jf(*args)))
        print(f"{name:34s} compile+run {time.time() - t0:7.1f}s "
              f"(v={v})", flush=True)
    print("# all fragments compiled", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
