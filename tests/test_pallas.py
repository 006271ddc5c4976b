"""Pallas encode kernel: interpret-mode equivalence vs the jnp path.

(On-hardware validation is in the kernel docstring: compiled on v5e with
identical checksums; CI here runs the interpreter.)
"""

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
