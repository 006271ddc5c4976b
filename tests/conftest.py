"""Test harness: run everything on a virtual 8-device CPU mesh.

The environment forces JAX_PLATFORMS=axon (one real TPU chip) via
sitecustomize; tests must run on CPU with 8 virtual devices so sharding
paths are exercised without hardware.  jax.config wins over the env here.
"""

import os

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

# VMA exhaustion guard: every cached CPU executable holds mmap'd code/
# trampoline pages (a single pallas-interpret sort: ~1,200 VMAs), and a
# full suite run accumulates past the kernel's vm.max_map_count (65,530
# here), after which ANY mmap inside XLA fails and the process
# segfaults/aborts at a state-dependent spot (observed in compile,
# serialize, and deserialize alike — diagnosed by sampling
# /proc/self/maps, 39 -> 63,060 right before the crash).  Clearing
# jax's caches releases the executables and their pages.  Short-lived
# CLI processes never get close; only many-program processes like this
# suite need the guard.
_VMA_GUARD_LIMIT = 30_000


def _n_vmas() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: no guard needed
        return 0

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REF_TESTDATA = "/root/reference/testdata/old"

GENOMES = {
    "mg1655": f"{REF_TESTDATA}/Ecoli-MG1655.fasta.gz",
    "iai39": f"{REF_TESTDATA}/Ecoli-IAI39.fasta.gz",
    "amuc": f"{REF_TESTDATA}/A.muciniphila-ATCC_BAA-835.fasta.gz",
}

# Conformance fixture counts from the reference README (SURVEY.md §6).
FIXTURE_COUNTS_K23_CANONICAL = {
    "mg1655": 4_546_632,
    "iai39": 4_902_266,
    "amuc": 2_630_905,
}


def pytest_addoption(parser):
    parser.addoption(
        "--full",
        action="store_true",
        default=os.environ.get("UNIKMER_TPU_FULL", "") == "1",
        help="run full-genome conformance fixtures (slow on CPU)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--full"):
        return
    skip = pytest.mark.skip(reason="full-genome fixture; enable with --full")
    for item in items:
        if "full" in item.keywords:
            item.add_marker(skip)


def pytest_configure(config):
    config.addinivalue_line("markers", "full: full-genome conformance fixtures")


@pytest.fixture(autouse=True)
def _vma_guard():
    """Release cached executables before the VMA count hits the kernel
    limit (see the vm.max_map_count note above)."""
    yield
    if _n_vmas() > _VMA_GUARD_LIMIT:
        jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)


def random_dna(rng, n, p_invalid=0.0):
    bases = rng.choice(list(b"ACGT"), size=n).astype(np.uint8)
    if p_invalid > 0:
        mask = rng.random(n) < p_invalid
        bases[mask] = ord("N")
    return bases.tobytes()
