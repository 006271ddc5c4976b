"""unikmer_tpu — a TPU-native k-mer analysis engine.

A from-scratch re-design of the capabilities of shenwei356/unikmer v0.21.0
(reference surveyed in SURVEY.md) for TPU hardware: k-mers are encoded
(2-bit, k<=32) or hashed (ntHash v1, k<=64) into uint64 codes with
vectorized JAX/XLA/Pallas kernels, represented as sorted uint64 arrays in
HBM (optionally with a uint32 TaxId column), and manipulated with
merge-based sorted-set operations (union / intersection / difference /
common / unique / repeated) where TaxIds merge by LCA.

Layer map (bottom-up):
  io/        .unik serialization, FASTA/Q ingest, varint-GB codec
  ops/       device kernels: 2-bit codec, ntHash, sketches, sort, set ops
  taxonomy/  NCBI taxdump loading, O(1) vectorized LCA, ranks
  models/    end-to-end jitted pipelines (count/sketch "flagship model")
  parallel/  device meshes, hash-range sharded sets, collectives
  pipeline/  host orchestration: chunking, external sort spill, multi-host
  cli/       the unikmer-compatible command-line surface (23 subcommands)
  utils/     logging, sizes, file lists
"""

# 64-bit integers are the core currency of this package (k-mer codes are
# uint64).  x64 must be enabled before anything traces; on TPU XLA lowers
# 64-bit integer ops to 32-bit pairs, and the Pallas hot kernels use
# explicit (hi, lo) uint32 representations instead.
#
# jax itself costs ~2.3 s to import, which would dominate every host-only
# CLI invocation (union/inter/view/... never touch the device).  So jax
# is NOT imported here: if it is already in sys.modules (e.g. a TPU-host
# sitecustomize imported it at interpreter start) it is configured
# immediately, otherwise a one-shot import hook configures it the moment
# anything imports it — before any trace or backend init can happen.
import os as _os
import sys as _sys


def _configure_jax() -> None:
    from jax import config as _jax_config

    _jax_config.update("jax_enable_x64", True)

    # Persistent compilation cache: the CLI spawns a fresh process per
    # command, so XLA programs (20-40 s first compile on TPU) must be
    # reused across runs.  UNIKMER_TPU_CACHE=0 (or empty) disables it.
    _cache_dir = _os.environ.get(
        "UNIKMER_TPU_CACHE", _os.path.expanduser("~/.cache/unikmer_tpu/xla")
    )
    if _cache_dir and _cache_dir != "0":
        try:
            _os.makedirs(_cache_dir, exist_ok=True)
            _jax_config.update("jax_compilation_cache_dir", _cache_dir)
            _jax_config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        except (OSError, AttributeError):  # read-only fs / older jax: non-fatal
            pass

    # Optional platform override (e.g. UNIKMER_TPU_PLATFORM=cpu) — the
    # environment may force a platform via JAX_PLATFORMS before this runs.
    _platform = _os.environ.get("UNIKMER_TPU_PLATFORM")
    if _platform:
        _jax_config.update("jax_platforms", _platform)


class _JaxConfigureOnImport:
    """meta_path hook: run _configure_jax() right after ``jax`` first
    executes, then retire.  Guarantees configuration precedes any trace
    or backend initialization no matter which module imports jax first."""

    def find_spec(self, name, path=None, target=None):
        if name != "jax":
            return None
        import importlib.util

        try:
            _sys.meta_path.remove(self)
        except ValueError:  # concurrent import already consumed the hook
            return None
        spec = importlib.util.find_spec("jax")
        if spec is None or spec.loader is None:
            return None
        loader = spec.loader
        orig_exec = loader.exec_module

        def exec_module(module):
            orig_exec(module)
            _configure_jax()

        loader.exec_module = exec_module
        return spec


if "jax" in _sys.modules:
    _configure_jax()
else:
    _sys.meta_path.insert(0, _JaxConfigureOnImport())

# numpy madvises MADV_HUGEPAGE on every buffer >= 4 MB; on virtualized
# hosts (Firecracker/GKE guests) a 2 MB huge fault can cost ~100 ms —
# measured 200 s/GB first-touch vs 0.7 s/GB with plain 4 KB faults, a
# ~200x tax on every large temp in the CLI.  Disable it (runtime switch
# works even when numpy is already imported); UNIKMER_TPU_HUGEPAGE=1
# restores numpy's default for bare-metal hosts where THP helps.
if _os.environ.get("UNIKMER_TPU_HUGEPAGE") != "1":
    _os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")  # subprocesses
    try:
        try:
            from numpy._core import multiarray as _ma
        except ImportError:  # numpy < 2
            from numpy.core import multiarray as _ma
        _ma._set_madvise_hugepage(False)
    except Exception:  # private API: best-effort
        pass

# Keep large freed allocations on the heap instead of returning pages to
# the OS: with glibc's default mmap threshold every multi-hundred-MB
# numpy temp is a fresh mmap that re-faults its pages.  M_MMAP_THRESHOLD
# / M_TRIM_THRESHOLD pushed up -> pages fault once and are reused.
try:
    import ctypes as _ctypes

    _libc = _ctypes.CDLL("libc.so.6", use_errno=True)
    _libc.mallopt(-3, 1 << 31)  # M_MMAP_THRESHOLD
    _libc.mallopt(-1, 1 << 31)  # M_TRIM_THRESHOLD
    # The numpy madvise switch above only stops NEW MADV_HUGEPAGE calls;
    # vmas marked before it ran (during numpy import) keep VM_HUGEPAGE,
    # glibc recycles those arenas, and khugepaged (defrag=madvise here)
    # keeps collapsing them — measured 3 s vs 300 s run-to-run variance
    # on identical 800 MB numpy temps.  PR_SET_THP_DISABLE (=41) turns
    # THP off for the whole process regardless of per-vma flags.
    if _os.environ.get("UNIKMER_TPU_HUGEPAGE") != "1":
        _libc.prctl(41, 1, 0, 0, 0)  # PR_SET_THP_DISABLE
except (OSError, AttributeError):  # non-glibc platforms: best-effort
    pass

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports for the library API."""
    if name in ("CountConfig", "count_packed", "count_linear"):
        from .models import count as _m

        return getattr(_m, name)
    if name in ("UnikReader", "UnikWriter"):
        from .io import unik as _u

        return getattr(_u, name)
    if name in ("pack_files", "pack_records", "read_fastx"):
        from .io import fastx as _f

        return getattr(_f, name)
    if name == "load_taxonomy":
        from .taxonomy.taxdump import load_taxonomy

        return load_taxonomy
    if name == "KmerSet":
        from .api import KmerSet

        return KmerSet
    raise AttributeError(name)

# Version of the reference toolkit whose behavior we reproduce.
REFERENCE_VERSION = "0.21.0"
# .unik format version we emit (parity with unik/v5 v5.0 semantics;
# byte-level layout is this package's own documented layout, see io/unik.py).
# Must track io.unik.MAIN_VERSION/MINOR_VERSION (duplicated here so
# importing the package root stays cheap; guarded by test_unik_io).
UNIK_MAIN_VERSION = 5
UNIK_MINOR_VERSION = 1
