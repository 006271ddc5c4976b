"""The flagship pipeline: FASTA/Q -> k-mer / sketch set ("count").

Reference behavior: unikmer/cmd/count.go (SURVEY.md §3.1).  The Go code
streams one k-mer at a time through a map; here one jitted XLA program
encodes/hashes EVERY window of a packed sequence batch, masks invalid
windows, and sort-collapses to the distinct (or unique/repeated) set on
device.  Host code only packs bytes and slices the resulting prefix.

Modes mirror the reference:
  * encoded (2-bit, k<=32) or hashed (ntHash v1, k<=64, forced for k>32)
  * canonical
  * scaled MinHash (keep hash <= maxUint64/scale, count.go:89-98,373-375)
  * minimizer / closed syncmer sketches (ops/sketch.py)
  * distinct / unique (-u) / repeated (-d) collapse
  * circular genomes (wrap windows materialized by the packer)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace as dc_replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..io.fastx import PackedSeqs
from ..ops import codec
from ..ops.nthash import nthash_windows, scaled_max_hash
from ..ops.sort import collapse_sorted

# ---------------------------------------------------------------------
# Streaming-path phase profiler (UNIKMER_TPU_PROFILE_STREAM=1).
#
# The round-4 verdict's top item: the streamed device path delivers
# 2.96M k-mers/s vs 215.9M device-resident, and nobody measured WHERE
# the wall-clock goes.  This attributes every streaming phase (host
# pack, 2-bit ingress, device upload, program dispatch, result sync,
# decode fetch, host sink merge) with near-zero overhead when off.
# Reference analog: the Go pipeline's pprof story (count.go:285-439
# is tuned via goroutine profiles).
# ---------------------------------------------------------------------

_PROF: dict | None = None


def stream_profile_reset() -> None:
    """Enable (env) + clear the phase table; call before a run."""
    global _PROF
    on = os.environ.get("UNIKMER_TPU_PROFILE_STREAM", "0") == "1"
    _PROF = {} if on else None


def stream_profile_table() -> dict:
    """{phase: (total_s, calls)} accumulated since the last reset."""
    return {k: tuple(v) for k, v in (_PROF or {}).items()}


def stream_profile_report(out=None) -> None:
    import sys

    if not _PROF:
        return
    out = out or sys.stderr
    total = sum(v[0] for v in _PROF.values())
    print("# stream profile (exclusive wall per phase):", file=out)
    for name, (secs, calls) in sorted(_PROF.items(),
                                      key=lambda kv: -kv[1][0]):
        print(f"#   {name:<22} {secs:8.3f}s  x{calls:<5} "
              f"({100 * secs / max(total, 1e-9):5.1f}%)", file=out)
    print(f"#   {'TOTAL(tracked)':<22} {total:8.3f}s", file=out)


class _prof:
    """Context timer: no-op unless profiling is enabled."""

    __slots__ = ("name", "t0")

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        if _PROF is not None:
            import time

            self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if _PROF is not None:
            import time

            e = _PROF.setdefault(self.name, [0.0, 0])
            e[0] += time.perf_counter() - self.t0
            e[1] += 1
        return False


stream_profile_reset()


@dataclass(frozen=True)
class CountConfig:
    k: int
    canonical: bool = False
    hashed: bool = False
    scale: int = 1
    minimizer_w: int = 0
    syncmer_s: int = 0
    syncmer_impl: str = "edgar"  # edgar | compat (DIVERGENCES.md §2)
    circular: bool = False
    mode: str = "distinct"  # distinct | unique | repeated

    @property
    def code_bits(self) -> int:
        """Normalized static sort hint (ops/sort.sort_code_bits): 2k
        for narrow-splittable 2-bit configs, else 64.  NOT the true
        value width — partitioning code computes that itself."""
        from ..ops.sort import sort_code_bits

        return sort_code_bits(self.k, self.hashed)

    @property
    def segmentable(self) -> bool:
        """Whether windows are a pure per-position function of k bases
        (then k-1-overlap record segmentation partitions them exactly).
        Minimizer/syncmer selection spans w neighboring windows, so
        sketched records must stay whole."""
        return self.minimizer_w == 0 and self.syncmer_s == 0

    @property
    def needs_record_sep(self) -> bool:
        """The compat syncmer's device twin needs RECORD_SEP-delimited
        packing with widened gaps (ops/sketch.syncmer_compat_windows):
        its per-record truncation + fill semantics cannot be derived
        from the validity mask alone, so such configs must skip the
        2-bit ingress pack (which erases the separator value)."""
        return self.syncmer_s > 0 and self.syncmer_impl == "compat"

    @property
    def record_gap(self) -> int:
        """Separator-run length pack_records must use for this config."""
        if not self.needs_record_sep:
            return 1
        from ..ops.sketch import compat_gap

        return compat_gap(self.k, self.syncmer_s)

    def __post_init__(self):
        if self.syncmer_s == 0 and self.syncmer_impl != "edgar":
            # normalize so config equality/jit caches aren't fragmented
            object.__setattr__(self, "syncmer_impl", "edgar")
        if self.k > codec.MAX_K_ENCODED and not self.hashed:
            object.__setattr__(self, "hashed", True)
        if self.scale > 1 and not self.hashed:
            object.__setattr__(self, "hashed", True)
        if (self.minimizer_w > 0 or self.syncmer_s > 0) and not (
            self.hashed and self.canonical
        ):
            object.__setattr__(self, "hashed", True)
            object.__setattr__(self, "canonical", True)
        if self.minimizer_w > 0 and self.syncmer_s > 0:
            raise ValueError("minimizer and syncmer are mutually exclusive")
        if self.hashed and self.k > codec.MAX_K_HASHED:
            raise ValueError(f"k must be <= {codec.MAX_K_HASHED}")


def window_codes(bases: jnp.ndarray, cfg: CountConfig):
    """Per-position codes + validity for a packed base array.

    Returns (codes, valid) of length len(bases).  This is the shared
    front half of count/grep/locate/map pipelines.
    """
    k = cfg.k
    valid = codec.window_valid(bases, k)
    if cfg.minimizer_w > 0:
        from ..ops.sketch import minimizer_windows

        return minimizer_windows(bases, k, cfg.minimizer_w)
    if cfg.syncmer_s > 0:
        if cfg.syncmer_impl == "compat":
            from ..ops.sketch import syncmer_compat_windows

            return syncmer_compat_windows(bases, k, cfg.syncmer_s)
        from ..ops.sketch import syncmer_windows

        return syncmer_windows(bases, k, cfg.syncmer_s)
    if cfg.hashed:
        codes = nthash_windows(bases, k, cfg.canonical)
    else:
        codes = codec.kmer_codes(bases, k)
        if cfg.canonical:
            codes = codec.canonical_code(codes, k)
    if cfg.scale > 1:
        max_hash = jnp.uint64(scaled_max_hash(cfg.scale))
        valid = valid & (codes <= max_hash)
    return codes, valid


@partial(jax.jit, static_argnames=("cfg",))
def count_step(bases: jnp.ndarray, cfg: CountConfig):
    """Jitted: packed bases -> (sorted dense prefix of kept codes, n)."""
    codes, valid = window_codes(bases, cfg)
    if cfg.scale > 1 and (cfg.minimizer_w > 0 or cfg.syncmer_s > 0):
        max_hash = jnp.uint64(scaled_max_hash(cfg.scale))
        valid = valid & (codes <= max_hash)
    return collapse_sorted(codes, valid, mode=cfg.mode,
                           code_bits=cfg.code_bits)


@partial(jax.jit, static_argnames=("cfg",))
def linear_codes_step(bases: jnp.ndarray, cfg: CountConfig):
    """Jitted: packed bases -> (codes, valid) in genome order (count -l)."""
    codes, valid = window_codes(bases, cfg)
    if cfg.scale > 1 and (cfg.minimizer_w > 0 or cfg.syncmer_s > 0):
        max_hash = jnp.uint64(scaled_max_hash(cfg.scale))
        valid = valid & (codes <= max_hash)
    return codes, valid


# Pad packed buffers to a small set of bucket lengths so recompilation is
# bounded (XLA wants static shapes; SURVEY.md §7.3 "ragged genomes").
# On TPU the minimum bucket is 2^23: this backend's compiler hits a
# pathological compile-time cliff on mid-sized (~2^20) scans/sorts while
# 2^23 compiles fast, and one cached 8M-element program covers every
# small input.
def _pad_quantum() -> int:
    return (1 << 23) if jax.default_backend() == "tpu" else (1 << 20)


def _padded_len(n: int) -> int:
    q = _pad_quantum()
    while q < n:
        q *= 2
    return q


def pad_bases(bases: np.ndarray) -> np.ndarray:
    n = len(bases)
    padded = np.full(_padded_len(max(n, 1)), codec.INVALID_BASE, dtype=np.uint8)
    padded[:n] = bases
    return padded


# Compressed host->device base transfer: 2 bits/base + 1 validity
# bit/base (2.125 bits vs 8) — 3.8x less PCIe/tunnel traffic; the device
# unpacks with two cheap VPU gathers inside the jitted program.
def pack_bases_2bit(bases: np.ndarray):
    """(packed2 u8 [ceil(n/4)], validmask u8 [ceil(n/8)]) for a padded
    base array (values 0..3 valid, anything else invalid).  Routes
    through the multithreaded native kernel when available (~1 s of
    numpy per streamed 4x2^25 batch otherwise — round-5 profile)."""
    from ..native import pack_bases_2bit as native_pack

    res = native_pack(bases)
    if res is not None:
        return res
    n = len(bases)
    n4 = -(-n // 4) * 4
    n8 = -(-n // 8) * 8
    b = np.zeros(n4, np.uint8)
    np.copyto(b[:n], bases, casting="unsafe")
    valid = np.zeros(n8, bool)
    valid[:n] = bases < 4
    b = np.where(valid[:n4], b, 0).astype(np.uint8)
    quads = b.reshape(-1, 4)
    packed2 = (
        quads[:, 0]
        | (quads[:, 1] << 2)
        | (quads[:, 2] << 4)
        | (quads[:, 3] << 6)
    ).astype(np.uint8)
    validmask = np.packbits(valid.reshape(-1, 8), axis=1, bitorder="little")
    return packed2, validmask.reshape(-1)


def unpack_bases_2bit(packed2: jnp.ndarray, validmask: jnp.ndarray, n: int):
    """Device-side inverse of pack_bases_2bit -> u8 bases with
    codec.INVALID_BASE on invalid slots (shape (n,))."""
    q = packed2.astype(jnp.uint32)
    shifts = jnp.arange(4, dtype=jnp.uint32) * 2
    b = ((q[:, None] >> shifts[None, :]) & 3).astype(jnp.uint8).reshape(-1)[:n]
    m = validmask.astype(jnp.uint32)
    bits = jnp.arange(8, dtype=jnp.uint32)
    v = ((m[:, None] >> bits[None, :]) & 1).astype(jnp.bool_).reshape(-1)[:n]
    return jnp.where(v, b, jnp.uint8(codec.INVALID_BASE))


# Compressed result fetch: sorted codes come back as uint32 deltas plus
# an exception list for deltas >= 2^32 — 2x fewer bytes over PCIe (and
# this environment's slow device->host tunnel).  u32 covers every
# encoded set bigger than 2^(2k-32) codes; hashed sets (64-bit space,
# huge deltas) overflow the exception buffer and fall back to the raw
# fetch.  Exact either way.
_MAX_EXC = 1 << 16


def _exc_overflow_limit() -> int:
    """Fetch-time overflow threshold for the compressed-egress
    exception lists.  Separate from the trace-time _MAX_EXC buffer size
    so tests can force the overflow fallback without poisoning
    re-traces (the suite's VMA guard clears jit caches mid-run)."""
    return _MAX_EXC


def _compress_result(out, n):
    idx = jnp.arange(out.shape[0], dtype=jnp.int64)
    prev = jnp.concatenate([jnp.zeros((1,), jnp.uint64), out[:-1]])
    delta = jnp.where(idx < n, out - prev, jnp.uint64(0))
    big = delta >= jnp.uint64(1 << 32)
    n_exc = jnp.sum(big, dtype=jnp.int64)
    # Exception (index, value) pairs via ONE u32 single-operand sort +
    # a tiny fixed-slice gather.  The previous scatter formulation
    # (2^25-source .at[pos].set into the 2^16 buffers) cost 4.3-5.9 s
    # PER PIECE on this backend and silently dominated the whole
    # streamed pipeline at 45 s / 4x2^25 — the round-5 chip micro
    # measured e_scatter_only 5.87 s vs f_sortexc 0.15 s at 2^25
    # (docs/BENCH_NOTES.md round-5; scripts/exp_round5_micro.py).
    key = jnp.where(big, idx.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))
    from ..ops.sort import _sort_stable

    skey = jax.lax.sort(key, is_stable=_sort_stable())[:_MAX_EXC]
    exc_idx = jnp.where(skey == jnp.uint32(0xFFFFFFFF), jnp.int64(-1),
                        skey.astype(jnp.int64))
    take = jnp.clip(exc_idx, 0, out.shape[0] - 1)
    exc_val = jnp.where(exc_idx >= 0, out[take], jnp.uint64(0))
    small = jnp.where(big, jnp.uint64(0), delta).astype(jnp.uint32)
    return small, exc_idx, exc_val, n_exc, n


def _split_egress() -> bool:
    """Run the compressed-egress delta encoding as its OWN program with
    device-resident handoff instead of fused into the count program.
    Round-5 chip finding: the FUSED composition costs ~4.2 s/piece at
    2^25 on this backend while the two programs run in 0.167 s + 0.03 s
    — an XLA fusion pathology, not arithmetic cost (the same graph
    fed from a materialized buffer runs 140x faster;
    scripts/exp_round5_micro3.py).  UNIKMER_TPU_SPLIT_EGRESS=0 restores
    the fused form for experiments."""
    return os.environ.get("UNIKMER_TPU_SPLIT_EGRESS", "1") != "0"


@jax.jit
def _compress_stage(out, n):
    """Stage-2 program: compressed egress over a device-resident count
    result (see _split_egress)."""
    return _compress_result(out, n)


@jax.jit
def _compress_stage_multi(outs, ns):
    """Stacked twin of _compress_stage for the multi-bucket programs."""
    return jax.lax.map(lambda a: _compress_result(a[0], a[1]), (outs, ns))


@partial(jax.jit, static_argnames=("cfg",))
def _count_step_packed_result(bases: jnp.ndarray, cfg: CountConfig):
    out, n = count_step(bases, cfg)
    return _compress_result(out, n)


@partial(jax.jit, static_argnames=("cfg", "n"))
def _count_step_packed2_result(packed2, validmask, cfg: CountConfig, n: int):
    out, nn = count_step(unpack_bases_2bit(packed2, validmask, n), cfg)
    return _compress_result(out, nn)


@partial(jax.jit, static_argnames=("cfg", "n"))
def _count_step_packed2_raw(packed2, validmask, cfg: CountConfig, n: int):
    """2-bit compressed transfer in, raw u64 codes out (for configs
    whose code space makes u32-delta result compression hopeless)."""
    return count_step(unpack_bases_2bit(packed2, validmask, n), cfg)


@partial(jax.jit, static_argnames=("cfg",))
def count_step_dual(bases: jnp.ndarray, cfg: CountConfig):
    """Jitted: one sort, both capped-multiplicity outputs —
    (distinct, n_d, within-piece repeated, n_r).  The -u/-d streams
    need both per piece; fusing them halves the sort work
    (ops/sort.collapse_sorted_dual)."""
    from ..ops.sort import collapse_sorted_dual

    codes, valid = window_codes(bases, cfg)
    if cfg.scale > 1 and (cfg.minimizer_w > 0 or cfg.syncmer_s > 0):
        max_hash = jnp.uint64(scaled_max_hash(cfg.scale))
        valid = valid & (codes <= max_hash)
    return collapse_sorted_dual(codes, valid, code_bits=cfg.code_bits)


@partial(jax.jit, static_argnames=("cfg", "n", "z"))
def _count_step_dual_multi(packed2s, validmasks, cfg: CountConfig, n: int,
                           z: bool):
    """B stacked buckets through the fused dual collapse (lax.map)."""

    def body(args):
        p2, vm = args
        od, nd, orp, nr = count_step_dual(
            unpack_bases_2bit(p2, vm, n), cfg)
        if z:
            return _compress_result(od, nd) + _compress_result(orp, nr)
        return od, nd, orp, nr

    return jax.lax.map(body, (packed2s, validmasks))


@partial(jax.jit, static_argnames=("cfg", "n"))
def _dual_sort_stage(packed2s, validmasks, cfg: CountConfig, n: int):
    """Stage 1/2 of the STAGED dual collapse: B x (2-bit decode +
    encode + keyed sort) -> (sorted keys (B, n), n_sent_real (B,),
    n_head (B,)).  The fused B>=2 dual graph SIGKILLs the remote
    compile helper (oversized graph, BENCH_NOTES round-3 phase 2);
    splitting at the sorted boundary gives two programs of proven
    shapes with device-resident handoff — the same fix as the staged
    taxid programs (ops/device_sets.run_staged_taxid_collapse)."""
    from ..ops.sort import CODE_SENTINEL, _sort_u64

    def body(args):
        p2, vm = args
        bases = unpack_bases_2bit(p2, vm, n)
        codes, valid = window_codes(bases, cfg)
        if cfg.scale > 1 and (cfg.minimizer_w > 0 or cfg.syncmer_s > 0):
            max_hash = jnp.uint64(scaled_max_hash(cfg.scale))
            valid = valid & (codes <= max_hash)
        sent = jnp.uint64(CODE_SENTINEL)
        keyed = jnp.where(valid, codes, sent)
        n_sent_real = jnp.sum((codes == sent) & valid, dtype=jnp.int64)
        n_tail = jnp.sum(~valid, dtype=jnp.int64) + n_sent_real
        s = _sort_u64(keyed, code_bits=cfg.code_bits)
        n_head = jnp.int64(codes.shape[0]) - n_tail
        return s, n_sent_real, n_head

    return jax.lax.map(body, (packed2s, validmasks))


@partial(jax.jit, static_argnames=("z", "code_bits"))
def _dual_collapse_stage(s_all, n_sent_real, n_head, z: bool,
                         code_bits: int = 64):
    """Stage 2/2 of the staged dual collapse: B x (run bounds + both
    compacts + optional compressed egress).  Result layout identical
    to _count_step_dual_multi so count_packed_fetch_group is shared."""
    from ..ops.sort import collapse_dual_from_sorted

    def body(args):
        s, nsr, nh = args
        od, nd, orp, nr = collapse_dual_from_sorted(s, nsr, nh,
                                                    code_bits=code_bits)
        if z:
            return _compress_result(od, nd) + _compress_result(orp, nr)
        return od, nd, orp, nr

    return jax.lax.map(body, (s_all, n_sent_real, n_head))


@partial(jax.jit, static_argnames=("cfg", "n", "z"))
def _count_step_multi(packed2s, validmasks, cfg: CountConfig, n: int,
                      z: bool):
    """One program over B stacked equal-length buckets, sequenced with
    lax.map (a single 2^26 sort hangs this backend; B sequential 2^25
    bodies compile and run).  Amortizes the ~20-25 ms fixed
    dispatch+fetch floor across B buckets on the streaming paths
    (VERDICT round-2 next #5; reference analog: the goroutine pipeline
    count.go:285-439 keeps its workers saturated)."""

    def body(args):
        p2, vm = args
        out, nn = count_step(unpack_bases_2bit(p2, vm, n), cfg)
        if z:
            return _compress_result(out, nn)
        return out, nn

    return jax.lax.map(body, (packed2s, validmasks))


def _decode_packed_result(small, exc_idx, exc_val, n_exc, n):
    n = int(n)
    n_exc = int(n_exc)
    with _prof("fetch.small"):
        d = np.asarray(small[:n]).astype(np.uint64)
    if n == 0:
        return np.zeros(0, np.uint64)
    with np.errstate(over="ignore"):
        codes = np.cumsum(d, dtype=np.uint64)
    if n_exc:
        idx = np.asarray(exc_idx[:n_exc]).astype(np.int64)
        val = np.asarray(exc_val[:n_exc])
        # each exception j resets the absolute value at index i_j; the
        # per-segment correction is val_j - cumsum[i_j], applied as a
        # step function via one more cumsum (mod-2^64 arithmetic exact)
        with np.errstate(over="ignore"):
            seg_corr = val - codes[idx]
            step = np.zeros(n, np.uint64)
            step[idx] = seg_corr - np.concatenate(
                [np.zeros(1, np.uint64), seg_corr[:-1]]
            )
            codes += np.cumsum(step, dtype=np.uint64)
    return codes


def phase_watchdog(phase: str, every_s: int = 120):
    """Context manager: periodic stderr diagnostic while a device phase
    (upload / compile submission / dispatch) is in flight — these have
    no result to watchdog-fetch, and the tunnel can stall them
    silently for many minutes (BENCH_NOTES round-3)."""
    import contextlib
    import sys
    import threading

    @contextlib.contextmanager
    def cm():
        done = threading.Event()

        def warn():
            waited = 0
            while not done.wait(every_s):
                waited += every_s
                print(
                    f"[WARNING] {phase} still in flight after {waited}s "
                    "(first compiles of big programs can take minutes; "
                    "a silent tunnel stall looks identical)",
                    file=sys.stderr,
                    flush=True,
                )

        t = threading.Thread(target=warn, daemon=True)
        t.start()
        try:
            yield
        finally:
            done.set()

    return cm()


def _fetch_scalar_watchdog(x, every_s: int = 120):
    """int(x) with a monitor thread: tunnel-attached devices can silently
    drop an execution (observed wedges of 30-60 min); surface a periodic
    diagnostic instead of hanging without explanation."""
    import sys
    import threading

    done = threading.Event()

    def warn():
        waited = 0
        while not done.wait(every_s):
            waited += every_s
            print(
                f"[WARNING] device result still pending after {waited}s — "
                "the TPU link may be wedged (transient on tunnel-attached "
                "chips). Set UNIKMER_TPU_PLATFORM=cpu to run without the "
                "device.",
                file=sys.stderr,
                flush=True,
            )

    t = threading.Thread(target=warn, daemon=True)
    t.start()
    try:
        return int(x)
    finally:
        done.set()


def count_step_ingress(bases: np.ndarray, cfg: CountConfig):
    """count_step whose host->device transfer is 2-bit packed on real
    devices (2.125 bits/base vs 8 over the ~35 MB/s tunnel); the result
    stays on device.  ``bases`` must already be padded (pad_bases)."""
    import os

    if (
        jax.default_backend() != "cpu"
        and os.environ.get("UNIKMER_TPU_PACKED_TRANSFER", "1") != "0"
        and not cfg.needs_record_sep  # 2-bit pack erases RECORD_SEP
    ):
        _warm_device_session()
        packed2, validmask = pack_bases_2bit(bases)
        return _count_step_packed2_raw(packed2, validmask, cfg, len(bases))
    return count_step(bases, cfg)


_session_warm = False


def _warm_device_session() -> None:
    """One tiny round-trip before the first big dispatch of the process.

    On tunnel-attached chips a process's first large dispatch is
    occasionally dropped (the fetch then hangs forever); a small
    device_put + readback first establishes the session the way
    bench.py does.  The warm-up op ITSELF can be silently dropped
    (observed 2026-08-20 after a wedge: 20+ min pending with the chip
    otherwise healthy), so readiness is POLLED and the tiny op
    re-dispatched up to UNIKMER_TPU_WARM_RETRIES times (default 3)
    every UNIKMER_TPU_WARM_RETRY_S seconds (default 300) before
    falling back to a blocking watchdogged fetch.  No-op on the cpu
    backend so call sites need no guard of their own."""
    import sys
    import time

    global _session_warm
    if _session_warm or jax.default_backend() == "cpu":
        return
    with _prof("warmup.session"):
        _warm_device_session_inner()
    _session_warm = True


def _warm_device_session_inner() -> None:
    import sys
    import time
    tries = max(int(os.environ.get("UNIKMER_TPU_WARM_RETRIES", "3")), 1)
    poll_s = float(os.environ.get("UNIKMER_TPU_WARM_RETRY_S", "300"))
    x = None
    for attempt in range(tries):
        x = jax.device_put(np.zeros(8, np.float32)).sum()
        deadline = time.time() + poll_s
        pollable = True
        while time.time() < deadline:
            try:
                ready = x.is_ready()
            except Exception:
                pollable = False
                break
            if ready:
                break
            time.sleep(1.0)
        if not pollable or (attempt == tries - 1):
            break
        try:
            if x.is_ready():
                break
        except Exception:
            break
        print(
            "[WARNING] warm-up op still pending after "
            f"{poll_s:.0f}s — re-dispatching "
            f"({attempt + 2}/{tries}; dropped first dispatches are a "
            "known tunnel pathology)",
            file=sys.stderr,
            flush=True,
        )
    # blocking fetch (cheap when ready; watchdog surfaces a dead link)
    _fetch_scalar_watchdog(x)


def count_packed_dispatch(packed: PackedSeqs, cfg: CountConfig):
    """Enqueue the device count program for one packed piece and return
    an opaque token for :func:`count_packed_fetch`.

    Host-side work (padding, 2-bit ingress packing) and the async
    device dispatch happen here; the heavy device->host result fetch
    happens only at fetch time.  Streaming callers keep one extra token
    in flight so piece i+1's ingress/compute overlaps piece i's result
    fetch (double buffering over the ~6 MB/s egress tunnel)."""
    if packed.bases.size == 0:
        return ("empty",)
    bases = pad_bases(packed.bases)
    if jax.default_backend() == "cpu":
        return ("raw",) + count_step(bases, cfg)
    _warm_device_session()
    # u32-delta result compression only pays when deltas between sorted
    # codes actually fit 32 bits: expected delta ~ code_space / n.  For
    # large spaces (hashed 2^64, or encoded with 2k >> 32 + log2(n))
    # every delta overflows and we would run BOTH the compressed and
    # the raw program per chunk; skip straight to the raw-result
    # program (still with 2-bit compressed ingress).
    space_bits = 64 if cfg.hashed else 2 * cfg.k
    compress_result = space_bits - (len(bases).bit_length() - 1) <= 30
    if not compress_result:
        return ("raw",) + count_step_ingress(bases, cfg)
    import os

    if os.environ.get("UNIKMER_TPU_PACKED_TRANSFER", "1") != "0":
        packed2, validmask = pack_bases_2bit(bases)
        if _split_egress():
            out, nn = _count_step_packed2_raw(packed2, validmask, cfg,
                                              len(bases))
            res = _compress_stage(out, nn)
        else:
            res = _count_step_packed2_result(packed2, validmask, cfg,
                                             len(bases))
    elif _split_egress():
        res = _compress_stage(*count_step(bases, cfg))
    else:
        res = _count_step_packed_result(bases, cfg)
    return ("compressed", res, bases, cfg)


def count_packed_fetch(token) -> np.ndarray:
    """Materialize the result of a count_packed_dispatch token."""
    kind = token[0]
    if kind == "empty":
        return np.zeros(0, np.uint64)
    if kind == "raw":
        _, out, n = token
        return np.asarray(out[: _fetch_scalar_watchdog(n)])
    _, (small, exc_idx, exc_val, n_exc, n), bases, cfg = token
    if _fetch_scalar_watchdog(n_exc) > _exc_overflow_limit():  # huge deltas
        out, nn = count_step(bases, cfg)
        return np.asarray(out[: int(nn)])
    return _decode_packed_result(small, exc_idx, exc_val, n_exc, n)


def count_packed(packed: PackedSeqs, cfg: CountConfig) -> np.ndarray:
    """Host entry: packed sequences -> sorted numpy uint64 of kept codes.

    Non-CPU backends ship bases 2-bit packed (3.8x less host->device
    traffic) and fetch results as u32 deltas (2x less device->host;
    hashed sets overflow the exception list and fetch raw)."""
    return count_packed_fetch(count_packed_dispatch(packed, cfg))


def _pipeline_depth() -> int:
    """Extra dispatch tokens kept in flight by the streaming loops.

    1 on real devices (bounds device memory to ~2 piece results while
    overlapping fetch with compute); 0 on CPU where execution is
    effectively synchronous and overlap buys nothing."""
    import os

    env = os.environ.get("UNIKMER_TPU_PIPELINE_DEPTH")
    if env is not None:
        return max(0, int(env))
    return 1 if jax.default_backend() == "tpu" else 0


def _taxid_code_bits(cfg: CountConfig) -> int:
    """Static bound on VALID code values for a -T config: lets the
    collapse pack the taxid id into a single-operand sort key
    (taxonomy/lca._collapse_sort)."""
    if not cfg.hashed:
        return 2 * cfg.k
    if cfg.scale > 1:
        return int(scaled_max_hash(cfg.scale)).bit_length()
    return 64


@partial(jax.jit, static_argnames=("cfg", "rounds", "mode", "kind"))
def count_taxids_step(bases, pos_ctax, lca_tab, cfg: CountConfig,
                      rounds: int, mode: str, kind: str = "table"):
    """Jitted: packed bases + per-position COMPACT taxid ids -> sorted
    LCA-merged (codes, compact ids) dense prefix + count, entirely on
    device (VERDICT round-1 next #3; reference count.go:377-410).

    ``kind`` picks the vocabulary LCA representation (taxonomy/lca.py):
    "table" = (C, C) closure table, one gather per merge round (small
    vocabularies); "paths" = (C, Dp) path matrix, gather-free merge
    rounds (large vocabularies).  Either way the whole taxid collapse
    lives in the same program as encode + sort."""
    from ..ops.sort import _run_bounds, compact_aux, compact_sorted
    from ..taxonomy.lca import lca_collapse_compact, lca_collapse_paths

    codes, valid = window_codes(bases, cfg)
    if cfg.scale > 1 and (cfg.minimizer_w > 0 or cfg.syncmer_s > 0):
        # sketch branches return from window_codes before the scaled
        # filter (count.go:373-375): apply it here like count_step does
        max_hash = jnp.uint64(scaled_max_hash(cfg.scale))
        valid = valid & (codes <= max_hash)
    cb = _taxid_code_bits(cfg)
    collapse = lca_collapse_compact if kind == "table" else lca_collapse_paths
    s_codes, ctax, keep, s_valid = collapse(
        codes, pos_ctax, valid, lca_tab, rounds, cb
    )
    if mode in ("unique", "repeated"):
        # multiplicity = VALID occurrences per code run
        first, start, end = _run_bounds(s_codes)
        v = s_valid.astype(jnp.int64)
        csum = jnp.cumsum(v)
        count = csum[end - 1] - csum[start] + v[start]
        keep = keep & (count == 1 if mode == "unique" else count > 1)
    n = jnp.sum(keep, dtype=jnp.int64)
    out_c = compact_sorted(s_codes, keep, jnp.uint64(codec.CODE_SENTINEL),
                           code_bits=cb)
    out_t = compact_aux(keep, ctax, jnp.int32(0))
    return out_c, out_t, n


@partial(jax.jit, static_argnames=("cfg", "ib"))
def _count_taxids_key_step(bases, pos_ctax, cfg: CountConfig, ib: int):
    """Staged stage 1/3 for count -T: encode + packed-key sort.  The
    sorted u64 key is the only buffer handed to stage 2
    (ops/device_sets.run_staged_taxid_collapse) — the monolithic
    count_taxids_step graph starves the remote AOT compile helper at
    2^23+ (BENCH_NOTES round-3), while this program is count_step's
    exact shape (encode + one single-operand sort)."""
    from ..taxonomy.lca import collapse_sort_key

    codes, valid = window_codes(bases, cfg)
    if cfg.scale > 1 and (cfg.minimizer_w > 0 or cfg.syncmer_s > 0):
        max_hash = jnp.uint64(scaled_max_hash(cfg.scale))
        valid = valid & (codes <= max_hash)
    return collapse_sort_key(codes, pos_ctax, valid, ib,
                             _taxid_code_bits(cfg))


@partial(jax.jit, static_argnames=("cfg",))
def _count_taxids_split3_step(bases, pos_ctax, cfg: CountConfig):
    """Staged stage 1/3 for UNPACKABLE count -T configs (ntHash /
    k>=24 big vocab): encode + split3 sort -> sorted (hi, lo, payload)
    triple, the 3-buffer handoff to lca_rounds_staged_split3.  No u64
    sort operand (the compile-starving shape, BENCH_NOTES round-3);
    reference: count.go:377-410 (ntHash -T is the metagenomics
    norm)."""
    from ..taxonomy.lca import collapse_sort_split3

    codes, valid = window_codes(bases, cfg)
    if cfg.scale > 1 and (cfg.minimizer_w > 0 or cfg.syncmer_s > 0):
        max_hash = jnp.uint64(scaled_max_hash(cfg.scale))
        valid = valid & (codes <= max_hash)
    # validity travels in the PAYLOAD (not the key), so a real
    # all-ones hash sorting into the invalid tail is still counted by
    # the run accounting (invalid slots contribute identity taxid 0
    # and are excluded from run_valid) — no sentinel aliasing
    return collapse_sort_split3(codes, pos_ctax, valid)


@partial(jax.jit, static_argnames=("cfg", "rounds", "mode", "kind"))
def _count_taxids_step_z(bases, pos_ctax, lca_tab, cfg: CountConfig,
                         rounds: int, mode: str, kind: str = "table"):
    """count_taxids_step + compressed egress: u32-delta codes (exact;
    exception list for deltas >= 2^32) and u16 compact taxid ids (u32
    when the vocabulary structure outgrows u16) — the taxid twin of
    _count_step_packed_result.  A raw fetch of the padded 2^24 u64+i32
    buffers is 30-60 min over the ~6 MB/s dev tunnel (the 2026-08-19
    chip run died there); this is ~4x less egress."""
    out_c, out_t, n = count_taxids_step(bases, pos_ctax, lca_tab, cfg,
                                        rounds, mode, kind)
    small, exc_idx, exc_val, n_exc, n = _compress_result(out_c, n)
    wide = lca_tab.shape[0] > 0xFFFF
    return (small, exc_idx, exc_val, n_exc, n,
            out_t.astype(jnp.uint32 if wide else jnp.uint16))


def use_compressed_taxid_fetch(space_bits: int, padded_len: int,
                               n_closure: int) -> bool:
    """Compressed taxid-result egress pays when code deltas usually fit
    u32 (same heuristic as count_packed_dispatch); compact ids ride as
    u16, or u32 for large vocabulary structures.
    UNIKMER_TPU_COMPRESS_TAXID_FETCH=0/1 forces (1 lets CPU tests
    exercise the compressed programs)."""
    knob = os.environ.get("UNIKMER_TPU_COMPRESS_TAXID_FETCH", "auto")
    if knob == "0":
        return False
    if knob == "1":
        return True
    return (
        jax.default_backend() != "cpu"
        and space_bits - (max(padded_len, 2).bit_length() - 1) <= 30
    )


def fetch_taxid_result(z, raw_fn, closure):
    """Materialize a compressed taxid-result tuple; ``raw_fn()`` is the
    uncompressed re-run fallback for exception-list overflow (mirrors
    count_packed_fetch)."""
    small, exc_idx, exc_val, n_exc, n, t16 = z
    if _fetch_scalar_watchdog(n_exc) > _exc_overflow_limit():
        out_c, out_t, nn = raw_fn()
        nn = _fetch_scalar_watchdog(nn)
        return (np.asarray(out_c[:nn]),
                closure[np.asarray(out_t[:nn]).astype(np.int64)])
    n = int(n)
    codes = _decode_packed_result(small, exc_idx, exc_val, int(n_exc), n)
    taxids = closure[np.asarray(t16[:n]).astype(np.int64)]
    return codes, taxids


def materialize_staged_taxid_result(res, staged_raw, z_out: bool, closure):
    """Shared tail of the staged taxid collapses (count -T and the
    taxid set ops): a run_staged_taxid_collapse result -> host
    (codes, taxids).  One definition so the z/raw slice handling cannot
    drift between the two call sites."""
    if z_out:
        return fetch_taxid_result(res, staged_raw, closure)
    out_c, out_t, n = res
    n = _fetch_scalar_watchdog(n)
    return (np.asarray(out_c[:n]),
            closure[np.asarray(out_t[:n]).astype(np.int64)])


def _device_taxid_route(packed, rec_taxids, taxdb,
                        cfg: CountConfig | None = None):
    """Should count -T keep its LCA reduction on device?  Yes when the
    padded program fits the validated bucket, the tiered vocabulary
    admission accepts (closure table for small vocabularies, path
    matrix for large — taxonomy/lca.device_lca_plan), and every taxid
    is known (the unknown-nonzero rule is order-dependent, so only the
    host engine's deterministic order defines those).
    UNIKMER_TPU_DEVICE_TAXID=0 forces the host reduction."""
    if os.environ.get("UNIKMER_TPU_DEVICE_TAXID", "auto") == "0":
        return None
    if _padded_len(max(len(packed.bases), 1)) > (1 << 25):
        return None  # beyond the validated bucket: streamed/host tiers
    from ..taxonomy.lca import device_collapse_admissible, device_lca_plan

    plan = device_lca_plan(taxdb, rec_taxids)
    if (
        plan is not None
        and cfg is not None
        and not device_collapse_admissible(
            _taxid_code_bits(cfg), len(plan[1])
        )
    ):
        return None  # 2-operand fallback sort compile-starves on tpu
    return plan


def parse_taxid_records(records, cfg: CountConfig, re_taxid):
    """Parse per-record taxids from headers and pack the sequences:
    (packed, rec_taxids) aligned (records shorter than k dropped from
    both).  The shared front half of the -T engines."""
    from ..io.fastx import pack_records
    from ..utils.log import die

    records = list(records)
    rec_taxids = np.empty(len(records), np.uint32)
    for i, rec in enumerate(records):
        m = re_taxid.search(rec.name)
        if not m:
            die(f"failed to parse taxid in header: {rec.name.decode()}")
        try:
            rec_taxids[i] = int(m.group(1))
        except (ValueError, OverflowError):
            die(
                f"failed to parse taxid {m.group(1)!r} in header: "
                f"{rec.name.decode()}"
            )
    packed = pack_records(records, cfg.k, cfg.circular,
                          gap=cfg.record_gap)
    # records shorter than k were dropped by the packer: align taxids
    if packed.n_records != len(records):
        kept = [i for i, rec in enumerate(records) if len(rec.seq) >= cfg.k]
        rec_taxids = rec_taxids[kept]
    return packed, rec_taxids


def count_packed_taxids(records, cfg: CountConfig, re_taxid, taxdb):
    """count -T/--parse-taxid: per-record taxids, LCA-merged per code
    (reference count.go:334-344,377-410).

    ``records`` is an iterable of fastx.Record; ``re_taxid`` a compiled
    bytes regexp with one capture group; ``taxdb`` a taxonomy.Taxonomy.
    Returns (codes, taxids) sorted by code, filtered by cfg.mode.

    Batched: ALL records are packed into one device invocation; each
    valid window is assigned its record's taxid by a searchsorted over
    record start offsets (one device pass instead of one per record).
    """
    packed, rec_taxids = parse_taxid_records(records, cfg, re_taxid)
    return count_taxids_from_packed(packed, rec_taxids, cfg, taxdb)


def _pos_ctax_for(packed, rec_taxids, closure):
    """Per-position compact taxid ids: each record's id repeated over
    its base span (windows starting in separators are invalid anyway)."""
    from ..taxonomy.lca import compact_ids

    rec_ctax = compact_ids(closure, rec_taxids)
    spans = np.diff(np.append(packed.starts, len(packed.bases)))
    return np.repeat(rec_ctax, spans).astype(np.int32)


def _device_taxid_collapse(bases_unpadded, pos_ctax, cfg: CountConfig,
                           plan, mode: str):
    """One device piece of the -T reduction -> (codes, taxids)."""
    kind, closure, lca_tab = plan
    bases = pad_bases(bases_unpadded)
    padded_ctax = np.zeros(len(bases), np.int32)
    padded_ctax[: len(pos_ctax)] = pos_ctax
    rounds = max(len(bases).bit_length() - 1, 1)
    # tunnel-attached chips occasionally drop a process's first large
    # dispatch (fetch hangs forever); establish the session with a
    # watchdogged tiny round-trip first (no-op on cpu)
    _warm_device_session()
    from ..ops.device_sets import (
        run_staged_taxid_collapse, use_staged_taxid_programs,
    )
    from ..taxonomy.lca import _id_bits, collapse_sort_packable

    # static code bound: _taxid_code_bits is tight for scaled hashes
    # (bit length of max_hash), so compressed egress engages for them
    # too — the raw '64 if hashed' bound wrongly declined it
    z_out = use_compressed_taxid_fetch(
        _taxid_code_bits(cfg), len(bases), len(closure)
    )
    from ..taxonomy.lca import staged_split3_wanted

    packable = collapse_sort_packable(_taxid_code_bits(cfg), len(closure))
    if use_staged_taxid_programs() and (packable or staged_split3_wanted()):
        ib = _id_bits(len(closure))
        wide = len(closure) > 0xFFFF
        with phase_watchdog("count -T staged sort (stage 1/3)"):
            dctax, dtab = jnp.asarray(padded_ctax), jnp.asarray(lca_tab)
            skey = (_count_taxids_key_step(bases, dctax, cfg, ib)
                    if packable else
                    _count_taxids_split3_step(bases, dctax, cfg))
        res, staged_raw = run_staged_taxid_collapse(
            skey, dtab, rounds, ib, kind, z_out, wide, mode=mode,
            phase="count -T", code_bits=_taxid_code_bits(cfg))
        return materialize_staged_taxid_result(res, staged_raw, z_out,
                                               closure)

    with phase_watchdog("count -T upload/compile/dispatch"):
        dctax, dtab = jnp.asarray(padded_ctax), jnp.asarray(lca_tab)

        def raw():
            return count_taxids_step(bases, dctax, dtab, cfg, rounds,
                                     mode, kind)

        if z_out:
            z = _count_taxids_step_z(bases, dctax, dtab, cfg, rounds,
                                     mode, kind)
        else:
            z = None
    if z is not None:
        return fetch_taxid_result(z, raw, closure)
    with phase_watchdog("count -T upload/compile/dispatch"):
        out_c, out_t, n = raw()
    n = _fetch_scalar_watchdog(n)
    return (np.asarray(out_c[:n]),
            closure[np.asarray(out_t[:n]).astype(np.int64)])


def count_taxids_stream_device(packed, rec_taxids, cfg: CountConfig,
                               plan, taxdb, chunk_bases: int | None = None):
    """Streamed device -T for inputs beyond the validated bucket: each
    piece collapses on device (distinct partial + within-piece repeated
    partial for -u/-d, the capped-multiplicity trick), partials merge
    on host with one lca_reduce over the much smaller distinct sets."""
    if chunk_bases is None:
        chunk_bases = _stream_chunk_bases()
    pos_ctax = _pos_ctax_for(packed, rec_taxids, plan[1])
    distinct_cfg, repeated_cfg = _capped_cfgs(cfg)
    parts_c, parts_t, parts_rep = [], [], []
    for piece, off in split_packed(
        packed, chunk_bases, cfg.k if cfg.segmentable else 0,
        yield_offsets=True,
    ):
        pc = pos_ctax[off : off + len(piece.bases)]
        c, t = _device_taxid_collapse(piece.bases, pc, distinct_cfg, plan,
                                      "distinct")
        parts_c.append(c)
        parts_t.append(t)
        if repeated_cfg is not None:
            rc, _ = _device_taxid_collapse(piece.bases, pc, repeated_cfg,
                                           plan, "repeated")
            parts_rep.append(rc)
    dcodes = (np.concatenate(parts_c) if parts_c
              else np.zeros(0, np.uint64))
    dtax = (np.concatenate(parts_t) if parts_t
            else np.zeros(0, np.uint32))
    uniq, merged = taxdb.lca_reduce(dcodes, dtax)
    if repeated_cfg is None:
        return uniq, merged
    # piece-presence counts align with lca_reduce's sorted keys
    _, counts = np.unique(dcodes, return_counts=True)
    in_rep = (
        np.isin(uniq, np.unique(np.concatenate(parts_rep)))
        if parts_rep else np.zeros(len(uniq), bool)
    )
    multi = (counts > 1) | in_rep
    keep = ~multi if cfg.mode == "unique" else multi
    return uniq[keep], merged[keep]


def count_taxids_from_packed(packed, rec_taxids, cfg: CountConfig, taxdb):
    """The -T reduction over pre-parsed (packed, rec_taxids)."""
    if packed.bases.size == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
    route = _device_taxid_route(packed, rec_taxids, taxdb, cfg)
    if route is not None:
        pos_ctax = _pos_ctax_for(packed, rec_taxids, route[1])
        return _device_taxid_collapse(packed.bases, pos_ctax, cfg, route,
                                      cfg.mode)
    # beyond the single-program bucket: streamed device pieces when the
    # vocabulary admission still accepts
    if (
        os.environ.get("UNIKMER_TPU_DEVICE_TAXID", "auto") != "0"
        and _padded_len(max(len(packed.bases), 1)) > (1 << 25)
    ):
        from ..taxonomy.lca import (
            device_collapse_admissible, device_lca_plan,
        )

        plan = device_lca_plan(taxdb, rec_taxids)
        if plan is not None and device_collapse_admissible(
            _taxid_code_bits(cfg), len(plan[1])
        ):
            return count_taxids_stream_device(packed, rec_taxids, cfg,
                                              plan, taxdb)
    codes, pos = linear_codes_all(packed.bases, cfg)
    rec_id = np.searchsorted(packed.starts, pos, side="right") - 1
    taxids = rec_taxids[rec_id]
    uniq, merged = taxdb.lca_reduce(codes, taxids)
    if cfg.mode in ("unique", "repeated"):
        u, counts = np.unique(codes, return_counts=True)
        keep = counts == 1 if cfg.mode == "unique" else counts > 1
        return uniq[keep], merged[keep]
    return uniq, merged


def _stream_chunk_bases() -> int:
    """Stream chunk sized so every chunk fits the fastest validated
    device bucket (2^25 on TPU: 188M k-mers/s vs 139M at 2^23, see
    docs/BENCH_NOTES.md; 2^20 on CPU) with room for separators."""
    return (28 << 20) if jax.default_backend() == "tpu" else (7 << 16)


def _capped_cfgs(cfg: CountConfig):
    """(distinct_cfg, repeated_cfg-or-None) for the capped-multiplicity
    chunk merge used by the streaming paths."""
    capped = cfg.mode in ("unique", "repeated")
    if not capped:
        return cfg, None
    # dataclasses.replace so EVERY field (incl. syncmer_impl) carries
    # over — a field-by-field rebuild silently reset compat configs to
    # edgar semantics (round-4 advisor finding).
    mk = lambda mode: dc_replace(cfg, mode=mode)
    return mk("distinct"), mk("repeated")


class _SpillOpt:
    """Minimal option bag for pipeline/extsort writers (spill chunks are
    write-once temp files: cheapest compression)."""

    max_taxid = 0
    compress = True
    compression_level = 1
    threads = 4
    verbose = False


class SpilledCount:
    """Beyond-RAM count result: the distinct set exceeded the in-RAM
    merge cap (UNIKMER_TPU_COUNT_MEM_MB) and lives in sorted spill
    chunks.  ``write_to(write_batch)`` streams the final collapsed
    result in ascending batches (consecutive batches never split a run)
    and returns the total count; temp files are removed afterwards.
    The reference's bounded-memory analog is `sort -m` chunk spill
    (sort.go:241-419); here it happens transparently inside count."""

    def __init__(self, chunk_files: list, tmp_dir: str, mode: str, k: int):
        self.chunk_files = chunk_files
        self.tmp_dir = tmp_dir
        self.mode = mode  # extsort collapse mode: unique/once/repeated
        self.k = k

    def write_to(self, write_batch) -> int:
        import shutil

        from ..pipeline import extsort

        total = 0

        def sink(codes, _taxids):
            nonlocal total
            total += len(codes)
            write_batch(codes)

        try:
            extsort.cascade_merge(
                self.chunk_files,
                lambda: sink,
                self.tmp_dir,
                self.k,
                flag=0,
                mode=self.mode,
                taxdb=None,
                opt=_SpillOpt(),
            )
        finally:
            shutil.rmtree(self.tmp_dir, ignore_errors=True)
        return total


class _PartialSink:
    """Accumulator for the streaming counts' per-chunk partial arrays.

    Below the cap it is just a list (the round-1 behavior).  Beyond
    UNIKMER_TPU_COUNT_MEM_MB (default 4096) of buffered partials, the
    buffer is sorted + capped-collapsed and spilled to an extsort chunk
    file, so a dataset whose distinct set exceeds host RAM still has an
    exact path through `count` alone (VERDICT round-1 weak #7)."""

    _SPILL_MODE = {"distinct": "unique", "unique": "once",
                   "repeated": "repeated"}

    def __init__(self, cfg: CountConfig):
        self.cfg = cfg
        self.mode = self._SPILL_MODE[cfg.mode]
        self.parts: list[np.ndarray] = []
        self.nbytes = 0
        self.cap = int(
            float(os.environ.get("UNIKMER_TPU_COUNT_MEM_MB", "4096"))
            * (1 << 20)
        )
        self.tmp_dir: str | None = None
        self.chunks: list[str] = []

    def add(self, u: np.ndarray) -> None:
        with _prof("sink.add"):
            self.parts.append(u)
            self.nbytes += u.nbytes
            if self.nbytes > self.cap:
                self._spill()

    def _spill(self) -> None:
        import tempfile

        from ..pipeline import extsort

        if self.tmp_dir is None:
            self.tmp_dir = tempfile.mkdtemp(prefix="unikmer-tpu-count-")
        codes = np.concatenate(self.parts)
        self.parts, self.nbytes = [], 0
        path = extsort.chunk_file_name(self.tmp_dir, len(self.chunks))
        extsort.dump_chunk(
            codes, None, path, self.cfg.k, 0, self.mode, None, _SpillOpt()
        )
        self.chunks.append(path)

    def result(self):
        """np.ndarray (everything fit) or SpilledCount (chunks on disk)."""
        if not self.chunks:
            with _prof("sink.merge"):
                return _merge_partials(self.parts, self.cfg)
        if self.parts:
            self._spill()
        return SpilledCount(self.chunks, self.tmp_dir, self.mode, self.cfg.k)


def _merge_partials(partial, cfg: CountConfig) -> np.ndarray:
    if not partial:
        return np.zeros(0, np.uint64)
    if cfg.mode not in ("unique", "repeated"):
        # partials are sorted unique arrays: the parallel native
        # sorted-union tree beats a full re-sort of the concatenation
        # (falls back to concat+sort without the native lib)
        from ..ops import sets as host_sets

        codes, _ = host_sets.union(partial)
        return codes
    # in-place sort: the concatenation is the peak-memory buffer here,
    # and numpy's default kind is the same simd sort host_sort uses
    merged = np.concatenate(partial)
    merged.sort()
    first = np.ones(len(merged), bool)
    first[1:] = merged[1:] != merged[:-1]
    run_id = np.cumsum(first) - 1
    counts = np.bincount(run_id)
    keep = counts == 1 if cfg.mode == "unique" else counts >= 2
    return merged[first][keep]


def _multi_bucket() -> int:
    """Buckets per streaming dispatch (UNIKMER_TPU_MULTI_BUCKET;
    auto = 2 on TPU where the ~20-25 ms dispatch floor is 12-16% of a
    2^25 batch, 1 elsewhere)."""
    env = os.environ.get("UNIKMER_TPU_MULTI_BUCKET", "auto")
    if env not in ("", "auto"):
        return max(int(env), 1)
    try:
        return 2 if jax.default_backend() == "tpu" else 1
    except Exception:
        return 1


def _dual_step_wanted() -> bool:
    """Fuse the -u/-d streams' per-piece (distinct, repeated) pair into
    one program (UNIKMER_TPU_DUAL_STEP; auto = non-cpu backends, where
    the sort dominates each piece)."""
    env = os.environ.get("UNIKMER_TPU_DUAL_STEP", "auto")
    if env in ("0", "1"):
        return env == "1"
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _dual_staged_wanted() -> bool:
    """Run B>=2 dual groups as TWO programs split at the sorted
    boundary (UNIKMER_TPU_DUAL_STAGED; auto = non-cpu backends, same
    policy as the staged taxid programs).  The monolithic B>=2 dual
    graph SIGKILLs the remote compile helper (BENCH_NOTES round-3
    phase 2); the staged split is the known fix for that mechanism."""
    env = os.environ.get("UNIKMER_TPU_DUAL_STAGED", "auto")
    if env in ("0", "1"):
        return env == "1"
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _group_stack(pieces):
    """(p2s, vms, n): stacked 2-bit ingress buffers for a group."""
    with _prof("ingress.pad"):
        bases_list = [pad_bases(p.bases) for p in pieces]
    n = len(bases_list[0])
    _warm_device_session()
    with _prof("ingress.pack2bit"):
        packed = [pack_bases_2bit(b) for b in bases_list]
        p2s = np.stack([p for p, _ in packed])
        vms = np.stack([v for _, v in packed])
    with _prof("ingress.upload"):
        dp = jnp.asarray(p2s)
        dv = jnp.asarray(vms)
        if _PROF is not None:  # make the upload cost attributable
            jax.block_until_ready((dp, dv))
    return dp, dv, n


def count_packed_dispatch_group(pieces, cfg: CountConfig):
    """Dispatch B equal-padded pieces as ONE device program
    (_count_step_multi).  Returns an opaque token for
    count_packed_fetch_group."""
    if len(pieces) == 1:
        return ("one", count_packed_dispatch(pieces[0], cfg))
    p2s, vms, n = _group_stack(pieces)
    space_bits = 64 if cfg.hashed else 2 * cfg.k
    z = space_bits - (n.bit_length() - 1) <= 30
    with _prof("dispatch.program"):
        if z and _split_egress():
            outs, ns = _count_step_multi(p2s, vms, cfg, n, False)
            res = _compress_stage_multi(outs, ns)
        else:
            res = _count_step_multi(p2s, vms, cfg, n, z)
    return ("multi_z" if z else "multi_raw", res, len(pieces))


def count_packed_dispatch_group_dual(pieces, cfg: CountConfig):
    """Dispatch B pieces through the fused dual collapse: each piece
    yields its distinct AND within-piece repeated set from one sort.
    At B>=2 the staged 2-program split is used (when enabled): the
    monolithic B>=2 dual graph SIGKILLs the remote compile helper."""
    if cfg.needs_record_sep:
        # The 2-bit ingress pack erases RECORD_SEP (unpacks to
        # INVALID_BASE), which the compat syncmer's device twin needs
        # for its per-record truncation+fill semantics — mirror the
        # count_step_ingress guard and ship raw bases, one dual
        # program per piece (round-4 advisor finding).
        if jax.default_backend() != "cpu":
            _warm_device_session()
        toks = [count_step_dual(pad_bases(p.bases), cfg) for p in pieces]
        return ("dual_sep", toks, len(pieces))
    p2s, vms, n = _group_stack(pieces)
    space_bits = 64 if cfg.hashed else 2 * cfg.k
    z = space_bits - (n.bit_length() - 1) <= 30
    zf = z and not _split_egress()  # fused egress only when asked
    with _prof("dispatch.program"):
        if len(pieces) >= 2 and _dual_staged_wanted():
            s_all, nsr, nhead = _dual_sort_stage(p2s, vms, cfg, n)
            res = _dual_collapse_stage(s_all, nsr, nhead, zf,
                                       code_bits=cfg.code_bits)
        else:
            res = _count_step_dual_multi(p2s, vms, cfg, n, zf)
        if z and not zf:
            od, nd, orp, nr = res
            res = (_compress_stage_multi(od, nd)
                   + _compress_stage_multi(orp, nr))
    return ("dual_z" if z else "dual_raw", res, len(pieces))


def count_packed_fetch_group(token, pieces, cfg: CountConfig):
    """Materialize a group token -> list of per-piece sorted arrays
    (dual tokens yield the distinct and repeated array per piece,
    interleaved).  A per-bucket exception-list overflow (rare: hashed
    spaces skip the compressed egress) re-runs that piece through the
    single path."""
    kind = token[0]
    if kind == "one":
        return [count_packed_fetch(token[1])]
    if kind in ("dual_z", "dual_raw", "dual_sep"):
        return _fetch_group_dual(token, pieces, cfg)
    _, res, B = token
    outs = []
    if kind == "multi_z":
        small, exc_idx, exc_val, n_exc, nn = res
        with _prof("fetch.sync"):
            _fetch_scalar_watchdog(jnp.sum(n_exc))  # force + hang diagnostic
            ne = np.asarray(n_exc)
            counts = np.asarray(nn)
        for i in range(B):
            if ne[i] > _exc_overflow_limit():
                outs.append(count_packed_fetch(
                    count_packed_dispatch(pieces[i], cfg)))
                continue
            with _prof("fetch.decode"):
                outs.append(_decode_packed_result(
                    small[i], exc_idx[i], exc_val[i], int(ne[i]),
                    int(counts[i])))
    else:
        out_codes, ns = res
        with _prof("fetch.sync"):
            _fetch_scalar_watchdog(jnp.sum(ns))
            counts = np.asarray(ns)
        for i in range(B):
            with _prof("fetch.raw"):
                outs.append(np.asarray(out_codes[i][: int(counts[i])]))
    return outs


def _fetch_group_dual(token, pieces, cfg: CountConfig):
    kind, res, B = token
    outs = []
    if kind == "dual_sep":
        for od, nd, orp, nr in res:
            # watchdog BOTH scalars: a dropped orp/nr result would
            # otherwise hang int(nr) with no diagnostic (round-5 review)
            _fetch_scalar_watchdog(nd + nr)
            outs.append(np.asarray(od[: int(nd)]))
            outs.append(np.asarray(orp[: int(nr)]))
        return outs
    if kind == "dual_z":
        (sd, eid, evd, ned, nnd, sr, eir, evr, ner, nnr) = res
        _fetch_scalar_watchdog(jnp.sum(ned) + jnp.sum(ner))
        ned_a, ner_a = np.asarray(ned), np.asarray(ner)
        nnd_a, nnr_a = np.asarray(nnd), np.asarray(nnr)
        for i in range(B):
            if (ned_a[i] > _exc_overflow_limit()
                    or ner_a[i] > _exc_overflow_limit()):
                # overflow: per-piece single-path re-run of both modes
                import dataclasses

                outs.append(count_packed_fetch(count_packed_dispatch(
                    pieces[i], dataclasses.replace(cfg, mode="distinct"))))
                outs.append(count_packed_fetch(count_packed_dispatch(
                    pieces[i], dataclasses.replace(cfg, mode="repeated"))))
                continue
            outs.append(_decode_packed_result(
                sd[i], eid[i], evd[i], int(ned_a[i]), int(nnd_a[i])))
            outs.append(_decode_packed_result(
                sr[i], eir[i], evr[i], int(ner_a[i]), int(nnr_a[i])))
    else:
        od, nd, orp, nr = res
        _fetch_scalar_watchdog(jnp.sum(nd) + jnp.sum(nr))
        nd_a, nr_a = np.asarray(nd), np.asarray(nr)
        for i in range(B):
            outs.append(np.asarray(od[i][: int(nd_a[i])]))
            outs.append(np.asarray(orp[i][: int(nr_a[i])]))
    return outs


class _GroupedCounter:
    """Streaming dispatch helper shared by count_stream[_packed]:
    groups same-config equal-padded pieces into multi-bucket programs
    and keeps the double-buffer depth of GROUPS in flight."""

    def __init__(self, sink, depth: int):
        from collections import deque

        self.sink = sink
        self.depth = depth
        self.inflight: "deque" = deque()
        self.pending: dict = {}
        self.B = _multi_bucket()

    def add(self, piece, cfg: CountConfig, dual: bool = False):
        if self.B <= 1 and not dual:
            self.inflight.append((("one", count_packed_dispatch(piece, cfg)),
                                  [piece], cfg))
            self.drain(self.depth)
            return
        key = (cfg, dual, _padded_len(max(len(piece.bases), 1)))
        group = self.pending.setdefault(key, [])
        group.append(piece)
        # dual groups compose with multi-bucket via the STAGED split
        # (chip-validated 2026-08-20 session B: B=2 staged dual
        # compiled and ran byte-exact, 1.045x vs 2-dispatch on a
        # degraded link).  The MONOLITHIC B>=2 dual graph SIGKILLs the
        # remote compile helper (BENCH_NOTES round-3), so grouping is
        # allowed only where the staged route serves it; DUAL_MULTI=0
        # restores the B=1 cap, =1 forces grouping even unstaged.
        target = self.B
        knob = os.environ.get("UNIKMER_TPU_DUAL_MULTI", "auto")
        if dual and (knob == "0"
                     or (knob == "auto" and not _dual_staged_wanted())):
            target = 1
        if cfg.needs_record_sep:
            # multi-bucket grouping rides the 2-bit ingress pack, which
            # erases the RECORD_SEP bytes the compat syncmer needs
            target = 1
        if len(group) >= target:
            self._dispatch(key)

    def _dispatch(self, key):
        pieces = self.pending.pop(key)
        cfg, dual = key[0], key[1]
        tok = (count_packed_dispatch_group_dual(pieces, cfg) if dual
               else count_packed_dispatch_group(pieces, cfg))
        self.inflight.append((tok, pieces, cfg))
        self.drain(self.depth)

    def drain(self, limit: int):
        while len(self.inflight) > limit:
            token, pieces, cfg = self.inflight.popleft()
            for u in count_packed_fetch_group(token, pieces, cfg):
                if len(u):
                    self.sink.add(u)

    def finish(self):
        for key in list(self.pending):
            self._dispatch(key)
        self.drain(0)


def count_stream(records, cfg: CountConfig,
                 chunk_bases: int | None = None) -> np.ndarray:
    """Streaming count: process records in device-sized chunks and merge
    partial sorted sets, so host memory is O(distinct + chunk) instead
    of O(total windows).  Exact for all modes:

      distinct: union of per-chunk distinct sets.
      unique/repeated: per chunk emit each code with multiplicity
        min(count, 2) (the external-sort non-final-round trick,
        util-sort.go:377-388); the global capped multiplicity then
        separates count==1 from count>=2 exactly.

    The reference's equivalent bounded-memory path is `sort -m`
    (SURVEY.md §3.2); here chunking happens transparently inside count.
    """
    from ..io.fastx import pack_records

    if chunk_bases is None:
        chunk_bases = _stream_chunk_bases()
    sink = _PartialSink(cfg)
    gc = _GroupedCounter(sink, _pipeline_depth())
    buf: list = []
    buffered = 0
    distinct_cfg, repeated_cfg = _capped_cfgs(cfg)

    def flush():
        nonlocal buf, buffered
        if not buf:
            return
        packed = pack_records(buf, cfg.k, cfg.circular,
                              gap=cfg.record_gap)
        buf = []
        buffered = 0
        # split_packed bounds every piece even when one record alone
        # exceeds the chunk (overlap-segmented, window-exact)
        for piece in split_packed(
            packed, chunk_bases, cfg.k if cfg.segmentable else 0
        ):
            if repeated_cfg is not None and _dual_step_wanted():
                # fused program: one sort yields distinct AND the
                # within-chunk repeated marks
                gc.add(piece, distinct_cfg, dual=True)
            else:
                gc.add(piece, distinct_cfg)
                if repeated_cfg is not None:
                    # second copy marks within-chunk dups
                    gc.add(piece, repeated_cfg)

    for rec in records:
        buf.append(rec)
        buffered += len(rec.seq)
        if buffered >= chunk_bases:
            flush()
    flush()
    gc.finish()
    return sink.result()


def split_packed(packed: PackedSeqs, chunk_bases: int, k: int = 0,
                 yield_offsets: bool = False):
    """Split a PackedSeqs at record boundaries into pieces of at most
    ~chunk_bases bases each (a piece always holds >= 1 record).

    With ``k`` > 0, a single record whose base span exceeds chunk_bases
    (e.g. a mammalian chromosome) is further cut into segments with
    k-1 bases of overlap: windows starting in [off, off+chunk) belong
    to exactly one segment, so distinct/unique/repeated multiplicities
    are preserved exactly.  Without this, one oversized record would
    force a device program far above the validated 2^25 bucket (2^26+
    hangs on the tunnel backend — docs/BENCH_NOTES.md).

    ``yield_offsets`` yields (piece, base_offset) pairs, base_offset
    being the piece's start in packed.bases (for position-aligned
    auxiliary columns like count -T's per-position taxid ids)."""
    n_rec = packed.n_records
    if n_rec == 0:
        return
    total = len(packed.bases)
    lo = 0
    while lo < n_rec:
        rec_end = packed.starts[lo + 1] if lo + 1 < n_rec else total
        span = int(rec_end - packed.starts[lo])
        if k > 0 and span > chunk_bases + k:
            # oversized single record: overlap-segmented exact cut
            base0 = int(packed.starts[lo])
            for off in range(0, span - (k - 1), chunk_bases):
                seg = packed.bases[
                    base0 + off : base0 + min(off + chunk_bases + k - 1, span)
                ]
                piece = PackedSeqs(
                    seg, np.zeros(1, np.int64),
                    np.asarray([len(seg)], np.int64),
                )
                yield (piece, base0 + off) if yield_offsets else piece
            lo += 1
            continue
        # include whole records while the piece END stays within the
        # chunk (bounding by record STARTS would let the last record
        # overshoot arbitrarily — e.g. two 20 Mbp records would form a
        # 40 Mb piece and pad to the hanging 2^26 bucket)
        limit = packed.starts[lo] + chunk_bases
        ends = np.concatenate([packed.starts[lo + 1 :], [total]])
        hi = lo + int(np.searchsorted(ends, limit, side="right"))
        hi = max(hi, lo + 1)
        end = packed.starts[hi] if hi < n_rec else total
        piece = PackedSeqs(
            packed.bases[packed.starts[lo]:end],
            packed.starts[lo:hi] - packed.starts[lo],
            packed.lengths[lo:hi],
        )
        yield (piece, int(packed.starts[lo])) if yield_offsets else piece
        lo = hi


def count_stream_packed(packed_iter, cfg: CountConfig,
                        chunk_bases: int | None = None) -> np.ndarray:
    """count_stream over already-packed buffers (native ingest path):
    each PackedSeqs is re-chunked at record boundaries to the device
    bucket size; merge semantics identical to count_stream."""
    if chunk_bases is None:
        chunk_bases = _stream_chunk_bases()
    sink = _PartialSink(cfg)
    gc = _GroupedCounter(sink, _pipeline_depth())
    distinct_cfg, repeated_cfg = _capped_cfgs(cfg)

    for packed in packed_iter:
        for piece in split_packed(
            packed, chunk_bases, cfg.k if cfg.segmentable else 0
        ):
            if repeated_cfg is not None and _dual_step_wanted():
                gc.add(piece, distinct_cfg, dual=True)
            else:
                gc.add(piece, distinct_cfg)
                if repeated_cfg is not None:
                    gc.add(piece, repeated_cfg)
    gc.finish()
    return sink.result()


def linear_codes_all(bases: np.ndarray, cfg: CountConfig,
                     chunk_bases: int | None = None):
    """All valid window codes of a packed base buffer, in genome order:
    (codes uint64[n_valid], positions int64[n_valid]).

    Large buffers are processed in overlap-segmented device chunks
    (k-1 overlap = exact window partition, order-preserving) so no
    input builds a program above the validated bucket size; sketched
    configs (minimizer/syncmer) are not segmentable and run whole."""
    n = len(bases)
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    if chunk_bases is None:
        chunk_bases = _stream_chunk_bases()
    k = cfg.k
    if n <= chunk_bases + k or not cfg.segmentable:
        dev_codes, dev_valid = linear_codes_step(pad_bases(bases), cfg)
        pos = np.flatnonzero(np.asarray(dev_valid)[:n])
        return np.asarray(dev_codes)[pos], pos
    from collections import deque

    parts_c, parts_p = [], []
    inflight: deque = deque()
    depth = _pipeline_depth()

    def drain(limit: int):
        while len(inflight) > limit:
            dev_codes, dev_valid, off, seg_len = inflight.popleft()
            valid = np.asarray(dev_valid)[:seg_len]
            # window starts in the k-1 overlap tail belong to the next
            # piece (invalid here anyway: windows cross into padding)
            pos = np.flatnonzero(valid[:chunk_bases])
            parts_c.append(np.asarray(dev_codes)[pos])
            parts_p.append(pos + off)

    for off in range(0, n - (k - 1), chunk_bases):
        seg = bases[off : min(off + chunk_bases + k - 1, n)]
        dev_codes, dev_valid = linear_codes_step(pad_bases(seg), cfg)
        inflight.append((dev_codes, dev_valid, off, len(seg)))
        drain(depth)
    drain(0)
    return np.concatenate(parts_c), np.concatenate(parts_p)


def count_linear(packed: PackedSeqs, cfg: CountConfig) -> np.ndarray:
    """Host entry for -l/--linear: codes in genome order, dups kept."""
    if packed.bases.size == 0:
        return np.zeros(0, np.uint64)
    codes, _ = linear_codes_all(packed.bases, cfg)
    return codes
