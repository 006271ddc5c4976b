#!/usr/bin/env python
"""Benchmark: end-to-end device throughput of the flagship pipeline
(2-bit encode + canonical + sort + distinct-collapse = `count -K -s`).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "kmers/s", "vs_baseline": N}

Baseline: the reference processes MG1655's 4.64M windows in 0.897 s
(~5.17e6 k-mers/s, README.md:156-158 / BASELINE.md).

Methodology: data device-resident; the jitted program returns only the
distinct count (8-byte fetch forces execution — this backend's
block_until_ready does not reliably synchronize, and the dev-tunnel's
6 MB/s device->host link would otherwise dominate; production hosts
fetch results at PCIe bandwidth).
"""

import argparse
import json
import sys
import time

import numpy as np

import unikmer_tpu  # noqa: F401  (x64, compile cache, mallopt)
import jax

from unikmer_tpu.models.count import CountConfig, count_step

K = 23
# 2^25 bases/batch: the pipeline pads inputs to pow-2 buckets >= 2^23
# (models/count._padded_len), so this is the exact program a real
# `count` runs on a 17-33 Mbp input.  Measured on the v5e chip:
# 2^23 -> 139M, 2^24 -> 154M, 2^25 -> 188M k-mers/s (fixed ~20 ms
# dispatch+fetch latency amortizes away); 2^26 hit a compile/dispatch
# hang on this tunnel backend, so 2^25 is the sweet spot.
SIZE = 1 << 25  # bases per batch; windows = SIZE - K + 1
REPS = 5
BASELINE_KMERS_PER_SEC = 4_641_630 / 0.897  # reference count wall-clock


def _watchdog(seconds: int) -> None:
    """The tunnel-attached chip occasionally wedges (every op hangs);
    fail fast with a diagnostic instead of hanging the driver."""
    import os
    import signal

    def on_alarm(signum, frame):
        print(
            "# bench watchdog: device unresponsive after "
            f"{seconds}s (known transient tunnel wedge; retry later)",
            file=sys.stderr,
        )
        os._exit(1)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def _probe_device_ready(tries: int = 20, wait_s: int = 90,
                        counter: dict | None = None) -> bool:
    """The tunnel chip occasionally wedges for a while; probe with a tiny
    op under a short alarm and wait out a transient wedge instead of
    failing the whole bench run.  ``counter['n']`` records how many
    probes failed before success (VERDICT round-4 weak #8: track probe
    flakiness in the bench JSON)."""
    import os
    import signal

    for attempt in range(tries):
        ok = {"v": False}

        def on_alarm(signum, frame):
            raise TimeoutError

        old = signal.signal(signal.SIGALRM, on_alarm)
        signal.alarm(45)
        try:
            x = jax.device_put(np.ones(8, np.float32))
            ok["v"] = float(np.asarray(x)[0]) == 1.0
        except Exception:
            ok["v"] = False
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
        if ok["v"]:
            return True
        if counter is not None:
            counter["n"] = counter.get("n", 0) + 1
        print(
            f"# bench: device probe {attempt + 1}/{tries} failed; "
            f"waiting {wait_s}s (transient tunnel wedge)",
            file=sys.stderr,
        )
        time.sleep(wait_s)
    return False


# --all-configs arms (VERDICT round-1 next #8): the hashed / sketch
# pipelines are first-class in the reference (count.go:85-130) — bench
# them so regressions on the k>32 path are caught.  The headline
# metric stays the single 2-bit line (driver contract: ONE json line
# on the default run).
CONFIGS = [
    ("count_encode_canonical_sort_distinct",
     CountConfig(k=23, canonical=True)),
    ("count_nthash_canonical_sort_distinct",
     CountConfig(k=31, canonical=True, hashed=True)),
    ("count_scaled_s15_sort_distinct",
     CountConfig(k=31, canonical=True, hashed=True, scale=15)),
    ("count_minimizer_w15_sort_distinct",
     CountConfig(k=31, minimizer_w=15)),
    ("count_syncmer_s16_sort_distinct",
     CountConfig(k=31, syncmer_s=16)),
]


def _bench_config(name: str, cfg: CountConfig, dev_bases) -> dict:
    def step(b):
        out, n = count_step(b, cfg)
        return n

    f = jax.jit(step)
    _watchdog(900)
    t0 = time.time()
    n = int(np.asarray(f(dev_bases)))  # compile + first run
    compile_s = time.time() - t0
    _watchdog(300)  # re-arm: warm reps are ~60-200 ms; 300s is generous
    times = []
    for _ in range(REPS):
        t = time.time()
        n = int(np.asarray(f(dev_bases)))
        times.append(time.time() - t)
    best = min(times)
    windows = SIZE - cfg.k + 1
    kps = windows / best
    print(
        f"# {name}: backend={jax.default_backend()} distinct={n} "
        f"windows={windows} best={best*1e3:.1f}ms "
        f"times_ms={[round(t*1e3,1) for t in times]} "
        f"compile_first={compile_s:.1f}s",
        file=sys.stderr,
    )
    return {
        "metric": name,
        "value": round(kps),
        "unit": "kmers/s",
        "vs_baseline": round(kps / BASELINE_KMERS_PER_SEC, 2),
    }


def _bench_stream(pieces: int = 4) -> dict:
    """The production streaming path (count_stream_packed: multi-bucket
    lax.map programs, compressed egress, double buffering) over
    4 x 2^25 bases — the number a real multi-chunk `count` sees."""
    from unikmer_tpu.io.fastx import PackedSeqs
    from unikmer_tpu.models.count import (
        count_stream_packed,
        stream_profile_report,
        stream_profile_reset,
    )
    rng = np.random.default_rng(20260820)
    # genome-like distinct ratio (unit tiled 64x, distinct ~2^21 <<
    # windows): random bases are ~100% distinct and on this dev tunnel
    # the 6 MB/s result egress then drowns the pipeline signal
    # (exp_multibucket_chip lesson); production hosts fetch at PCIe
    # rates where egress is negligible either way
    unit = rng.integers(0, 4, size=1 << 21, dtype=np.uint8)
    bases = np.tile(unit, pieces * SIZE // len(unit))
    starts = np.arange(pieces, dtype=np.int64) * SIZE
    packed = PackedSeqs(bases, starts, np.full(pieces, SIZE, np.int64))
    cfg = CountConfig(k=K, canonical=True)
    _watchdog(900)
    t0 = time.time()
    out = count_stream_packed([packed], cfg, chunk_bases=SIZE - K)
    warm_first = time.time() - t0
    _watchdog(900)
    stream_profile_reset()  # attribute the WARM pass only (env-gated)
    t0 = time.time()
    out = count_stream_packed([packed], cfg, chunk_bases=SIZE - K)
    dt = time.time() - t0
    stream_profile_report(sys.stderr)
    windows = pieces * SIZE
    kps = windows / dt
    print(
        f"# count_streamed: n={len(out)} warm={dt:.2f}s "
        f"(first incl. compile {warm_first:.1f}s) "
        f"backend={jax.default_backend()}",
        file=sys.stderr,
    )
    return {
        "metric": f"count_streamed_{pieces}x2e25",
        "value": round(kps),
        "unit": "kmers/s",
        "vs_baseline": round(kps / BASELINE_KMERS_PER_SEC, 2),
    }


def _bench_staged_taxid_cpu() -> dict | None:
    """Cheap CPU-side staged-taxid wall-time (subprocess so the cpu
    platform doesn't fight this process's device backend)."""
    import os
    import subprocess

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "bench_staged_taxid_cpu.py")
    try:
        out = subprocess.run(
            [sys.executable, script], capture_output=True, text=True,
            timeout=600,
        )
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        print(f"# staged-taxid probe: no JSON (rc={out.returncode}) "
              f"{out.stderr.strip()[-200:]}", file=sys.stderr)
    except Exception as e:  # never let a side metric sink the headline
        print(f"# staged-taxid probe failed: {e!r}", file=sys.stderr)
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all-configs", action="store_true",
                    help="also bench the ntHash/scaled/minimizer/syncmer "
                         "pipelines (one JSON line per config)")
    ap.add_argument("--stream", action="store_true",
                    help="bench ONLY the streaming path (multi-bucket "
                         "programs) instead of the default suite")
    ap.add_argument("--no-extras", action="store_true",
                    help="headline metric only (round-4 behavior)")
    args = ap.parse_args()
    probe_retries = {"n": 0}
    if not _probe_device_ready(counter=probe_retries):
        print(
            "# bench: device unresponsive after all probe retries",
            file=sys.stderr,
        )
        return 1
    # 900s rides out the known "first large dispatch stalls 5-8 min then
    # completes at full speed" tunnel pathology (CLAUDE.md) instead of
    # killing the run just before it would have finished.
    _watchdog(900)
    if args.stream:
        print(json.dumps(_bench_stream()))
        return 0
    rng = np.random.default_rng(20260817)
    bases = rng.integers(0, 4, size=SIZE, dtype=np.uint8)

    dev_bases = jax.device_put(bases)
    _ = np.asarray(jax.block_until_ready(dev_bases)[:1])

    configs = CONFIGS if args.all_configs else CONFIGS[:1]
    results = [_bench_config(name, cfg, dev_bases) for name, cfg in configs]
    headline = results[0]
    headline["probe_retries"] = probe_retries["n"]
    # Secondary metrics (VERDICT round-4 next #6: the driver bench
    # should carry the round's evidence, not just the headline).  Each
    # is best-effort: a failure degrades to the round-4 single-line
    # behavior.  The headline prints LAST so a driver that parses the
    # final JSON line still records the flagship number.
    extras = []
    if not args.no_extras:
        del dev_bases
        try:
            _watchdog(1800)
            extras.append(_bench_stream())
        except Exception as e:
            print(f"# stream bench failed: {e!r}", file=sys.stderr)
        st = _bench_staged_taxid_cpu()
        if st:
            extras.append(st)
        _watchdog(300)
    for r in results[1:]:
        print(json.dumps(r))
    for r in extras:
        print(json.dumps(r))
    print(json.dumps(headline))  # driver headline: LAST line
    return 0


if __name__ == "__main__":
    sys.exit(main())
