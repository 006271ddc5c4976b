#!/usr/bin/env python
"""Round-5 chip session P1: streamed-path phase attribution + B/depth
sweep (VERDICT round-4 next #1 and #4).

ONE device process, in-process watchdogs only, incremental JSONL
output (survives a mid-session wedge).  Run inside tmux, never under
external `timeout` (CLAUDE.md wedge discipline).

Arms:
  tunnel    raw link probes: device_put 32 MB (ingress) and 32 MB
            fetch (egress) — the floor numbers every later phase is
            read against
  profile   4 x 2^25 streamed count with UNIKMER_TPU_PROFILE_STREAM=1
            -> per-phase wall table
  Bsweep    B in {1,2,3,4} multi-bucket streamed metric (profile off)
  depth     pipeline depth {0,1,2} at the best B
  raw_ingress  PACKED_TRANSFER=0 arm (is 2-bit ingress still paying?)
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import unikmer_tpu  # noqa: F401
import jax

OUT = os.environ.get("EXP_OUT", "/tmp/round5_stream.jsonl")
SIZE = 1 << int(os.environ.get("EXP_LOG2", "25"))
K = 23
PIECES = 4


def emit(rec):
    rec["t"] = round(time.time(), 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"## {json.dumps(rec)}", flush=True)


class Watchdog:
    def __init__(self, seconds, label):
        self.seconds, self.label = int(seconds), label

    def __enter__(self):
        signal.signal(signal.SIGALRM, lambda s, f: (_ for _ in ()).throw(
            TimeoutError(f"{self.label}: {self.seconds}s")))
        signal.alarm(self.seconds)

    def __exit__(self, *e):
        signal.alarm(0)
        return False


def probe():
    for attempt in range(20):
        try:
            with Watchdog(45, "probe"):
                x = jax.device_put(np.ones(8, np.float32))
                assert float(np.asarray(x)[0]) == 1.0
            return True
        except TimeoutError:
            print(f"probe {attempt+1}/20 timeout; sleep 90", flush=True)
            time.sleep(90)
    return False


def make_packed():
    from unikmer_tpu.io.fastx import PackedSeqs

    rng = np.random.default_rng(20260820)
    unit = rng.integers(0, 4, size=1 << 21, dtype=np.uint8)
    bases = np.tile(unit, PIECES * SIZE // len(unit))
    starts = np.arange(PIECES, dtype=np.int64) * SIZE
    return PackedSeqs(bases, starts, np.full(PIECES, SIZE, np.int64))


def stream_once(packed, cfg, label, budget=1800):
    from unikmer_tpu.models.count import count_stream_packed

    with Watchdog(budget, label):
        t0 = time.time()
        out = count_stream_packed([packed], cfg, chunk_bases=SIZE - K)
        dt = time.time() - t0
    return dt, len(out)


def main():
    from unikmer_tpu.models.count import (
        CountConfig, count_packed, stream_profile_report,
        stream_profile_reset, stream_profile_table,
    )
    from unikmer_tpu.io.fastx import PackedSeqs

    emit({"arm": "start", "backend": None})
    with Watchdog(1200, "backend init"):
        devs = jax.devices()
    emit({"arm": "backend", "devices": str(devs)})
    if not probe():
        emit({"arm": "abort", "reason": "device unresponsive"})
        return 2

    cfg = CountConfig(k=K, canonical=True)

    # --- pretouch: absorb the known first-large-dispatch stall on a
    # 2^23 program and TIME it (evidence for the warm-server story)
    rng = np.random.default_rng(0)
    pb = rng.integers(0, 4, size=1 << 23, dtype=np.uint8)
    pp = PackedSeqs(pb, np.zeros(1, np.int64), np.asarray([len(pb)], np.int64))
    t0 = time.time()
    with Watchdog(1800, "pretouch"):
        n = len(count_packed(pp, cfg))
    emit({"arm": "pretouch_2e23", "wall_s": round(time.time() - t0, 1),
          "n": n})

    # --- tunnel floors
    blob = np.random.default_rng(1).integers(
        0, 255, size=32 << 20, dtype=np.uint8)
    with Watchdog(900, "ingress floor"):
        t0 = time.time()
        d = jax.device_put(blob)
        _ = int(np.asarray(d[:1])[0])  # force
        up = time.time() - t0
        # warm second upload (first may carry session setup)
        t0 = time.time()
        d2 = jax.device_put(blob)
        _ = int(np.asarray(d2[:1])[0])
        up2 = time.time() - t0
    emit({"arm": "tunnel_ingress_32MB", "first_s": round(up, 2),
          "second_s": round(up2, 2),
          "MBps": round(32 / max(up2, 1e-9), 1)})
    with Watchdog(900, "egress floor"):
        t0 = time.time()
        back = np.asarray(d)
        dn = time.time() - t0
    assert back[0] == blob[0]
    emit({"arm": "tunnel_egress_32MB", "wall_s": round(dn, 2),
          "MBps": round(32 / max(dn, 1e-9), 1)})
    del d, d2, back

    packed = make_packed()

    # --- profiled stream (B=2 default): run 1 = compile, run 2 = warm
    os.environ["UNIKMER_TPU_PROFILE_STREAM"] = "1"
    dt, n = stream_once(packed, cfg, "stream compile run", budget=2400)
    emit({"arm": "stream_first_incl_compile", "wall_s": round(dt, 1),
          "n": n})
    stream_profile_reset()
    dt, n = stream_once(packed, cfg, "stream profiled warm")
    tab = {k: [round(v[0], 3), v[1]] for k, v in
           stream_profile_table().items()}
    emit({"arm": "stream_profiled_warm", "wall_s": round(dt, 2), "n": n,
          "kps": round(PIECES * SIZE / dt), "phases": tab})
    stream_profile_report(sys.stderr)
    os.environ["UNIKMER_TPU_PROFILE_STREAM"] = "0"

    # --- B sweep (warm second run per B reported)
    best = (None, 1e9)
    for B in (1, 2, 3, 4):
        os.environ["UNIKMER_TPU_MULTI_BUCKET"] = str(B)
        try:
            dt1, _ = stream_once(packed, cfg, f"B={B} run1", budget=2400)
            dt2, n = stream_once(packed, cfg, f"B={B} run2")
        except TimeoutError as e:
            emit({"arm": f"stream_B{B}", "error": str(e)})
            continue
        emit({"arm": f"stream_B{B}", "first_s": round(dt1, 2),
              "warm_s": round(dt2, 2), "n": n,
              "kps": round(PIECES * SIZE / dt2)})
        if dt2 < best[1]:
            best = (B, dt2)
    os.environ["UNIKMER_TPU_MULTI_BUCKET"] = str(best[0] or 2)
    emit({"arm": "best_B", "B": best[0], "warm_s": round(best[1], 2)})

    # --- depth sweep at best B
    for depth in (0, 1, 2):
        os.environ["UNIKMER_TPU_PIPELINE_DEPTH"] = str(depth)
        try:
            dt, n = stream_once(packed, cfg, f"depth={depth}")
        except TimeoutError as e:
            emit({"arm": f"stream_depth{depth}", "error": str(e)})
            continue
        emit({"arm": f"stream_depth{depth}", "warm_s": round(dt, 2),
              "kps": round(PIECES * SIZE / dt)})
    os.environ.pop("UNIKMER_TPU_PIPELINE_DEPTH", None)

    # --- raw ingress arm (is the 2-bit pack still a win?)
    os.environ["UNIKMER_TPU_PACKED_TRANSFER"] = "0"
    try:
        dt1, _ = stream_once(packed, cfg, "raw ingress run1", budget=2400)
        dt2, n = stream_once(packed, cfg, "raw ingress run2")
        emit({"arm": "stream_raw_ingress", "first_s": round(dt1, 2),
              "warm_s": round(dt2, 2), "kps": round(PIECES * SIZE / dt2)})
    except TimeoutError as e:
        emit({"arm": "stream_raw_ingress", "error": str(e)})
    os.environ.pop("UNIKMER_TPU_PACKED_TRANSFER", None)

    emit({"arm": "done"})
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except TimeoutError as e:
        emit({"arm": "WATCHDOG", "error": str(e)})
        sys.exit(2)
