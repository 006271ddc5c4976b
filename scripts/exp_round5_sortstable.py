#!/usr/bin/env python
"""Is the default is_stable=True costing us sort time?  None of the
pipeline's sorts need stability: single-operand sorts (equal u64
values are interchangeable), split (hi, lo) num_keys=2 sorts (both
operands are keys), and payload sorts keyed by a UNIQUE index.  If
XLA's unstable TPU sort is faster, this is free headline perf (the
pipeline is sort-bound: ~140 of 156 ms at 2^25)."""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import unikmer_tpu  # noqa: F401
import jax
import jax.numpy as jnp

OUT = os.environ.get("EXP_OUT", "/tmp/round5_sortstable.jsonl")
N = 1 << 25


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


def timed(label, fn, *args, reps=5, budget=900):
    try:
        with Watchdog(budget, label):
            t0 = time.time()
            r = fn(*args)
            s = float(np.asarray(jnp.sum(
                (r[0] if isinstance(r, tuple) else r).astype(jnp.uint64))
                .astype(jnp.float64)))
            cold = time.time() - t0
            walls = []
            for _ in range(reps):
                t0 = time.time()
                r = fn(*args)
                float(np.asarray(jnp.sum(
                    (r[0] if isinstance(r, tuple) else r)
                    .astype(jnp.uint64)).astype(jnp.float64)))
                walls.append(time.time() - t0)
        emit({"arm": label, "cold_s": round(cold, 2),
              "warm_ms": [round(w * 1e3) for w in walls],
              "best_ms": round(min(walls) * 1e3, 1), "sum": s})
    except TimeoutError as e:
        emit({"arm": label, "error": str(e)})


def main():
    emit({"arm": "start"})
    with Watchdog(1200, "backend init"):
        jax.devices()
    if not probe():
        emit({"arm": "abort"})
        return 2
    rng = np.random.default_rng(20260821)
    a = rng.integers(0, 1 << 46, N, dtype=np.uint64)
    hi = jax.device_put((a >> 32).astype(np.uint16))
    hi32 = jax.device_put((a >> 32).astype(np.uint32))
    lo = jax.device_put(a.astype(np.uint32))
    da = jax.device_put(a)
    _ = int(np.asarray(da[0]))

    for stable in (True, False):
        tag = "stable" if stable else "unstable"

        @jax.jit
        def s_u64(x, st=stable):
            return jax.lax.sort(x, is_stable=st)

        @jax.jit
        def s_split16(h, l, st=stable):
            return jax.lax.sort((h, l), num_keys=2, is_stable=st)[1]

        @jax.jit
        def s_split32(h, l, st=stable):
            return jax.lax.sort((h, l), num_keys=2, is_stable=st)[1]

        timed(f"u64_{tag}", s_u64, da)
        timed(f"split16_{tag}", s_split16, hi, lo)
        timed(f"split32_{tag}", s_split32, hi32, lo)
    emit({"arm": "done"})
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except TimeoutError as e:
        emit({"arm": "WATCHDOG", "error": str(e)})
        sys.exit(2)
