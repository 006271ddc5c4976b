#!/usr/bin/env python
"""Round-5 micro3: subdivide the remaining ~4.2 s non-exception cost of
_compress_result at 2^25 (micro2: c_compress 4.35 s with the exception
sort DCE'd; count_step alone 0.167 s).  All arms feed a DEVICE-RESIDENT
sorted u64 array + traced n; scalar-fetch forced."""

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

OUT = os.environ.get("EXP_OUT", "/tmp/round5_micro3.jsonl")
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


def timed(label, fn, *args, reps=3, budget=900):
    try:
        with Watchdog(budget, label):
            t0 = time.time()
            r = fn(*args)
            s = float(np.asarray(jnp.sum(
                r[0] if isinstance(r, tuple) else r).astype(jnp.float64)))
            cold = time.time() - t0
            walls = []
            for _ in range(reps):
                t0 = time.time()
                r = fn(*args)
                float(np.asarray(jnp.sum(
                    r[0] if isinstance(r, tuple) else r)
                    .astype(jnp.float64)))
                walls.append(time.time() - t0)
        emit({"arm": label, "cold_s": round(cold, 2),
              "warm_ms": [round(w * 1e3) for w in walls], "sum": s})
        return min(walls)
    except TimeoutError as e:
        emit({"arm": label, "error": str(e)})
        return None


def main():
    emit({"arm": "start"})
    with Watchdog(1200, "backend init"):
        jax.devices()
    if not probe():
        emit({"arm": "abort"})
        return 2
    rng = np.random.default_rng(20260821)
    out_np = np.sort(rng.choice(1 << 46, 1 << 21, replace=False)
                     .astype(np.uint64))
    full = np.full(N, np.uint64((1 << 46) - 1), np.uint64)
    full[: len(out_np)] = out_np
    d_out = jax.device_put(full)
    d_n = jax.device_put(np.int64(len(out_np)))
    _ = int(np.asarray(d_out[0]))

    @jax.jit
    def g0_sum(out, n):
        return jnp.sum(out) + n.astype(jnp.uint64)

    @jax.jit
    def g1_shift_sub(out, n):
        prev = jnp.concatenate([jnp.zeros((1,), jnp.uint64), out[:-1]])
        return jnp.sum(out - prev)

    @jax.jit
    def g2_masked_delta(out, n):
        idx = jnp.arange(out.shape[0], dtype=jnp.int64)
        prev = jnp.concatenate([jnp.zeros((1,), jnp.uint64), out[:-1]])
        delta = jnp.where(idx < n, out - prev, jnp.uint64(0))
        return jnp.sum(delta)

    @jax.jit
    def g3_big(out, n):
        idx = jnp.arange(out.shape[0], dtype=jnp.int64)
        prev = jnp.concatenate([jnp.zeros((1,), jnp.uint64), out[:-1]])
        delta = jnp.where(idx < n, out - prev, jnp.uint64(0))
        big = delta >= jnp.uint64(1 << 32)
        return jnp.sum(big.astype(jnp.int64))

    @jax.jit
    def g4_small_u32(out, n):
        idx = jnp.arange(out.shape[0], dtype=jnp.int64)
        prev = jnp.concatenate([jnp.zeros((1,), jnp.uint64), out[:-1]])
        delta = jnp.where(idx < n, out - prev, jnp.uint64(0))
        big = delta >= jnp.uint64(1 << 32)
        small = jnp.where(big, jnp.uint64(0), delta).astype(jnp.uint32)
        return jnp.sum(small.astype(jnp.uint64))

    @jax.jit
    def g5_u32_formulation(out, n):
        # u32-only delta/overflow arithmetic (no u64 elementwise chain)
        lo = out.astype(jnp.uint32)
        hi = (out >> jnp.uint64(32)).astype(jnp.uint32)
        plo = jnp.concatenate([jnp.zeros((1,), jnp.uint32), lo[:-1]])
        phi = jnp.concatenate([jnp.zeros((1,), jnp.uint32), hi[:-1]])
        idx = jnp.arange(out.shape[0], dtype=jnp.int32)
        live = idx < n.astype(jnp.int32)
        borrow = (lo < plo).astype(jnp.uint32)
        hid = hi - phi
        big = live & (hid > borrow)
        small = jnp.where(live & ~big, lo - plo, jnp.uint32(0))
        return (jnp.sum(small.astype(jnp.uint64))
                + jnp.sum(big.astype(jnp.uint64)))

    @jax.jit
    def g6_roll(out, n):
        # roll instead of concatenate (different layout path)
        prev = jnp.roll(out, 1).at[0].set(jnp.uint64(0))
        idx = jnp.arange(out.shape[0], dtype=jnp.int64)
        delta = jnp.where(idx < n, out - prev, jnp.uint64(0))
        return jnp.sum(delta)

    @jax.jit
    def g7_pad_slice(out, n):
        # static pad+slice instead of concatenate
        prev = jnp.pad(out, (1, 0))[:-1]
        idx = jnp.arange(out.shape[0], dtype=jnp.int64)
        delta = jnp.where(idx < n, out - prev, jnp.uint64(0))
        return jnp.sum(delta)

    timed("g0_sum", g0_sum, d_out, d_n)
    timed("g1_shift_sub", g1_shift_sub, d_out, d_n)
    timed("g2_masked_delta", g2_masked_delta, d_out, d_n)
    timed("g3_big", g3_big, d_out, d_n)
    timed("g4_small_u32", g4_small_u32, d_out, d_n)
    timed("g5_u32_formulation", g5_u32_formulation, d_out, d_n)
    timed("g6_roll", g6_roll, d_out, d_n)
    timed("g7_pad_slice", g7_pad_slice, d_out, d_n)
    emit({"arm": "done"})
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except TimeoutError as e:
        emit({"arm": "WATCHDOG", "error": str(e)})
        sys.exit(2)
