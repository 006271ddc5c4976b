#!/usr/bin/env python
"""Round-5 micro4: do program OUTPUTS ship eagerly over the tunnel?

Every anomaly tonight (fused compress 4.3 s, lax.map B=2 8.9 s, split
programs not helping, stream stuck at ~5 s/piece) is consistent with
one model: execution cost ~ static output bytes / tunnel bandwidth,
i.e. outputs are returned BY VALUE at dispatch instead of staying
device-resident.  These arms measure exactly that.

  h0_scalar      x+1 -> sum (8 B out)          expect ~30 ms
  h1_big_out     x+1 -> full 2^25 u64 (268 MB) eager => ~7-14 s
  h2_sliced_out  (x+1)[:1024] (8 KB out)       expect ~30 ms
  h3_chain       g(f(x)) two jits, scalar out  handoff cost
  h4_count_raw   count_step full out (268 MB)  the production shape
  h5_small_u32   x.astype(u32) out (134 MB)    bandwidth scaling check
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
import jax.numpy as jnp

OUT = os.environ.get("EXP_OUT", "/tmp/round5_micro4.jsonl")
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


def timed(label, fn, *args, reps=3, budget=900, force=None):
    try:
        with Watchdog(budget, label):
            t0 = time.time()
            r = fn(*args)
            s = float(np.asarray((force or (lambda y: jnp.sum(
                y[0] if isinstance(y, tuple) else y)))(r)
                .astype(jnp.float64)))
            cold = time.time() - t0
            walls = []
            for _ in range(reps):
                t0 = time.time()
                r = fn(*args)
                float(np.asarray((force or (lambda y: jnp.sum(
                    y[0] if isinstance(y, tuple) else y)))(r)
                    .astype(jnp.float64)))
                walls.append(time.time() - t0)
        emit({"arm": label, "cold_s": round(cold, 2),
              "warm_ms": [round(w * 1e3) for w in walls], "sum": s})
    except TimeoutError as e:
        emit({"arm": label, "error": str(e)})


def main():
    from unikmer_tpu.models.count import CountConfig, count_step

    emit({"arm": "start"})
    with Watchdog(1200, "backend init"):
        jax.devices()
    if not probe():
        emit({"arm": "abort"})
        return 2
    rng = np.random.default_rng(20260821)
    x_np = rng.integers(0, 1 << 46, N, dtype=np.uint64)
    d_x = jax.device_put(x_np)
    bases = np.tile(rng.integers(0, 4, 1 << 21, dtype=np.uint8),
                    N // (1 << 21))
    d_bases = jax.device_put(bases)
    _ = int(np.asarray(d_x[0]))
    _ = int(np.asarray(d_bases[0]))

    @jax.jit
    def h0_scalar(x):
        return jnp.sum(x + jnp.uint64(1))

    @jax.jit
    def h1_big_out(x):
        return x + jnp.uint64(1)

    @jax.jit
    def h2_sliced_out(x):
        return (x + jnp.uint64(1))[:1024]

    @jax.jit
    def f_part(x):
        return x + jnp.uint64(1)

    @jax.jit
    def g_part(y):
        return jnp.sum(y)

    def h3_chain(x):
        return g_part(f_part(x))

    @jax.jit
    def h4_count_raw(b):
        return count_step(b, CountConfig(k=23, canonical=True))

    @jax.jit
    def h5_small_u32(x):
        return (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)

    timed("h0_scalar", h0_scalar, d_x)
    timed("h1_big_out_268MB", h1_big_out, d_x,
          force=lambda y: y[0].astype(jnp.float64))
    timed("h2_sliced_out", h2_sliced_out, d_x)
    timed("h3_chain_two_jits", h3_chain, d_x)
    timed("h4_count_raw_268MB", h4_count_raw, d_bases,
          force=lambda y: y[1].astype(jnp.float64))
    timed("h5_small_u32_134MB", h5_small_u32, d_x,
          force=lambda y: y[0].astype(jnp.float64))
    emit({"arm": "done"})
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except TimeoutError as e:
        emit({"arm": "WATCHDOG", "error": str(e)})
        sys.exit(2)
