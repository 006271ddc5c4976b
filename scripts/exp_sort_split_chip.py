#!/usr/bin/env python
"""On-chip race: u64 lax.sort vs the split 2-key (hi,lo) sorts, raw and
integrated into the count pipeline at the 2^25 bench bucket.

Single device process; in-process watchdogs only (CLAUDE.md wedge
discipline).  Compiles every new program at 2^23 first so a compile
blow-up is caught cheaply.
"""

import resource
import signal
import sys
import time
from functools import partial

import numpy as np

resource.setrlimit(resource.RLIMIT_CPU, (5400, 5400))

import unikmer_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from unikmer_tpu.models.count import CountConfig, window_codes
from unikmer_tpu.ops.codec import CODE_SENTINEL
from unikmer_tpu.ops.sort import _sort_u64_split, collapse_sorted


class Watchdog:
    def __init__(self, seconds, label):
        self.seconds, self.label = seconds, label

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
                assert float(np.asarray(
                    jax.device_put(np.ones(8, np.float32)))[0]) == 1.0
            return True
        except TimeoutError:
            print(f"probe {attempt+1}/20 timeout; sleep 90", flush=True)
            time.sleep(90)
    return False


def timeit(label, f, *args, reps=4, budget=900):
    with Watchdog(budget, label):
        t0 = time.time()
        r = f(*args)
        s = float(np.asarray(jnp.sum(r[0] if isinstance(r, tuple) else r)
                             .astype(jnp.float64)))
        cold = time.time() - t0
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            r = f(*args)
            float(np.asarray(jnp.sum(
                r[0] if isinstance(r, tuple) else r).astype(jnp.float64)))
            best = min(best, time.time() - t0)
    print(f"{label}: cold {cold:.1f}s warm {best*1e3:.1f} ms (sum={s:.3e})",
          flush=True)
    return best


def main():
    with Watchdog(1200, "backend init"):
        print(f"devices: {jax.devices()}", flush=True)
    if not probe():
        print("device unresponsive", flush=True)
        return
    rng = np.random.default_rng(20260819)

    # --- exactness + compile sanity at 2^23 ---
    n = 1 << 23
    a64 = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    a64[:64] = np.uint64(CODE_SENTINEL)  # real sentinel collisions
    valid = rng.random(n) < 0.9
    a46 = rng.integers(0, 1 << 46, size=n, dtype=np.uint64)
    d64, d46 = jax.device_put(a64), jax.device_put(a46)
    dvalid = jax.device_put(valid)

    col = jax.jit(partial(collapse_sorted, mode="distinct"),
                  static_argnames=("code_bits", "split"))

    with Watchdog(900, "exactness 2^23"):
        ref_out, ref_n = col(d64, dvalid, code_bits=64, split=0)
        ref_out, ref_n = np.asarray(ref_out), int(ref_n)
        o32, n32 = col(d64, dvalid, code_bits=64, split=32)
        assert int(n32) == ref_n and np.array_equal(np.asarray(o32), ref_out)
        print("exact: split32 full-u64 collapse ok", flush=True)

        r46_out, r46_n = col(d46, dvalid, code_bits=46, split=0)
        r46_out, r46_n = np.asarray(r46_out), int(r46_n)
        o16, n16 = col(d46, dvalid, code_bits=46, split=16)
        assert int(n16) == r46_n and np.array_equal(np.asarray(o16), r46_out)
        print("exact: split16 46-bit collapse ok", flush=True)

    # --- raw sort timings at 2^25 ---
    n = 1 << 25
    b46 = rng.integers(0, 1 << 46, size=n, dtype=np.uint64)
    db = jax.device_put(b46)
    timeit("raw lax.sort u64 2^25", jax.jit(jax.lax.sort), db)
    timeit("raw split32 2^25",
           jax.jit(partial(_sort_u64_split, width=32)), db)
    timeit("raw split16 2^25",
           jax.jit(partial(_sort_u64_split, width=16)), db)

    # --- integrated count pipeline at 2^25 ---
    bases = rng.integers(0, 4, size=n, dtype=np.uint8)
    dbase = jax.device_put(bases)
    cfg = CountConfig(k=23, canonical=True)

    def make(split):
        @jax.jit
        def fn(b):
            codes, valid = window_codes(b, cfg)
            out, nn = collapse_sorted(codes, valid, mode="distinct",
                                      code_bits=cfg.code_bits, split=split)
            return nn
        return fn

    outs = {}
    for split in (0, 32, 16):
        f = make(split)
        timeit(f"count_step 2^25 split={split}", f, dbase)
        outs[split] = int(np.asarray(f(dbase)))
    assert outs[0] == outs[32] == outs[16], outs
    print(f"pipeline n-distinct agree: {outs[0]}", flush=True)


if __name__ == "__main__":
    try:
        main()
    except TimeoutError as e:
        print(f"WATCHDOG: {e}", file=sys.stderr, flush=True)
        sys.exit(2)
