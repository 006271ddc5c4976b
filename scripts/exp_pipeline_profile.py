#!/usr/bin/env python
"""On-chip stage profile of the flagship count pipeline at the bench
size (2^25), plus sort-primitive variants.  Single device process;
in-process watchdogs only (CLAUDE.md wedge discipline)."""

import resource
import signal
import sys
import time

import numpy as np

resource.setrlimit(resource.RLIMIT_CPU, (5400, 5400))

import unikmer_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from unikmer_tpu.models.count import CountConfig, count_step, window_codes
from unikmer_tpu.ops import codec
from unikmer_tpu.ops.sort import collapse_sorted


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
    n = 1 << 25
    k = 23
    rng = np.random.default_rng(20260817)
    bases = rng.integers(0, 4, size=n, dtype=np.uint8)
    cfg = CountConfig(k=k, canonical=True)
    d = jax.device_put(bases)

    # 1. full pipeline (the bench program)
    @jax.jit
    def full(b):
        out, nn = count_step(b, cfg)
        return nn

    timeit("full count_step 2^25", full, d)

    # 2. encode+canonical+valid only
    @jax.jit
    def enc(b):
        codes, valid = window_codes(b, cfg)
        return jnp.sum(jnp.where(valid, codes, jnp.uint64(0)))

    timeit("encode+valid 2^25", enc, d)

    # 3. lax.sort of the keyed array only
    @jax.jit
    def sort_only(b):
        codes, valid = window_codes(b, cfg)
        keyed = jnp.where(valid, codes, jnp.uint64(0xFFFFFFFFFFFFFFFF))
        return jax.lax.sort(keyed)[0]

    timeit("encode+sort 2^25", sort_only, d)

    # 4. collapse (sort included; full pipeline minus nothing) for the
    # delta: collapse-after-sort = (1) - (3)
    # 5. sort primitive variants on random u64 (46-bit)
    a = rng.integers(0, 1 << 46, size=n, dtype=np.uint64)
    da = jax.device_put(a)
    timeit("lax.sort u64 2^25", jax.jit(jax.lax.sort), da)

    hi = (a >> 32).astype(np.uint32)
    lo = (a & 0xFFFFFFFF).astype(np.uint32)
    dhi, dlo = jax.device_put(hi), jax.device_put(lo)

    @jax.jit
    def sort2(h, l):
        return jax.lax.sort((h, l), num_keys=2)[0]

    timeit("lax.sort 2xu32 nk=2 2^25", sort2, dhi, dlo)

    # 6. pallas u16s at 2^25 (cached block kernels from the race)
    from unikmer_tpu.ops.pallas_sort import sort_codes_pallas

    @jax.jit
    def psort(x):
        return sort_codes_pallas(x, block_elems=1 << 16, layout="sub")

    timeit("pallas u16s 2^25", psort, da)

    # 7. throughput mode: two batches in flight (dispatch overlap)
    d2 = jax.device_put(rng.integers(0, 4, size=n, dtype=np.uint8))
    with Watchdog(900, "overlap"):
        full(d)  # warm
        t0 = time.time()
        r1 = full(d)
        r2 = full(d2)
        int(np.asarray(r1))
        int(np.asarray(r2))
        dt = time.time() - t0
    print(f"2 batches in flight: {dt*1e3:.1f} ms total "
          f"({dt/2*1e3:.1f} ms/batch)", flush=True)


if __name__ == "__main__":
    try:
        main()
    except TimeoutError as e:
        print(f"WATCHDOG: {e}", file=sys.stderr, flush=True)
        sys.exit(2)
