#!/usr/bin/env python
"""On-chip probe of the VMEM-blocked bitonic sort (ops/pallas_sort.py).

Run standalone (single device process!). Escalates carefully:
  1. tiny device probe
  2. n=1024 pallas sort, correctness vs numpy
  3. n=2^18 single-block sort, correctness + timing
  4. n=2^23 (block 2^18) full config, timing vs jax.lax.sort

Every step is under a SIGALRM watchdog that prints a diagnostic; we
never external-kill this process (tunnel-wedge discipline, CLAUDE.md).
"""

import signal
import sys
import time

import numpy as np

import unikmer_tpu  # noqa: F401  (x64, compile cache, mallopt)
import jax
import jax.numpy as jnp

from unikmer_tpu.ops.pallas_sort import sort_codes_pallas


class Watchdog:
    def __init__(self, seconds, label):
        self.seconds = seconds
        self.label = label

    def __enter__(self):
        def on_alarm(signum, frame):
            raise TimeoutError(f"{self.label}: no progress in {self.seconds}s")

        self.old = signal.signal(signal.SIGALRM, on_alarm)
        signal.alarm(self.seconds)
        return self

    def __exit__(self, *exc):
        signal.alarm(0)
        signal.signal(signal.SIGALRM, self.old)
        return False


def fetch_checksum(x):
    """Force full execution by fetching a scalar that depends on every
    element AND its position (a permutation-blind xor would pass on a
    broken merge); block_until_ready is unreliable on this backend."""
    w = jnp.arange(1, x.shape[0] + 1, dtype=jnp.uint64)
    return int(np.asarray(jnp.sum(x * w)))  # mod 2^64


def np_checksum(x):
    w = np.arange(1, len(x) + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return int(np.sum(x * w, dtype=np.uint64))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    with Watchdog(60, "tiny probe"):
        v = np.asarray(jax.device_put(np.ones(8, np.float32)))[0]
        assert v == 1.0
    print("probe ok", flush=True)
    rng = np.random.default_rng(0)

    # step 2: small sort
    a = rng.integers(0, 1 << 64, size=1024, dtype=np.uint64)
    with Watchdog(420, "n=1024 compile+run"):
        t0 = time.time()
        out = sort_codes_pallas(jnp.asarray(a), block_elems=1024)
        got = np.asarray(out)
        print(f"n=1024: {time.time()-t0:.1f}s "
              f"{'EXACT' if np.array_equal(got, np.sort(a)) else 'MISMATCH'}",
              flush=True)

    # step 3: one full 2^18 block
    n = 1 << 18
    a = rng.integers(0, 1 << 46, size=n, dtype=np.uint64)
    with Watchdog(900, "n=2^18 compile+run"):
        t0 = time.time()
        d = jax.device_put(jnp.asarray(a))
        f = jax.jit(lambda x: sort_codes_pallas(x, block_elems=1 << 18))
        cs = fetch_checksum(f(d))
        print(f"n=2^18 cold: {time.time()-t0:.1f}s", flush=True)
        want = np.sort(a)
        assert cs == np_checksum(want), "checksum!"
        # full fetch once: position-exact validation of the merge path
        np.testing.assert_array_equal(np.asarray(f(d)), want)
        print("n=2^18 EXACT (full fetch)", flush=True)
        for i in range(3):
            t0 = time.time()
            fetch_checksum(f(d))
            print(f"n=2^18 warm {i}: {(time.time()-t0)*1e3:.1f} ms", flush=True)

    # step 4: full config 2^23 / block 2^18 vs lax.sort
    n = 1 << 23
    a = rng.integers(0, 1 << 46, size=n, dtype=np.uint64)
    with Watchdog(1800, "n=2^23 pallas compile+run"):
        d = jax.device_put(jnp.asarray(a))
        f = jax.jit(lambda x: sort_codes_pallas(x, block_elems=1 << 18))
        t0 = time.time()
        cs = fetch_checksum(f(d))
        print(f"n=2^23 pallas cold: {time.time()-t0:.1f}s", flush=True)
        want = np.sort(a)
        assert cs == np_checksum(want), "checksum!"
        best = 1e9
        for i in range(5):
            t0 = time.time()
            fetch_checksum(f(d))
            dt = time.time() - t0
            best = min(best, dt)
            print(f"n=2^23 pallas warm {i}: {dt*1e3:.1f} ms", flush=True)
    with Watchdog(900, "n=2^23 lax.sort"):
        g = jax.jit(jax.lax.sort)
        fetch_checksum(g(d))
        bestx = 1e9
        for i in range(5):
            t0 = time.time()
            fetch_checksum(g(d))
            dt = time.time() - t0
            bestx = min(bestx, dt)
            print(f"n=2^23 lax.sort warm {i}: {dt*1e3:.1f} ms", flush=True)
    print(f"RESULT pallas {best*1e3:.1f} ms vs lax.sort {bestx*1e3:.1f} ms "
          f"({bestx/best:.2f}x)", flush=True)


if __name__ == "__main__":
    try:
        main()
    except TimeoutError as e:
        print(f"WATCHDOG: {e}", file=sys.stderr, flush=True)
        sys.exit(2)
