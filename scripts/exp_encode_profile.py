#!/usr/bin/env python
"""On-chip breakdown of the encode half of the count pipeline at 2^25:
which of kmer_codes / canonical / window_valid costs what, to decide
whether the encode stage (now ~27% of count_step after the split sort)
has a worthwhile lever.  Single device process, in-process watchdogs."""

import resource
import signal
import sys
import time

import numpy as np

resource.setrlimit(resource.RLIMIT_CPU, (5400, 5400))

import unikmer_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from unikmer_tpu.models.count import CountConfig, count_step
from unikmer_tpu.ops import codec


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
    rng = np.random.default_rng(20260819)
    bases = rng.integers(0, 4, size=n, dtype=np.uint8)
    d = jax.device_put(bases)
    cfg = CountConfig(k=k, canonical=True)

    # floor: one u8 read + reduce
    timeit("floor u8 sum 2^25", jax.jit(lambda b: jnp.sum(
        b.astype(jnp.uint32))), d)

    # kmer_codes alone
    timeit("kmer_codes 2^25", jax.jit(
        lambda b: codec.kmer_codes(b, k)), d)

    # + canonical
    timeit("kmer_codes+canonical 2^25", jax.jit(
        lambda b: codec.canonical_code(codec.kmer_codes(b, k), k)), d)

    # window_valid alone
    timeit("window_valid 2^25", jax.jit(
        lambda b: codec.window_valid(b, k).astype(jnp.int32)), d)

    # full encode half (what exp_pipeline_profile measured at 42.8 ms)
    @jax.jit
    def enc(b):
        from unikmer_tpu.models.count import window_codes
        codes, valid = window_codes(b, cfg)
        return jnp.sum(jnp.where(valid, codes, jnp.uint64(0)))

    timeit("encode+valid 2^25", enc, d)

    # reference: full count_step with the shipped split sort
    @jax.jit
    def full(b):
        out, nn = count_step(b, cfg)
        return nn

    timeit("full count_step 2^25", full, d)


if __name__ == "__main__":
    try:
        main()
    except TimeoutError as e:
        print(f"WATCHDOG: {e}", file=sys.stderr, flush=True)
        sys.exit(2)
