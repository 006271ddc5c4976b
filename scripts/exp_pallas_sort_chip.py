#!/usr/bin/env python
"""On-chip probe of the VMEM-blocked bitonic sort (ops/pallas_sort.py).

Escalating block-size sweep: the axon AOT Mosaic compiler handles the
55-stage 1024-element block in ~1 s but did not return within 900 s for
the 171-stage 2^18 block, so find the largest block that compiles in
reasonable time, then race the full 2^23 sort against jax.lax.sort.

Run standalone (single device process!).  Every step is under a
SIGALRM watchdog; we never external-kill this process (tunnel-wedge
discipline, CLAUDE.md).  The persistent compile cache makes every
block size that ever compiled free in later runs.
"""

import resource
import signal
import sys
import time

import numpy as np

# Hard self-termination backstop: the axon client busy-polls during
# backend init with the GIL held, so SIGALRM handlers can starve
# forever — but sys time accrues, so a CPU-time rlimit always fires.
# (Never external-kill this process: wedge discipline, CLAUDE.md.)
resource.setrlimit(resource.RLIMIT_CPU, (5400, 5400))

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


def xla_bitonic_sort_u64(codes):
    """Pure-XLA flip-merge bitonic sort (no Pallas): every stage is a
    reshape-view + select pass; measures how well XLA fuses the network
    (third arm of the sort race, zero Mosaic risk)."""
    from unikmer_tpu.ops.pallas_sort import _key_planes, _codes_from_planes

    n = codes.shape[0]
    hi, lo = _key_planes(codes)

    def stage(hi, lo, j):
        vhi = hi.reshape(n // (2 * j), 2, j)
        vlo = lo.reshape(n // (2 * j), 2, j)
        ahi, bhi, alo, blo = vhi[:, 0], vhi[:, 1], vlo[:, 0], vlo[:, 1]
        b_lt = (bhi < ahi) | ((bhi == ahi) & (blo < alo))
        hi = jnp.stack(
            [jnp.where(b_lt, bhi, ahi), jnp.where(b_lt, ahi, bhi)], 1
        ).reshape(-1)
        lo = jnp.stack(
            [jnp.where(b_lt, blo, alo), jnp.where(b_lt, alo, blo)], 1
        ).reshape(-1)
        return hi, lo

    def flip_second_halves(x, kk):
        v = x.reshape(n // kk, 2, kk // 2)
        return jnp.stack([v[:, 0], jax.lax.rev(v[:, 1], (1,))], 1).reshape(-1)

    kk = 2
    while kk <= n:
        hi = flip_second_halves(hi, kk)
        lo = flip_second_halves(lo, kk)
        j = kk // 2
        while j >= 1:
            hi, lo = stage(hi, lo, j)
            j //= 2
        kk *= 2
    return _codes_from_planes(hi, lo)


def race(f, d, want, label, warm_iters=5, budget=1800):
    """Compile+validate f(d) against want, then best-of warm timing."""
    with Watchdog(budget, f"{label} compile+run"):
        t0 = time.time()
        cs = fetch_checksum(f(d))
        print(f"{label} cold: {time.time()-t0:.1f}s", flush=True)
        assert cs == np_checksum(want), f"{label} checksum!"
        best = 1e9
        for i in range(warm_iters):
            t0 = time.time()
            fetch_checksum(f(d))
            dt = time.time() - t0
            best = min(best, dt)
            print(f"{label} warm {i}: {dt*1e3:.1f} ms", flush=True)
    return best


def main():
    # argv: [budget_s_per_mosaic_compile] [comma-separated arms:
    #   u<logb> = unrolled kernel, l<logb> = looped (fori/switch) kernel;
    #   trailing 's' = 'sub' layout (consecutive elements down sublanes,
    #   one transpose pass each way)] [skip_baseline]
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    arms = (
        [a.strip() for a in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else ["u10", "l16", "l18"]
    )
    skip_baseline = len(sys.argv) > 3 and sys.argv[3] == "skip_baseline"
    log_n = int(sys.argv[4]) if len(sys.argv) > 4 else 23
    with Watchdog(1200, "backend init"):
        print(f"devices: {jax.devices()}", flush=True)
    # bench.py-style probe-retry loop: the tunnel chip wedges
    # transiently after heavy traffic; wait it out instead of exiting
    # (an exit with the probe op pending is itself wedge-inducing).
    for attempt in range(20):
        try:
            with Watchdog(45, "tiny probe"):
                v = np.asarray(jax.device_put(np.ones(8, np.float32)))[0]
                assert v == 1.0
            break
        except TimeoutError:
            print(f"probe {attempt + 1}/20 timed out; sleeping 90s",
                  flush=True)
            time.sleep(90)
    else:
        print("device unresponsive after all probe retries", flush=True)
        return
    print("probe ok", flush=True)
    rng = np.random.default_rng(0)

    # baseline arm first: we always have the reference number on record
    n = 1 << log_n
    a = rng.integers(0, 1 << 46, size=n, dtype=np.uint64)
    want = np.sort(a)
    d = jax.device_put(jnp.asarray(a))
    bestx = 0.0503  # measured 2026-08-19 at 2^23 (warm best, same seed)
    if not skip_baseline:
        bestx = race(jax.jit(jax.lax.sort), d, want,
                     f"n=2^{log_n} lax.sort", budget=900)
    results = {}

    # per arm: tiny Mosaic compile (the risky, slow part), then
    # immediately the full 2^23 race with that block — so every block
    # that compiles produces a headline number even if the NEXT arm
    # hits the AOT compile cliff.
    for arm in arms:
        looped = arm[0] == "l"
        layout = "sub" if arm.endswith("s") else "lane"
        logb = int(arm[1:-1] if arm.endswith("s") else arm[1:])
        blk = 1 << logb
        t = rng.integers(0, 1 << 64, size=blk, dtype=np.uint64)
        try:
            with Watchdog(budget, f"{arm} mosaic compile"):
                t0 = time.time()
                got = np.asarray(
                    sort_codes_pallas(
                        jnp.asarray(t), block_elems=blk, looped=looped,
                        layout=layout,
                    )
                )
                dt = time.time() - t0
                ok = np.array_equal(got, np.sort(t))
                print(f"{arm} block-sort: {dt:.1f}s "
                      f"{'EXACT' if ok else 'MISMATCH'}", flush=True)
                if not ok:
                    break
        except TimeoutError as e:
            print(f"WATCHDOG: {e} — stopping escalation (abandoned "
                  f"compile may wedge the backend; let it rest)",
                  flush=True)
            break
        except Exception as e:  # noqa: BLE001  (lowering bugs: next arm)
            print(f"{arm} block-sort failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        try:
            f = jax.jit(
                lambda x, b=blk, lp=looped, ly=layout: sort_codes_pallas(
                    x, block_elems=b, looped=lp, layout=ly
                )
            )
            results[arm] = race(
                f, d, want, f"n=2^{log_n} pallas {arm}", budget=900
            )
        except TimeoutError as e:
            print(f"WATCHDOG: {e}", flush=True)
            break
        except Exception as e:  # noqa: BLE001  (lowering bugs: next arm)
            print(f"{arm} full race failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue

    print(f"RESULT lax.sort {bestx*1e3:.1f} ms | " + " | ".join(
        f"pallas {arm} {t*1e3:.1f} ms ({bestx/t:.2f}x)"
        for arm, t in results.items()
    ), flush=True)


if __name__ == "__main__":
    try:
        main()
    except TimeoutError as e:
        print(f"WATCHDOG: {e}", file=sys.stderr, flush=True)
        sys.exit(2)
