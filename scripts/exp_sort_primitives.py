"""Measure sort-related primitive throughput on the attached chip.

Question: can a sample-sort (batched short sorts + partition) beat the
flat XLA sort (~190M u64/s)?  Measures:
  - flat u32/u64 sort at 2^23
  - batched u32 sort at (B, m) for several shapes
  - random gather / scatter of 2^23 elements
Times by fetching a scalar (see bench.py methodology).
"""

import sys
import time

import numpy as np

import unikmer_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def timeit(name, f, *args, reps=3):
    jf = jax.jit(f)
    t0 = time.time()
    r = jf(*args)
    _ = np.asarray(r)[()] if r.ndim == 0 else np.asarray(r.ravel()[:1])
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(reps):
        t = time.time()
        r = jf(*args)
        _ = np.asarray(r)[()] if r.ndim == 0 else np.asarray(r.ravel()[:1])
        best = min(best, time.time() - t)
    print(f"{name:42s} {best*1e3:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return best


def main():
    import os, signal

    def on_alarm(s, f):
        print("WATCHDOG: wedged", file=sys.stderr)
        os._exit(1)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(1200)

    N = 1 << 23
    rng = np.random.default_rng(0)
    x32 = jax.device_put(rng.integers(0, 1 << 32, size=N, dtype=np.uint32))
    x64 = jax.device_put(rng.integers(0, 1 << 63, size=N, dtype=np.uint64))
    perm = jax.device_put(rng.permutation(N).astype(np.int32))
    _ = np.asarray(x32[:1])

    timeit("flat sort u32 2^23", lambda a: jax.lax.sort(a)[-1], x32)
    timeit("flat sort u64 2^23", lambda a: jax.lax.sort(a)[-1], x64)

    for B, m in [(256, 32768), (1024, 8192), (4096, 2048)]:
        timeit(
            f"batched sort u32 ({B},{m})",
            lambda a, B=B, m=m: jax.lax.sort(a.reshape(B, m), dimension=1)[-1, -1],
            x32,
        )
    timeit(
        "batched sort u64 (1024,8192)",
        lambda a: jax.lax.sort(a.reshape(1024, 8192), dimension=1)[-1, -1],
        x64,
    )

    timeit("gather u32 2^23 random", lambda a, p: a[p][-1], x32, perm)
    timeit("gather u64 2^23 random", lambda a, p: a[p][-1], x64, perm)
    timeit(
        "scatter u32 2^23 random",
        lambda a, p: jnp.zeros_like(a).at[p].set(a)[-1],
        x32,
        perm,
    )
    timeit(
        "scatter u64 2^23 random",
        lambda a, p: jnp.zeros_like(a).at[p].set(a)[-1],
        x64,
        perm,
    )
    # contiguous-ish gather: block-shuffled (each 512-run contiguous)
    blocks = rng.permutation(N // 512).astype(np.int32)
    bperm = jax.device_put((blocks[:, None] * 512 + np.arange(512, dtype=np.int32)).ravel())
    timeit("gather u64 2^23 block512-contig", lambda a, p: a[p][-1], x64, bperm)
    return 0


if __name__ == "__main__":
    sys.exit(main())
