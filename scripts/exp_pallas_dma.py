"""Feasibility probe for a Pallas VMEM-blocked sort on this axon build.

Tests, in order (each can fail independently):
  1. grid-free kernel with HBM in/out refs + run_scoped VMEM scratch +
     make_async_copy + fori_loop  -> measures HBM<->VMEM DMA bandwidth
  2. in-VMEM row-distance compare-exchange throughput (bitonic stage)
  3. lane-local stage via 128x128 transpose inside the kernel
"""

import sys
import time

import numpy as np

import unikmer_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def watchdog(sec=900):
    import os, signal

    def on_alarm(s, f):
        print("WATCHDOG fired", file=sys.stderr)
        os._exit(1)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(sec)


def timeit(name, jf, *args, reps=3):
    t0 = time.time()
    r = jf(*args)
    _ = np.asarray(r.ravel()[:1])
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(reps):
        t = time.time()
        r = jf(*args)
        _ = np.asarray(r.ravel()[:1])
        best = min(best, time.time() - t)
    print(f"{name:44s} {best*1e3:9.2f} ms (compile {compile_s:.1f}s)", flush=True)
    return best


N = 1 << 23          # u32 elements, 32 MB
ROWS = N // 128      # (65536, 128)
BLK = 1 << 19        # elements per VMEM chunk (2 MB)
BLK_ROWS = BLK // 128


def probe1():
    def kernel(hbm_in, hbm_out):
        def body(vmem, sem_in, sem_out):
            nblk = N // BLK

            def step(i, _):
                cin = pltpu.make_async_copy(
                    hbm_in.at[pl.ds(i * BLK_ROWS, BLK_ROWS), :], vmem, sem_in
                )
                cin.start()
                cin.wait()
                vmem[:] = vmem[:] + jnp.uint32(1)
                cout = pltpu.make_async_copy(
                    vmem, hbm_out.at[pl.ds(i * BLK_ROWS, BLK_ROWS), :], sem_out
                )
                cout.start()
                cout.wait()
                return 0

            jax.lax.fori_loop(0, nblk, step, 0)

        pl.run_scoped(
            body,
            vmem=pltpu.VMEM((BLK_ROWS, 128), jnp.uint32),
            sem_in=pltpu.SemaphoreType.DMA,
            sem_out=pltpu.SemaphoreType.DMA,
        )

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)

    x = jax.device_put(np.arange(N, dtype=np.uint32).reshape(ROWS, 128))
    _ = np.asarray(x[:1, :1])
    best = timeit("probe1 DMA copy+inc 32MB", run, x)
    out = np.asarray(run(x)[:4, :4])
    ok = np.array_equal(out, np.arange(N, dtype=np.uint32).reshape(ROWS, 128)[:4, :4] + 1)
    gb = 2 * N * 4 / best / 1e9
    print(f"  correct={ok}  effective {gb:.0f} GB/s (r+w)", flush=True)


def probe2():
    # VMEM-resident bitonic-style stage throughput: row-distance
    # compare-exchange on a (4096, 128) u32 block, 64 stages back to back.
    R = 4096

    def kernel(in_ref, out_ref):
        a = in_ref[:]
        for _ in range(64):
            top = a[: R // 2]
            bot = a[R // 2 :]
            lo = jnp.minimum(top, bot)
            hi = jnp.maximum(top, bot)
            a = jnp.concatenate([lo, hi], axis=0)
        out_ref[:] = a

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.uint32),
        )(x)

    x = jax.device_put(np.random.default_rng(0).integers(0, 2**32, (R, 128), dtype=np.uint32))
    _ = np.asarray(x[:1, :1])
    best = timeit("probe2 64 row cmpex stages on 2MB", run, x)
    ops = R * 128 * 64
    print(f"  {ops/best/1e9:.0f} G cmpex/s", flush=True)


def probe3():
    # transpose of (128,128) tiles inside the kernel
    def kernel(in_ref, out_ref):
        a = in_ref[:].reshape(32, 128, 128)
        out_ref[:] = jnp.swapaxes(a, 1, 2).reshape(32 * 128, 128)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((32 * 128, 128), jnp.uint32),
        )(x)

    x = jax.device_put(np.random.default_rng(0).integers(0, 2**32, (4096, 128), dtype=np.uint32))
    _ = np.asarray(x[:1, :1])
    timeit("probe3 32x transpose128 (2MB)", run, x)
    got = np.asarray(run(x))
    want = np.swapaxes(np.asarray(x).reshape(32, 128, 128), 1, 2).reshape(4096, 128)
    print(f"  correct={np.array_equal(got, want)}", flush=True)


def main():
    watchdog()
    for name, fn in [("probe1", probe1), ("probe2", probe2), ("probe3", probe3)]:
        try:
            fn()
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
