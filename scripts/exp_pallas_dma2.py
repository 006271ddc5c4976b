"""Round 2 of the Pallas sort feasibility probes."""

import sys
import time

import numpy as np

import unikmer_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def watchdog(sec=1100):
    import os, signal

    def on_alarm(s, f):
        print("WATCHDOG fired", file=sys.stderr)
        os._exit(1)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(sec)


def timeit(name, jf, *args, reps=3):
    t0 = time.time()
    r = jf(*args)
    r0 = r[0] if isinstance(r, (tuple, list)) else r
    _ = np.asarray(r0.ravel()[:1])
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(reps):
        t = time.time()
        r = jf(*args)
        r0 = r[0] if isinstance(r, (tuple, list)) else r
        _ = np.asarray(r0.ravel()[:1])
        best = min(best, time.time() - t)
    print(f"{name:46s} {best*1e3:9.2f} ms (compile {compile_s:.1f}s)", flush=True)
    return best


N = 1 << 23
ROWS = N // 128
BLK = 1 << 19
BLK_ROWS = BLK // 128


def probe1_fixed():
    def kernel(hbm_in, hbm_out):
        def body(vmem, sem_in, sem_out):
            nblk = N // BLK

            def step(i, _):
                off = pl.multiple_of(i * BLK_ROWS, BLK_ROWS)
                cin = pltpu.make_async_copy(
                    hbm_in.at[pl.ds(off, BLK_ROWS), :], vmem, sem_in
                )
                cin.start()
                cin.wait()
                vmem[:] = vmem[:] + jnp.uint32(1)
                cout = pltpu.make_async_copy(
                    vmem, hbm_out.at[pl.ds(off, BLK_ROWS), :], sem_out
                )
                cout.start()
                cout.wait()
                return 0

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(nblk), step, 0)

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
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)

    x = jax.device_put(np.arange(N, dtype=np.uint32).reshape(ROWS, 128))
    _ = np.asarray(x[:1, :1])
    best = timeit("p1 DMA copy+inc 32MB fori_loop", run, x)
    out = np.asarray(run(x)[:4, :4])
    ok = np.array_equal(out, np.arange(N, dtype=np.uint32).reshape(ROWS, 128)[:4, :4] + 1)
    print(f"  correct={ok}  effective {2*N*4/best/1e9:.0f} GB/s", flush=True)


def cmpex_rows_kernel(nstages, R):
    # real bitonic-merge stage pattern on a (R,128) u32 block:
    # distances R/2, R/4, ..., repeated to reach nstages; via ref writes
    def kernel(in_ref, out_ref, scratch):
        scratch[:] = in_ref[:]
        done = 0
        d = R // 2
        while done < nstages:
            a = scratch[: 2 * d if 2 * d <= R else R]  # static
            # full-array pass at distance d (rows): pairs (base+i, base+i+d)
            x = scratch[:]
            grp = x.reshape(R // (2 * d), 2 * d, 128)
            top = grp[:, :d]
            bot = grp[:, d:]
            lo = jnp.minimum(top, bot)
            hi = jnp.maximum(top, bot)
            scratch[:] = jnp.concatenate([lo, hi], axis=1).reshape(R, 128)
            done += 1
            d = d // 2 if d > 1 else R // 2
        out_ref[:] = scratch[:]

    return kernel


def probe2_small(nstages, R=4096):
    @jax.jit
    def run(x):
        return pl.pallas_call(
            cmpex_rows_kernel(nstages, R),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((R, 128), jnp.uint32)],
        )(x)

    x = jax.device_put(
        np.random.default_rng(0).integers(0, 2**32, (R, 128), dtype=np.uint32)
    )
    _ = np.asarray(x[:1, :1])
    best = timeit(f"p2 {nstages} row-stages on (4096,128)", run, x)
    print(f"  {R*128*nstages/best/1e9:.0f} G cmpex/s", flush=True)


def probe4_roll():
    # lane-local compare-exchange via pltpu.roll along lanes
    R = 4096

    def kernel(in_ref, out_ref):
        a = in_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        for d in (64, 32, 16, 8, 4, 2, 1):
            b = pltpu.roll(a, shift=d, axis=1)  # partner value
            c = pltpu.roll(a, shift=128 - d, axis=1)
            partner = jnp.where((lane & d) == 0, c, b)
            is_low = (lane & d) == 0
            a = jnp.where(is_low, jnp.minimum(a, partner), jnp.maximum(a, partner))
        out_ref[:] = a

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.uint32),
        )(x)

    x = jax.device_put(
        np.random.default_rng(0).integers(0, 2**32, (R, 128), dtype=np.uint32)
    )
    _ = np.asarray(x[:1, :1])
    best = timeit("p4 7 lane-stages via roll (2MB)", run, x)
    print(f"  {R*128*7/best/1e9:.0f} G cmpex/s", flush=True)
    # correctness: after these 7 stages, a bitonic 128-seq per row would be
    # sorted; with random input it's not, so just check vs numpy emulation
    a = np.asarray(x)
    lane = np.arange(128)[None, :]
    for d in (64, 32, 16, 8, 4, 2, 1):
        b = np.roll(a, d, axis=1)
        c = np.roll(a, 128 - d, axis=1)
        partner = np.where((lane & d) == 0, c, b)
        a = np.where((lane & d) == 0, np.minimum(a, partner), np.maximum(a, partner))
    got = np.asarray(run(x))
    print(f"  correct={np.array_equal(got, a)}", flush=True)


def main():
    watchdog()
    for name, fn in [
        ("p1", probe1_fixed),
        ("p2x4", lambda: probe2_small(4)),
        ("p2x16", lambda: probe2_small(16)),
        ("p2x64", lambda: probe2_small(64)),
        ("p4", probe4_roll),
    ]:
        try:
            fn()
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:400]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
