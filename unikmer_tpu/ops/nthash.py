"""ntHash v1 rolling hash, reformulated for TPU as a log2(k) doubling scan.

Behavior contract (reference: will-rowe/nthash v0.4.0 — the Go port of
ntHash 1.0 — used via call sites unikmer/cmd/{count,grep,dump,encode}.go;
SURVEY.md §2.2): for a k-mer s[0..k-1]

  forward  NTF64(s,k) = XOR_{j<k} rol64(seed[s[j]],   k-1-j)
  reverse  NTR64(s,k) = XOR_{j<k} rol64(seed[rc(s[j])],    j)
  canonical NTC64     = min(NTF64, NTR64)

with seeds seedA/C/G/T below and seed 0 for any other byte; k <= 64.
Hashes are NOT invertible (view needs genomes to decode, view.go:175-185).

TPU-first design: the reference's per-position rolling recurrence
(hVal = rol(hVal,1) ^ rol(seed[out],k) ^ seed[in]) is inherently
sequential.  Both hash families are instead rotate-weighted XOR windows,
which compose associatively:

  F_{a+b}[i] = rol(F_a[i], b) ^ F_b[i+a]
  R_{a+b}[i] = R_a[i] ^ rol(R_b[i+a], a)

so all windows of width k are built in ~log2(k) full-array VPU passes,
exactly like the 2-bit codec's doubling composition (ops/codec.py).
"""

from __future__ import annotations

import numpy as np
# lazy: dump/grep/encode import this module for the numpy host twins;
# the ~2.3 s jax import must not happen until a device path traces
from .._lazy import jnp

SEED_A = np.uint64(0x3C8BFBB395C60474)
SEED_C = np.uint64(0x3193C18562A02B4C)
SEED_G = np.uint64(0x20323ED082572324)
SEED_T = np.uint64(0x295549F54BE24456)
SEED_N = np.uint64(0)

# Indexed by 2-bit base code (A,C,G,T); slot 4 = invalid/N -> 0.
_SEEDS_FWD = np.array([SEED_A, SEED_C, SEED_G, SEED_T, SEED_N], dtype=np.uint64)
# Complement seeds: rc(A)=T etc.; invalid complements to invalid.
_SEEDS_RC = np.array([SEED_T, SEED_G, SEED_C, SEED_A, SEED_N], dtype=np.uint64)

MAX_K = 64


def _rol(x, s: int):
    s &= 63
    if s == 0:
        return x
    return (x << jnp.uint64(s)) | (x >> jnp.uint64(64 - s))


def _shift_up(x: jnp.ndarray, s: int) -> jnp.ndarray:
    if s == 0:
        return x
    if s >= x.shape[0]:  # inputs shorter than the window width
        return jnp.zeros_like(x)
    return jnp.concatenate([x[s:], jnp.zeros((s,), dtype=x.dtype)])


def _base_seed_arrays(bases: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-position forward and reverse-complement seeds."""
    idx = jnp.minimum(jnp.asarray(bases), np.uint8(4)).astype(jnp.int32)
    return jnp.asarray(_SEEDS_FWD)[idx], jnp.asarray(_SEEDS_RC)[idx]


def nthash_windows(bases: jnp.ndarray, k: int, canonical: bool) -> jnp.ndarray:
    """ntHash of every window [i, i+k) of a base-code array.

    Returns uint64 array of the same length as ``bases``; positions beyond
    len-k (or windows containing invalid bases) must be masked by the
    caller via codec.window_valid.  Invalid bases hash with seed 0, which
    matches the reference port's seedTab (all non-ACGT bytes -> seedN=0).
    """
    if not 0 < k <= MAX_K:
        raise ValueError(f"k must be in [1,{MAX_K}], got {k}")
    fwd_seed, rc_seed = _base_seed_arrays(bases)

    # width-1 windows
    f_pow, r_pow = fwd_seed, rc_seed
    pow_w = 1
    f_acc = r_acc = None
    acc_w = 0
    for b in range(7):
        if (k >> b) & 1:
            if f_acc is None:
                f_acc, r_acc, acc_w = f_pow, r_pow, pow_w
            else:
                # new window: pow block (front, width pow_w) ++ acc (back, width acc_w)
                f_acc = _rol(f_pow, acc_w) ^ _shift_up(f_acc, pow_w)
                r_acc = r_pow ^ _rol(_shift_up(r_acc, pow_w), pow_w)
                acc_w += pow_w
        if (k >> (b + 1)) != 0:
            f_pow = _rol(f_pow, pow_w) ^ _shift_up(f_pow, pow_w)
            r_pow = r_pow ^ _rol(_shift_up(r_pow, pow_w), pow_w)
            pow_w *= 2
    if canonical:
        return jnp.minimum(f_acc, r_acc)
    return f_acc


def _rol_np(x: np.ndarray, s: int) -> np.ndarray:
    s &= 63
    if s == 0:
        return x
    return (x << np.uint64(s)) | (x >> np.uint64(64 - s))


def _shift_up_np(x: np.ndarray, s: int) -> np.ndarray:
    if s == 0:
        return x
    out = np.zeros_like(x)
    out[:-s] = x[s:]
    return out


def nthash_windows_np(bases: np.ndarray, k: int, canonical: bool) -> np.ndarray:
    """Numpy twin of nthash_windows for host-side bulk paths (e.g. the
    dump command's -H re-hash), same doubling composition, bit-exact."""
    if not 0 < k <= MAX_K:
        raise ValueError(f"k must be in [1,{MAX_K}], got {k}")
    idx = np.minimum(np.asarray(bases), np.uint8(4)).astype(np.int32)
    f_pow = _SEEDS_FWD[idx]
    r_pow = _SEEDS_RC[idx]
    pow_w = 1
    f_acc = r_acc = None
    acc_w = 0
    for b in range(7):
        if (k >> b) & 1:
            if f_acc is None:
                f_acc, r_acc, acc_w = f_pow, r_pow, pow_w
            else:
                f_acc = _rol_np(f_pow, acc_w) ^ _shift_up_np(f_acc, pow_w)
                r_acc = r_pow ^ _rol_np(_shift_up_np(r_acc, pow_w), pow_w)
                acc_w += pow_w
        if (k >> (b + 1)) != 0:
            f_pow = _rol_np(f_pow, pow_w) ^ _shift_up_np(f_pow, pow_w)
            r_pow = r_pow ^ _rol_np(_shift_up_np(r_pow, pow_w), pow_w)
            pow_w *= 2
    if canonical:
        return np.minimum(f_acc, r_acc)
    return f_acc


def nthash_rows_np(rows: np.ndarray, canonical: bool) -> np.ndarray:
    """ntHash of each row of an (n, k) 2-bit base matrix (host-side)."""
    n, k = rows.shape
    flat = np.full((n, k + 1), 4, np.uint8)
    flat[:, :k] = rows
    hashes = nthash_windows_np(flat.reshape(-1), k, canonical)
    return hashes[:: k + 1][:n].copy()


def nthash_kmer(kmer: bytes | str, canonical: bool = False) -> int:
    """Host-side single k-mer ntHash (encode/dump commands)."""
    from .codec import BASE_LUT

    if isinstance(kmer, str):
        kmer = kmer.encode()
    k = len(kmer)
    b = np.minimum(BASE_LUT[np.frombuffer(kmer, dtype=np.uint8)], 4)
    f = np.uint64(0)
    r = np.uint64(0)
    for j in range(k):
        rot_f = int(k - 1 - j)
        rot_r = int(j)
        f ^= np.uint64(_rol_int(int(_SEEDS_FWD[b[j]]), rot_f))
        r ^= np.uint64(_rol_int(int(_SEEDS_RC[b[j]]), rot_r))
    if canonical:
        return int(min(f, r))
    return int(f)


def _rol_int(x: int, s: int) -> int:
    s &= 63
    return ((x << s) | (x >> (64 - s))) & 0xFFFFFFFFFFFFFFFF


def scaled_max_hash(scale: int) -> int:
    """maxHash = uint64(float64(MaxUint64) / float64(scale)).

    Matches Go's float math exactly (unikmer/cmd/count.go:98): the
    division is done in float64 and truncated toward zero.
    """
    if scale <= 1:
        return (1 << 64) - 1
    f = np.float64(np.float64(18446744073709551615) / np.float64(scale))
    v = int(f)
    return min(v, (1 << 64) - 1)
