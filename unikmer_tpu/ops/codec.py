"""Vectorized 2-bit k-mer codec (TPU-first, batched over whole sequences).

Behavior contract (reference: shenwei356/kmers v0.1.0, via call sites
unikmer/cmd/{encode,decode,view,filter}.go — see SURVEY.md §2.2):

  * bases A=0, C=1, G=2, T=3 (U==T), case-insensitive; any other byte is
    invalid and breaks every k-mer window covering it.
  * a k-mer's code packs its first base into the highest-order 2-bit group
    (MSB-first), so sorting codes sorts k-mers lexicographically and
    ``code & 3`` is the LAST base (reference reads codes back-to-front in
    unikmer/cmd/filter.go:185-198).
  * canonical(code) = min(code, revcomp(code)).
  * MaxCode[k] = 4**k - 1; k <= 32.

Design notes (TPU): instead of the reference's per-position rolling
iterator (a sequential Go loop), the whole sequence is encoded at once:
a log2(k)-step doubling composition builds all sliding-window codes with
~2*log2(k) full-length vector shift/or ops on the VPU, and validity is a
cumulative-sum range query.  All ops are uint64 (XLA lowers to u32 pairs
on TPU); Pallas kernels with explicit u32 pairs live in ops/pallas/.
"""

from __future__ import annotations

import numpy as np

# lazy: host-only CLI paths import this module for the numpy twins and
# tables; the ~2.3 s jax import must not happen until a device path runs
from .._lazy import jnp

# Invalid-base sentinel in base-code space (valid codes are 0..3).
INVALID_BASE = np.uint8(255)
# Distinct invalid value marking RECORD boundaries in packed base
# buffers (io/fastx.pack_records): every >=4 value is invalid to the
# window kernels, but segment-aware sketches (the compat syncmer's
# per-record truncation + fill semantics, ops/sketch) must distinguish
# "separator between records" from "interior N within a record".
RECORD_SEP = np.uint8(254)
# Sentinel code for masked-out slots in uint64 code space: all ones.
# Real codes are < 4^k <= 2^64, and hashes may be any uint64, so the
# sentinel is only used together with an explicit count/mask.
CODE_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)

MAX_K_ENCODED = 32
MAX_K_HASHED = 64


def max_code(k: int) -> int:
    """MaxCode[k] = 4^k - 1 (reference: kmers.MaxCode, cmd/decode.go:99-106)."""
    if not 0 < k <= MAX_K_ENCODED:
        raise ValueError(f"k must be in [1,{MAX_K_ENCODED}], got {k}")
    return (1 << (2 * k)) - 1


def _build_base_lut() -> np.ndarray:
    lut = np.full(256, INVALID_BASE, dtype=np.uint8)
    for chars, code in (("Aa", 0), ("Cc", 1), ("Gg", 2), ("TtUu", 3)):
        for ch in chars:
            lut[ord(ch)] = code
    # '\n' is pack_records' record-separator join byte (it can never
    # occur inside a sequence line): map it to the distinct RECORD_SEP
    # so packed buffers carry record boundaries (still invalid >= 4)
    lut[ord("\n")] = RECORD_SEP
    return lut


# ASCII byte -> 2-bit base code (255 = invalid).
BASE_LUT = _build_base_lut()
# 2-bit base code -> ASCII (upper case), for decoding.
BASE_CHARS = np.frombuffer(b"ACGT", dtype=np.uint8)


def seq_to_bases(seq_ascii) -> jnp.ndarray:
    """Map ASCII sequence bytes to 2-bit base codes (uint8; 255=invalid)."""
    seq_ascii = jnp.asarray(seq_ascii, dtype=jnp.uint8)
    return jnp.asarray(BASE_LUT)[seq_ascii]


def _shift_up(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """y[i] = x[i+s], zero-padded at the tail (static shapes)."""
    if s == 0:
        return x
    if s >= x.shape[0]:  # inputs shorter than the window width
        return jnp.zeros_like(x)
    return jnp.concatenate([x[s:], jnp.zeros((s,), dtype=x.dtype)])


def kmer_codes(bases: jnp.ndarray, k: int) -> jnp.ndarray:
    """All sliding-window k-mer codes of a base-code array.

    ``bases`` is uint8 base codes (invalid bases may hold any value >= 4;
    they corrupt only windows that ``window_valid`` masks out, because the
    2-bit contribution of any byte is taken mod 4).

    Returns uint64 array of length ``len(bases)`` where slot i holds the
    code of window [i, i+k); slots beyond len-k are garbage (mask them).
    """
    if not 0 < k <= MAX_K_ENCODED:
        raise ValueError(f"k must be in [1,{MAX_K_ENCODED}], got {k}")
    x = (jnp.asarray(bases).astype(jnp.uint64)) & jnp.uint64(3)
    # powers[b] = codes of windows of width 2^b
    acc = None
    acc_w = 0
    pow_codes = x
    pow_w = 1
    for b in range(6):
        if (k >> b) & 1:
            if acc is None:
                acc, acc_w = pow_codes, pow_w
            else:
                # new window = pow_codes window (front) ++ acc window (back)
                acc = (pow_codes << jnp.uint64(2 * acc_w)) | _shift_up(acc, pow_w)
                acc_w += pow_w
        if (k >> (b + 1)) != 0:
            pow_codes = (pow_codes << jnp.uint64(2 * pow_w)) | _shift_up(
                pow_codes, pow_w
            )
            pow_w *= 2
    return acc


def window_valid(bases: jnp.ndarray, k: int) -> jnp.ndarray:
    """Boolean mask: window [i, i+k) contains only valid bases and fits.

    Same length as ``bases``; positions > len-k are False.
    """
    bases = jnp.asarray(bases)
    n = bases.shape[0]
    bad = (bases >= 4).astype(jnp.int32)
    prefix = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(bad)])
    # windows fully inside: i in [0, n-k]
    ok_in = (prefix[k:] - prefix[:-k]) == 0  # length n-k+1
    if k == 1:
        return ok_in if n >= 1 else jnp.zeros((n,), bool)
    # pad so the mask always has length n (all-False when n < k)
    pad = jnp.zeros((min(k - 1, n),), dtype=bool)
    return jnp.concatenate([ok_in, pad])


_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M16 = np.uint64(0x0000FFFF0000FFFF)


def revcomp_code(code: jnp.ndarray, k: int):
    """Reverse complement of 2-bit packed code(s) (vectorized bit tricks)."""
    c = ~jnp.asarray(code, dtype=jnp.uint64)
    c = ((c >> jnp.uint64(2)) & _M2) | ((c & _M2) << jnp.uint64(2))
    c = ((c >> jnp.uint64(4)) & _M4) | ((c & _M4) << jnp.uint64(4))
    c = ((c >> jnp.uint64(8)) & _M8) | ((c & _M8) << jnp.uint64(8))
    c = ((c >> jnp.uint64(16)) & _M16) | ((c & _M16) << jnp.uint64(16))
    c = (c >> jnp.uint64(32)) | (c << jnp.uint64(32))
    return c >> jnp.uint64(64 - 2 * k)


def canonical_code(code, k: int):
    """min(code, revcomp(code)) elementwise."""
    code = jnp.asarray(code, dtype=jnp.uint64)
    return jnp.minimum(code, revcomp_code(code, k))


# ---------------------------------------------------------------------------
# Host-side (numpy) helpers for text interop: encode/decode of explicit
# k-mer strings.  These serve the encode/decode/view/dump commands; the
# device path above never materializes strings.
# ---------------------------------------------------------------------------


def encode_kmer(kmer: bytes | str) -> int:
    """Encode one k-mer string to its code. Raises on invalid base."""
    if isinstance(kmer, str):
        kmer = kmer.encode()
    b = BASE_LUT[np.frombuffer(kmer, dtype=np.uint8)]
    if (b >= 4).any():
        bad = kmer[int(np.argmax(b >= 4))]
        raise ValueError(f"invalid DNA base {chr(bad)!r} in k-mer {kmer!r}")
    if len(kmer) > MAX_K_ENCODED:
        raise ValueError(f"k-mer longer than {MAX_K_ENCODED}: {len(kmer)}")
    code = 0
    for v in b:
        code = (code << 2) | int(v)
    return code


def decode_codes(codes: np.ndarray, k: int) -> np.ndarray:
    """Decode uint64 codes to an (n, k) array of ASCII bytes.

    Works on the little-endian byte view with uint8 column ops only —
    no (n, k) uint64 broadcast temp (8x smaller working set, which
    matters at 10^7 rows)."""
    codes = np.ascontiguousarray(codes, dtype=np.uint64).reshape(-1)
    byte_view = codes.view(np.uint8).reshape(-1, 8)  # little-endian
    n = len(codes)
    out = np.empty((n, k), np.uint8)
    for j in range(k):
        bit = 2 * (k - 1 - j)
        out[:, j] = (byte_view[:, bit >> 3] >> (bit & 7)) & 3
    return BASE_CHARS[out]


def decode_kmer(code: int, k: int) -> str:
    """Decode a single code to its k-mer string."""
    if code > max_code(k):
        raise ValueError(f"code {code} overflows k={k} (max {max_code(k)})")
    return decode_codes(np.array([code], dtype=np.uint64), k)[0].tobytes().decode()


def bits_string(code: int, k: int) -> str:
    """Bit representation grouped per base (reference: encode -a)."""
    s = format(code, f"0{2 * k}b")
    return " ".join(s[i : i + 2] for i in range(0, len(s), 2))


def revcomp_np(codes: np.ndarray, k: int) -> np.ndarray:
    """Numpy twin of revcomp_code for host-side paths."""
    c = ~np.asarray(codes, dtype=np.uint64)
    c = ((c >> np.uint64(2)) & _M2) | ((c & _M2) << np.uint64(2))
    c = ((c >> np.uint64(4)) & _M4) | ((c & _M4) << np.uint64(4))
    c = ((c >> np.uint64(8)) & _M8) | ((c & _M8) << np.uint64(8))
    c = ((c >> np.uint64(16)) & _M16) | ((c & _M16) << np.uint64(16))
    c = (c >> np.uint64(32)) | (c << np.uint64(32))
    return c >> np.uint64(64 - 2 * k)


def canonical_np(codes: np.ndarray, k: int) -> np.ndarray:
    codes = np.asarray(codes, dtype=np.uint64)
    return np.minimum(codes, revcomp_np(codes, k))
