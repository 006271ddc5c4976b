"""Byte/element size parsing (reference unikmer/cmd/util.go:291-336
ParseByteSize: suffixes B/K/M/G with optional trailing 'b', case
insensitive, bare numbers allowed)."""

from __future__ import annotations

_UNITS = {"": 1, "B": 1, "K": 1 << 10, "M": 1 << 20, "G": 1 << 30, "T": 1 << 40}


def parse_byte_size(s: str) -> int:
    t = s.strip().upper()
    if t.endswith("B") and len(t) > 1 and t[-2] in "KMGT":
        t = t[:-1]
    unit = 1
    if t and t[-1] in _UNITS and not t[-1].isdigit():
        unit = _UNITS[t[-1]]
        t = t[:-1]
    if not t:
        raise ValueError(f"invalid size: {s!r}")
    try:
        val = float(t)
    except ValueError as e:
        raise ValueError(f"invalid size: {s!r}") from e
    return int(val * unit)


def humanize(n: int) -> str:
    """1234567 -> '1,234,567' (reference uses dustin/go-humanize)."""
    return f"{n:,}"
