"""Parallel gzip writer (reference: klauspost/pgzip via
unikmer/cmd/util-io.go:31,59,90).

Chunks are compressed concurrently (zlib releases the GIL) and written
in order as independent gzip MEMBERS — concatenated members are valid
gzip per RFC 1952, and every gzip reader (including Python's) handles
them transparently.  Reads of our own multi-member files could be
parallelized the same way later.
"""

from __future__ import annotations

import gzip
import io
from concurrent.futures import ThreadPoolExecutor

DEFAULT_CHUNK = 1 << 20


def _compress_member(data: bytes, level: int) -> bytes:
    return gzip.compress(data, compresslevel=level)


class ParallelGzipWriter(io.RawIOBase):
    """File-like write-only object producing multi-member gzip output."""

    def __init__(self, fileobj, compresslevel: int = 5, threads: int = 4,
                 chunk_size: int = DEFAULT_CHUNK):
        self._f = fileobj
        self._level = compresslevel
        self._chunk = chunk_size
        self._pool = ThreadPoolExecutor(max_workers=max(threads, 1))
        self._pending = []  # ordered futures
        self._buf = bytearray()
        self._closed = False

    def writable(self) -> bool:
        return True

    def write(self, data) -> int:
        self._buf += data
        while len(self._buf) >= self._chunk:
            chunk = bytes(self._buf[: self._chunk])
            del self._buf[: self._chunk]
            self._submit(chunk)
        return len(data)

    def _submit(self, chunk: bytes) -> None:
        self._pending.append(self._pool.submit(_compress_member, chunk, self._level))
        # bound memory: drain finished prefix when deep
        while len(self._pending) > 4 * self._pool._max_workers:
            self._f.write(self._pending.pop(0).result())

    def flush(self) -> None:
        if self._buf:
            self._submit(bytes(self._buf))
            self._buf = bytearray()
        while self._pending:
            self._f.write(self._pending.pop(0).result())
        self._f.flush()

    def close(self) -> None:
        if self._closed:
            return
        self.flush()
        self._pool.shutdown()
        self._closed = True
        super().close()
