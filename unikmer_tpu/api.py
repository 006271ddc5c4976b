"""Device-resident k-mer set API: chain set algebra without host round-trips.

The CLI mirrors the reference's one-process-per-command model, where
every operation reads `.unik` files and writes one back (SURVEY.md §2.1).
A TPU-native framework can do better for programmatic use: `KmerSet`
keeps each set as a sorted, sentinel-padded uint64 array in HBM
(ops/device_sets.py), so a whole pipeline of unions/intersections/
subtractions runs as chained XLA programs with only 8-byte count
fetches in between.  Host materialization happens only at `.to_numpy()`
/ `.save()` boundaries.

Example::

    import unikmer_tpu as ut
    a = ut.KmerSet.from_fasta("a.fa.gz", k=23, canonical=True)
    b = ut.KmerSet.from_fasta("b.fa.gz", k=23, canonical=True)
    (a | b).save("union.unik")
    hits = (a & b).contains(query_codes)

Capacities are padded to the compile-friendly bucket quantum
(models/count._pad_quantum) so every shape hits the persistent compile
cache; `compact()` re-buckets after chains of unions.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .ops import device_sets
from .ops.codec import CODE_SENTINEL
from .ops.sort import collapse_sorted, sort_code_bits
from .models.count import (
    CountConfig, _fetch_scalar_watchdog, _padded_len, _stream_chunk_bases,
    count_step_ingress, count_stream_packed, pad_bases, split_packed,
)


def _max_device_elems() -> int:
    """Largest single-program element count validated on this backend
    (2^25; 2^26 hangs — docs/BENCH_NOTES.md).  Unlimited on CPU."""
    import os

    env = os.environ.get("UNIKMER_TPU_MAX_ELEMS")
    if env:
        return int(env)
    return (1 << 25) if jax.default_backend() == "tpu" else (1 << 62)

_SENT = np.uint64(CODE_SENTINEL)


def _pad_codes_device(codes: np.ndarray, cap: int) -> jnp.ndarray:
    out = np.full(cap, _SENT, dtype=np.uint64)
    out[: len(codes)] = codes
    return jax.device_put(out)


class KmerSet:
    """A sorted, deduplicated k-mer set resident in device memory.

    Attributes mirror the `.unik` header surface: ``k``, ``canonical``,
    ``hashed``, ``scale``; an optional uint32 taxid column rides along
    and is LCA-merged on union when a taxonomy is attached.
    """

    def __init__(self, codes, n, k, *, canonical=False, hashed=False,
                 scale=1, taxids=None, taxdb=None):
        self._codes = codes  # device u64, capacity padded with sentinel
        self._n = int(n)
        self.k = int(k)
        self.canonical = bool(canonical)
        self.hashed = bool(hashed)
        self.scale = int(scale)
        self._taxids = taxids  # device u32 (0 on padding) or None
        self._taxdb = taxdb

    # ------------------------------------------------------------ build
    @classmethod
    def from_codes(cls, codes, k, *, canonical=False, hashed=False, scale=1,
                   taxids=None, taxdb=None, assume_sorted_unique=False):
        """Build from a host/device uint64 array (sorted+deduped on device
        unless ``assume_sorted_unique``)."""
        codes = np.asarray(codes, dtype=np.uint64)
        if len(codes) and codes.max() == _SENT:
            # the all-ones value pads capacity in the device layout and
            # cannot be represented as a member (2^-64 chance for hashed
            # sets; impossible for 2-bit codes).  Fail loudly instead of
            # silently dropping it — the CLI pipelines (ops/sort) do the
            # exact sentinel accounting where it matters.
            raise ValueError(
                "KmerSet cannot hold the reserved all-ones code "
                "(0xFFFFFFFFFFFFFFFF); use the CLI/ops pipelines for "
                "exact sentinel accounting"
            )
        if taxids is not None:
            taxids = np.asarray(taxids, dtype=np.uint32)
            if len(taxids) != len(codes):
                raise ValueError("taxids length must match codes")
            if not assume_sorted_unique:
                if taxdb is None:
                    raise ValueError(
                        "deduplicating taxid-carrying codes needs taxdb for LCA"
                    )
                codes, taxids = taxdb.lca_reduce(codes, taxids)
                assume_sorted_unique = True
        cap = _padded_len(max(len(codes), 1))
        if cap > _max_device_elems():
            # a device buffer this large would make every later op on
            # the set (contains' searchsorted, algebra concats) a
            # program past the validated 2^25 cap — the exact hang
            # class the host fallbacks exist to avoid.  Keep the set
            # host-resident: binary ops already route to the host
            # engine (capacity sums exceed the cap) and contains()
            # runs numpy searchsorted.
            if not assume_sorted_unique:
                codes = np.unique(codes)  # taxid case lca_reduced above
            return cls(codes, len(codes), k, canonical=canonical,
                       hashed=hashed, scale=scale, taxids=taxids,
                       taxdb=taxdb)
        dev = _pad_codes_device(codes, cap)
        if not assume_sorted_unique:
            valid = jnp.arange(cap) < len(codes)
            dev, n = collapse_sorted(dev, valid, mode="distinct",
                                     code_bits=sort_code_bits(k, hashed))
            n = int(n)
        else:
            n = len(codes)
        dev_tax = None
        if taxids is not None:
            t = np.zeros(cap, np.uint32)
            t[: len(taxids)] = taxids
            dev_tax = jax.device_put(t)
        return cls(dev, n, k, canonical=canonical, hashed=hashed,
                   scale=scale, taxids=dev_tax, taxdb=taxdb)

    @classmethod
    def from_fasta(cls, paths, k, *, canonical=False, hashed=False, scale=1,
                   minimizer_w=0, syncmer_s=0, circular=False,
                   mode="distinct", taxdb=None, mesh=None):
        """Count k-mers of FASTA/Q file(s) directly into a device set.

        The result never leaves the device: only the 8-byte count is
        fetched (count pipeline: models/count.count_step).  ``mesh=N``
        routes the build through the N-device sharded engine
        (parallel/sharded.mesh_count_stream — the CLI's count --mesh).
        """
        from .io.fastx import pack_files

        if isinstance(paths, (str, bytes)):
            paths = [paths]
        cfg = CountConfig(k=k, canonical=canonical, hashed=hashed,
                          scale=scale, minimizer_w=minimizer_w,
                          syncmer_s=syncmer_s, circular=circular, mode=mode)
        if mesh is not None and int(mesh) >= 2:
            from .io.fastx import read_fastx
            from .models.count import SpilledCount
            from .parallel.sharded import mesh_count_stream

            def records():
                for p in paths:
                    yield from read_fastx(p)

            codes = mesh_count_stream(records(), cfg, int(mesh))
            if isinstance(codes, SpilledCount):
                parts: list = []
                codes.write_to(parts.append)
                codes = (np.concatenate(parts) if parts
                         else np.zeros(0, np.uint64))
            return cls.from_codes(codes, k, canonical=cfg.canonical,
                                  hashed=cfg.hashed, scale=scale,
                                  taxdb=taxdb, assume_sorted_unique=True)
        packed = pack_files(paths, cfg.k, circular)
        if packed.bases.size == 0:
            return cls.from_codes(np.zeros(0, np.uint64), k,
                                  canonical=cfg.canonical, hashed=cfg.hashed,
                                  scale=scale, taxdb=taxdb)
        chunk = _stream_chunk_bases()
        if len(packed.bases) > chunk + cfg.k and cfg.mode == "distinct":
            # bound every device program to the validated bucket size
            # (2^26+ hangs this backend, docs/BENCH_NOTES.md): per-piece
            # device sets, merged by the one-pass device union
            from collections import deque

            from .models.count import _pipeline_depth

            pieces = []
            pending: deque = deque()
            depth = _pipeline_depth()

            def drain(limit: int):
                while len(pending) > limit:
                    out, n = pending.popleft()
                    pieces.append(cls(out, _fetch_scalar_watchdog(n), k,
                                      canonical=cfg.canonical,
                                      hashed=cfg.hashed, scale=scale,
                                      taxdb=taxdb).compact())

            for piece in split_packed(
                packed, chunk, cfg.k if cfg.segmentable else 0
            ):
                pending.append(
                    count_step_ingress(pad_bases(piece.bases), cfg))
                drain(depth)
            drain(0)
            # union_all host-falls-back (parallel native sorted-union
            # tree) when the concat would exceed the validated program
            # size; the result stays host-resident past the cap
            return cls.union_all(pieces)
        if len(packed.bases) > chunk + cfg.k:
            # unique/repeated need cross-chunk multiplicities: exact
            # capped-multiplicity host merge, then re-upload
            codes = count_stream_packed([packed], cfg)
            from .models.count import SpilledCount

            if isinstance(codes, SpilledCount):
                # beyond-RAM spill engaged: materialize the merged
                # result (a KmerSet is device-resident by definition —
                # peak RSS here equals the pre-spill behavior)
                parts: list = []
                codes.write_to(parts.append)
                codes = (np.concatenate(parts) if parts
                         else np.zeros(0, np.uint64))
            return cls.from_codes(codes, k, canonical=cfg.canonical,
                                  hashed=cfg.hashed, scale=scale,
                                  taxdb=taxdb, assume_sorted_unique=True)
        out, n = count_step_ingress(pad_bases(packed.bases), cfg)
        s = cls(out, _fetch_scalar_watchdog(n), k, canonical=cfg.canonical,
                hashed=cfg.hashed, scale=scale, taxdb=taxdb)
        return s.compact()

    @classmethod
    def from_unik(cls, path, taxdb=None):
        """Load a `.unik` file into device memory."""
        from .io.unik import UnikReader

        with UnikReader(path) as r:
            codes, taxids = r.read_all()
            h = r.header
            if h.has_global_taxid and taxids is None:
                taxids = np.full(len(codes), h.global_taxid, np.uint32)
            # the SORTED flag does not imply distinct (sort without -u,
            # dump -s, concat -s keep duplicates): verify strictly
            # increasing before trusting the sorted-unique fast path
            sorted_unique = bool(h.is_sorted) and bool(
                np.all(codes[1:] > codes[:-1])
            )
            return cls.from_codes(
                codes, h.k, canonical=h.is_canonical, hashed=h.is_hashed,
                scale=h.scale if h.is_scaled else 1, taxids=taxids,
                taxdb=taxdb, assume_sorted_unique=sorted_unique,
            )

    # ------------------------------------------------------- properties
    def __len__(self) -> int:
        return self._n

    @property
    def has_taxids(self) -> bool:
        return self._taxids is not None

    @property
    def capacity(self) -> int:
        return int(self._codes.shape[0])

    def _check_compatible(self, other: "KmerSet"):
        """The reference enforces equal k/canonical/hashed/scaled across
        inputs (unikmer/cmd/util-binary-file.go:31-44)."""
        if not isinstance(other, KmerSet):
            raise TypeError(f"expected KmerSet, got {type(other).__name__}")
        for attr in ("k", "canonical", "hashed", "scale"):
            if getattr(self, attr) != getattr(other, attr):
                raise ValueError(
                    f"incompatible sets: {attr} differs "
                    f"({getattr(self, attr)} vs {getattr(other, attr)})"
                )

    def _flags_kw(self):
        return dict(canonical=self.canonical, hashed=self.hashed,
                    scale=self.scale)

    # -------------------------------------------------------- set algebra
    def _np_taxids(self):
        return self.taxids_to_numpy() if self.has_taxids else None

    def _from_host(self, codes, taxids, taxdb=None) -> "KmerSet":
        return KmerSet.from_codes(
            codes, self.k, taxids=taxids, taxdb=taxdb or self._taxdb,
            assume_sorted_unique=True, **self._flags_kw(),
        )

    def _host_union(self, other: "KmerSet") -> "KmerSet":
        from .ops import sets as host_sets

        if self.has_taxids and other.has_taxids:
            taxdb = self._taxdb or other._taxdb
            if taxdb is None:
                raise ValueError("taxid-carrying union needs an attached taxdb")
            c, t = host_sets.union(
                [self.to_numpy(), other.to_numpy()],
                [self._np_taxids(), other._np_taxids()], taxdb,
            )
            return self._from_host(c, t, taxdb)
        c, _ = host_sets.union([self.to_numpy(), other.to_numpy()])
        return self._from_host(c, None)

    def _host_intersect(self, other: "KmerSet") -> "KmerSet":
        from .ops import sets as host_sets

        taxdb = self._taxdb or other._taxdb
        if self.has_taxids and other.has_taxids:
            if taxdb is None:
                raise ValueError(
                    "taxid-carrying intersection needs an attached taxdb"
                )
            c, t = host_sets.intersect(
                [self.to_numpy(), other.to_numpy()],
                [self._np_taxids(), other._np_taxids()], taxdb,
            )
            return self._from_host(c, t, taxdb)
        if self.has_taxids or other.has_taxids:
            # taxid-present side first: its values pass through on match
            wt = self if self.has_taxids else other
            wo = other if self.has_taxids else self
            c, t = host_sets.intersect(
                [wt.to_numpy(), wo.to_numpy()], [wt._np_taxids(), None],
                taxdb,
            )
            return self._from_host(c, t, taxdb)
        c, _ = host_sets.intersect([self.to_numpy(), other.to_numpy()])
        return self._from_host(c, None)

    def _host_subtract(self, other: "KmerSet") -> "KmerSet":
        from .ops import sets as host_sets

        c, t = host_sets.subtract(
            self.to_numpy(), self._np_taxids(), [other.to_numpy()],
        )
        return self._from_host(c, t)

    def union(self, other: "KmerSet") -> "KmerSet":
        """Union; colliding codes LCA-merge taxids when both sides carry
        them (union.go:195-202).  When only ONE side does, its taxids
        pass through (missing side = taxid 0, the no-taxid identity) —
        same one-sided semantics as intersect."""
        self._check_compatible(other)
        if self.has_taxids != other.has_taxids:
            from .ops import sets as host_sets

            with_t, plain = (self, other) if self.has_taxids else (other, self)
            c, t = host_sets.union(
                [with_t.to_numpy(), plain.to_numpy()],
                [with_t._np_taxids(),
                 np.zeros(len(plain), np.uint32)],
                self._taxdb or other._taxdb,
            )
            return self._from_host(c, t)
        if self.capacity + other.capacity > _max_device_elems():
            # concat would exceed the validated program size (2^26+
            # hangs this backend): exact host engine, then re-upload
            return self._host_union(other)
        if self.has_taxids and other.has_taxids:
            taxdb = self._taxdb or other._taxdb
            if taxdb is None:
                raise ValueError("taxid-carrying union needs an attached taxdb")
            from .taxonomy.lca import device_tables

            parent, depth, max_depth = device_tables(taxdb)
            c, t, n = device_sets.union_with_taxids(
                self._codes, self._taxids, other._codes, other._taxids,
                parent, depth, int(max_depth), 1,
            )
            return KmerSet(c, n, self.k, taxids=t, taxdb=taxdb,
                           **self._flags_kw()).compact()
        c, n = device_sets.union(self._codes, other._codes,
                                 code_bits=sort_code_bits(self.k, self.hashed))
        return KmerSet(c, n, self.k, taxdb=self._taxdb,
                       **self._flags_kw()).compact()

    def _zero_taxids(self):
        return jnp.zeros(self.capacity, jnp.uint32)

    def intersect(self, other: "KmerSet") -> "KmerSet":
        """Intersection; matching codes LCA-merge their taxids when both
        sides carry them (reference inter.go:228-249), pass the present
        side through when only one does (--mix-taxid semantics)."""
        self._check_compatible(other)
        if self.capacity + other.capacity > _max_device_elems():
            return self._host_intersect(other)
        if self.has_taxids and other.has_taxids:
            taxdb = self._taxdb or other._taxdb
            if taxdb is None:
                raise ValueError(
                    "taxid-carrying intersection needs an attached taxdb"
                )
            from .taxonomy.lca import device_tables

            parent, depth, max_depth = device_tables(taxdb)
            c, t, n = device_sets.intersect_with_taxids(
                self._codes, self._taxids, other._codes, other._taxids,
                parent, depth, int(max_depth),
            )
            return KmerSet(c, n, self.k, taxids=t, taxdb=taxdb,
                           **self._flags_kw()).compact()
        if self.has_taxids or other.has_taxids:
            ta = self._taxids if self.has_taxids else self._zero_taxids()
            tb = other._taxids if other.has_taxids else jnp.zeros(
                other.capacity, jnp.uint32
            )
            c, t, n = device_sets.intersect_one_sided_taxids(
                self._codes, ta, other._codes, tb
            )
            return KmerSet(c, n, self.k, taxids=t,
                           taxdb=self._taxdb or other._taxdb,
                           **self._flags_kw()).compact()
        c, n = device_sets.intersect(self._codes, other._codes)
        out = KmerSet(c, n, self.k, taxdb=self._taxdb, **self._flags_kw())
        return out.compact()

    def subtract(self, other: "KmerSet") -> "KmerSet":
        """Difference; keeps this set's taxid column (the reference diff
        keeps the query taxids, diff.go:379-454)."""
        self._check_compatible(other)
        if self.capacity + other.capacity > _max_device_elems():
            return self._host_subtract(other)
        if self.has_taxids:
            c, t, n = device_sets.subtract_with_taxids(
                self._codes, self._taxids, other._codes
            )
            return KmerSet(c, n, self.k, taxids=t, taxdb=self._taxdb,
                           **self._flags_kw()).compact()
        c, n = device_sets.subtract(self._codes, other._codes)
        out = KmerSet(c, n, self.k, taxdb=self._taxdb, **self._flags_kw())
        return out.compact()

    __or__ = union
    __and__ = intersect
    __sub__ = subtract

    @staticmethod
    def union_all(sets) -> "KmerSet":
        """N-way union in one device pass (concat + sort-collapse),
        cheaper than a chain of pairwise unions for many inputs."""
        sets = list(sets)
        if not sets:
            raise ValueError("union_all() needs at least one set")
        first = sets[0]
        for s in sets[1:]:
            first._check_compatible(s)
        if any(s.has_taxids for s in sets):
            # LCA reduction over >2 duplicates needs the log-rounds
            # collapse; chain pairwise unions (each LCA-exact, each
            # host-falling-back past the program-size cap)
            out = sets[0]
            for s in sets[1:]:
                out = out.union(s)
            return out
        if sum(s.capacity for s in sets) > _max_device_elems():
            from .ops import sets as host_sets

            c, _ = host_sets.union([s.to_numpy() for s in sets])
            return first._from_host(c, None)
        merged = jnp.concatenate([s._codes for s in sets])
        c, n = collapse_sorted(merged, merged != _SENT, mode="distinct",
                               code_bits=sort_code_bits(first.k, first.hashed))
        return KmerSet(c, n, first.k, taxdb=first._taxdb,
                       **first._flags_kw()).compact()

    @staticmethod
    def common(sets, threshold: int) -> "KmerSet":
        """Codes present in >= threshold of the given sets
        (`unikmer common`; reference cmd/common.go)."""
        sets = list(sets)
        if not sets:
            raise ValueError("common() needs at least one set")
        first = sets[0]
        for s in sets[1:]:
            first._check_compatible(s)
        if threshold <= 0:
            # host engine (ops/sets.common) reads <=0 as "all files";
            # normalize here so the device path agrees instead of
            # degenerating to a union (count >= 0)
            threshold = len(sets)
        cap = max(s.capacity for s in sets)
        if cap * len(sets) > _max_device_elems():
            from .ops import sets as host_sets

            c, _ = host_sets.common(
                [s.to_numpy() for s in sets], None, threshold)
            return first._from_host(c, None)
        stacked = jnp.stack([
            s._codes if s.capacity == cap
            else jnp.concatenate([
                s._codes, jnp.full((cap - s.capacity,), _SENT, jnp.uint64)
            ])
            for s in sets
        ])
        c, n = device_sets.common(
            stacked, threshold, code_bits=sort_code_bits(first.k, first.hashed))
        return KmerSet(c, n, first.k, taxdb=first._taxdb,
                       **first._flags_kw()).compact()

    # ------------------------------------------------------------ queries
    def contains(self, queries) -> np.ndarray:
        """Vectorized membership (merge-path binary search on device;
        numpy searchsorted for host-resident oversized sets)."""
        if isinstance(self._codes, np.ndarray):
            q = np.asarray(queries, dtype=np.uint64)
            codes = self._codes[: self._n]
            if codes.size == 0:
                return np.zeros(q.shape, bool)
            idx = np.minimum(np.searchsorted(codes, q), codes.size - 1)
            return (codes[idx] == q) & (q != _SENT)
        q = jnp.asarray(np.asarray(queries, dtype=np.uint64))
        idx = jnp.clip(jnp.searchsorted(self._codes, q), 0,
                       self._codes.shape[0] - 1)
        # the all-ones sentinel pads capacity and is not supported as a
        # member (ops/device_sets.py); CLI paths that need exact sentinel
        # accounting go through ops/sort.collapse_sorted instead
        hit = (self._codes[idx] == q) & (q != _SENT)
        return np.asarray(hit)

    # -------------------------------------------------- per-set transforms
    def head(self, n: int) -> "KmerSet":
        """First n codes (cmd/head semantics on a sorted set)."""
        n = max(0, min(int(n), self._n))
        return KmerSet.from_codes(
            self.to_numpy()[:n], self.k,
            taxids=None if self._taxids is None else self.taxids_to_numpy()[:n],
            taxdb=self._taxdb, assume_sorted_unique=True, **self._flags_kw(),
        )

    def sample(self, start: int, window: int) -> "KmerSet":
        """Fixed-stride sampling: keep record j when j >= start and
        (j - start) % window == 0 (cmd/sample.go:134-149)."""
        if window <= 0 or start < 0:
            raise ValueError("sample needs start >= 0 and window >= 1")
        idx = np.arange(self._n)
        keep = (idx >= start) & ((idx - start) % window == 0)
        return KmerSet.from_codes(
            self.to_numpy()[keep], self.k,
            taxids=None if self._taxids is None
            else self.taxids_to_numpy()[keep],
            taxdb=self._taxdb, assume_sorted_unique=True, **self._flags_kw(),
        )

    def filter_low_complexity(self, penalty_s=3, penalty_d=1, threshold=15,
                              window=7, invert=False) -> "KmerSet":
        """Drop (or keep, with invert) low-complexity k-mers
        (cmd/filter.go window-score semantics; encoded sets only)."""
        if self.hashed:
            raise ValueError("low-complexity filter needs 2-bit encoded k-mers")
        from .ops.filter import low_complexity_mask

        codes = self.to_numpy()
        low = low_complexity_mask(codes, self.k, penalty_s, penalty_d,
                                  threshold, window)
        keep = low if invert else ~low
        return KmerSet.from_codes(
            codes[keep], self.k,
            taxids=None if self._taxids is None
            else self.taxids_to_numpy()[keep],
            taxdb=self._taxdb, assume_sorted_unique=True, **self._flags_kw(),
        )

    # ------------------------------------------------------- maintenance
    def compact(self) -> "KmerSet":
        """Re-bucket capacity to the smallest padded length holding n
        (keeps chained-op shapes inside the cached-program set)."""
        if isinstance(self._codes, np.ndarray):
            return self  # host-resident (oversized) sets stay unpadded
        want = _padded_len(max(self._n, 1))
        if want == self.capacity:
            return self
        c = self._codes[:want]
        t = self._taxids[:want] if self._taxids is not None else None
        return KmerSet(c, self._n, self.k, taxids=t, taxdb=self._taxdb,
                       **self._flags_kw())

    # ----------------------------------------------------------- egress
    def to_numpy(self) -> np.ndarray:
        return np.asarray(self._codes[: self._n])

    def taxids_to_numpy(self) -> np.ndarray | None:
        if self._taxids is None:
            return None
        return np.asarray(self._taxids[: self._n])

    def save(self, path, *, compress=True, compression_level=5, threads=4,
             description=b"") -> None:
        """Write a sorted `.unik` file (io/unik.py layout)."""
        from .io import unik

        flag = unik.SORTED
        if self.canonical:
            flag |= unik.CANONICAL
        if self.hashed:
            flag |= unik.HASHED
        taxids = self.taxids_to_numpy()
        max_taxid = 0
        if taxids is not None:
            flag |= unik.INCLUDE_TAXID
            max_taxid = int(taxids.max(initial=0))
        with unik.UnikWriter(
            path, self.k, flag, number=self._n, description=description,
            scale=self.scale, max_taxid=max_taxid, compress=compress,
            compression_level=compression_level, threads=threads,
        ) as w:
            w.write_codes(self.to_numpy(), taxids)

    def __repr__(self) -> str:
        tax = "+taxids" if self.has_taxids else ""
        return (f"KmerSet(n={self._n}, k={self.k}, "
                f"{'hashed' if self.hashed else 'encoded'}"
                f"{', canonical' if self.canonical else ''}{tax}, "
                f"capacity={self.capacity})")
