"""count: generate k-mers (sketch) from FASTA/Q sequences.

Reference: unikmer/cmd/count.go (full semantics in SURVEY.md §3.1).
"""

from __future__ import annotations

import os
import re

import numpy as np

from ...io import unik
from ...io.fastx import pack_files, pack_records, read_fastx
from ...ops.codec import MAX_K_ENCODED, MAX_K_HASHED
from ...utils.log import die, log
from ..opts import ensure_unik_suffix, get_file_list, get_options, out_binary_stream
from ._common import new_command, log_saved


def register(subparsers):
    p = new_command(subparsers, "count", "Generate k-mers (sketch) from FASTA/Q sequences")
    p.add_argument("files", nargs="*", default=[], help="input FASTA/Q file(s)")
    p.add_argument("-B", "--seq-name-filter", action="append", default=[],
                   help="regular expression for filtering out sequences by header/name, case ignored")
    p.add_argument("-o", "--out-prefix", default="-", help='out file prefix ("-" for stdout)')
    p.add_argument("-k", "--kmer-len", type=int, required=True, help="k-mer length")
    p.add_argument("-K", "--canonical", action="store_true", help="only keep the canonical k-mers")
    p.add_argument("-s", "--sort", action="store_true",
                   help="sort k-mers, this significantly reduces file size for k<=25. Overrides -c/--compact")
    p.add_argument("-t", "--taxid", type=int, default=0, help="global taxid")
    p.add_argument("-T", "--parse-taxid", action="store_true", help="parse taxid from FASTA/Q header")
    p.add_argument("-r", "--parse-taxid-regexp", default="", help="regular expression for parsing taxid")
    p.add_argument("-d", "--repeated", action="store_true",
                   help="only count duplicate k-mers, for removing singletons in FASTQ")
    p.add_argument("-u", "--unique", action="store_true", help="only count unique k-mers")
    p.add_argument("-V", "--more-verbose", action="store_true", help="print extra verbose information")
    p.add_argument("-H", "--hash", action="store_true",
                   help="save hash of k-mer, automatically on for k>32. Overrides -c/--compact")
    p.add_argument("--circular", action="store_true", help="circular genome")
    p.add_argument("-D", "--scale", type=int, default=1, help="scale/down-sample factor")
    p.add_argument("-W", "--minimizer-w", type=int, default=0, help="minimizer window size")
    p.add_argument("-S", "--syncmer-s", type=int, default=0, help="closed syncmer length")
    p.add_argument("--syncmer-impl", choices=("edgar", "compat"), default="edgar",
                   help="closed-syncmer rule: 'edgar' (Edgar 2021, the documented "
                        "definition) or 'compat' (forensic reconstruction of the "
                        "reference binary's behavior; docs/DIVERGENCES.md §2)")
    p.add_argument("-l", "--linear", action="store_true",
                   help="output k-mers in linear order, duplicate k-mers are not removed")
    p.set_defaults(func=run)


def run(args) -> int:
    # NOTE: models.count (the device pipeline) pulls jax (~3 s import);
    # it is imported only on the branches that actually dispatch to the
    # device.  Small un-hashed inputs route to the jax-free host engine
    # (models/count_host.py) instead.
    opt = get_options(args)
    k = args.kmer_len
    if k <= 0:
        die("k-mer length must be positive")
    hashed = args.hash
    if k > MAX_K_ENCODED and not hashed:
        hashed = True
        log.warning("flag -H/--hash is switched on for k > 32")
    if hashed and k > MAX_K_HASHED:
        die(f"k-mer size ({k}) should be <=64")
    if args.scale > 0xFFFFFFFF:
        die("scale must fit in 32 bits (the .unik header stores uint32)")
    if args.scale > 1 and not hashed:
        hashed = True
        log.warning("flag -H/--hash is switched on for scale > 1")
    canonical = args.canonical
    if (args.minimizer_w > 0 or args.syncmer_s > 0) and not (hashed and canonical):
        hashed = canonical = True
        log.warning("flags -H/--hash and -K/--canonical are switched on for sketches")
    if args.minimizer_w > 0 and args.syncmer_s > 0:
        die("flag --minimizer-w and --syncmer-s can not be given simultaneously")
    if args.syncmer_impl == "compat":
        if args.syncmer_s <= 0:
            die("flag --syncmer-impl=compat requires -S/--syncmer-s")
    if args.unique and args.repeated:
        die("flag -u/--unique and -d/--repeated are not compatible")
    if args.linear and args.sort:
        die("flag -l/--linear and -s/--sort are not compatible")
    if args.linear and (args.unique or args.repeated):
        log.warning("flag -d/--repeated and -u/--unique are ignored when -l/--linear given")
    if args.parse_taxid:
        if args.taxid > 0:
            die("flag -t/--taxid and -T/--parse-taxid can not be given simultaneously")
        if not args.parse_taxid_regexp:
            die("flag -r/--parse-taxid-regexp needed when given flag -T/--parse-taxid")
        if not re.search(r"\(.+\)", args.parse_taxid_regexp):
            die('value of -r/--parse-taxid-regexp must contain "(" and ")" to capture taxid')
        re_taxid = re.compile(args.parse_taxid_regexp.encode())
    else:
        re_taxid = None

    name_res = []
    for kw in args.seq_name_filter:
        if "(?i)" not in kw:
            kw = "(?i)" + kw
        try:
            name_res.append(re.compile(kw.encode()))
        except re.error as e:
            die(f"failed to parse regular expression for matching sequence header: {e}")

    files = get_file_list(args, check_exists=not opt.skip_file_check)
    out_file = ensure_unik_suffix(args.out_prefix)

    mode = "repeated" if args.repeated else "unique" if args.unique else "distinct"
    if args.linear:
        mode = "distinct"

    def make_cfg():
        from ...models.count import CountConfig  # pulls jax

        return CountConfig(
            k=k,
            canonical=canonical,
            hashed=hashed,
            scale=args.scale,
            minimizer_w=args.minimizer_w,
            syncmer_s=args.syncmer_s,
            syncmer_impl=args.syncmer_impl,
            circular=args.circular,
            mode=mode,
        )

    def records():
        for f in files:
            if opt.verbose:
                log.info(f"reading sequence file: {f}")
            for rec in read_fastx(f):
                if name_res and any(r.search(rec.name) for r in name_res):
                    continue
                yield rec

    flag = 0
    if canonical:
        flag |= unik.CANONICAL
    if hashed:
        flag |= unik.HASHED
    elif opt.compact and not args.sort and not args.linear:
        flag |= unik.COMPACT
    if args.parse_taxid:
        flag |= unik.INCLUDE_TAXID
    if args.sort:
        flag |= unik.SORTED
        flag &= ~unik.COMPACT

    writer_kw = dict(
        k=k,
        compress=opt.compress,
        compression_level=opt.compression_level,
        threads=opt.threads,
        global_taxid=args.taxid if (args.taxid > 0 and not args.parse_taxid) else 0,
        scale=args.scale if args.scale > 1 else 1,
        max_taxid=opt.max_taxid,
    )

    # native fused ingest (inflate+parse+pack in C++, io/fastx.pack_files)
    # applies when no header-dependent filtering is requested and every
    # input is a bounded-size regular file
    use_packed_ingest = (
        not args.parse_taxid
        and not name_res
        and all(_native_ingest_ok(f) for f in files)
    )
    compat_syncmer = args.syncmer_impl == "compat" and args.syncmer_s > 0
    if compat_syncmer:
        # the native loader's packed buffers lack the RECORD_SEP bytes
        # the compat device twin segments by (ops/sketch)
        use_packed_ingest = False
    compat_gap_n = 1
    if compat_syncmer:
        from ...ops.sketch import compat_gap

        compat_gap_n = compat_gap(k, args.syncmer_s)
    # prefer the native host kernel for compat (the original
    # reconstruction); the device twin (round 4) is the fallback and
    # the only -T route
    host_ok = compat_syncmer or _host_count_wanted(files, k, hashed, args)
    if args.parse_taxid and (args.minimizer_w > 0 or args.syncmer_s > 0):
        # the host taxid engine has no sketch kernels (sketch_emit
        # returns hashes without positions, so per-record taxids can't
        # be assigned); only the device path handles -T with -W/-S
        host_ok = False

    def pack_all():
        if use_packed_ingest:
            return pack_files(files, k, args.circular)
        return pack_records(records(), k, args.circular, gap=compat_gap_n)

    def packed_stream():
        # native fused ingest per file, falling back to bounded record
        # chunks past the native size cap (shared by the single-device
        # and mesh streaming paths)
        from ...io.fastx import PackedSeqs, _try_native_load
        from ...models.count import _stream_chunk_bases

        chunk = _stream_chunk_bases()
        for f in files:
            if opt.verbose:
                log.info(f"reading sequence file: {f}")
            part = (None if compat_syncmer
                    else _try_native_load(f, k, args.circular))
            if part is not None:
                b, s, ln, _ = part
                yield PackedSeqs(b, s, ln)
                continue
            buf, size = [], 0
            for rec in read_fastx(f):
                buf.append(rec)
                size += len(rec.seq)
                if size >= chunk:
                    yield pack_records(buf, k, args.circular,
                                       gap=compat_gap_n)
                    buf, size = [], 0
            if buf:
                yield pack_records(buf, k, args.circular,
                                   gap=compat_gap_n)

    if (
        opt.mesh >= 1
        and not args.linear
        and not args.parse_taxid
        and not compat_syncmer
    ):
        # --mesh N: range-partitioned sharded build over a device mesh
        # (parallel/sharded.py all_to_all repartition; SURVEY.md §2.4),
        # streamed in bounded pieces with the capped-multiplicity merge
        # + beyond-RAM spill of the single-device path.  Sketches are
        # halo-shardable (shard_halos: minimizer reign emission looks
        # forward + one previous group); -l needs genome order and the
        # compat syncmer rule lives only in the host kernel.
        _ensure_device_env()
        import jax

        if jax.device_count() < opt.mesh:
            die(f"--mesh {opt.mesh} needs {opt.mesh} devices, "
                f"found {jax.device_count()}")
        from ...models.count import SpilledCount
        from ...parallel.sharded import (
            mesh_count_stream, mesh_count_stream_packed,
        )

        if use_packed_ingest:
            codes = mesh_count_stream_packed(packed_stream(), make_cfg(),
                                             opt.mesh)
        else:
            codes = mesh_count_stream(records(), make_cfg(), opt.mesh)
        out, _ = out_binary_stream(out_file)
        if isinstance(codes, SpilledCount):
            with unik.UnikWriter(out, flag=flag, **writer_kw) as w:
                n = codes.write_to(w.write_codes)
            log_saved(opt, n, out_file)
            return 0
        with unik.UnikWriter(
            out, flag=flag, number=len(codes), **writer_kw
        ) as w:
            w.write_codes(codes)
        log_saved(opt, len(codes), out_file)
        return 0

    if args.linear:
        # re-exec (if the device env must be restored) BEFORE touching
        # the output stream or stdin: UnikWriter's gzip wrapper writes
        # its header at construction, and pack_all() would consume a
        # stdin input the re-exec'd process can never re-read
        if not host_ok:
            _ensure_device_env()
        out, _ = out_binary_stream(out_file)
        with unik.UnikWriter(out, flag=flag, **writer_kw) as w:
            n = 0
            if args.parse_taxid:
                # batch ALL records into one packed buffer (one
                # engine invocation instead of one padded dispatch per
                # record), then map emitted window positions back to
                # records for the per-record taxid column
                kept, taxid_of = [], []
                for rec in records():
                    if len(rec.seq) < k:
                        continue  # ErrShortSeq skip (count.go:323-331)
                    m = re_taxid.search(rec.name)
                    if not m:
                        die(
                            "failed to parse taxid in header: "
                            f"{rec.name.decode()}"
                        )
                    kept.append(rec)
                    taxid_of.append(int(m.group(1)))
                # gap=compat_gap_n: the compat syncmer's device twin
                # needs widened separator runs so vote windows near a
                # record's end never reach into the next record's
                # s-mer hashes (round-4 advisor finding)
                packed = pack_records(kept, k, args.circular,
                                      gap=compat_gap_n)
                res = None
                if host_ok:
                    from ...models.count_host import linear_windows_host

                    res = linear_windows_host(packed.bases, k, canonical,
                                              hashed)
                if res is None:
                    from ...models.count import linear_codes_all

                    res = linear_codes_all(packed.bases, make_cfg())
                codes, pos = res
                rec_idx = (
                    np.searchsorted(packed.starts, pos, side="right") - 1
                )
                taxids = (
                    np.asarray(taxid_of, np.uint32)[rec_idx]
                    if kept
                    else np.zeros(0, np.uint32)
                )
                w.write_codes(codes, taxids)
                n = len(codes)
            else:
                packed = pack_all()
                codes = None
                if host_ok and (compat_syncmer
                                or len(packed.bases) <= _host_max_bases()):
                    from ...models.count_host import linear_host

                    codes = linear_host(packed, k, canonical, hashed,
                                        args.scale, args.minimizer_w,
                                        args.syncmer_s, args.syncmer_impl)
                if codes is None:
                    # incl. compat over the host cap: the device twin
                    # (ops/sketch.syncmer_compat_windows) takes over
                    from ...models.count import count_linear

                    codes = count_linear(packed, make_cfg())
                w.write_codes(codes)
                n = len(codes)
        log_saved(opt, n, out_file)
        return 0

    if args.parse_taxid:
        from ...taxonomy.taxdump import load_taxonomy

        taxdb = load_taxonomy(opt.data_dir, verbose=opt.verbose)
        res = None
        if opt.mesh >= 1 and not compat_syncmer:
            # count -T --mesh: sharded packed-key build with the tiered
            # vocabulary LCA; falls through on admission decline
            # (compat syncmer is record-scoped, not halo-shardable)
            _ensure_device_env()
            import jax

            if jax.device_count() < opt.mesh:
                die(f"--mesh {opt.mesh} needs {opt.mesh} devices, "
                    f"found {jax.device_count()}")
            from ...models.count import (
                count_taxids_from_packed, parse_taxid_records,
            )
            from ...parallel.sharded import mesh_count_taxids

            packed_t, rec_taxids = parse_taxid_records(
                records(), make_cfg(), re_taxid)
            res = mesh_count_taxids(packed_t, rec_taxids, taxdb,
                                    make_cfg(), opt.mesh)
            if res is None:
                res = count_taxids_from_packed(packed_t, rec_taxids,
                                               make_cfg(), taxdb)
        if res is None and host_ok:
            from ...models.count_host import count_taxids_host

            res = count_taxids_host(records(), k, canonical, hashed,
                                    args.scale, mode, args.circular,
                                    re_taxid, taxdb)
        if res is None:
            _ensure_device_env()
            from ...models.count import count_packed_taxids

            res = count_packed_taxids(records(), make_cfg(), re_taxid, taxdb)
        codes, taxids = res
        if not args.sort:
            pass  # already sorted; reference order is map order (unordered)
        out, _ = out_binary_stream(out_file)
        with unik.UnikWriter(out, flag=flag, number=len(codes), **writer_kw) as w:
            w.write_codes(codes, taxids)
        log_saved(opt, len(codes), out_file)
        return 0

    if host_ok:
        packed = pack_all()
        codes = None
        if compat_syncmer or len(packed.bases) <= _host_max_bases():
            from ...models.count_host import count_host

            codes = count_host(packed, k, canonical, mode, hashed,
                               args.scale, args.minimizer_w,
                               args.syncmer_s, args.syncmer_impl)
        if codes is not None:
            out, _ = out_binary_stream(out_file)
            with unik.UnikWriter(
                out, flag=flag, number=len(codes), **writer_kw
            ) as w:
                w.write_codes(codes)
            log_saved(opt, len(codes), out_file)
            return 0
        # size caps said no (gz pre-filter underestimated, or the
        # sketch kernels' tighter memory cap): fall through to the
        # bounded-memory device streaming path (files are re-readable;
        # stdin never routes here)
        del packed

    _ensure_device_env()
    from ...models.count import count_stream, count_stream_packed
    cfg = make_cfg()

    if use_packed_ingest:
        codes = count_stream_packed(packed_stream(), cfg)
    else:
        codes = count_stream(records(), cfg)
    from ...models.count import SpilledCount

    out, _ = out_binary_stream(out_file)
    if isinstance(codes, SpilledCount):
        # beyond-RAM distinct set: stream the cascade merge straight
        # into the writer (number left unknown, like sort -m outputs)
        with unik.UnikWriter(out, flag=flag, **writer_kw) as w:
            n = codes.write_to(w.write_codes)
        log_saved(opt, n, out_file)
        return 0
    with unik.UnikWriter(out, flag=flag, number=len(codes), **writer_kw) as w:
        w.write_codes(codes)
    log_saved(opt, len(codes), out_file)
    return 0


def _ensure_device_env() -> None:
    """The launcher starts `count` dial-free (axon relay dial = ~3 s at
    interpreter start) betting on the host engine.  When routing decides
    it needs the device after all, re-exec with the saved pool restored
    so the device backend can register; UNIKMER_TPU_HOST_COUNT=0 makes
    the second invocation route straight to the device."""
    import sys

    if os.environ.get("UNIKMER_TPU_LAUNCHER_PINNED") != "1":
        return
    saved = os.environ.get("UNIKMER_TPU_SAVED_POOL", "")
    if not saved:
        # no relay pool existed before the launcher pinned: there is no
        # device to restore — stay in-process on the XLA CPU fallback
        return
    env = dict(os.environ)
    env.pop("UNIKMER_TPU_LAUNCHER_PINNED", None)
    env.pop("UNIKMER_TPU_SAVED_POOL", None)
    env.pop("UNIKMER_TPU_PLATFORM", None)
    env["PALLAS_AXON_POOL_IPS"] = saved
    env["UNIKMER_TPU_HOST_COUNT"] = "0"
    sys.stdout.flush()
    sys.stderr.flush()
    os.execvpe(sys.executable, [sys.executable, "-m", "unikmer_tpu.cli.main",
                                *sys.argv[1:]], env)


def _host_max_bases() -> int:
    """Hard post-pack cap for the host engine: its window buffer costs
    8 bytes/base, so bound it independently of the compressed-size
    pre-filter (the device streaming path is memory-bounded instead)."""
    return int(os.environ.get("UNIKMER_TPU_HOST_COUNT_MAX_BASES",
                              str(1 << 28)))  # 268 Mbp -> ~2.1 GB codes


def _host_count_wanted(files, k: int, hashed: bool, args) -> bool:
    """Route to the jax-free host engine?  UNIKMER_TPU_HOST_COUNT:
    0 = never, 1 = whenever the config is supported, auto (default) =
    supported AND total input size below UNIKMER_TPU_HOST_COUNT_MAX_MB
    (default 256 MB — at that scale startup + dispatch dominate the
    device path; above it the TPU pipeline's throughput wins)."""
    knob = os.environ.get("UNIKMER_TPU_HOST_COUNT", "auto")
    if knob == "0":
        return False  # checked before supported(): get_lib() may compile
    from ...models.count_host import supported

    if not supported(k, hashed, args.scale, args.minimizer_w, args.syncmer_s):
        return False
    if knob == "1":
        return True
    if any(f == "-" for f in files):
        return False  # unknown size: keep the streaming device path
    try:
        total = sum(os.path.getsize(f) for f in files)
    except OSError:
        return False
    cap_mb = float(os.environ.get("UNIKMER_TPU_HOST_COUNT_MAX_MB", "256"))
    return total <= cap_mb * (1 << 20)


def _native_ingest_ok(path: str) -> bool:
    """Regular files go through pack_files, whose native fast path
    enforces the io.fastx.NATIVE_INGEST_MAX decompressed-size cap and
    falls back to the streaming reader beyond it."""
    return path != "-" and os.path.isfile(path)

