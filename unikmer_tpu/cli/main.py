"""unikmer-tpu CLI: flag-compatible surface of the reference toolkit.

Command set mirrors shenwei356/unikmer v0.21.0 (SURVEY.md §2.1): 23
subcommands over the same `.unik` data model, orchestrating the TPU
pipelines in models/ and ops/.
"""

from __future__ import annotations

import argparse
import lzma
import sys
import zlib

from .. import __version__, REFERENCE_VERSION

_SECTIONS = [
    (
        "Counting",
        ["count"],
    ),
    (
        "Information",
        ["info", "num"],
    ),
    (
        "Format conversion",
        ["view", "dump", "encode", "decode"],
    ),
    (
        "Set operations",
        ["concat", "inter", "union", "common", "diff", "grep"],
    ),
    (
        "Split and merge",
        ["sort", "split", "merge", "tsplit"],
    ),
    (
        "Subset",
        ["head", "sample", "filter", "rfilter"],
    ),
    (
        "Searching on genomes",
        ["locate", "map"],
    ),
    (
        "Misc",
        ["autocompletion", "version"],
    ),
]

_ALIASES = {"stats": "info", "uniqs": "map"}


def build_parser(only: str | None = None) -> argparse.ArgumentParser:
    """Build the CLI parser.

    With `only`, register just that subcommand — importing all 25
    command modules costs ~0.18 s, a large share of small-command
    wall-clock.  Callers pass `only` solely when argv[0] is exactly
    that known command, so help output, the command listing, and
    unknown-command errors always come from the fully-registered
    parser.
    """
    p = argparse.ArgumentParser(
        prog="unikmer-tpu",
        description=(
            "unikmer-tpu - a TPU-native toolkit for nucleic acid k-mer "
            "analysis (unikmer-compatible)\n\n"
            f"Version: v{__version__} (reference parity: unikmer v{REFERENCE_VERSION})"
        ),
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="command", metavar="command")
    from . import commands

    for name in commands.COMMANDS if only is None else [only]:
        commands.register(name, sub)
    return p


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] in _ALIASES:
        argv[0] = _ALIASES[argv[0]]
    import os

    if argv and os.environ.get("UNIKMER_TPU_SERVER"):
        # resident device server (server.py): reuse a warm dialed
        # backend + compiled programs instead of paying per-process
        # startup; falls through to local execution when unreachable
        from .._client import try_server

        rc = try_server(argv)
        if rc is not None:
            return rc
    from . import commands

    only = argv[0] if argv and argv[0] in commands.COMMANDS else None
    parser = build_parser(only=only)
    args = parser.parse_args(argv)
    if not getattr(args, "command", None):
        parser.print_help()
        return 0
    try:
        return _run_profiled(args)
    except SystemExit as e:
        # Commands mirror the reference's process-level exits (utils.log
        # die/check_error = util-cli.go:39-44 checkError; grep's
        # zero-query os.Exit(0) = grep.go:475-478).  main() is also the
        # embeddable API, so convert to a return code instead of killing
        # the host process; `sys.exit(main())` keeps the process
        # behavior identical (-1 -> 255, as in Go).
        code = e.code
        if code is None:
            return 0
        return code & 0xFF if isinstance(code, int) else 255
    except BrokenPipeError:
        # head | view-style pipelines
        try:
            sys.stdout.close()
        except Exception:
            pass
        return 0
    except KeyboardInterrupt:
        return 130
    except (ValueError, OSError, EOFError, zlib.error, lzma.LZMAError) as e:
        # fatal-error semantics of the reference (checkError -> exit -1);
        # set UNIKMER_TPU_DEBUG=1 for the full traceback
        import os

        if os.environ.get("UNIKMER_TPU_DEBUG"):
            raise
        from ..utils.log import init_logging, log

        init_logging(False)
        log.error(str(e))
        return 255


def _run_profiled(args) -> int:
    """Dispatch with optional tracing (the reference keeps commented
    pprof/trace hooks in main.go:48-56; ours are env-gated and live):
    UNIKMER_TPU_PROFILE=<dir> captures a JAX/XLA device trace,
    UNIKMER_TPU_CPROFILE=<file> a host cProfile dump."""
    import os

    trace_dir = os.environ.get("UNIKMER_TPU_PROFILE")
    cprof = os.environ.get("UNIKMER_TPU_CPROFILE")
    if cprof:
        import cProfile

        prof = cProfile.Profile()
        prof.enable()
    if trace_dir:
        import jax

        jax.profiler.start_trace(trace_dir)
    try:
        return args.func(args) or 0
    finally:
        if trace_dir:
            import jax

            jax.profiler.stop_trace()
        if cprof:
            prof.disable()
            prof.dump_stats(cprof)


if __name__ == "__main__":
    sys.exit(main())
