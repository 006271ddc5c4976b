"""Command registry: each module exposes register(subparsers)."""

from __future__ import annotations

import importlib

COMMANDS = [
    "count",
    "info",
    "num",
    "view",
    "dump",
    "encode",
    "decode",
    "concat",
    "inter",
    "union",
    "common",
    "diff",
    "grep",
    "sort",
    "split",
    "merge",
    "tsplit",
    "head",
    "sample",
    "filter",
    "rfilter",
    "locate",
    "map",
    "autocompletion",
    "version",
]


def register(name: str, subparsers) -> None:
    mod = importlib.import_module(f".{name}", __package__)
    mod.register(subparsers)
