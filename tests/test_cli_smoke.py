"""Smoke matrix: every subcommand's --help and the no-device utility
surfaces exit cleanly (catches argparse/registration regressions in
rarely-driven flags)."""

import pytest

from unikmer_tpu.cli.main import main

COMMANDS = [
    "count", "sort", "split", "merge", "tsplit", "union", "inter",
    "common", "diff", "grep", "view", "dump", "encode", "decode",
    "concat", "head", "sample", "filter", "rfilter", "locate", "map",
    "info", "num", "version", "autocompletion",
]


def run(argv):
    try:
        return main(argv)
    except SystemExit as e:  # argparse --help exits 0
        return e.code or 0


@pytest.mark.parametrize("cmd", COMMANDS)
def test_help_exits_clean(cmd, capsys):
    assert run([cmd, "--help"]) == 0
    out = capsys.readouterr().out
    assert cmd in out or "usage" in out


def test_version(capsys):
    assert run(["version"]) == 0
    assert "unikmer" in capsys.readouterr().out


def test_autocompletion_shells(tmp_path, capsys):
    for shell in ("bash", "zsh", "fish"):
        assert run(["autocompletion", "--type", shell,
                    "--file", str(tmp_path / f"c.{shell}")]) == 0
        assert (tmp_path / f"c.{shell}").exists()


def test_rfilter_lists(capsys, monkeypatch):
    import os

    monkeypatch.setenv(
        "UNIKMER_DB",
        os.path.join(os.path.dirname(__file__), "data", "taxdump"),
    )
    assert run(["rfilter", "--list-order"]) == 0
    out = capsys.readouterr().out
    assert "species" in out
    # --list-ranks walks the taxonomy (needs the data dir)
    assert run(["rfilter", "--list-ranks"]) == 0
    assert "species" in capsys.readouterr().out


def test_stats_alias(capsys):
    # reference registers `stats` as an alias of info (info.go)
    assert run(["stats", "--help"]) == 0


def test_uniqs_alias(capsys):
    # reference registers `uniqs` as an alias of map (map.go)
    assert run(["uniqs", "--help"]) == 0


def test_unknown_command_fails():
    assert run(["definitely-not-a-command"]) not in (0, None)
