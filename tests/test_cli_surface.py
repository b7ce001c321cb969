"""Every registered CLI subcommand must import and parse --help.

Catches broken imports, flag conflicts and registry typos across the
whole command surface without running any compute.
"""
import importlib

import pytest

from tomatis_tpu.cli.main import COMMANDS, main


def test_dispatcher_help_lists_all():
    assert main(["--help"]) == 0


def test_unknown_command():
    assert main(["no-such-command"]) == 2


@pytest.mark.parametrize("name", sorted(COMMANDS))
def test_subcommand_help_parses(name, capsys):
    spec = COMMANDS[name]
    mod = importlib.import_module(spec[0])
    entry = getattr(mod, spec[2]) if len(spec) > 2 else mod.main
    # argparse exits 0 on --help; entries wrapping parse_args propagate it
    with pytest.raises(SystemExit) as e:
        entry(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "usage" in out.lower()
