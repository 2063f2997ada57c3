"""Leveled logging (reference src/logging.cpp semantics)."""

import importlib

from fargocpt_tpu import log


def fresh(tmp_path=None):
    importlib.reload(log)
    return log


def test_print_level_gates(tmp_path, capsys):
    lg = fresh()
    lg.init_logfiles(tmp_path)
    lg.info("shown")
    lg.verbose("hidden at default level 3")
    lg.debug("also hidden")
    out = capsys.readouterr().out
    assert "shown" in out
    assert "hidden" not in out
    lg.set_print_level(lg.DEBUG)
    lg.debug("now visible")
    assert "now visible" in capsys.readouterr().out
    lg.finalize()


def test_error_routes_to_stderr_and_errfile(tmp_path, capsys):
    lg = fresh()
    lg.init_logfiles(tmp_path)
    lg.error("boom")
    lg.warning("careful")
    cap = capsys.readouterr()
    assert "boom" in cap.err and "boom" not in cap.out
    # warnings go to stdout (error_level defaults to 0, reference
    # src/logging.cpp:28)
    assert "careful" in cap.out
    lg.finalize()
    assert "boom" in (tmp_path / "logs" / "err_0.txt").read_text()
    assert "careful" in (tmp_path / "logs" / "log_0.txt").read_text()


def test_preinit_header_buffer(tmp_path, capsys):
    """Lines logged before the output directory exists are buffered and
    flushed into log_0.txt on init (reference header_buffer,
    src/logging.cpp:40-73)."""
    lg = fresh()
    lg.notice("early header line")
    assert "early header line" in capsys.readouterr().out
    lg.init_logfiles(tmp_path)
    lg.finalize()
    assert "early header line" in (tmp_path / "logs" /
                                   "log_0.txt").read_text()


def test_cli_has_level_flags():
    import argparse
    from fargocpt_tpu.__main__ import _add_log_flags
    p = argparse.ArgumentParser()
    _add_log_flags(p)
    args = p.parse_args(["-q"])
    assert args.quiet and not args.verbose and not args.debug
