"""Shared scratch-dir scoping for queries that write (saveAsTable,
parquet sinks, streaming memory-sink names).

The bench harness runs the registry from several threads of ONE
process (SPARK_GRAFT_BENCH_THREADS), and the driver gate may run
concurrently from another process — so every mutable scratch name/path
is scoped by pid AND thread id, and scratch left behind by exited
processes is reaped on the next use.
"""

from __future__ import annotations

import glob
import os
import re
import shutil
import threading

_SCOPED_RE = re.compile(r"_(\d+)_\d+$")


def scope() -> str:
    """pid_tid suffix for scratch paths / table names / stream names."""
    return f"{os.getpid()}_{threading.get_ident()}"


def reap(pattern: str) -> None:
    """Remove scratch dirs matching ``pattern`` (a glob) whose trailing
    ``_<pid>_<tid>`` names an exited process. Dirs of live pids —
    possibly a concurrently running gate — are left alone; names
    without the scoped suffix are ignored (they are not ours to
    judge)."""
    for old in glob.glob(pattern):
        m = _SCOPED_RE.search(old)
        if not m or int(m.group(1)) == os.getpid():
            continue
        try:
            os.kill(int(m.group(1)), 0)
        except ProcessLookupError:
            shutil.rmtree(old, ignore_errors=True)
        except PermissionError:
            pass
