"""Scratch-dir staging hygiene for streaming replays.

Several streaming queries stage a deterministic copy of a fixture
under ``$TMPDIR/spark_graft_<family>_<key>`` so a file-source replay
can feed it in micro-batches. Two of those families key the dir by
PID (two concurrent processes — e.g. the parity suite alongside a
driver emulation — must never rmtree/append under each other), and a
pid-scoped dir is reaped by an ``atexit`` hook. A process that dies
before its atexit runs therefore leaks one staged fixture copy
FOREVER: no later process ever reuses a dead pid's key (VERDICT r8
item 7).

:func:`sweep_stale_stage_dirs` is the countermeasure: on entry each
staging query best-effort-removes sibling dirs of its own family
older than a day. The age gate guarantees a concurrently-LIVE stage
is never touched (a live stage is written and consumed within
seconds-to-minutes of its mtime), and every removal is
``ignore_errors`` — hygiene must never fail a query.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

#: Reap horizon: a day. Far above any real staging lifetime (seconds)
#: so a paused-under-debugger process is safe, far below "forever".
STALE_STAGE_AGE_S = 24 * 3600


def sweep_stale_stage_dirs(prefix: str, max_age_s: int = STALE_STAGE_AGE_S) -> None:
    """Best-effort removal of ``$TMPDIR/<prefix>*`` dirs whose mtime is
    older than ``max_age_s`` seconds.

    The dir mtime is refreshed by its final write (the ``_staged_ok``
    marker), so age = time since staging finished. Races are benign:
    a concurrent sweep of the same orphan makes one rmtree a no-op,
    and a dir created between listdir and stat is younger than the
    gate by construction.
    """
    root = tempfile.gettempdir()
    now = time.time()
    try:
        names = os.listdir(root)
    except OSError:
        return
    for name in names:
        if not name.startswith(prefix):
            continue
        path = os.path.join(root, name)
        try:
            if os.path.isdir(path) and now - os.stat(path).st_mtime > max_age_s:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue


def pin_new_file_mtimes(stage: str, t: float, staged: set[str]) -> None:
    """Pin EXPLICIT mtime ``t`` on stage part-files not yet in ``staged``.

    The chunked-replay protocol (session / funnel / wmdrop stages)
    relies on the file stream source feeding micro-batches in mtime
    order; on filesystems with coarse mtime granularity two sequential
    writes can tie, and the source's tiebreak over random part-file
    names could replay a later chunk first. Callers pass a strictly
    increasing whole-second ``t`` per chunk and the shared ``staged``
    set accumulates files already pinned.
    """
    for name in sorted(os.listdir(stage)):
        p = os.path.join(stage, name)
        if name.endswith(".parquet") and p not in staged:
            os.utime(p, (t, t))
            staged.add(p)
