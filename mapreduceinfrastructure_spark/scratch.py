"""Per-session scratch roots under the system tempdir, with cleanup.

The applicationId-suffixed scratch paths (bucketed_join_revenue,
zorder_layout, orc_roundtrip, shard_manifest, compaction_roundtrip)
fixed the ADVICE-r7 cross-session overwrite race, but each session then
left a fresh directory tree in ``tempfile.gettempdir()`` that nothing
deleted — unbounded /tmp growth on long-lived hosts and CI runners
(ADVICE r8).  Every write-path operator now takes its scratch location
from :func:`scratch_dir`, which parks ALL of a session's scratch under
ONE per-application root and registers exactly one ``atexit`` cleanup
for that root.

Why atexit rather than a SparkSession stop hook: the scratch must
outlive individual queries (bucketed tables are re-read across calls
within a session) but not the Python process, and PySpark exposes no
public on-stop callback; ``shutil.rmtree(ignore_errors=True)`` at
interpreter exit is idempotent and safe if the JVM already died.
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
import tempfile
import time

# roots with a registered cleanup — one entry per applicationId seen in
# this process (normally exactly one; tests that stop/start sessions
# may accumulate a few, each cleaned independently).
_REGISTERED: set[str] = set()

# Age (seconds) past which a sibling mri_scratch_* root from ANOTHER
# process is presumed orphaned (its session was SIGKILLed/OOMed before
# atexit could run) and reclaimed by the next session's first
# scratch_dir call.  24h is far beyond any session's lifetime here and
# cheap to be wrong about: every scratch consumer rewrites its leaf.
_ORPHAN_AGE_S = 24 * 3600

_SWEPT = False


def _sweep_orphans(current_root: str) -> None:
    """Best-effort reclamation of mri_scratch_* trees left by crashed
    sessions (ADVICE r9: atexit only fires on clean interpreter exit,
    so SIGKILL/OOM — common for Spark drivers — leaked roots forever).
    Runs once per process, skips the live session's own root, and only
    removes trees whose mtime is older than _ORPHAN_AGE_S."""
    global _SWEPT
    if _SWEPT:
        return
    _SWEPT = True
    tmp = tempfile.gettempdir()
    try:
        names = os.listdir(tmp)
    except OSError:
        return
    now = time.time()
    for name in names:
        if not name.startswith("mri_scratch_"):
            continue
        path = os.path.join(tmp, name)
        if path == current_root or path in _REGISTERED:
            continue
        try:
            if now - os.path.getmtime(path) > _ORPHAN_AGE_S:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue


def app_tag(spark) -> str:
    """The session's applicationId as a filesystem/identifier-safe tag
    (also used in bucketed TABLE names, which forbid dashes)."""
    return re.sub(r"[^0-9a-zA-Z]+", "_", spark.sparkContext.applicationId)


def scratch_dir(spark, kind: str, tag: str = "") -> str:
    """A scratch path ``<tmp>/mri_scratch_<appId>/<kind>[_<tag>]`` whose
    per-application root is removed at interpreter exit.  The leaf is
    NOT created here — Spark writers create it — and repeated calls
    with the same (kind, tag) return the same path, preserving the
    within-session reuse semantics the operators rely on."""
    root = os.path.join(
        tempfile.gettempdir(), f"mri_scratch_{app_tag(spark)}"
    )
    if root not in _REGISTERED:
        _REGISTERED.add(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _sweep_orphans(root)
    leaf = f"{kind}_{tag}" if tag else kind
    return os.path.join(root, leaf)
