"""Reference-faithful output sink: R text files, ``key value\\n`` rows,
sorted by key within each file.

Format mandate: single-space separator (description.md:66-68;
src/mr_tasks.h:90 ``key << " " << val``); per-file sort mandate
(description.md:62, via std::map iteration in src/worker.h:105).
File naming ``{user_id}_result_{r}`` (src/mr_tasks.h:67).

Unlike the reference, output is overwritten, not appended — the
reference's append-mode files corrupt re-runs (src/mr_tasks.h:25,69;
manual cleanup demanded by structure.md:50); we do not replicate that.

Scale note: ``repartition(R, key)`` + ``sortWithinPartitions`` is the
reference's exact layout contract (hash partition by key, sort within
partition) and never requires a global sort.  For globally ordered
output use ``repartitionByRange`` instead (one extra sampling pass).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_sorted_kv_text(
    df: DataFrame,
    output_dir: str,
    num_partitions: int,
    user_id: str = "user",
    rename_to_reference_layout: bool = True,
) -> list[str]:
    """Write DataFrame[key, value] as R sorted text files; returns the
    final file paths.  With ``rename_to_reference_layout`` the Spark
    ``part-*`` files are renamed to ``{user_id}_result_{r}`` (local
    filesystem paths only)."""
    staging = os.path.join(output_dir, f"_{user_id}_staging")
    (
        df.repartition(num_partitions, F.col("key"))
        .sortWithinPartitions("key", "value")
        .select(F.concat_ws(" ", F.col("key"), F.col("value")).alias("line"))
        .write.mode("overwrite")
        .text(staging)
    )
    if not rename_to_reference_layout:
        return sorted(glob.glob(os.path.join(staging, "part-*")))
    out_paths: list[str] = []
    parts = sorted(glob.glob(os.path.join(staging, "part-*")))
    for r, part in enumerate(parts):
        dest = os.path.join(output_dir, f"{user_id}_result_{r}")
        shutil.move(part, dest)
        out_paths.append(dest)
    # partitions with no rows produce no part file; emit empty files so
    # exactly R outputs exist, as the reference does (it opens all R up
    # front, mr_tasks.h:66-70)
    for r in range(len(parts), num_partitions):
        dest = os.path.join(output_dir, f"{user_id}_result_{r}")
        open(dest, "w").close()
        out_paths.append(dest)
    shutil.rmtree(staging, ignore_errors=True)
    return out_paths
