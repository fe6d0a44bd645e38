"""Driver-environment hardening check: run EVERY declared query plus
``entry()`` under the conditions the external grading driver may use —
a vanilla SparkSession (none of this repo's session.py conf) launched
from a cwd that does NOT have the repo on PYTHONPATH.

This catches the cloudpickle-by-reference failure mode: a closure
handed to Spark that references a module-level name in this package
needs the package importable on EXECUTOR workers, which silently holds
when running from the repo root (cwd is on sys.path) and breaks
anywhere else.  See session.ensure_package_on_executors.

Run from anywhere:  python /root/repo/scripts/drive_foreign.py
Exits 1 on any failure.
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_FOREIGN_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    os.chdir(tempfile.gettempdir())  # simulate a foreign cwd
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod

    failures = []
    for name, fn in sorted(entrymod.queries().items()):
        try:
            fn(spark, SF_DIR).count()
            print(f"OK {name}")
        except Exception as ex:  # noqa: BLE001 — report-all sweep
            failures.append(name)
            msg = str(ex).split("\n")[0][:160]
            print(f"FAIL {name}: {msg}")
    try:
        entrymod.entry(spark).count()
        print("OK entry")
    except Exception as ex:  # noqa: BLE001
        failures.append("entry")
        print(f"FAIL entry: {str(ex).split(chr(10))[0][:160]}")
    print(f"RESULT: {'ALL OK' if not failures else f'{len(failures)} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
