"""CLI entry point — the reference's ``./mrdemo config.ini`` binary
(test/main.cc:1-16: parse argv[1] as the config path, construct the
MapReduce handle, run, print SUCCESS/FAILURE) as a Python module:

    python -m mapreduceinfrastructure_spark test/config.ini

Reads the reference-format ``key=value`` config, runs the registered
``user_id`` task over ``input_files`` through the generic MapReduce
engine, and writes ``n_output_files`` sorted ``key value`` text files
into ``output_dir`` — the complete reference user journey on Spark.
The shipped reference task ids resolve through the same registry the
library exposes (wordcount / grep / invidx; ``cs6210`` is aliased to
wordcount, the reference's one shipped user task, user_tasks.cc:59).
"""

from __future__ import annotations

import sys


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print("usage: python -m mapreduceinfrastructure_spark <config.ini>", file=sys.stderr)
        return 2
    from .operators import mapreduce as mr
    from .session import get_spark

    spec = mr.read_spec_from_config_file(argv[1])
    # the reference's shipped example registers under "cs6210"
    # (test/user_tasks.cc:59); map it onto the wordcount task.
    if spec.user_id == "cs6210":
        spec.user_id = "wordcount"
    if not mr.validate_spec(spec):
        print("FAILURE: invalid spec", file=sys.stderr)
        return 1
    spark = get_spark(app_name=f"mri-job-{spec.user_id}")
    try:
        mr.run_job(spark, spec)
    except Exception as exc:  # noqa: BLE001 — mirror mrdemo's FAILURE print
        print(f"FAILURE: {exc}", file=sys.stderr)
        return 1
    print("SUCCESS")  # test/main.cc:13
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
