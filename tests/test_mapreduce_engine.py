"""The generic MapReduce fidelity layer: programming-model parity with
the reference (map/emit + reduce/emit, config-driven job, sorted
partitioned text output)."""

from __future__ import annotations

import os
from collections import Counter

from mapreduceinfrastructure_spark.operators import mapreduce as mr
from mapreduceinfrastructure_spark.sinks.textsink import write_sorted_kv_text


def python_wordcount(lines: list[str]) -> Counter:
    """Independent strtok-faithful oracle."""
    c: Counter = Counter()
    for line in lines:
        for tok in line.replace(",", " ").replace(".", " ").replace('"', " ").replace("'", " ").split():
            c[tok] += 1
    return c


def test_strtok_semantics():
    # consecutive delimiters yield no empty tokens (user_tasks.cc:15-21)
    assert list(mr.wordcount_map('a,,b.."c"  d\'')) == [
        ("a", "1"), ("b", "1"), ("c", "1"), ("d", "1"),
    ]
    assert list(mr.wordcount_map("")) == []
    assert list(mr.wordcount_map(" ,.\"'")) == []


def test_registry_refuses_duplicates():
    assert mr.register_tasks("wordcount", mr.wordcount_map, mr.wordcount_reduce) is False


def test_map_reduce_matches_builtin(spark, sf_dir):
    """word_count through the generic engine == built-in word_count."""
    from mapreduceinfrastructure_spark.operators.text_analysis import word_count

    got = {
        (r["word"], r["cnt"]) for r in mr.word_count_mr(spark, sf_dir).collect()
    }
    want = {(r["word"], r["cnt"]) for r in word_count(spark, sf_dir).collect()}
    assert got == want


def test_run_job_end_to_end(spark, tmp_path):
    """Full MapReduce::run parity: config file -> sorted R-file output."""
    lines = [
        "the quick brown fox",
        "the lazy dog, the end.",
        'quick "quotes" and \'apostrophes\' here',
        "",
        "fox fox fox",
    ]
    inp = tmp_path / "input.txt"
    inp.write_text("\n".join(lines) + "\n")
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    config = tmp_path / "config.ini"
    config.write_text(
        "n_workers=6\n"
        "worker_ipaddr_ports=localhost:50051,localhost:50052\n"
        f"input_files={inp}\n"
        f"output_dir={out_dir}\n"
        "n_output_files=4\n"
        "map_kilobytes=500\n"
        "user_id=wordcount\n"
    )
    spec = mr.read_spec_from_config_file(str(config))
    assert spec.n_output_files == 4 and spec.user_id == "wordcount"
    assert mr.validate_spec(spec)

    mr.run_job(spark, spec)

    files = sorted(os.listdir(out_dir))
    assert files == [f"wordcount_result_{r}" for r in range(4)]

    seen: Counter = Counter()
    for fname in files:
        rows = (out_dir / fname).read_text().splitlines()
        keys = [row.split(" ", 1)[0] for row in rows]
        assert keys == sorted(keys), f"{fname} not sorted by key"
        for row in rows:
            k, v = row.split(" ", 1)
            seen[k] += int(v)
    assert seen == python_wordcount(lines)
    # every key lands in exactly one partition file
    all_keys = []
    for fname in files:
        all_keys.extend({r.split(" ", 1)[0] for r in (out_dir / fname).read_text().splitlines()})
    assert len(all_keys) == len(set(all_keys))


def test_invalid_spec_rejected(spark, tmp_path):
    spec = mr.JobSpec(user_id="", input_files=[str(tmp_path / "nope.txt")])
    assert not mr.validate_spec(spec)


def test_sink_empty_partitions(spark, tmp_path):
    """Sink emits exactly R files even when R > #distinct keys."""
    df = spark.createDataFrame([("k", "v")], "key string, value string")
    paths = write_sorted_kv_text(df, str(tmp_path), 5, user_id="u")
    assert len(paths) == 5
    contents = [open(p).read() for p in sorted(paths)]
    assert sum(1 for c in contents if c.strip()) == 1


def test_cli_main_runs_reference_config_shape(spark, tmp_path):
    """The module CLI (python -m mapreduceinfrastructure_spark
    config.ini) — the reference's ./mrdemo entry — must parse the
    reference config format, alias its shipped cs6210 user id onto the
    wordcount task, run, and leave exactly n_output_files sorted text
    files.  Invoked in-process so the already-running test session is
    reused (get_spark getOrCreate)."""
    import glob

    from mapreduceinfrastructure_spark.__main__ import main

    inp = tmp_path / "in.txt"
    inp.write_text("b a a\nc b a\n")
    out_dir = tmp_path / "out"
    config = tmp_path / "config.ini"
    config.write_text(
        "n_workers=2\n"
        "worker_ipaddr_ports=localhost:50051,localhost:50052\n"
        f"input_files={inp}\n"
        f"output_dir={out_dir}\n"
        "n_output_files=3\n"
        "map_kilobytes=500\n"
        "user_id=cs6210\n"
    )
    assert main(["prog", str(config)]) == 0
    parts = sorted(glob.glob(str(out_dir / "wordcount_result_*")))
    assert len(parts) == 3
    kv = {}
    for p in parts:
        lines = open(p).read().splitlines()
        assert lines == sorted(lines)  # per-file sorted contract
        for line in lines:
            k, v = line.split(" ")
            kv[k] = int(v)
    assert kv == {"a": 3, "b": 2, "c": 1}

    # bad argv and bad spec paths return the reference's failure codes
    assert main(["prog"]) == 2
    bad = tmp_path / "bad.ini"
    bad.write_text("user_id=\n")
    assert main(["prog", str(bad)]) == 1
