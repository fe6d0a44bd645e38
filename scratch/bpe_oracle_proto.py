"""Prototype: generated unrolled-CTE DuckDB oracle for bpe_merges,
checked against tests/test_bpe.py's pure-Python reference before it
goes into __spark_entry__.oracle_sql (VERDICT r10 #3)."""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from test_bpe import _reference_bpe  # noqa: E402

K = 20
MIN_PAIR = 2
_D = "'[ ,.\"'']'"


def bpe_sql(k: int, min_pair: int) -> str:
    parts = [
        f"""WITH vw AS (
  SELECT word, count(*) AS freq FROM (
    SELECT unnest(string_split_regex(text, {_D})) AS word FROM documents
  ) WHERE length(word) > 0 GROUP BY word
),
v0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY word) AS wid,
         string_split(word, '') AS s, freq
  FROM vw
)"""
    ]
    finals = []
    for i in range(1, k + 1):
        p = i - 1
        parts.append(f""",
pc{i} AS (
  SELECT s[j] AS l, s[j + 1] AS r, sum(freq) AS cnt
  FROM v{p}, unnest(range(1, len(s))) AS u(j)
  GROUP BY 1, 2
),
b{i} AS MATERIALIZED (
  SELECT l, r, cnt FROM pc{i} WHERE cnt >= {min_pair}
  ORDER BY cnt DESC, l, r LIMIT 1
),
pos{i} AS (
  SELECT wid, freq, unnest(s) AS sym, unnest(range(1, len(s) + 1)) AS pos
  FROM v{p}
),
mt{i} AS (
  SELECT q.wid, q.freq, q.pos, q.sym, b.l || b.r AS tok,
         CASE WHEN q.sym = b.l
               AND lead(q.sym) OVER (PARTITION BY q.wid ORDER BY q.pos) = b.r
              THEN 1 ELSE 0 END AS m
  FROM pos{i} q CROSS JOIN b{i} b
),
pk{i} AS (
  SELECT wid, freq, pos, sym, tok,
         CASE WHEN m = 1 AND (pos - min(pos) OVER (PARTITION BY wid, grp, m)) % 2 = 0
              THEN 1 ELSE 0 END AS picked
  FROM (
    SELECT *, pos - row_number() OVER (PARTITION BY wid, m ORDER BY pos) AS grp
    FROM mt{i}
  )
),
nv{i} AS MATERIALIZED (
  SELECT wid, freq,
         array_agg(CASE WHEN picked = 1 THEN tok ELSE sym END ORDER BY pos)
           FILTER (WHERE dropped = 0) AS s
  FROM (
    SELECT *, coalesce(lag(picked) OVER (PARTITION BY wid ORDER BY pos), 0)
                AS dropped
    FROM pk{i}
  )
  GROUP BY wid, freq
),
v{i} AS MATERIALIZED (
  SELECT wid, s, freq FROM nv{i} WHERE EXISTS (SELECT 1 FROM b{i})
  UNION ALL
  SELECT wid, s, freq FROM v{p} WHERE NOT EXISTS (SELECT 1 FROM b{i})
)""")
        finals.append(
            f'SELECT {p}::BIGINT AS rank, l AS "left", r AS "right",'
            f" cnt::BIGINT AS pair_count FROM b{i}"
        )
    return "\n".join(parts) + "\n" + "\nUNION ALL\n".join(finals)


def main() -> None:
    for sf in ("0.001", "0.01"):
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf{sf}/documents.parquet')"
        )
        got = con.sql(bpe_sql(K, MIN_PAIR) + " ORDER BY rank").fetchall()
        texts = [
            r[0] for r in con.sql("SELECT text FROM documents").fetchall()
        ]
        want = _reference_bpe(texts, K)
        ok = [tuple(g) for g in got] == [tuple(w) for w in want]
        print(f"sf{sf}: rows={len(got)} match={ok}")
        if not ok:
            for g, w in zip(got, want):
                if tuple(g) != tuple(w):
                    print("  first diff: got", g, "want", w)
                    break
            sys.exit(1)


if __name__ == "__main__":
    main()
