"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``mapreduceinfrastructure_spark``; this module
is registry + oracle SQL only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduceinfrastructure_spark.operators import advanced as adv  # noqa: E402
from mapreduceinfrastructure_spark.operators import dedup as dd  # noqa: E402
from mapreduceinfrastructure_spark.operators import graph as gr  # noqa: E402
from mapreduceinfrastructure_spark.operators import mapreduce as mr  # noqa: E402
from mapreduceinfrastructure_spark.operators import multimodal as mm  # noqa: E402
from mapreduceinfrastructure_spark.operators import pipeline as pl  # noqa: E402
from mapreduceinfrastructure_spark.operators import relational as rel  # noqa: E402
from mapreduceinfrastructure_spark.operators import similarity as sim  # noqa: E402
from mapreduceinfrastructure_spark.operators import sketches as sk  # noqa: E402
from mapreduceinfrastructure_spark.operators import text_analysis as ta  # noqa: E402
from mapreduceinfrastructure_spark.operators import sqlapi  # noqa: E402
from mapreduceinfrastructure_spark.operators import timeseries as ts  # noqa: E402
from mapreduceinfrastructure_spark.operators import tpch  # noqa: E402
from mapreduceinfrastructure_spark.streaming import event_stream as es  # noqa: E402

# Delimiter class inside a SQL single-quoted string (the ' is doubled).
_D = "'[ ,.\"'']'"

# Derived part-supplier relation for q2/q11/q20 (no partsupp table in
# the driver data): min/sum over exact doubles, deterministic.
_SQL_PS = """
  ps AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(l_extendedprice / l_quantity) AS ps_supplycost,
           sum(l_quantity) AS ps_availqty
    FROM lineitem GROUP BY 1, 2
  )
"""

# Payload hex of multimodal.make_media_table: the synthetic PNG/JPEG
# container headers (doc_id-derived dims) followed by the UTF-8 text
# bytes, all in the hex-string domain so the oracles never need BLOB
# ops.  Must mirror make_media_table byte for byte.
_MEDIA_HX = """
  med AS (
    SELECT doc_id,
           CASE doc_id % 3
             WHEN 0 THEN '89504E470D0A1A0A0000000D49484452'
                         || lpad(hex(doc_id % 640 + 16), 8, '0')
                         || lpad(hex(doc_id % 480 + 16), 8, '0')
                         || '0806000000DEADBEEF'
             WHEN 1 THEN 'FFD8FFC0001108'
                         || substr(lpad(hex(doc_id % 480 + 16), 8, '0'), 5, 4)
                         || substr(lpad(hex(doc_id % 640 + 16), 8, '0'), 5, 4)
                         || '03012200021101031101'
             ELSE '' END || hex(encode(text)) AS hx
    FROM documents
  )
"""

# Byte-exact reparse of make_media_table payloads: fmt from signature
# bytes, dims/channels from PNG IHDR / JPEG SOF0 fixed hex offsets,
# the documented integer fake for raw payloads.  Shared by the
# multimodal_features oracle and the media_type_profile rollup.
_MEDIA_FEATURES_SQL = f"""
    WITH {_MEDIA_HX},
    g AS (
      SELECT doc_id, hx, (length(hx) // 2)::BIGINT AS n_bytes,
             CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN 'png'
                  WHEN substr(hx, 1, 4) = 'FFD8' THEN 'jpeg'
                  ELSE 'raw' END AS fmt
      FROM med
    ),
    p AS (
      SELECT doc_id, n_bytes, substr(hx, 1, 16) AS head_hex, fmt,
             CASE fmt WHEN 'png' THEN ('0x' || substr(hx, 33, 8))::BIGINT
                      WHEN 'jpeg' THEN ('0x' || substr(hx, 19, 4))::BIGINT
                      ELSE greatest(1, least(1024, n_bytes // 64)) END AS width,
             CASE fmt WHEN 'png' THEN ('0x' || substr(hx, 41, 8))::BIGINT
                      WHEN 'jpeg' THEN ('0x' || substr(hx, 15, 4))::BIGINT
                      ELSE NULL END AS height0,
             CASE fmt WHEN 'png' THEN
                    CASE substr(hx, 51, 2) WHEN '00' THEN 1 WHEN '02' THEN 3
                         WHEN '03' THEN 1 WHEN '04' THEN 2 WHEN '06' THEN 4
                         ELSE 0 END
                  WHEN 'jpeg' THEN ('0x' || substr(hx, 23, 2))::BIGINT
                  ELSE 3 END AS channels
      FROM g
    )
    SELECT doc_id, n_bytes, head_hex, fmt, width,
           coalesce(height0,
                    greatest(1, n_bytes // greatest(1, 3 * width))) AS height,
           channels
    FROM p
"""

# Shared CTE fragments for the DuckDB oracles (token pipelines).
_SQL_PAIRS = f"""
  WITH raw AS (
    SELECT doc_id, unnest(string_split_regex(text, {_D})) AS word FROM documents
  ), pairs AS (SELECT doc_id, word FROM raw WHERE length(word) > 0)
"""
_SQL_TOKS = f"""
  WITH toks AS (
    SELECT doc_id, text,
           list_filter(string_split_regex(text, {_D}), x -> length(x) > 0) AS t
    FROM documents
  )
"""


def _kmeans_iter_sql() -> str:
    """Unrolled Lloyd iterations mirroring similarity.kmeans_iterate:
    the SAME recurrence generated by the same loop — assignment by
    squared-L2 argmin (ties to lower cid), per-cluster inertia rounded
    at 3 BEFORE the global sum (as the Spark driver loop does),
    re-centering by per-(cluster, pos) mean with empty clusters
    carrying their previous centroid, max centroid shift, and the
    count of vectors whose assignment changed."""
    from mapreduceinfrastructure_spark.operators import similarity as _sim

    k, iters = _sim.KMEANS_K, _sim.KMEANS_ITERS
    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),",
        f"c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {k})",
    ]
    finals = []
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f""",
p{i} AS (
  SELECT e.vec_id, e.v, c.cid,
         list_sum(list_transform(range(1, len(e.v) + 1),
             q -> (e.v[q] - c.c[q]) * (e.v[q] - c.c[q]))) AS d2
  FROM e CROSS JOIN c{p} c
),
a{i} AS (
  SELECT vec_id, v, cid, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM p{i}
  ) WHERE rn = 1
),
i{i} AS (
  SELECT round(sum(cl), 3) AS inertia FROM (
    SELECT cid, round(sum(d2), 3) AS cl FROM a{i} GROUP BY cid
  )
),
nc{i} AS (
  SELECT cid, array_agg(nv ORDER BY pos) AS c FROM (
    SELECT cid, pos, avg(val) AS nv FROM (
      SELECT cid, unnest(v) AS val, unnest(range(1, len(v) + 1)) AS pos
      FROM a{i}
    ) GROUP BY cid, pos
  ) GROUP BY cid
),
c{i} AS (
  SELECT c{p}.cid, coalesce(nc{i}.c, c{p}.c) AS c
  FROM c{p} LEFT JOIN nc{i} ON c{p}.cid = nc{i}.cid
),
s{i} AS (
  SELECT round(max(sqrt(list_sum(list_transform(range(1, len(a.c) + 1),
             q -> (a.c[q] - b.c[q]) * (a.c[q] - b.c[q]))))), 6) AS max_shift
  FROM c{i} a JOIN c{p} b ON a.cid = b.cid
),
m{i} AS (
  SELECT count(*) AS n_moved FROM a{i}""" + (
            "" if i == 1 else f"""
  JOIN a{p} USING (vec_id) WHERE a{i}.cid <> a{p}.cid"""
        ) + """
)""")
        finals.append(
            f"SELECT {i}::BIGINT AS iteration, i{i}.inertia,"
            f" m{i}.n_moved::BIGINT AS n_moved, s{i}.max_shift"
            f" FROM i{i}, m{i}, s{i}"
        )
    return "\n".join(parts) + "\n" + "\nUNION ALL\n".join(finals)


def _ann_lsh_sql() -> str:
    """Exact DuckDB twin of similarity.ann_lsh at ANY corpus size up to
    ORACLE_MAX_VECTORS (~33.5M) — VERDICT r10 #4 removed the old
    8192-vector regime cliff.  The FULL seed-42 plane pool
    (N_TABLES x POOL_BPT planes, the same lsh_plane_pool the operator
    indexes) is embedded as exact double literals (shortest-repr
    round-trips bit-exactly in both engines), and ``bpt`` is computed
    from count(*) IN SQL by the same max(floor, ceil(log2(n/target)))
    rule as _bits_per_table — so the oracle tracks the adaptive width
    instead of assuming the floor.  Table t's bit k reads pool plane
    t*POOL_BPT + k (the bpt-independent mapping), and each plane dot
    product is the SAME left fold over the SAME elementwise products
    as the Spark zip_with+aggregate expression — list_reduce with a
    prepended 0.0 seed — so the sign bits, bucket ids, multiprobe
    keys, and therefore the whole candidate set are bit-identical,
    not merely close (VERDICT r9 #3 retired the operator's rows-only
    status; the beyond-floor regime is pinned by
    tests/test_round11_ops.py against a 20k-vector corpus at bpt=6).
    Only the final cosine uses list_cosine_similarity, the same
    already-banked pairing as cosine_topk (round-6 output; rank ties
    broken by neighbor id)."""
    planes = sim.lsh_plane_pool()
    flat = ", ".join(repr(x) for row in planes for x in row)
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        prm AS (
          SELECT greatest({sim.BITS_FLOOR}, CAST(ceil(log2(greatest(1.0,
                   count(*) / {sim.TARGET_OCCUPANCY}.0))) AS BIGINT)) AS bpt
          FROM e
        ),
        pl AS (SELECT [{flat}]::DOUBLE[] AS p),
        bits AS (
          SELECT vec_id, v, bpt,
                 list_transform(range(0, {sim.N_TABLES} * bpt), i ->
                   CASE WHEN list_reduce(
                          [0.0] || list_transform(v,
                            (x, j) -> x * p[((i // bpt) * {sim.POOL_BPT}
                                             + (i % bpt)) * {sim.EMBED_DIM} + j]),
                          (acc, x) -> acc + x) > 0
                        THEN 1 ELSE 0 END) AS bt
          FROM e, pl, prm
        ),
        keyed AS (
          SELECT vec_id, v, bpt, t AS tbl,
                 CAST(list_sum(list_transform(range(0, bpt), k ->
                   bt[t * bpt + k + 1] * (1::BIGINT << k))) AS BIGINT) AS bucket
          FROM bits, unnest(range(0, {sim.N_TABLES})) AS ut(t)
        ),
        probes AS (
          SELECT vec_id AS qid, v AS qv, tbl,
                 CASE WHEN f = 0 THEN bucket
                      ELSE xor(bucket, (1::BIGINT << (f - 1))) END AS bucket
          FROM keyed, unnest(range(0, bpt + 1)) AS uf(f)
          WHERE vec_id < {sim.N_QUERIES}
        ),
        cand AS (
          SELECT DISTINCT p.qid, p.qv, k.vec_id, k.v
          FROM probes p JOIN keyed k USING (tbl, bucket)
          WHERE k.vec_id <> p.qid
        ),
        r AS (
          SELECT qid, vec_id AS neighbor_id,
                 list_cosine_similarity(qv, v) AS sim,
                 row_number() OVER (
                   PARTITION BY qid
                   ORDER BY list_cosine_similarity(qv, v) DESC, vec_id) AS rn
          FROM cand
        )
        SELECT qid, neighbor_id, round(sim, 6) AS cosine, rn
        FROM r WHERE rn <= {sim.TOPK}
    """


def _ann_ivf_sql() -> str:
    """Unrolled DuckDB twin of similarity.ann_ivf (VERDICT r9 #4),
    following _kmeans_iter_sql's pattern: the IVF coarse quantizer's
    deterministic recurrence — seed centroids at vec_id % N_CLUSTERS_MOD
    = 0, LLOYD_ITERATIONS argmin/mean refinements (a cluster that loses
    all members DROPS from the centroid table, exactly as the Spark
    groupBy-means rebuild does — no coalesce back), a final assignment
    pass — then the NPROBE nearest-centroid probes per query and the
    exact-cosine top-K within the probed clusters.  Squared distances
    use the same left-fold order as the Spark zip_with+aggregate
    expression; centroid means are avg() in both engines (the
    already-banked kmeans_iterate pairing)."""
    k_mod, iters = sim.N_CLUSTERS_MOD, sim.LLOYD_ITERATIONS

    def d2(v: str, c: str) -> str:
        return (
            f"list_reduce([0.0] || list_transform(range(1, len({v}) + 1), "
            f"j -> ({v}[j] - {c}[j]) * ({v}[j] - {c}[j])), "
            "(acc, x) -> acc + x)"
        )

    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),",
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {k_mod} = 0)",
    ]
    # iterations 1..iters refine centroids; pass iters+1 is the final
    # assignment the Spark operator returns (nearest(cents) after the loop)
    for i in range(1, iters + 2):
        parts.append(f""",
        a{i} AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY {d2('e.v', 'c.cv')}, c.cid) AS rn
            FROM e CROSS JOIN c{i - 1} c
          ) WHERE rn = 1
        )""")
        if i <= iters:
            parts.append(f""",
        c{i} AS (
          SELECT cid, array_agg(nv ORDER BY pos) AS cv FROM (
            SELECT cid, pos, avg(val) AS nv FROM (
              SELECT cid, unnest(v) AS val,
                     unnest(range(1, len(v) + 1)) AS pos
              FROM a{i}
            ) GROUP BY cid, pos
          ) GROUP BY cid
        )""")
    fin = iters + 1
    parts.append(f""",
        q AS (SELECT vec_id AS qid, v AS qv FROM a{fin} WHERE vec_id < {sim.N_QUERIES}),
        qp AS (
          SELECT qid, qv, cid FROM (
            SELECT q.qid, q.qv, c.cid,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY {d2('q.qv', 'c.cv')}, c.cid) AS rn
            FROM q CROSS JOIN c{iters} c
          ) WHERE rn <= {sim.NPROBE}
        ),
        cand AS (
          SELECT qp.qid, qp.qv, a.vec_id, a.v
          FROM qp JOIN a{fin} a USING (cid)
          WHERE a.vec_id <> qp.qid
        ),
        r AS (
          SELECT qid, vec_id AS neighbor_id,
                 list_cosine_similarity(qv, v) AS sim,
                 row_number() OVER (
                   PARTITION BY qid
                   ORDER BY list_cosine_similarity(qv, v) DESC, vec_id) AS rn
          FROM cand
        )
        SELECT qid, neighbor_id, round(sim, 6) AS cosine, rn
        FROM r WHERE rn <= {sim.TOPK}""")
    return "\n".join(parts)


def _ann_probe_sweep_core_sql() -> str:
    """Unrolled twin of the rank-list half of similarity.ann_probe_sweep
    (r15, VERDICT r14 #4): _ann_ivf_sql's deterministic-Lloyd chain,
    but the probe CTE keeps every cell rank up to max(ANN_PROBE_SET)
    and the per-cell candidates sweep all operating points via a level
    join (nprobe >= cr) before one per-(nprobe, qid) top-K — the same
    one-fetch-many-points shape as the Spark explode.  Emits (nprobe,
    qid, neighbor_id) rows; the recall report composes on top (the
    ann_recall_report pattern)."""
    k_mod, iters = sim.N_CLUSTERS_MOD, sim.LLOYD_ITERATIONS

    def d2(v: str, c: str) -> str:
        return (
            f"list_reduce([0.0] || list_transform(range(1, len({v}) + 1), "
            f"j -> ({v}[j] - {c}[j]) * ({v}[j] - {c}[j])), "
            "(acc, x) -> acc + x)"
        )

    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),",
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {k_mod} = 0)",
    ]
    for i in range(1, iters + 2):
        parts.append(f""",
        a{i} AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY {d2('e.v', 'c.cv')}, c.cid) AS rn
            FROM e CROSS JOIN c{i - 1} c
          ) WHERE rn = 1
        )""")
        if i <= iters:
            parts.append(f""",
        c{i} AS (
          SELECT cid, array_agg(nv ORDER BY pos) AS cv FROM (
            SELECT cid, pos, avg(val) AS nv FROM (
              SELECT cid, unnest(v) AS val,
                     unnest(range(1, len(v) + 1)) AS pos
              FROM a{i}
            ) GROUP BY cid, pos
          ) GROUP BY cid
        )""")
    fin = iters + 1
    pmax = max(sim.ANN_PROBE_SET)
    lv = ", ".join(str(p) for p in sim.ANN_PROBE_SET)
    parts.append(f""",
        q AS (SELECT vec_id AS qid, v AS qv FROM a{fin}
              WHERE vec_id < {sim.N_QUERIES}),
        qp AS (
          SELECT qid, qv, cid, rn AS cr FROM (
            SELECT q.qid, q.qv, c.cid,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY {d2('q.qv', 'c.cv')}, c.cid) AS rn
            FROM q CROSS JOIN c{iters} c
          ) WHERE rn <= {pmax}
        ),
        cand AS (
          SELECT qp.qid, qp.qv, qp.cr, a.vec_id, a.v
          FROM qp JOIN a{fin} a USING (cid)
          WHERE a.vec_id <> qp.qid
        ),
        lvls AS (SELECT unnest([{lv}]) AS nprobe),
        r AS (
          SELECT lvls.nprobe, c.qid, c.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY lvls.nprobe, c.qid
                   ORDER BY list_cosine_similarity(c.qv, c.v) DESC,
                            c.vec_id) AS rn
          FROM cand c JOIN lvls ON lvls.nprobe >= c.cr
        )
        SELECT nprobe::BIGINT AS nprobe, qid, neighbor_id
        FROM r WHERE rn <= {sim.TOPK}""")
    return "\n".join(parts)


def _filtered_ann_postfilter_core_sql() -> str:
    """Unrolled twin of the post-filtered IVF leg of
    similarity.filtered_ann_recall_report (r15): _ann_ivf_sql's
    deterministic-Lloyd chain, the lang attach (doc_id = vec_id), the
    NPROBE probe selection, candidates filtered to the query's
    language AFTER the cell prefilter, and the per-qid exact-cosine
    top-K ((sim desc, neighbor_id) ties).  Emits (qid, neighbor_id)
    rows; the recall report composes on top."""
    k_mod, iters = sim.N_CLUSTERS_MOD, sim.LLOYD_ITERATIONS

    def d2(v: str, c: str) -> str:
        return (
            f"list_reduce([0.0] || list_transform(range(1, len({v}) + 1), "
            f"j -> ({v}[j] - {c}[j]) * ({v}[j] - {c}[j])), "
            "(acc, x) -> acc + x)"
        )

    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),",
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {k_mod} = 0)",
    ]
    for i in range(1, iters + 2):
        parts.append(f""",
        a{i} AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY {d2('e.v', 'c.cv')}, c.cid) AS rn
            FROM e CROSS JOIN c{i - 1} c
          ) WHERE rn = 1
        )""")
        if i <= iters:
            parts.append(f""",
        c{i} AS (
          SELECT cid, array_agg(nv ORDER BY pos) AS cv FROM (
            SELECT cid, pos, avg(val) AS nv FROM (
              SELECT cid, unnest(v) AS val,
                     unnest(range(1, len(v) + 1)) AS pos
              FROM a{i}
            ) GROUP BY cid, pos
          ) GROUP BY cid
        )""")
    fin = iters + 1
    parts.append(f""",
        dl AS (SELECT doc_id AS vec_id, lang FROM documents),
        ca AS (SELECT a.vec_id, a.v, a.cid, dl.lang
               FROM a{fin} a JOIN dl USING (vec_id)),
        q AS (SELECT vec_id AS qid, v AS qv, lang AS qlang FROM ca
              WHERE vec_id < {sim.N_QUERIES}),
        qp AS (
          SELECT qid, qv, qlang, cid FROM (
            SELECT q.qid, q.qv, q.qlang, c.cid,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY {d2('q.qv', 'c.cv')}, c.cid) AS rn
            FROM q CROSS JOIN c{iters} c
          ) WHERE rn <= {sim.NPROBE}
        ),
        cand AS (
          SELECT qp.qid, qp.qv, ca.vec_id, ca.v
          FROM qp JOIN ca USING (cid)
          WHERE ca.vec_id <> qp.qid AND ca.lang = qp.qlang
        ),
        r AS (
          SELECT qid, vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY qid
                   ORDER BY list_cosine_similarity(qv, v) DESC,
                            vec_id) AS rn
          FROM cand
        )
        SELECT qid, neighbor_id FROM r WHERE rn <= {sim.TOPK}""")
    return "\n".join(parts)


_CM_ORACLE = f"""
            {_SQL_TOKS},
            words AS (SELECT unnest(t) AS w FROM toks),
            sketch AS (
              SELECT j, ('0x' || substr(md5(j::VARCHAR || w), 1, 8))::BIGINT % {sk.CM_W} AS c,
                     count(*) AS n
              FROM words, unnest(range(0, {sk.CM_D})) AS u(j)
              GROUP BY 1, 2
            ),
            counts AS (SELECT w, count(*) AS exact_cnt FROM words GROUP BY w),
            top AS (
              SELECT w, exact_cnt FROM counts
              ORDER BY exact_cnt DESC, w ASC LIMIT {sk.CM_TOP_K}
            ),
            probes AS (
              SELECT w, exact_cnt, j,
                     ('0x' || substr(md5(j::VARCHAR || w), 1, 8))::BIGINT % {sk.CM_W} AS c
              FROM top, unnest(range(0, {sk.CM_D})) AS u(j)
            )
            SELECT p.w, CAST(max(p.exact_cnt) AS BIGINT) AS exact_cnt,
                   CAST(min(s.n) AS BIGINT) AS cm_estimate,
                   CAST(min(s.n) - max(p.exact_cnt) AS BIGINT) AS overestimate
            FROM probes p JOIN sketch s ON p.j = s.j AND p.c = s.c
            GROUP BY p.w
        """


_QSK_ORACLE = f"""
            WITH toks AS (
              SELECT doc_id, source, text,
                     list_filter(string_split_regex(text, '[ ,."'']'),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            m AS (
              SELECT doc_id, source,
                     round(least(1.0, len(t) / 100.0) * 0.5
                           + (1.0 - length(regexp_replace(text, '[^,.]', '', 'g'))::DOUBLE
                                    / greatest(length(text), 1)) * 0.3
                           + least(1.0,
                               (coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                                / greatest(len(t), 1)) / 8.0) * 0.2, 6) AS q
              FROM toks
            ),
            binned AS (
              SELECT source, q,
                     least({sk.QSK_BINS - 1}, floor(q * {sk.QSK_BINS}))::INT AS b
              FROM m
            ),
            cells AS (SELECT source, b, count(*) AS cnt FROM binned GROUP BY 1, 2),
            cum AS (
              SELECT source, b, cnt,
                     sum(cnt) OVER (PARTITION BY source ORDER BY b
                                    ROWS UNBOUNDED PRECEDING) AS cum,
                     sum(cnt) OVER (PARTITION BY source) AS n
              FROM cells
            ),
            sk_est AS (
              SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
                     max(CASE WHEN cum >= greatest(1, ceil(0.5 * n))
                               AND cum - cnt < greatest(1, ceil(0.5 * n))
                          THEN round((b + (greatest(1, ceil(0.5 * n)) - (cum - cnt))::DOUBLE / cnt)
                                     / {sk.QSK_BINS}, 6) END) AS p50_est,
                     max(CASE WHEN cum >= greatest(1, ceil(0.9 * n))
                               AND cum - cnt < greatest(1, ceil(0.9 * n))
                          THEN round((b + (greatest(1, ceil(0.9 * n)) - (cum - cnt))::DOUBLE / cnt)
                                     / {sk.QSK_BINS}, 6) END) AS p90_est
              FROM cum GROUP BY source
            ),
            r AS (
              SELECT source, q,
                     row_number() OVER (PARTITION BY source ORDER BY q, doc_id) AS rn,
                     count(*) OVER (PARTITION BY source) AS n
              FROM m
            ),
            ex AS (
              SELECT source,
                     max(CASE WHEN rn = greatest(1, ceil(0.5 * n)) THEN q END) AS p50_exact,
                     max(CASE WHEN rn = greatest(1, ceil(0.9 * n)) THEN q END) AS p90_exact
              FROM r GROUP BY source
            )
            SELECT s.source, s.n_docs, s.p50_est, ex.p50_exact, s.p90_est, ex.p90_exact,
                   round(abs(s.p50_est - ex.p50_exact), 6) AS err_p50,
                   round(abs(s.p90_est - ex.p90_exact), 6) AS err_p90
            FROM sk_est s JOIN ex ON s.source = ex.source
        """


_CUSTOM_SESSIONS_ORACLE = """
            WITH e AS (
              SELECT user_id, value,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id,
                   CAST(sum(brk) AS BIGINT) AS n_sessions,
                   count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM e GROUP BY user_id
        """


def _lpa_sql() -> str:
    """Exact oracle for ``graph.label_prop_iterate``: the LPA_ITERS
    synchronous rounds unrolled as a generated l0..lN CTE chain, the
    _pagerank_sql pattern applied to the integer-deterministic LPA
    update (argmax = row_number over (wsum DESC, lbl ASC), exactly
    label_prop_step's tiebreak)."""
    n = gr.LPA_ITERS
    parts = ["""
      WITH e AS MATERIALIZED (
        SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2
      ),
      und AS MATERIALIZED (
        SELECT src, dst, w FROM e
        UNION ALL
        SELECT dst AS src, src AS dst, w FROM e
      ),
      l0 AS (SELECT DISTINCT dst AS node, dst AS lbl FROM und)"""]
    for i in range(1, n + 1):
        parts.append(f""",
      c{i} AS (
        SELECT u.dst AS node, l.lbl AS lbl, sum(u.w) AS wsum
        FROM und u JOIN l{i - 1} l ON u.src = l.node
        GROUP BY 1, 2
      ),
      l{i} AS (
        SELECT node, lbl FROM (
          SELECT node, lbl,
                 row_number() OVER (PARTITION BY node
                                    ORDER BY wsum DESC, lbl ASC) AS rn
          FROM c{i}
        ) WHERE rn = 1
      ),
      s{i} AS (
        SELECT {i} AS iteration,
               (SELECT count(*) FROM l{i} a JOIN l{i - 1} b USING (node)
                WHERE a.lbl != b.lbl) AS n_changed,
               (SELECT count(DISTINCT lbl) FROM l{i}) AS n_communities,
               (SELECT max(c) FROM (SELECT count(*) AS c FROM l{i}
                                    GROUP BY lbl)) AS largest_community
      )""")
    union = "\n      UNION ALL\n".join(
        f"      SELECT CAST(iteration AS BIGINT) AS iteration, "
        f"CAST(n_changed AS BIGINT) AS n_changed, "
        f"CAST(n_communities AS BIGINT) AS n_communities, "
        f"CAST(largest_community AS BIGINT) AS largest_community FROM s{i}"
        for i in range(1, n + 1)
    )
    return "".join(parts) + "\n" + union


def _kcore_sql() -> str:
    """Exact oracle for ``graph.kcore_peel``: the KCORE_ROUNDS peel
    rounds unrolled as a generated e0..eN / s1..sN CTE chain (the
    _lpa_sql pattern) over the same COPURCHASE_MIN_W co-purchase edge
    set; every trajectory quantity is an integer, so the hash gate is
    exact.  Unrolling runs every round even after the fixpoint — a
    converged graph peels as a no-op, matching the Spark padding."""
    k, w, n = gr.KCORE_K, gr.COPURCHASE_MIN_W, gr.KCORE_ROUNDS
    parts = [f"""
      WITH op AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      ),
      e0 AS MATERIALIZED (
        SELECT a.pk AS pa, b.pk AS pb
        FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2 HAVING count(*) >= {w}
      ),
      n0 AS (
        SELECT count(DISTINCT x) AS c
        FROM (SELECT pa AS x FROM e0 UNION ALL SELECT pb FROM e0)
      )"""]
    for i in range(1, n + 1):
        parts.append(f""",
      k{i} AS (
        SELECT x FROM (
          SELECT x, count(*) AS d
          FROM (SELECT pa AS x FROM e{i - 1} UNION ALL SELECT pb FROM e{i - 1})
          GROUP BY x
        ) WHERE d >= {k}
      ),
      e{i} AS MATERIALIZED (
        SELECT pa, pb FROM e{i - 1}
        WHERE pa IN (SELECT x FROM k{i}) AND pb IN (SELECT x FROM k{i})
      ),
      n{i} AS (
        SELECT count(DISTINCT x) AS c
        FROM (SELECT pa AS x FROM e{i} UNION ALL SELECT pb FROM e{i})
      ),
      s{i} AS (
        SELECT {i} AS iteration,
               (SELECT c FROM n{i - 1}) - (SELECT c FROM n{i}) AS n_removed,
               (SELECT c FROM n{i}) AS n_nodes,
               (SELECT count(*) FROM e{i}) AS n_edges
      )""")
    union = "\n      UNION ALL\n".join(
        f"      SELECT CAST(iteration AS BIGINT) AS iteration, "
        f"CAST(n_removed AS BIGINT) AS n_removed, "
        f"CAST(n_nodes AS BIGINT) AS n_nodes, "
        f"CAST(n_edges AS BIGINT) AS n_edges FROM s{i}"
        for i in range(1, n + 1)
    )
    return "".join(parts) + "\n" + union


def _pagerank_sql() -> str:
    """Exact oracle for ``graph.pagerank_nations``: the 10 fixed
    iterations unrolled as a generated r0..r10 CTE chain (no recursive
    CTE needed for a fixed-iteration algorithm).  Term order mirrors the
    Spark expression — (1-d)/n + d·dm/n + d·inflow — and the final
    round(…, 6) absorbs the ~1e-15 cross-engine float-summation drift."""
    d = gr.DAMPING
    base = repr(1.0 - d)
    head = """
      WITH edges AS MATERIALIZED (
        SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2
      ),
      out_w AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
      trans AS MATERIALIZED (
        SELECT e.src, e.dst, e.w::DOUBLE / e_ow.ow AS p
        FROM edges e JOIN out_w e_ow ON e.src = e_ow.src
      ),
      nodes AS MATERIALIZED (
        SELECT DISTINCT src AS node FROM edges
        UNION SELECT DISTINCT dst FROM edges
      ),
      nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
      dang AS MATERIALIZED (
        SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM edges)
      ),
      r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)
    """
    steps = []
    for k in range(gr.ITERATIONS):
        steps.append(f"""
      r{k + 1} AS MATERIALIZED (
        SELECT nd.node,
               {base}::DOUBLE / (SELECT n FROM nn)
               + {d!r}::DOUBLE * (
                   SELECT COALESCE(sum(r.rank), 0)
                   FROM r{k} r JOIN dang ON r.node = dang.node
                 ) / (SELECT n FROM nn)
               + {d!r}::DOUBLE * COALESCE(inf.s, 0) AS rank
        FROM nodes nd
        LEFT JOIN (
          SELECT t.dst AS node, sum(t.p * r.rank) AS s
          FROM trans t JOIN r{k} r ON t.src = r.node
          GROUP BY t.dst
        ) inf ON nd.node = inf.node
      )""")
    tail = f"""
      SELECT r.node, n.n_name, round(r.rank, 6) AS rank
      FROM r{gr.ITERATIONS} r JOIN nation n ON r.node = n.n_nationkey
    """
    return head + "," + ",".join(steps) + tail


def _pagerank_docs_sql() -> str:
    """Exact oracle for ``graph.pagerank_docs``: the PR_DOC_ITERS
    fixed rounds unrolled over the doc-similarity edge set — the SAME
    uncapped all-pairs Jaccard >= PREFIX_JACCARD_T twin that gates
    prefix_filter_neardup, symmetrized; no dangling term (every node
    of an undirected pair graph has out-edges).  round(rank, 6)
    absorbs the ~1e-14 cross-engine float-summation drift (the
    _pagerank_sql convention)."""
    d = gr.DAMPING
    head = f"""
      {_SQL_TOKS},
      sh AS MATERIALIZED (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
        FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
      ),
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      pairs AS MATERIALIZED (
        SELECT da, db, i::DOUBLE / (ca.n + cb.n - i) AS w
        FROM inter
        JOIN cnt ca ON da = ca.doc_id
        JOIN cnt cb ON db = cb.doc_id
        WHERE i::DOUBLE / (ca.n + cb.n - i) >= {dd.PREFIX_JACCARD_T}
      ),
      und AS MATERIALIZED (
        SELECT da AS src, db AS dst, w FROM pairs
        UNION ALL
        SELECT db AS src, da AS dst, w FROM pairs
      ),
      out_w AS (SELECT src, sum(w) AS ow FROM und GROUP BY src),
      trans AS MATERIALIZED (
        SELECT u.src, u.dst, u.w / o.ow AS p
        FROM und u JOIN out_w o ON u.src = o.src
      ),
      nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM und),
      nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
      r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)
    """
    steps = []
    for k in range(gr.PR_DOC_ITERS):
        steps.append(f"""
      r{k + 1} AS MATERIALIZED (
        SELECT nd.node,
               {1.0 - d!r}::DOUBLE / (SELECT n FROM nn)
               + {d!r}::DOUBLE * COALESCE(inf.s, 0) AS rank
        FROM nodes nd
        LEFT JOIN (
          SELECT t.dst AS node, sum(t.p * r.rank) AS s
          FROM trans t JOIN r{k} r ON t.src = r.node
          GROUP BY t.dst
        ) inf ON nd.node = inf.node
      )""")
    tail = f"""
      SELECT CAST(node AS BIGINT) AS doc_id, round(rank, 6) AS rank
      FROM r{gr.PR_DOC_ITERS}
    """
    return head + "," + ",".join(steps) + tail


def _sssp_sql() -> str:
    """Exact oracle for ``graph.sssp_parts``: the SSSP_ROUNDS
    Bellman-Ford relaxations unrolled as d0..dN CTEs over the same
    weighted co-purchase edge set, same integer cost (max_w + 1 − w),
    same min-merge — all integers, the 5th exactly-verified iterative
    algorithm's twin (the _kcore_sql convention)."""
    head = f"""
      WITH op AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      ),
      e0 AS (
        SELECT a.pk AS pa, b.pk AS pb, count(*)::BIGINT AS w
        FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2 HAVING count(*) >= {gr.COPURCHASE_MIN_W}
      ),
      mx AS (SELECT max(w) AS mw FROM e0),
      und AS MATERIALIZED (
        SELECT pa AS u, pb AS v, (mw + 1 - w)::BIGINT AS c FROM e0, mx
        UNION ALL
        SELECT pb AS u, pa AS v, (mw + 1 - w)::BIGINT AS c FROM e0, mx
      ),
      srcn AS (
        SELECT arg_max(u, d * 1000000000000 - u) AS s FROM (
          SELECT u, count(*)::BIGINT AS d FROM und GROUP BY u
        )
      ),
      d0 AS (
        SELECT s::BIGINT AS node, 0::BIGINT AS dist FROM srcn
        WHERE s IS NOT NULL
      )
    """
    steps = []
    for k in range(gr.SSSP_ROUNDS):
        steps.append(f"""
      d{k + 1} AS MATERIALIZED (
        SELECT node, min(dist)::BIGINT AS dist FROM (
          SELECT node, dist FROM d{k}
          UNION ALL
          SELECT e.v AS node, d.dist + e.c AS dist
          FROM d{k} d JOIN und e ON d.node = e.u
        ) GROUP BY node
      )""")
    tail = f"""
      SELECT node, dist FROM d{gr.SSSP_ROUNDS}
    """
    return head + "," + ",".join(steps) + tail


def _simhash_cte() -> str:
    """Shared sketch CTE chain for the SimHash oracles (VERDICT r8 #3
    retired this family's rows-only status): the SAME md5-derived 64
    hash bits as dedup.simhash (lo = first 12 md5 hex chars / 48 bits,
    hi = next 4 / 16 bits — sketches._hash48 extended one segment),
    the same ±1 vote sums and majority bit assembly — all integer
    arithmetic, bit-identical across engines (bit 63 via the two's-
    complement MIN_VALUE literal, mirroring Spark's shiftleft(1,63)).
    Ends with ``sk(doc_id, n_tokens, simhash)`` covering EVERY doc
    (zero-token docs sketch to 0, like Spark's explode_outer)."""
    votes = ",\n                   ".join(
        "sum((((h{src} >> {sh}) & 1) * 2 - 1))::BIGINT AS b{i}".format(
            src="lo" if i < 48 else "hi", sh=i if i < 48 else i - 48, i=i
        )
        for i in range(64)
    )
    bit_vals = [str(1 << i) for i in range(63)] + [
        "(-9223372036854775807 - 1)"
    ]
    sketch = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {bv}::BIGINT ELSE 0 END)"
        for i, bv in enumerate(bit_vals)
    )
    return f"""
      {_SQL_TOKS},
      tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
      hsh AS (SELECT doc_id,
                     ('0x' || substr(md5(tok), 1, 12))::BIGINT AS hlo,
                     ('0x' || substr(md5(tok), 13, 4))::BIGINT AS hhi
              FROM tok),
      v AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
                   {votes}
            FROM hsh GROUP BY doc_id),
      sk AS MATERIALIZED (
        SELECT d.doc_id,
               coalesce(v.n_tokens, 0)::BIGINT AS n_tokens,
               coalesce({sketch}, 0)::BIGINT AS simhash
        FROM documents d LEFT JOIN v ON d.doc_id = v.doc_id
      )
    """


def _simhash_sql() -> str:
    """Exact oracle for ``dedup.simhash`` — the shared sketch CTE."""
    return f"""
      {_simhash_cte()}
      SELECT doc_id, n_tokens, simhash FROM sk
    """


def _simhash_neardup_sql() -> str:
    """Exact oracle for ``dedup.simhash_neardup``: identical sketches
    (shared CTE), the same 4×16-bit block candidate join, the same
    bit_count(xor) <= 3 verify — DuckDB's >> is arithmetic on BIGINT
    exactly like Spark's shiftright (empirically cross-checked on
    negative sketches), so block values match bit-for-bit."""
    return f"""
      {_simhash_cte()},
      blocks AS MATERIALIZED (
        SELECT doc_id, simhash, blk, (simhash >> (16 * blk::INT)) & 65535 AS val
        FROM sk, range(0, {dd.SIMHASH_BLOCKS}) r(blk)
        WHERE n_tokens > 0
      ),
      prs AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
               a.simhash AS sa, b.simhash AS sb
        FROM blocks a
        JOIN blocks b ON a.blk = b.blk AND a.val = b.val
                     AND a.doc_id < b.doc_id
      )
      SELECT da, db, bit_count(xor(sa, sb))::BIGINT AS hamming
      FROM prs WHERE bit_count(xor(sa, sb)) <= {dd.SIMHASH_HAMMING_MAX}
    """


def _minhash_lsh_sql() -> str:
    """Exact oracle for ``dedup.minhash_lsh_neardup`` (VERDICT r8 #3):
    recomputes the md5-derived universal-hash signatures h_i =
    (A_i·hash48(shingle) + B_i) mod MH_PRIME, the base-MH_BAND_MULT
    band-bucket fold, the band-collision candidates, and the exact
    Jaccard verify at 0.5 — so the BANDING ITSELF is oracle-verified,
    not just the verified pairs (the candidate set is deterministic
    integer arithmetic in both engines)."""
    k = dd.MINHASH_BANDS * dd.MINHASH_ROWS
    p = dd.MH_PRIME
    mins = ",\n               ".join(
        f"min(({dd.MH_A[i]} * x + {dd.MH_B[i]}) % {p}) AS h{i}"
        for i in range(k)
    )
    band_rows = []
    for b in range(dd.MINHASH_BANDS):
        cols = [f"h{b * dd.MINHASH_ROWS + r}" for r in range(dd.MINHASH_ROWS)]
        expr = cols[0]
        for c in cols[1:]:
            expr = f"(({expr}) * {dd.MH_BAND_MULT} + {c}) % {p}"
        band_rows.append(
            f"SELECT doc_id, {b} AS band, {expr} AS bucket FROM sig"
        )
    bands = "\n        UNION ALL ".join(band_rows)
    return f"""
      {_SQL_TOKS},
      sh AS MATERIALIZED (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
        FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
      ),
      hx AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS x FROM sh),
      sig AS MATERIALIZED (
        SELECT doc_id, {mins}
        FROM hx GROUP BY doc_id
      ),
      bands AS MATERIALIZED (
        {bands}
      ),
      cand AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                    AND a.doc_id < b.doc_id
      ),
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT c.da, c.db, count(*) AS i
        FROM cand c
        JOIN sh a ON a.doc_id = c.da
        JOIN sh b ON b.doc_id = c.db AND b.shingle = a.shingle
        GROUP BY c.da, c.db
      )
      SELECT i.da, i.db, i.i::DOUBLE / (ca.n + cb.n - i.i) AS jaccard
      FROM inter i
      JOIN cnt ca ON i.da = ca.doc_id
      JOIN cnt cb ON i.db = cb.doc_id
      WHERE i.i::DOUBLE / (ca.n + cb.n - i.i) >= {dd.MINHASH_LSH_T}
    """


def _bpe_merges_sql() -> str:
    """Exact unrolled twin of text_analysis.bpe_merges (VERDICT r10 #3
    — retires the op's rows-only status, the kmeans_iterate/ann_ivf
    generated-CTE pattern): the SAME K-iteration merge recurrence over
    the SAME (word, freq) vocabulary, emitted per iteration i as CTEs
    pc{i} (freq-weighted adjacent pair counts), b{i} (argmax with the
    count-desc / left-asc / right-asc tie-break and the MIN_PAIR stop),
    and v{i} (the merged vocab).

    The one semantic translation: Spark applies the leftmost-first
    NON-OVERLAPPING merge as a sequential HOF fold with a skip flag
    (text_analysis.py:421-447); DuckDB 1.0's list_reduce silently
    drops list-typed struct fields from the accumulator (verified:
    ``list_reduce([{'v':[1]},{'v':[2]}], (a,x) -> {'v': a.v || x.v})``
    returns [2], not [1,2]), so the fold is restated as its closed
    form — greedy picks alternate within each maximal RUN of
    consecutive match positions (runs longer than 1 only occur when
    left = right, e.g. 'aaaa' + (a,a) -> aa,aa), via gaps-and-islands
    (pos - row_number) + run-min parity, then the next symbol after
    each pick is dropped.  Equality with the sequential fold holds by
    induction on runs; the prototype matched tests/test_bpe.py's
    pure-Python trainer at sf0.001/sf0.01 before landing.

    v{i}/b{i} are AS MATERIALIZED: v{i} references v{i-1} twice (merge
    branch + empty-argmax passthrough), and DuckDB's default CTE
    inlining makes that 2^K scans of the base table ("too many open
    files" at K=20); materialization restores the linear recurrence
    the Spark loop's localCheckpoint gives for free."""
    from mapreduceinfrastructure_spark.operators import text_analysis as _ta

    k, min_pair = _ta.BPE_NUM_MERGES, _ta.BPE_MIN_PAIR
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
         CASE WHEN m = 1
               AND (pos - min(pos) OVER (PARTITION BY wid, grp, m)) % 2 = 0
              THEN 1 ELSE 0 END AS picked
  FROM (
    SELECT *, pos - row_number() OVER (PARTITION BY wid, m ORDER BY pos) AS grp
    FROM mt{i}
  )
),
nv{i} AS (
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


def _pq_adc_sql() -> str:
    """Exact replay twin of similarity.pq_adc_topk on the TRAINED
    production codebook (r15): the _pq_train_cte unrolled Lloyd chain
    supplies the codebook (cb{T}, flattened in pos order exactly like
    the Spark flat literal) and the codes (a{T+1}, the trained
    assignment pass with (d2, pos) ties = Spark's
    first-match-lowest-position); per-query subspace distances are
    recomputed with the IDENTICAL _pq_d2 fold, and the ADC total added
    in the same fixed s-order as the Spark element_at chain — no
    order-unstable float aggregation anywhere.  fb[pos*DIM + s*SUBDIM
    + j] (1-based) is element_at(flat, pos*DIM + s*SUBDIM + j + 1)
    operand for operand."""
    T = sim.PQ_TRAIN_ITERS

    def dsub(s: int) -> str:
        sub, dim = sim.PQ_SUBDIM, sim.EMBED_DIM
        term = (
            f"(q.qv[{s * sub} + j] - fb.f[c.cs[{s + 1}] * {dim}"
            f" + {s * sub} + j])"
        )
        return (
            f"list_reduce([0.0] || list_transform(range(1, {sub + 1}),\n"
            f"                   j -> {term}\n"
            f"                        * {term}),\n"
            f"                 (acc, x) -> acc + x)"
        )

    adc = "\n               + ".join(dsub(s) for s in range(sim.PQ_SUB))
    return (
        _pq_train_cte()
        + f""",
            fb AS (SELECT flatten(list(cv ORDER BY pos)) AS f FROM cb{T}),
            codes AS (SELECT vec_id, list(code_pos ORDER BY s) AS cs
                      FROM a{T + 1} GROUP BY vec_id),
            q AS (SELECT vec_id AS qid, v AS qv FROM e
                  WHERE vec_id < {sim.N_QUERIES}),
            pairs AS (
              SELECT q.qid, c.vec_id AS neighbor_id,
               {adc} AS adc
              FROM codes c, q, fb
              WHERE c.vec_id <> q.qid
            ),
            top AS (
              SELECT qid, neighbor_id, adc,
                     row_number() OVER (
                       PARTITION BY qid ORDER BY adc, neighbor_id) AS rn
              FROM pairs
            )
            SELECT qid, neighbor_id, round(adc, 6) AS adc_d2,
                   rn::BIGINT AS rn
            FROM top WHERE rn <= {sim.TOPK}
    """
    )


def _pq_bits_recall_sql() -> str:
    """Exact replay twin of similarity.pq_bits_recall_report (r17):
    TWO _pq_train_cte_body replays over the same corpus — the
    production 4-bit seed count (unprefixed) and the 8-bit
    PQ_BITS_WIDE_K=256 one (prefix "w") — each followed by
    _pq_adc_sql's search tail (flat codebook in pos order, trained
    assignment codes, fixed s-order ADC, (adc, neighbor_id) ties),
    then the brute-force L2 ground-truth leg and integer set algebra
    + one exact int/int division."""
    T = sim.PQ_TRAIN_ITERS
    dim, sub = sim.EMBED_DIM, sim.PQ_SUBDIM

    def dsub(s: int) -> str:
        term = (
            f"(q.qv[{s * sub} + j] - fb.f[c.cs[{s + 1}] * {dim}"
            f" + {s * sub} + j])"
        )
        return (
            f"list_reduce([0.0] || list_transform(range(1, {sub + 1}),\n"
            f"                   j -> {term}\n"
            f"                        * {term}),\n"
            f"                 (acc, x) -> acc + x)"
        )

    adc = "\n               + ".join(dsub(s) for s in range(sim.PQ_SUB))

    def leg(P: str) -> str:
        return f""",
        {P}fb AS (SELECT flatten(list(cv ORDER BY pos)) AS f
                  FROM {P}cb{T}),
        {P}codes AS (SELECT vec_id, list(code_pos ORDER BY s) AS cs
                     FROM {P}a{T + 1} GROUP BY vec_id),
        {P}top AS (
          SELECT qid, neighbor_id FROM (
            SELECT q.qid, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY {adc}, c.vec_id) AS rn
            FROM {P}codes c, q, {P}fb fb
            WHERE c.vec_id <> q.qid
          ) WHERE rn <= {sim.TOPK}
        )"""

    return (
        "\nWITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v"
        " FROM embeddings)"
        + _pq_train_cte_body()
        + _pq_train_cte_body(prefix="w", k=sim.PQ_BITS_WIDE_K)
        + f""",
        q AS (SELECT vec_id AS qid, v AS qv FROM e
              WHERE vec_id < {sim.N_QUERIES})"""
        + leg("")
        + leg("w")
        + f""",
        ex AS MATERIALIZED (
          SELECT qid, neighbor_id FROM (
            SELECT qe.vec_id AS qid, ne.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY qe.vec_id ORDER BY
                     list_reduce([0.0] || list_transform(
                         range(1, {dim} + 1),
                         j -> (ne.v[j] - qe.v[j]) * (ne.v[j] - qe.v[j])),
                       (acc, x) -> acc + x), ne.vec_id) AS rn
            FROM e ne, e qe
            WHERE qe.vec_id < {sim.N_QUERIES} AND ne.vec_id <> qe.vec_id
          ) WHERE rn <= {sim.TOPK}
        ),
        nx AS (SELECT qid, count(*) AS n_exact FROM ex GROUP BY qid),
        got AS (
          SELECT 4 AS bits, qid, neighbor_id FROM top
          UNION ALL
          SELECT 8 AS bits, qid, neighbor_id FROM wtop
        ),
        h AS (
          SELECT got.bits, got.qid, count(*) AS n_hit
          FROM got JOIN ex
            ON got.qid = ex.qid AND got.neighbor_id = ex.neighbor_id
          GROUP BY 1, 2
        )
        SELECT b.bits::BIGINT AS bits, nx.qid,
               nx.n_exact::BIGINT AS n_exact,
               coalesce(h.n_hit, 0)::BIGINT AS n_hit,
               round(coalesce(h.n_hit, 0)::DOUBLE / nx.n_exact, 6)
                 AS recall
        FROM nx CROSS JOIN (VALUES (4), (8)) b(bits)
        LEFT JOIN h ON h.bits = b.bits AND h.qid = nx.qid"""
    )


def _ann_ivf_adc_sql() -> str:
    """Exact replay twin of similarity.ann_ivf_adc (r13; trained
    codebook r15): the _ann_ivf_sql unrolled deterministic-Lloyd
    recurrence (seed centroids, LLOYD_ITERATIONS argmin/mean
    refinements, final assignment, NPROBE nearest-centroid probes per
    query — ties ORDER BY (d2, cid)) COMPOSED with the trained-PQ
    replay (_pq_train_cte_body prefixed "t" so its a{i} names don't
    collide with the IVF chain's: codes are the trained assignment
    pass ta{T+1}, the flat codebook is tcb{T}; ADC added in the same
    fixed s-order as the Spark element_at chain).  The candidate set
    is the probed cells' members (a vector lives in exactly one cell,
    so no dedup), matching the Spark cid join."""
    k_mod, iters = sim.N_CLUSTERS_MOD, sim.LLOYD_ITERATIONS

    def d2(v: str, c: str) -> str:
        return (
            f"list_reduce([0.0] || list_transform(range(1, len({v}) + 1), "
            f"j -> ({v}[j] - {c}[j]) * ({v}[j] - {c}[j])), "
            "(acc, x) -> acc + x)"
        )

    def dsub(s: int) -> str:
        sub, dim = sim.PQ_SUBDIM, sim.EMBED_DIM
        term = (
            f"(qp.qv[{s * sub} + j] - fb.f[c.cs[{s + 1}] * {dim}"
            f" + {s * sub} + j])"
        )
        return (
            f"list_reduce([0.0] || list_transform(range(1, {sub + 1}),\n"
            f"                   j -> {term}\n"
            f"                        * {term}),\n"
            f"                 (acc, x) -> acc + x)"
        )

    adc = "\n               + ".join(dsub(s) for s in range(sim.PQ_SUB))
    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),",
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {k_mod} = 0)",
    ]
    for i in range(1, iters + 2):
        parts.append(f""",
        a{i} AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY {d2('e.v', 'c.cv')}, c.cid) AS rn
            FROM e CROSS JOIN c{i - 1} c
          ) WHERE rn = 1
        )""")
        if i <= iters:
            parts.append(f""",
        c{i} AS (
          SELECT cid, array_agg(nv ORDER BY pos) AS cv FROM (
            SELECT cid, pos, avg(val) AS nv FROM (
              SELECT cid, unnest(v) AS val,
                     unnest(range(1, len(v) + 1)) AS pos
              FROM a{i}
            ) GROUP BY cid, pos
          ) GROUP BY cid
        )""")
    fin = iters + 1
    T = sim.PQ_TRAIN_ITERS
    parts.append(_pq_train_cte_body(src="e", prefix="t"))
    parts.append(f""",
        fb AS (SELECT flatten(list(cv ORDER BY pos)) AS f FROM tcb{T}),
        codes AS (SELECT vec_id, list(code_pos ORDER BY s) AS cs
                  FROM ta{T + 1} GROUP BY vec_id),
        q AS (SELECT vec_id AS qid, v AS qv FROM a{fin}
              WHERE vec_id < {sim.N_QUERIES}),
        qp AS (
          SELECT qid, qv, cid FROM (
            SELECT q.qid, q.qv, c.cid,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY {d2('q.qv', 'c.cv')}, c.cid) AS rn
            FROM q CROSS JOIN c{iters} c
          ) WHERE rn <= {sim.NPROBE}
        ),
        pairs AS (
          SELECT qp.qid, a.vec_id AS neighbor_id,
           {adc} AS adc
          FROM qp JOIN a{fin} a USING (cid)
               JOIN codes c ON c.vec_id = a.vec_id, fb
          WHERE a.vec_id <> qp.qid
        ),
        top AS (
          SELECT qid, neighbor_id, adc,
                 row_number() OVER (
                   PARTITION BY qid ORDER BY adc, neighbor_id) AS rn
          FROM pairs
        )
        SELECT qid, neighbor_id, round(adc, 6) AS adc_d2,
               rn::BIGINT AS rn
        FROM top WHERE rn <= {sim.TOPK}""")
    return "\n".join(parts)


def _ivf_pq_residual_sql() -> str:
    """Exact replay twin of similarity.ivf_pq_residual (r13; trained
    residual codebook r15): the _ann_ivf_sql unrolled
    deterministic-Lloyd recurrence down to the final assignment,
    residual r = v - cv elementwise (single IEEE subtraction per
    component in both engines), then the _pq_train_cte_body training
    replay over the residuals (prefix "t", source resv — codes are
    actual seed vec_ids, the pq_quantize convention) whose final
    assignment pass ta{T+1} is the encode, with the same
    row_number-over-(d2, pos) argmin and identical left-fold distance
    sums."""
    k_mod, iters = sim.N_CLUSTERS_MOD, sim.LLOYD_ITERATIONS

    def d2(v: str, c: str) -> str:
        return (
            f"list_reduce([0.0] || list_transform(range(1, len({v}) + 1), "
            f"j -> ({v}[j] - {c}[j]) * ({v}[j] - {c}[j])), "
            "(acc, x) -> acc + x)"
        )

    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),",
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {k_mod} = 0)",
    ]
    for i in range(1, iters + 2):
        parts.append(f""",
        a{i} AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY {d2('e.v', 'c.cv')}, c.cid) AS rn
            FROM e CROSS JOIN c{i - 1} c
          ) WHERE rn = 1
        )""")
        if i <= iters:
            parts.append(f""",
        c{i} AS (
          SELECT cid, array_agg(nv ORDER BY pos) AS cv FROM (
            SELECT cid, pos, avg(val) AS nv FROM (
              SELECT cid, unnest(v) AS val,
                     unnest(range(1, len(v) + 1)) AS pos
              FROM a{i}
            ) GROUP BY cid, pos
          ) GROUP BY cid
        )""")
    fin = iters + 1
    T = sim.PQ_TRAIN_ITERS
    # res is MATERIALIZED: the training body references it 2(T+1)+T
    # times, and DuckDB's default CTE inlining would re-run the whole
    # unrolled Lloyd chain per reference (the _bpe_merges_sql lesson).
    parts.append(f""",
        res AS MATERIALIZED (
          SELECT a.vec_id, a.cid,
                 list_transform(range(1, len(a.v) + 1),
                                j -> a.v[j] - c.cv[j]) AS rv
          FROM a{fin} a JOIN c{iters} c USING (cid)
        ),
        resv AS (SELECT vec_id, rv AS v FROM res)""")
    parts.append(_pq_train_cte_body(src="resv", prefix="t"))
    parts.append(f"""
        SELECT a.vec_id, res.cid::BIGINT AS cid, a.s::BIGINT AS subspace,
               tcb.code::BIGINT AS code, round(a.d2, 6) AS sq_err
        FROM ta{T + 1} a
             JOIN tcb ON tcb.pos = a.code_pos
             JOIN res ON res.vec_id = a.vec_id""")
    return "\n".join(parts)


def _ivf_split_chain_sql() -> str:
    """The shared IVF split-maintenance chain (r17 refactor of the r16
    _ivf_split_plan_sql): the unrolled Lloyd chain to the final
    assignment, per-member d2 to the own-cell centroid (the banked
    j-ascending fold; ``m`` MATERIALIZED and carrying the member/
    centroid vectors so the apply tail re-reads rows, not the
    re-inlined Lloyd cross join), per-cell count + farthest member
    (row_number ORDER BY d2 DESC, vec_id — the integer-tiebroken
    argmax equivalent of Spark's max_by struct), and the
    above-average occupancy threshold — ends at ``plan`` (cid,
    n_vectors, split_seed, mx)."""
    k_mod, iters = sim.N_CLUSTERS_MOD, sim.LLOYD_ITERATIONS

    def d2(v: str, c: str) -> str:
        return (
            f"list_reduce([0.0] || list_transform(range(1, len({v}) + 1), "
            f"j -> ({v}[j] - {c}[j]) * ({v}[j] - {c}[j])), "
            "(acc, x) -> acc + x)"
        )

    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),",
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {k_mod} = 0)",
    ]
    for i in range(1, iters + 2):
        parts.append(f""",
        a{i} AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY {d2('e.v', 'c.cv')}, c.cid) AS rn
            FROM e CROSS JOIN c{i - 1} c
          ) WHERE rn = 1
        )""")
        if i <= iters:
            parts.append(f""",
        c{i} AS (
          SELECT cid, array_agg(nv ORDER BY pos) AS cv FROM (
            SELECT cid, pos, avg(val) AS nv FROM (
              SELECT cid, unnest(v) AS val,
                     unnest(range(1, len(v) + 1)) AS pos
              FROM a{i}
            ) GROUP BY cid, pos
          ) GROUP BY cid
        )""")
    fin = iters + 1
    parts.append(f""",
        m AS MATERIALIZED (
          SELECT a.cid, a.vec_id, a.v, c.cv, {d2('a.v', 'c.cv')} AS d2
          FROM a{fin} a JOIN c{iters} c USING (cid)
        ),
        pc AS (
          SELECT cid, count(*)::BIGINT AS n_vectors,
                 max(d2) AS mx
          FROM m GROUP BY cid
        ),
        far AS (
          SELECT cid, vec_id AS split_seed FROM (
            SELECT cid, vec_id,
                   row_number() OVER (PARTITION BY cid
                     ORDER BY d2 DESC, vec_id) AS rn
            FROM m
          ) WHERE rn = 1
        ),
        plan AS (
          SELECT pc.cid, pc.n_vectors, far.split_seed, pc.mx
          FROM pc JOIN far USING (cid)
          WHERE pc.n_vectors > (SELECT avg(n_vectors) FROM pc)
        )""")
    return "\n".join(parts)


def _ivf_split_plan_sql() -> str:
    """Exact replay twin of similarity.ivf_split_plan (r16): the
    shared _ivf_split_chain_sql, projected."""
    return (
        _ivf_split_chain_sql()
        + """
        SELECT cid::BIGINT AS cid, n_vectors,
               split_seed::BIGINT AS split_seed,
               round(mx, 6) AS max_d2
        FROM plan"""
    )


def _ivf_split_apply_sql() -> str:
    """Exact replay twin of similarity.ivf_split_apply (r17): the
    shared _ivf_split_chain_sql, then the 2-means reassignment of each
    planned cell's members between the old centroid (m.d2, already the
    banked fold) and the split-seed vector fetched BY KEY from ``e``;
    a member moves on a strict <, ties stay; integer counts out."""
    d2sv = (
        "list_reduce([0.0] || list_transform(range(1, len(m.v) + 1), "
        "j -> (m.v[j] - s.sv[j]) * (m.v[j] - s.sv[j])), "
        "(acc, x) -> acc + x)"
    )
    return (
        _ivf_split_chain_sql()
        + f""",
        sv AS (
          SELECT p.cid, e.v AS sv FROM plan p
          JOIN e ON e.vec_id = p.split_seed
        ),
        mv AS (
          SELECT m.cid, ({d2sv}) < m.d2 AS moves
          FROM m JOIN sv s USING (cid)
        )
        SELECT cid::BIGINT AS cid,
               count(*)::BIGINT AS n_before,
               count(*) FILTER (WHERE NOT moves)::BIGINT AS n_keep,
               count(*) FILTER (WHERE moves)::BIGINT AS n_split
        FROM mv GROUP BY cid"""
    )


def _ivf_pq_pairs_sql(
    max_probe: int | None = None, carry_rank: bool = False
) -> str:
    """The shared IVFADC candidate chain (r16 refactor of the r15
    _ivf_pq_adc_sql): the unrolled Lloyd chain down to the final
    assignment, the MATERIALIZED residual CTE, the prefixed
    residual-training replay (_pq_train_cte_body over resv), the
    per-probe query residual (qrv = qv − probed centroid, single IEEE
    subtractions) and the residual-ADC total added in the same fixed
    s-order as the Spark element_at chain — ends at ``pairs`` (qid,
    neighbor_id, adc[, cr]); _ivf_pq_adc_sql, _ivf_pq_rerank_sql and
    the recall/sweep reports append their tails.  ``max_probe``
    defaults to NPROBE; ``carry_rank`` keeps the probed cell's rank
    ``cr`` on every pair (the probe-sweep replay of
    _ivf_pq_probe_pairs)."""
    if max_probe is None:
        max_probe = sim.NPROBE
    k_mod, iters = sim.N_CLUSTERS_MOD, sim.LLOYD_ITERATIONS
    T = sim.PQ_TRAIN_ITERS

    def d2(v: str, c: str) -> str:
        return (
            f"list_reduce([0.0] || list_transform(range(1, len({v}) + 1), "
            f"j -> ({v}[j] - {c}[j]) * ({v}[j] - {c}[j])), "
            "(acc, x) -> acc + x)"
        )

    def dsub(s: int) -> str:
        sub, dim = sim.PQ_SUBDIM, sim.EMBED_DIM
        term = (
            f"(qp.qrv[{s * sub} + j] - fb.f[c.cs[{s + 1}] * {dim}"
            f" + {s * sub} + j])"
        )
        return (
            f"list_reduce([0.0] || list_transform(range(1, {sub + 1}),\n"
            f"                   j -> {term}\n"
            f"                        * {term}),\n"
            f"                 (acc, x) -> acc + x)"
        )

    adc = "\n               + ".join(dsub(s) for s in range(sim.PQ_SUB))
    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),",
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {k_mod} = 0)",
    ]
    for i in range(1, iters + 2):
        parts.append(f""",
        a{i} AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY {d2('e.v', 'c.cv')}, c.cid) AS rn
            FROM e CROSS JOIN c{i - 1} c
          ) WHERE rn = 1
        )""")
        if i <= iters:
            parts.append(f""",
        c{i} AS (
          SELECT cid, array_agg(nv ORDER BY pos) AS cv FROM (
            SELECT cid, pos, avg(val) AS nv FROM (
              SELECT cid, unnest(v) AS val,
                     unnest(range(1, len(v) + 1)) AS pos
              FROM a{i}
            ) GROUP BY cid, pos
          ) GROUP BY cid
        )""")
    fin = iters + 1
    parts.append(f""",
        res AS MATERIALIZED (
          SELECT a.vec_id, a.cid,
                 list_transform(range(1, len(a.v) + 1),
                                j -> a.v[j] - c.cv[j]) AS rv
          FROM a{fin} a JOIN c{iters} c USING (cid)
        ),
        resv AS (SELECT vec_id, rv AS v FROM res)""")
    parts.append(_pq_train_cte_body(src="resv", prefix="t"))
    parts.append(f""",
        fb AS (SELECT flatten(list(cv ORDER BY pos)) AS f FROM tcb{T}),
        codes AS (SELECT vec_id, list(code_pos ORDER BY s) AS cs
                  FROM ta{T + 1} GROUP BY vec_id),
        q AS (SELECT vec_id AS qid, v AS qv FROM a{fin}
              WHERE vec_id < {sim.N_QUERIES}),
        qp AS (
          SELECT qid, cid, qrv, rn AS cr FROM (
            SELECT q.qid, c.cid,
                   list_transform(range(1, len(q.qv) + 1),
                                  j -> q.qv[j] - c.cv[j]) AS qrv,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY {d2('q.qv', 'c.cv')}, c.cid) AS rn
            FROM q CROSS JOIN c{iters} c
          ) WHERE rn <= {max_probe}
        ),
        pairs AS (
          SELECT qp.qid, r.vec_id AS neighbor_id,
           {adc} AS adc{", qp.cr AS cr" if carry_rank else ""}
          FROM qp JOIN res r USING (cid)
               JOIN codes c ON c.vec_id = r.vec_id, fb
          WHERE r.vec_id <> qp.qid
        )""")
    return "\n".join(parts)


def _ivf_pq_adc_sql() -> str:
    """Exact replay twin of similarity.ivf_pq_adc_topk (r15): the
    shared _ivf_pq_pairs_sql candidate chain, then the top-K window;
    ties (adc, neighbor_id)."""
    return (
        _ivf_pq_pairs_sql()
        + f""",
        top AS (
          SELECT qid, neighbor_id, adc,
                 row_number() OVER (
                   PARTITION BY qid ORDER BY adc, neighbor_id) AS rn
          FROM pairs
        )
        SELECT qid, neighbor_id, round(adc, 6) AS adc_d2,
               rn::BIGINT AS rn
        FROM top WHERE rn <= {sim.TOPK}"""
    )


def _ivf_pq_rerank_sql() -> str:
    """Exact replay twin of similarity.ivf_pq_rerank_topk (r16): the
    shared _ivf_pq_pairs_sql candidate chain capped at RERANK_CAP,
    then the exact re-rank recomputing squared L2 with the banked
    full-vector left fold over the candidates only — query and
    neighbor vectors both fetched BY KEY from ``e`` (never through
    a{fin}, whose re-inlining would replay the Lloyd cross join);
    both stages tie on neighbor_id."""
    dim = sim.EMBED_DIM
    return (
        _ivf_pq_pairs_sql()
        + f""",
        cand AS (
          SELECT qid, neighbor_id FROM (
            SELECT qid, neighbor_id,
                   row_number() OVER (
                     PARTITION BY qid ORDER BY adc, neighbor_id) AS crn
            FROM pairs
          ) WHERE crn <= {sim.RERANK_CAP}
        ),
        rer AS (
          SELECT cand.qid, cand.neighbor_id,
                 list_reduce([0.0] || list_transform(range(1, {dim} + 1),
                     j -> (ne.v[j] - qe.v[j]) * (ne.v[j] - qe.v[j])),
                   (acc, x) -> acc + x) AS d2
          FROM cand JOIN e ne ON ne.vec_id = cand.neighbor_id
               JOIN e qe ON qe.vec_id = cand.qid
        ),
        rtop AS (
          SELECT qid, neighbor_id, d2,
                 row_number() OVER (
                   PARTITION BY qid ORDER BY d2, neighbor_id) AS rn
          FROM rer
        )
        SELECT qid, neighbor_id, round(d2, 6) AS d2, rn::BIGINT AS rn
        FROM rtop WHERE rn <= {sim.TOPK}"""
    )


def _ivf_pq_probe_sweep_sql() -> str:
    """Exact replay twin of similarity.ivf_pq_probe_sweep (r16): the
    shared _ivf_pq_pairs_sql chain fetched ONCE at max(ANN_PROBE_SET)
    probes with the cell rank carried, the qualifying operating
    points joined in (l.nprobe >= cr — the in-row explode's SQL
    twin), one window pass per (nprobe, qid), and the brute-force L2
    ground-truth leg; integer set algebra + one exact int/int
    division on top."""
    dim = sim.EMBED_DIM
    lv = ", ".join(str(p) for p in sim.ANN_PROBE_SET)
    return (
        _ivf_pq_pairs_sql(
            max_probe=max(sim.ANN_PROBE_SET), carry_rank=True
        )
        + f""",
        ex AS MATERIALIZED (
          SELECT qid, neighbor_id FROM (
            SELECT qe.vec_id AS qid, ne.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY qe.vec_id ORDER BY
                     list_reduce([0.0] || list_transform(
                         range(1, {dim} + 1),
                         j -> (ne.v[j] - qe.v[j]) * (ne.v[j] - qe.v[j])),
                       (acc, x) -> acc + x), ne.vec_id) AS rn
            FROM e ne, e qe
            WHERE qe.vec_id < {sim.N_QUERIES} AND ne.vec_id <> qe.vec_id
          ) WHERE rn <= {sim.TOPK}
        ),
        nx AS (SELECT qid, count(*) AS n_exact FROM ex GROUP BY qid),
        sw AS (
          SELECT nprobe, qid, neighbor_id FROM (
            SELECT l.nprobe, p.qid, p.neighbor_id,
                   row_number() OVER (PARTITION BY l.nprobe, p.qid
                     ORDER BY p.adc, p.neighbor_id) AS rn
            FROM pairs p
            JOIN (SELECT unnest([{lv}]) AS nprobe) l
              ON l.nprobe >= p.cr
          ) WHERE rn <= {sim.TOPK}
        ),
        hh AS (
          SELECT sw.nprobe, sw.qid, count(*) AS n_hit
          FROM sw JOIN ex
            ON sw.qid = ex.qid AND sw.neighbor_id = ex.neighbor_id
          GROUP BY 1, 2
        ),
        lvls AS (SELECT unnest([{lv}]) AS nprobe)
        SELECT lvls.nprobe::BIGINT AS nprobe, nx.qid,
               nx.n_exact::BIGINT AS n_exact,
               coalesce(hh.n_hit, 0)::BIGINT AS n_hit,
               round(coalesce(hh.n_hit, 0)::DOUBLE / nx.n_exact, 6)
                 AS recall
        FROM nx CROSS JOIN lvls
        LEFT JOIN hh ON hh.nprobe = lvls.nprobe AND hh.qid = nx.qid"""
    )


def _ivf_pq_rerank_recall_sql() -> str:
    """Exact replay twin of similarity.ivf_pq_rerank_recall_report
    (r16): ONE shared candidate ranking (rk, MATERIALIZED — read by
    both variant legs, the DuckDB analog of the Spark localCheckpoint)
    serves the 'ivfadc' prefix (crn <= TOPK) and the 'rerank' leg
    (crn <= RERANK_CAP + exact re-rank); the exact ground-truth leg is
    a self-contained brute-force L2 top-K over ``e``; integer set
    algebra + one exact int/int division on top."""
    dim = sim.EMBED_DIM
    return (
        _ivf_pq_pairs_sql()
        + f""",
        rk AS MATERIALIZED (
          SELECT qid, neighbor_id, adc,
                 row_number() OVER (
                   PARTITION BY qid ORDER BY adc, neighbor_id) AS crn
          FROM pairs
        ),
        ex AS MATERIALIZED (
          SELECT qid, neighbor_id FROM (
            SELECT qe.vec_id AS qid, ne.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY qe.vec_id ORDER BY
                     list_reduce([0.0] || list_transform(
                         range(1, {dim} + 1),
                         j -> (ne.v[j] - qe.v[j]) * (ne.v[j] - qe.v[j])),
                       (acc, x) -> acc + x), ne.vec_id) AS rn
            FROM e ne, e qe
            WHERE qe.vec_id < {sim.N_QUERIES} AND ne.vec_id <> qe.vec_id
          ) WHERE rn <= {sim.TOPK}
        ),
        nx AS (SELECT qid, count(*) AS n_exact FROM ex GROUP BY qid),
        rr AS (
          SELECT qid, neighbor_id FROM (
            SELECT rk.qid, rk.neighbor_id,
                   row_number() OVER (PARTITION BY rk.qid ORDER BY
                     list_reduce([0.0] || list_transform(
                         range(1, {dim} + 1),
                         j -> (ne.v[j] - qe.v[j]) * (ne.v[j] - qe.v[j])),
                       (acc, x) -> acc + x), rk.neighbor_id) AS rn
            FROM rk JOIN e ne ON ne.vec_id = rk.neighbor_id
                 JOIN e qe ON qe.vec_id = rk.qid
            WHERE rk.crn <= {sim.RERANK_CAP}
          ) WHERE rn <= {sim.TOPK}
        ),
        got AS (
          SELECT 'ivfadc' AS variant, qid, neighbor_id FROM rk
          WHERE crn <= {sim.TOPK}
          UNION ALL
          SELECT 'rerank' AS variant, qid, neighbor_id FROM rr
        ),
        h AS (
          SELECT g.variant, g.qid, count(*) AS hits
          FROM got g JOIN ex
            ON g.qid = ex.qid AND g.neighbor_id = ex.neighbor_id
          GROUP BY 1, 2
        )
        SELECT v.variant, nx.qid, nx.n_exact::BIGINT AS n_exact,
               coalesce(h.hits, 0)::BIGINT AS hits,
               round(coalesce(h.hits, 0)::DOUBLE / nx.n_exact, 6) AS recall
        FROM nx CROSS JOIN (VALUES ('ivfadc'), ('rerank')) v(variant)
        LEFT JOIN h ON h.variant = v.variant AND h.qid = nx.qid"""
    )


def _rerank_cap_sweep_sql() -> str:
    """Exact replay twin of similarity.rerank_cap_sweep (r17): the
    shared _ivf_pq_pairs_sql chain ranked once, exact re-rank d2
    computed once per candidate within max(RERANK_CAP_SET) (both
    vectors fetched BY KEY from ``e``), the qualifying caps joined in
    (l.cap >= crn — the in-row explode's SQL twin), one window pass
    per (cap, qid), and the brute-force L2 ground-truth leg; integer
    set algebra + one exact int/int division on top."""
    dim = sim.EMBED_DIM
    caps = ", ".join(str(c) for c in sim.RERANK_CAP_SET)
    return (
        _ivf_pq_pairs_sql()
        + f""",
        rk AS MATERIALIZED (
          SELECT qid, neighbor_id,
                 row_number() OVER (
                   PARTITION BY qid ORDER BY adc, neighbor_id) AS crn
          FROM pairs
        ),
        cd AS MATERIALIZED (
          SELECT rk.qid, rk.neighbor_id, rk.crn,
                 list_reduce([0.0] || list_transform(range(1, {dim} + 1),
                     j -> (ne.v[j] - qe.v[j]) * (ne.v[j] - qe.v[j])),
                   (acc, x) -> acc + x) AS d2
          FROM rk JOIN e ne ON ne.vec_id = rk.neighbor_id
               JOIN e qe ON qe.vec_id = rk.qid
          WHERE rk.crn <= {max(sim.RERANK_CAP_SET)}
        ),
        ex AS MATERIALIZED (
          SELECT qid, neighbor_id FROM (
            SELECT qe.vec_id AS qid, ne.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY qe.vec_id ORDER BY
                     list_reduce([0.0] || list_transform(
                         range(1, {dim} + 1),
                         j -> (ne.v[j] - qe.v[j]) * (ne.v[j] - qe.v[j])),
                       (acc, x) -> acc + x), ne.vec_id) AS rn
            FROM e ne, e qe
            WHERE qe.vec_id < {sim.N_QUERIES} AND ne.vec_id <> qe.vec_id
          ) WHERE rn <= {sim.TOPK}
        ),
        nx AS (SELECT qid, count(*) AS n_exact FROM ex GROUP BY qid),
        sw AS (
          SELECT cap, qid, neighbor_id FROM (
            SELECT l.cap, cd.qid, cd.neighbor_id,
                   row_number() OVER (PARTITION BY l.cap, cd.qid
                     ORDER BY cd.d2, cd.neighbor_id) AS rn
            FROM cd JOIN (SELECT unnest([{caps}]) AS cap) l
              ON l.cap >= cd.crn
          ) WHERE rn <= {sim.TOPK}
        ),
        hh AS (
          SELECT sw.cap, sw.qid, count(*) AS n_hit
          FROM sw JOIN ex
            ON sw.qid = ex.qid AND sw.neighbor_id = ex.neighbor_id
          GROUP BY 1, 2
        ),
        lvls AS (SELECT unnest([{caps}]) AS cap)
        SELECT lvls.cap::BIGINT AS cap, nx.qid,
               nx.n_exact::BIGINT AS n_exact,
               coalesce(hh.n_hit, 0)::BIGINT AS n_hit,
               round(coalesce(hh.n_hit, 0)::DOUBLE / nx.n_exact, 6)
                 AS recall
        FROM nx CROSS JOIN lvls
        LEFT JOIN hh ON hh.cap = lvls.cap AND hh.qid = nx.qid"""
    )


def _wav_le(expr: str, nbytes: int) -> str:
    """LE hex of an int expression: big-endian lpad-hex, byte pairs
    reversed (shared by the WAV container oracles)."""
    h = f"lpad(hex({expr}), {2 * nbytes}, '0')"
    pairs = " || ".join(
        f"substr({h}, {2 * b + 1}, 2)" for b in reversed(range(nbytes))
    )
    return f"({pairs})"


def _wav_rd(byte_off: int, nbytes: int) -> str:
    """Read an LE uint out of the hex payload at a fixed byte offset
    (byte b lives at 1-based hex position 2b+1)."""
    pairs = " || ".join(
        f"substr(hx, {2 * (byte_off + b) + 1}, 2)"
        for b in reversed(range(nbytes))
    )
    return f"('0x' || {pairs})::BIGINT"


def _pq_train_cte_body(
    src: str = "e", prefix: str = "", k: int | None = None
) -> str:
    """Parameterized CTE fragment (no leading WITH) for the PQ-training
    replay: the seed codebook of ``src`` (a CTE exposing (vec_id, v))
    as (pos, cv) rows, then PQ_TRAIN_ITERS unrolled Lloyd refinements
    mirroring similarity._pq_train_flat — assignment by the IDENTICAL
    _pq_d2 left fold with (d2, pos) tie order, per (code, position)
    re-centering by each engine's own float avg (contracted by the
    argmin, the kmeans_iterate precedent), emptied cells carrying the
    previous value.  Every CTE name takes ``prefix`` so the chain
    composes with the unrolled IVF-Lloyd chain (whose a{{i}} names
    would otherwise collide — the r15 trained-production twins).  Ends
    with {{P}}cb{{T}} (trained codebook rows) alongside {{P}}cb0, plus
    {{P}}a{{T+1}} (the assignment pass under the trained codebook) and
    {{P}}a1 (under the seed codebook).  ``k`` overrides the seed
    count (default PQ_K — r17: the 8-bit codebook rung seeds 256)."""
    iters = sim.PQ_TRAIN_ITERS
    sub, dim, nsub = sim.PQ_SUBDIM, sim.EMBED_DIM, sim.PQ_SUB
    P = prefix
    if k is None:
        k = sim.PQ_K

    def dfold(v: str, cv: str) -> str:
        t = f"({v}[s * {sub} + j] - {cv}[s * {sub} + j])"
        return (
            f"list_reduce([0.0] || list_transform(range(1, {sub} + 1),\n"
            f"             j -> {t} * {t}),\n"
            f"           (acc, x) -> acc + x)"
        )

    parts = [
        f""",
{P}cb AS (SELECT vec_id AS code,
              row_number() OVER (ORDER BY vec_id) - 1 AS pos,
              v AS cv
       FROM {src} WHERE vec_id < {k}),
{P}cb0 AS (SELECT pos, cv FROM {P}cb)"""
    ]
    for i in range(1, iters + 2):
        p = i - 1
        parts.append(f""",
{P}d{i} AS (
  SELECT {src}.vec_id, s, c.pos AS code_pos,
         {dfold(f"{src}.v", "c.cv")} AS d2
  FROM {src}, {P}cb{p} c, unnest(range(0, {nsub})) AS us(s)
),
{P}a{i} AS (
  SELECT vec_id, s, code_pos, d2 FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, s ORDER BY d2, code_pos) AS rn
    FROM {P}d{i}
  ) WHERE rn = 1
)""")
        if i <= iters:
            parts.append(f""",
{P}m{i} AS (
  SELECT a.code_pos, a.s * {sub} + j AS vj,
         avg({src}.v[a.s * {sub} + j]) AS mv
  FROM {P}a{i} a JOIN {src} USING (vec_id),
       unnest(range(1, {sub} + 1)) AS uj(j)
  GROUP BY a.code_pos, vj
),
{P}cb{i} AS (
  SELECT pos, array_agg(nv ORDER BY q) AS cv FROM (
    SELECT px.pos, px.q, coalesce({P}m{i}.mv, px.old) AS nv
    FROM (SELECT pos, unnest(range(1, {dim} + 1)) AS q,
                 unnest(cv) AS old
          FROM {P}cb{p}) px
    LEFT JOIN {P}m{i} ON {P}m{i}.code_pos = px.pos AND {P}m{i}.vj = px.q
  ) GROUP BY pos
)""")
    return "".join(parts)


def _pq_train_cte() -> str:
    """The raw-embeddings instance of :func:`_pq_train_cte_body` with
    unprefixed names — the shared head of the PQ-training twins."""
    return (
        "\nWITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v"
        " FROM embeddings)" + _pq_train_cte_body()
    )


def _pq_quantize_sql() -> str:
    """Exact replay twin of similarity.pq_quantize on the TRAINED
    production codebook (r15, VERDICT r14 #1): the _pq_train_cte
    unrolled Lloyd chain, whose final assignment pass a{T+1} is
    precisely the trained-codebook encode — (vec_id, subspace, code,
    sq_err), code labels mapped back to actual seed vec_ids (the
    pq_quantize convention)."""
    T = sim.PQ_TRAIN_ITERS
    return (
        _pq_train_cte()
        + f"""
SELECT a.vec_id, a.s::BIGINT AS subspace, cb.code::BIGINT AS code,
       round(a.d2, 6) AS sq_err
FROM a{T + 1} a JOIN cb ON cb.pos = a.code_pos
"""
    )


def _adc_rerank_sql() -> str:
    """Exact replay twin of similarity.adc_rerank_topk (r15): the
    trained-ADC candidate stage is _pq_adc_sql's replay with
    RERANK_CAP in place of TOPK, then the exact re-rank recomputes
    squared L2 with the banked full-vector left fold over the
    candidates only; both stages tie on neighbor_id."""
    T = sim.PQ_TRAIN_ITERS
    sub, dim = sim.PQ_SUBDIM, sim.EMBED_DIM

    def dsub(s: int) -> str:
        term = (
            f"(q.qv[{s * sub} + j] - fb.f[c.cs[{s + 1}] * {dim}"
            f" + {s * sub} + j])"
        )
        return (
            f"list_reduce([0.0] || list_transform(range(1, {sub + 1}),\n"
            f"                   j -> {term} * {term}),\n"
            f"                 (acc, x) -> acc + x)"
        )

    adc = "\n               + ".join(dsub(s) for s in range(sim.PQ_SUB))
    return (
        _pq_train_cte()
        + f""",
fb AS (SELECT flatten(list(cv ORDER BY pos)) AS f FROM cb{T}),
codes AS (SELECT vec_id, list(code_pos ORDER BY s) AS cs
          FROM a{T + 1} GROUP BY vec_id),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {sim.N_QUERIES}),
pairs AS (
  SELECT q.qid, c.vec_id AS neighbor_id,
   {adc} AS adc
  FROM codes c, q, fb
  WHERE c.vec_id <> q.qid
),
cand AS (
  SELECT qid, neighbor_id FROM (
    SELECT qid, neighbor_id,
           row_number() OVER (
             PARTITION BY qid ORDER BY adc, neighbor_id) AS crn
    FROM pairs
  ) WHERE crn <= {sim.RERANK_CAP}
),
rer AS (
  SELECT cand.qid, cand.neighbor_id,
         list_reduce([0.0] || list_transform(range(1, {dim} + 1),
             j -> (e.v[j] - q.qv[j]) * (e.v[j] - q.qv[j])),
           (acc, x) -> acc + x) AS d2
  FROM cand JOIN e ON e.vec_id = cand.neighbor_id
       JOIN q ON q.qid = cand.qid
),
top AS (
  SELECT qid, neighbor_id, d2,
         row_number() OVER (
           PARTITION BY qid ORDER BY d2, neighbor_id) AS rn
  FROM rer
)
SELECT qid, neighbor_id, round(d2, 6) AS d2, rn::BIGINT AS rn
FROM top WHERE rn <= {sim.TOPK}
"""
    )


def _pq_train_sql() -> str:
    """Exact replay twin of similarity.pq_train_codebooks: the
    _pq_train_cte chain, then per (variant, subspace, code) the count
    and round-6 total sq_err of the seed assignment (a1) and the
    trained assignment (a{T+1}), codes mapped back to actual seed
    vec_ids (the pq_quantize convention)."""
    T = sim.PQ_TRAIN_ITERS
    return (
        _pq_train_cte()
        + f""",
u AS (
  SELECT 'seed' AS variant, s, code_pos,
         count(*) AS n, round(sum(d2), 6) AS sq
  FROM a1 GROUP BY s, code_pos
  UNION ALL
  SELECT 'trained' AS variant, s, code_pos,
         count(*) AS n, round(sum(d2), 6) AS sq
  FROM a{T + 1} GROUP BY s, code_pos
)
SELECT u.variant, u.s::BIGINT AS subspace, cb.code::BIGINT AS code,
       u.n::BIGINT AS n_assigned, u.sq AS sq_err
FROM u JOIN cb ON cb.pos = u.code_pos
"""
    )


def _pq_recall_sql() -> str:
    """Exact replay twin of similarity.pq_recall_report: the
    _pq_train_cte chain, each variant's flat codebook (cb0 / cb{T}
    flattened in pos order exactly like the Spark literal), ADC totals
    added in the same fixed s-order as the Spark element_at chain,
    per-variant top-TOPK with (adc, neighbor_id) ties, the exact
    squared-L2 top-TOPK with the identical full-vector left fold, and
    hits = overlap, zero-filled over the (variant x qid-with-exact-
    neighbors) grid; recall divides by n_exact (ADVICE r14, matching
    every other *_recall_report)."""
    T = sim.PQ_TRAIN_ITERS
    sub, dim = sim.PQ_SUBDIM, sim.EMBED_DIM

    def dsub(s: int, fcol: str) -> str:
        term = (
            f"(q.qv[{s * sub} + j] - {fcol}[c.cs[{s + 1}] * {dim}"
            f" + {s * sub} + j])"
        )
        return (
            f"list_reduce([0.0] || list_transform(range(1, {sub + 1}),\n"
            f"               j -> {term} * {term}),\n"
            f"             (acc, x) -> acc + x)"
        )

    legs = []
    for variant, cbn, an in (("seed", "cb0", "a1"), ("trained", f"cb{T}", f"a{T + 1}")):
        adc = "\n             + ".join(dsub(s, "fb.f") for s in range(sim.PQ_SUB))
        legs.append(f"""
  SELECT '{variant}' AS variant, q.qid, c.vec_id AS neighbor_id,
         {adc} AS adc
  FROM (SELECT vec_id, list(code_pos ORDER BY s) AS cs
        FROM {an} GROUP BY vec_id) c,
       q,
       (SELECT flatten(list(cv ORDER BY pos)) AS f FROM {cbn}) fb
  WHERE c.vec_id <> q.qid""")
    pairs = "\n  UNION ALL\n".join(legs)
    return (
        _pq_train_cte()
        + f""",
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {sim.N_QUERIES}),
ex AS (
  SELECT qid, neighbor_id FROM (
    SELECT q.qid, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.qid ORDER BY
             list_reduce([0.0] || list_transform(range(1, {dim} + 1),
                 j -> (e.v[j] - q.qv[j]) * (e.v[j] - q.qv[j])),
               (acc, x) -> acc + x), e.vec_id) AS rn
    FROM e, q WHERE e.vec_id <> q.qid
  ) WHERE rn <= {sim.TOPK}
),
adcp AS ({pairs}
),
got AS (
  SELECT variant, qid, neighbor_id FROM (
    SELECT variant, qid, neighbor_id,
           row_number() OVER (PARTITION BY variant, qid
                              ORDER BY adc, neighbor_id) AS rn
    FROM adcp
  ) WHERE rn <= {sim.TOPK}
),
h AS (
  SELECT g.variant, g.qid, count(*) AS hits
  FROM got g JOIN ex ON g.qid = ex.qid AND g.neighbor_id = ex.neighbor_id
  GROUP BY g.variant, g.qid
),
nx AS (SELECT qid, count(*) AS n_exact FROM ex GROUP BY qid)
SELECT v.variant, nx.qid,
       nx.n_exact::BIGINT AS n_exact,
       coalesce(h.hits, 0)::BIGINT AS hits,
       round(coalesce(h.hits, 0)::DOUBLE / nx.n_exact, 6) AS recall
FROM nx CROSS JOIN (VALUES ('seed'), ('trained')) v(variant)
LEFT JOIN h ON h.variant = v.variant AND h.qid = nx.qid
"""
    )


def _sq8_cte() -> str:
    """Shared CTE fragment for the r14 scalar-quantization twins:
    per-dim exact (min, max) ranges, per-component 8-bit levels via
    floor(ratio * SQ_LEVELS + 0.5) — floor in BOTH engines, because
    F.round and DuckDB round() disagree on halves — and the identical
    reconstruction parenthesization mn + c * ((mx - mn) / 255.0)."""
    lv = sim.SQ_LEVELS
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ex AS (
  SELECT vec_id, pos - 1 AS pos0, x FROM (
    SELECT vec_id, unnest(v) AS x,
           unnest(range(1, len(v) + 1)) AS pos
    FROM e
  )
),
prm AS (
  SELECT pos0, min(x) AS mn, max(x) AS mx FROM ex GROUP BY pos0
),
qq AS (
  SELECT ex.vec_id, ex.pos0, ex.x, prm.mn, prm.mx,
         CASE WHEN prm.mx = prm.mn THEN 0
              ELSE CAST(floor((ex.x - prm.mn) / (prm.mx - prm.mn)
                              * {lv} + 0.5) AS BIGINT) END AS code
  FROM ex JOIN prm USING (pos0)
)"""


def _sq8_quantize_sql() -> str:
    """Exact replay twin of similarity.sq8_quantize: integer levels
    from the shared _sq8_cte, reconstruction with the identical
    expression tree, round-6 per-component error."""
    lv = float(sim.SQ_LEVELS)
    return (
        _sq8_cte()
        + f"""
SELECT vec_id, pos0::BIGINT AS pos, code::BIGINT AS code,
       round(abs(x - (mn + code * ((mx - mn) / {lv}))), 6) AS recon_err
FROM qq
"""
    )


def _sq8_topk_sql() -> str:
    """Exact replay twin of similarity.sq8_topk: codes list per
    vector (pos order), per-dim ranges as flat lists, the SAME
    j-ascending diffs-then-sum-of-squares fold (diffs materialized,
    then acc + d * d — bit-identical to the Spark transform+aggregate
    pair), ties (d2, neighbor_id)."""
    lv, dim = float(sim.SQ_LEVELS), sim.EMBED_DIM
    diff = (
        f"(q.qv[j] - (pm.mns[j] + c.cs[j]"
        f" * ((pm.mxs[j] - pm.mns[j]) / {lv})))"
    )
    return (
        _sq8_cte()
        + f""",
codes AS (
  SELECT vec_id, list(code ORDER BY pos0) AS cs FROM qq GROUP BY vec_id
),
pm AS (
  SELECT list(mn ORDER BY pos0) AS mns, list(mx ORDER BY pos0) AS mxs
  FROM prm
),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {sim.N_QUERIES}),
pairs AS (
  SELECT q.qid, c.vec_id AS neighbor_id,
         list_reduce([0.0] || list_transform(
             list_transform(range(1, {dim} + 1), j -> {diff}),
             d -> d * d),
           (acc, x) -> acc + x) AS d2
  FROM codes c, q, pm
  WHERE c.vec_id <> q.qid
)
SELECT qid, neighbor_id, round(d2, 6) AS sq_d2, rn::BIGINT AS rn FROM (
  SELECT qid, neighbor_id, d2,
         row_number() OVER (
           PARTITION BY qid ORDER BY d2, neighbor_id) AS rn
  FROM pairs
) WHERE rn <= {sim.TOPK}
"""
    )


def _sq8_recall_sql() -> str:
    """Exact replay twin of similarity.sq8_recall_report: the
    _sq8_topk_sql rank list and the exact squared-L2 rank list (the
    identical full-vector left fold) composed as nested CTEs — the
    ann_recall_report composition — then integer hit counting and one
    exact int/int division."""
    dim = sim.EMBED_DIM
    return f"""
        WITH ap AS ({_sq8_topk_sql()}),
        e2 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q2 AS (SELECT vec_id AS qid, v AS qv FROM e2
               WHERE vec_id < {sim.N_QUERIES}),
        ex AS (
          SELECT qid, neighbor_id FROM (
            SELECT q2.qid, e2.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q2.qid ORDER BY
                     list_reduce([0.0] || list_transform(range(1, {dim} + 1),
                         j -> (e2.v[j] - q2.qv[j]) * (e2.v[j] - q2.qv[j])),
                       (acc, x) -> acc + x), e2.vec_id) AS rn
            FROM e2, q2 WHERE e2.vec_id <> q2.qid
          ) WHERE rn <= {sim.TOPK}
        ),
        pq AS (SELECT qid, count(*) AS n_exact FROM ex GROUP BY 1),
        h AS (
          SELECT ex.qid, count(*) AS n_hit
          FROM ex JOIN ap
            ON ex.qid = ap.qid AND ex.neighbor_id = ap.neighbor_id
          GROUP BY 1
        )
        SELECT 'sq8' AS index, pq.qid, pq.n_exact,
               coalesce(h.n_hit, 0)::BIGINT AS n_hit,
               round(coalesce(h.n_hit, 0)::DOUBLE / pq.n_exact, 6) AS recall
        FROM pq LEFT JOIN h ON pq.qid = h.qid
    """


def _wav_pay_cte() -> str:
    """Shared CTE fragment rebuilding every synthetic WAV container as
    a hex string with independent string ops (mirrors
    multimodal.make_wav_table byte for byte) — consumed by both the
    wav_header_stats and audio_energy oracles."""
    hdr = " || ".join(
        [
            "'52494646'",
            _wav_le("dsz + 36", 4),
            "'57415645'",
            "'666D7420'",
            _wav_le("16", 4),
            _wav_le("1", 2),
            _wav_le("ch", 2),
            _wav_le("rate", 4),
            _wav_le("rate * ch * 2", 4),
            _wav_le("ch * 2", 2),
            _wav_le(str(mm.WAV_BITS), 2),
            "'64617461'",
            _wav_le("dsz", 4),
        ]
    )
    return f"""
        med AS (
          SELECT doc_id, doc_id % 2 + 1 AS ch,
                 (doc_id % 3 + 1) * 8000 AS rate,
                 octet_length(encode(text))::BIGINT AS dsz,
                 hex(encode(text)) AS body
          FROM documents
        ),
        pay AS (SELECT doc_id, {hdr} || body AS hx FROM med)"""


def _wav_stats_sql() -> str:
    """Hex-domain twin of multimodal.wav_header_stats (the
    multimodal_features / audio_energy pattern): rebuild the canonical
    44-byte RIFF/WAVE header + payload as a hex string with
    independent string ops, then PARSE the little-endian fmt/data
    fields back out of the hex at the spec offsets (byte b lives at
    1-based hex position 2b+1; LE values read byte pairs reversed) —
    so the Spark side's generic executor chunk scan is verified
    against a fixed-offset reparse of the same bytes, field for
    field.  n_frames/duration use the same exact int floor-div and
    int/int double division, rounded at 6 in both engines."""
    return f"""
        WITH {_wav_pay_cte()},
        p AS (
          SELECT doc_id,
                 {_wav_rd(22, 2)} AS n_channels,
                 {_wav_rd(24, 4)} AS sample_rate,
                 {_wav_rd(34, 2)} AS bits,
                 least({_wav_rd(40, 4)},
                       (length(hx) // 2) - {mm.WAV_HEADER_LEN}) AS data_bytes
          FROM pay
        )
        SELECT doc_id, n_channels, sample_rate, bits, data_bytes,
               (data_bytes // (n_channels * (bits // 8)))::BIGINT AS n_frames,
               round((data_bytes // (n_channels * (bits // 8)))
                     * 1000.0 / sample_rate, 6) AS duration_ms
        FROM p
    """


def _audio_energy_sql() -> str:
    """Hex-domain twin of multimodal.audio_energy (r12 — VERDICT r11
    #6): reparse ch/rate/bits from the WAV hex at the spec offsets,
    derive the SAME rate-dependent geometry (rate // WAV_WIN_DIVISOR
    frames, 50% hop, a window = win_frames * ch contiguous interleaved
    samples), and replay the int16-LE PCM sample sums from the hex —
    sample s of the data body is bytes 44+2s/44+2s+1 (lo/hi), signed
    via (+32768) % 65536 - 32768.  Window square-sums are exact
    integers in BIGINT (<= 32767^2 * 960 ~ 1e12), so only the final
    /ws, sqrt and round are float — identical IEEE ops in both
    engines.  The fixed-offset 44 here is the independence point: the
    Spark side slices at the PARSED data offset, the oracle at the
    canonical spec offset, and they must agree."""
    base = 2 * mm.WAV_HEADER_LEN + 1  # 1-based hex position of data byte 0
    return f"""
        WITH {_wav_pay_cte()},
        p AS (
          SELECT doc_id, hx,
                 {_wav_rd(22, 2)} AS ch,
                 {_wav_rd(24, 4)} AS rate,
                 {_wav_rd(34, 2)} AS bits,
                 least({_wav_rd(40, 4)},
                       (length(hx) // 2) - {mm.WAV_HEADER_LEN}) AS data_bytes
          FROM pay
        ),
        g AS (
          SELECT doc_id, hx, rate,
                 (rate // {mm.WAV_WIN_DIVISOR}) * ch AS ws,
                 ((rate // {mm.WAV_WIN_DIVISOR}) // 2) * ch AS hop,
                 data_bytes // 2 AS n_samp
          FROM p
          WHERE bits = 16 AND rate // {mm.WAV_WIN_DIVISOR} >= 2
        ),
        wins AS (
          SELECT doc_id, hx, rate, ws, hop, w
          FROM g, unnest(range(0,
                 CASE WHEN n_samp >= ws THEN (n_samp - ws) // hop + 1
                      ELSE 0 END)) AS uw(w)
        )
        SELECT doc_id, w::BIGINT AS win_idx, rate::BIGINT AS sample_rate,
               round(sqrt(list_sum(list_transform(
                 list_transform(range(0, ws), s ->
                   (('0x' || substr(hx, {base} + 4 * (w * hop + s) + 2, 2)
                          || substr(hx, {base} + 4 * (w * hop + s), 2)
                    )::BIGINT + 32768) % 65536 - 32768),
                 v -> v * v))::DOUBLE / ws), 6) AS rms
        FROM wins
    """


def _curation_final_sql(sw: str) -> str:
    """Shared oracle CTE chain for the end-to-end curation composition:
    everything up to ``final`` (the surviving docs with per-doc token
    counts) — consumed by both the curation_pipeline accounting and the
    shard_manifest pack accounting.  The quality and stopword scores
    are rounded to 6 decimals BEFORE the threshold compare, mirroring
    operators/pipeline.curated_docs, so boundary decisions are
    representation-stable across engines."""
    return f"""
            WITH toks AS (
              SELECT doc_id, source, text,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            base AS (
              SELECT doc_id, source, len(t) AS nt,
                     round(len(list_filter(list_distinct(t),
                         x -> list_contains([{sw}], x)))::DOUBLE
                       / greatest(len(list_distinct(t)), 1), 6) AS swr,
                     round(least(1.0, len(t) / 100.0) * 0.5
                       + (1.0 - length(regexp_replace(text, '[^,.]', '', 'g'))::DOUBLE
                              / greatest(length(text), 1)) * 0.3
                       + least(1.0,
                           (coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                              / greatest(len(t), 1)) / 8.0) * 0.2, 6) AS q,
                     md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
              FROM toks
            ),
            bgf AS (
              SELECT doc_id, bg, count(*) AS c FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(t)),
                           i -> t[i] || ' ' || t[i+1])) AS bg
                FROM toks
              ) GROUP BY doc_id, bg
            ),
            rep AS (
              SELECT doc_id,
                     CAST(max(c)::DOUBLE / sum(c)::DOUBLE > 0.10 AS BIGINT)
                       AS rep_flag
              FROM bgf GROUP BY doc_id
            ),
            grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, len(t) - 3),
                         i -> array_to_string(t[i:i+4], ' '))) AS gs
              FROM toks
            ),
            flat AS (SELECT doc_id, unnest(gs) AS g FROM grams),
            bench AS (SELECT DISTINCT g FROM flat WHERE doc_id % 20 = 0),
            contaminated AS (
              SELECT DISTINCT f.doc_id
              FROM flat f JOIN bench b USING (g)
              WHERE f.doc_id % 20 <> 0
            ),
            kept AS (
              SELECT b.*
              FROM base b
              LEFT JOIN rep r USING (doc_id)
              WHERE b.doc_id % 20 <> 0
                AND b.swr >= 0.08
                AND b.q >= 0.5
                AND coalesce(r.rep_flag, 0) = 0
                AND b.doc_id NOT IN (SELECT doc_id FROM contaminated)
            ),
            final AS (
              SELECT k.* FROM kept k
              JOIN (SELECT fp, min(doc_id) AS doc_id FROM kept GROUP BY fp) m
                ON k.fp = m.fp AND k.doc_id = m.doc_id
            )
    """


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference's shipped word count) on sf0.001."""
    return ta.word_count(spark, "/root/testdata/sf0.001")


# ORDER MATTERS for the first 50 queries() entries: the driver's
# correctness harness verifies exactly entries 1-50 against oracle_sql,
# and green rows bank cumulatively across rounds.  The window for THIS
# round is the explicit list below; queries() reorders the registry so
# these come first.  Rotation history lives in
# .claude/skills/verify/SKILL.md; scripts/rotation.py proposes the next
# round's list (most-recently-changed operators first once the full
# registry has banked rows).
#
# r13 composition — generated by `python scripts/ledger.py sync`
# followed by `python scripts/paste_window.py` (wraps rotation.py and
# rewrites both pinned copies), repasted after the round's final
# operator commit.  Final: the 2 fidelity anchors; the round's 3 new
# ops (ann_ivf_adc, ivf_pq_residual, dsir_weights — never banked);
# 20 genuinely-stale re-verifications (the similarity/PQ family
# reworked this round — single-pass dists, checkpointed Lloyd,
# codebook transport — plus every dedup/text query whose hash moved
# when _input_bytes gained the Hadoop-FS route and audio_energy's
# rounding helper changed); then the ENTIRE r6 evidence tail VERDICT
# r12 #2 listed (bigram_logprob_score, cdc_dup_chunks,
# contamination_report, corpus_summary, embedding_outliers,
# embedding_stats, lang_entropy, ngram_novelty, weighted_sample + 15
# TPC-H queries — 24 slots) + 1 r7 backfill (bloom_decontaminate).
# Every windowed entry has an exact DuckDB oracle (pinned by
# test_driver_window_is_oracle_backed).
WINDOW_ROUND = 18  # must equal max(CORRECTNESS_r*.json) + 1 — pinned by
# tests/test_oracle_parity.py::test_window_round_is_fresh (VERDICT r11 #1:
# r11 silently re-ran the r10 window; this makes a stale window a red test).
DRIVER_WINDOW_R18 = [
    "word_count",  # anchor
    "grep",  # anchor
    "minhash_lsh_neardup",  # stale (hash changed since r13 row)
    "cosine_topk",  # stale (hash changed since r14 row)
    "ivf_split_plan",  # stale (hash changed since r16 row)
    "streaming_cell_occupancy",  # stale (hash changed since r16 row)
    "streaming_pq_ingest",  # stale (hash changed since r16 row)
    "adc_rerank_topk",  # stale (hash changed since r17 row)
    "ann_ivf",  # stale (hash changed since r17 row)
    "ann_ivf_adc",  # stale (hash changed since r17 row)
    "ann_probe_sweep",  # stale (hash changed since r17 row)
    "ann_recall_report",  # stale (hash changed since r17 row)
    "bm25_recall_report",  # stale (hash changed since r17 row)
    "cc_star",  # stale (hash changed since r17 row)
    "cluster_balanced_sample",  # stale (hash changed since r17 row)
    "cluster_diameter",  # stale (hash changed since r17 row)
    "dedup_clusters",  # stale (hash changed since r17 row)
    "dedup_rate_by_threshold",  # stale (hash changed since r17 row)
    "filtered_ann_recall_report",  # stale (hash changed since r17 row)
    "incremental_dedup",  # stale (hash changed since r17 row)
    "ivf_pq_adc_topk",  # stale (hash changed since r17 row)
    "ivf_pq_probe_sweep",  # stale (hash changed since r17 row)
    "ivf_pq_recall_report",  # stale (hash changed since r17 row)
    "ivf_pq_rerank_recall_report",  # stale (hash changed since r17 row)
    "ivf_pq_rerank_topk",  # stale (hash changed since r17 row)
    "ivf_pq_residual",  # stale (hash changed since r17 row)
    "ivf_split_apply",  # stale (hash changed since r17 row)
    "lexical_semantic_rrf",  # stale (hash changed since r17 row)
    "neardup_audit",  # stale (hash changed since r17 row)
    "ngram_jaccard_neardup",  # stale (hash changed since r17 row)
    "pq_adc_topk",  # stale (hash changed since r17 row)
    "pq_bits_recall_report",  # stale (hash changed since r17 row)
    "pq_quantize",  # stale (hash changed since r17 row)
    "pq_recall_report",  # stale (hash changed since r17 row)
    "pq_train_codebooks",  # stale (hash changed since r17 row)
    "rerank_cap_sweep",  # stale (hash changed since r17 row)
    "rrf_fusion",  # stale (hash changed since r17 row)
    "source_overlap",  # stale (hash changed since r17 row)
    "sorted_neighborhood_neardup",  # backfill (last banked r9)
    "stratified_sample",  # backfill (last banked r9)
    "streaming_active_users",  # backfill (last banked r9)
    "streaming_curated_ingest",  # backfill (last banked r9)
    "streaming_enriched_revenue",  # backfill (last banked r9)
    "streaming_hourly_counts",  # backfill (last banked r9)
    "streaming_ohlc",  # backfill (last banked r9)
    "streaming_sessions",  # backfill (last banked r9)
    "tf_idf",  # backfill (last banked r9)
    "token_stats",  # backfill (last banked r9)
    "trade_edges",  # backfill (last banked r9)
    "trade_flows_2hop",  # backfill (last banked r9)
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # The rows-only-by-design set is EMPTY since r15:
    # approx_distinct_users (the last member — HLL++ internals have no
    # DuckDB twin by construction) was converted to the audited form
    # whose verified output is the exact leg + in-output bound checks,
    # VERDICT r14 #5.  History: simhash / simhash_neardup /
    # minhash_lsh_neardup left the set in r9 (md5-derived hashing);
    # ann_lsh / ann_ivf / audio_energy in r10 (plane-literal fold
    # replay, unrolled Lloyd CTE, hex-domain PCM replay); bpe_merges
    # in r11 (unrolled merge-recurrence CTE, _bpe_merges_sql).
    reg = {
        # (registry order is historical; DRIVER_WINDOW_R18 defines the
        #  verified window — see the note above)
        "word_count": ta.word_count,
        "grep": ta.grep,
        # --- first-timers: MR engine + curation integrity ---
        "inverted_index_mr": mr.inverted_index_mr,
        "contamination_report": pl.contamination_report,
        # --- first-timers: SQL/window/UDF catalog long tail ---
        "window_funcs_catalog": adv.window_funcs_catalog,
        "scalar_subquery": adv.scalar_subquery,
        "skew_safe_distinct": adv.skew_safe_distinct,
        "token_positions": adv.token_positions,
        "grouping_sets_pricing": adv.grouping_sets_pricing,
        "pandas_udaf_geomean": adv.pandas_udaf_geomean,
        "udtf_chunk_text": adv.udtf_chunk_text,
        "time_rollup": adv.time_rollup,
        "deterministic_sample": adv.deterministic_sample,
        "stats_aggregates": adv.stats_aggregates,
        "not_in_null_aware": adv.not_in_null_aware,
        "argmax_order": adv.argmax_order,
        "nested_roundtrip": adv.nested_roundtrip,
        "cross_join_grid": adv.cross_join_grid,
        "bag_except": adv.bag_except,
        "date_funcs": adv.date_funcs,
        # --- first-timers: graph ---
        "pagerank_nations": gr.pagerank_nations,
        "trade_edges": gr.trade_edges,
        # --- first-timers: embeddings ---
        "embedding_stats": sim.embedding_stats,
        "embedding_outliers": sim.embedding_outliers,
        # --- first-timers: the remaining TPC-H backlog (15 shapes) ---
        "tpch_q2": tpch.tpch_q2,
        "tpch_q3": tpch.tpch_q3,
        "tpch_q4": tpch.tpch_q4,
        "tpch_q6": tpch.tpch_q6,
        "tpch_q7": tpch.tpch_q7,
        "tpch_q8": tpch.tpch_q8,
        "tpch_q10": tpch.tpch_q10,
        "tpch_q11": tpch.tpch_q11,
        "tpch_q12": tpch.tpch_q12,
        "tpch_q13": tpch.tpch_q13,
        "tpch_q14": tpch.tpch_q14,
        "tpch_q15": tpch.tpch_q15,
        "tpch_q19": tpch.tpch_q19,
        "tpch_q20": tpch.tpch_q20,
        "tpch_q22": tpch.tpch_q22,
        # --- first-timers: the round-5 analytics ---
        "zipf_slope": ta.zipf_slope,
        "bigram_logprob_score": pl.bigram_logprob_score,
        "weighted_sample": pl.weighted_sample,
        "lang_entropy": pl.lang_entropy,
        "kl_source_divergence": pl.kl_source_divergence,
        "source_signature": pl.source_signature,
        "containment_neardup": dd.containment_neardup,
        "cdc_dup_chunks": dd.cdc_dup_chunks,
        "ngram_novelty": pl.ngram_novelty,
        "corpus_summary": pl.corpus_summary,
        "neardup_audit": dd.neardup_audit,
        # --- first-timers: the three round-5 streaming signals ---
        "streaming_sessions": es.streaming_sessions,
        "streaming_enriched_revenue": es.streaming_enriched_revenue,
        "streaming_curated_ingest": es.streaming_curated_ingest,
        # ---------- entries past the driver window (local parity only) ----------
        "inverted_index": ta.inverted_index,
        "token_stats": ta.token_stats,
        "key_count": rel.key_count,
        "key_stats": rel.key_stats,
        "select_project": rel.select_project,
        "histogram": rel.histogram,
        "join_revenue_by_nation": rel.join_revenue_by_nation,
        "edge_inversion": rel.edge_inversion,
        "distributed_sort": rel.distributed_sort,
        "topk_per_group": rel.topk_per_group,
        "rollup_pricing": rel.rollup_pricing,
        "sessionize": rel.sessionize,
        "join_outer": adv.join_outer,
        "join_full_outer": adv.join_full_outer,
        "salted_join": adv.salted_join,
        "asof_join": adv.asof_join,
        "range_join_events": adv.range_join_events,
        "merge_upsert": adv.merge_upsert,
        "window_frames": adv.window_frames,
        "sql_segment_spend": sqlapi.sql_segment_spend,
        "dedup_exact": dd.dedup_exact,
        "ngram_jaccard_neardup": dd.ngram_jaccard_neardup,
        "dedup_clusters": dd.dedup_clusters,
        "incremental_dedup": dd.incremental_dedup,
        "dup_spans": dd.dup_spans,
        "fuzzy_blocked_join": dd.fuzzy_blocked_join,
        "cosine_topk": sim.cosine_topk,
        "multimodal_features": mm.multimodal_features,
        "funnel_conversion": ts.funnel_conversion,
        "retention_cohorts": ts.retention_cohorts,
        "gap_fill": ts.gap_fill,
        "rolling_time_window": ts.rolling_time_window,
        "triangle_count": gr.triangle_count,
        "decontamination": pl.decontamination,
        "data_mixture": pl.data_mixture,
        "repetition_filter": pl.repetition_filter,
        "unigram_logprob_score": pl.unigram_logprob_score,
        "pack_sequences": pl.pack_sequences,
        "split_assign": pl.split_assign,
        "curation_pipeline": pl.curation_pipeline,
        "shard_manifest": pl.shard_manifest,
        "tpch_q1": tpch.tpch_q1,
        "tpch_q5": tpch.tpch_q5,
        "tpch_q9": tpch.tpch_q9,
        "tpch_q16": tpch.tpch_q16,
        "tpch_q17": tpch.tpch_q17,
        "tpch_q18": tpch.tpch_q18,
        "tpch_q21": tpch.tpch_q21,
        "streaming_active_users": es.streaming_active_users,
        "streaming_hourly_counts": es.streaming_hourly_counts,
        "tf_idf": ta.tf_idf,
        "word_pmi": ta.word_pmi,
        "pii_scrub": ta.pii_scrub,
        "stratified_sample": ta.stratified_sample,
        "distinct_count": rel.distinct_count,
        "join_anti": rel.join_anti,
        "source_overlap": dd.source_overlap,
        "embedding_neardup": sim.embedding_neardup,
        "unpivot_measures": adv.unpivot_measures,
        "percentile_by_brand": adv.percentile_by_brand,
        "json_extract_agg": adv.json_extract_agg,
        "event_transitions": ts.event_transitions,
        "trade_flows_2hop": gr.trade_flows_2hop,
        "keep_best_dedup": pl.keep_best_dedup,
        "mixture_weights": pl.mixture_weights,
        "dsir_weights": pl.dsir_weights,
        "bpe_token_count": ta.bpe_token_count,
        "rolling_fingerprint": ta.rolling_fingerprint,
        "cube_pricing": adv.cube_pricing,
        "frame_offsets": lambda spark, sf_dir: mm.frame_sample(
            mm.make_media_table(spark, sf_dir)
        ).selectExpr("doc_id", "cast(frame_offset as long) AS frame_offset"),
        "bigram_count": ta.bigram_count,
        "language_id": ta.language_id,
        "quality_score": ta.quality_score,
        "fingerprint": ta.fingerprint,
        "join_semi": rel.join_semi,
        "set_ops": rel.set_ops,
        "global_rank": rel.global_rank,
        "topk_global": rel.topk_global,
        "window_running": rel.window_running,
        "pivot_status": rel.pivot_status,
        "scalar_funcs": adv.scalar_funcs,
        "simhash": dd.simhash,
        "simhash_neardup": dd.simhash_neardup,
        "bpe_merges": ta.bpe_merges,
        "audio_energy": mm.audio_energy,
        "wav_header_stats": mm.wav_header_stats,
        "pq_quantize": sim.pq_quantize,
        "pq_adc_topk": sim.pq_adc_topk,
        "ann_ivf_adc": sim.ann_ivf_adc,
        "ivf_pq_residual": sim.ivf_pq_residual,
        "pq_train_codebooks": sim.pq_train_codebooks,
        "pq_recall_report": sim.pq_recall_report,
        "sq8_quantize": sim.sq8_quantize,
        "sq8_topk": sim.sq8_topk,
        "sq8_recall_report": sim.sq8_recall_report,
        # --- round-15 additions ---
        "ann_probe_sweep": sim.ann_probe_sweep,
        "ivf_pq_adc_topk": sim.ivf_pq_adc_topk,
        "ivf_pq_recall_report": sim.ivf_pq_recall_report,
        "ann_filtered_topk": sim.ann_filtered_topk,
        "filtered_ann_recall_report": sim.filtered_ann_recall_report,
        "streaming_cell_occupancy": es.streaming_cell_occupancy,
        "adc_rerank_topk": sim.adc_rerank_topk,
        # --- round-16 additions ---
        "ivf_pq_rerank_topk": sim.ivf_pq_rerank_topk,
        "ivf_pq_rerank_recall_report": sim.ivf_pq_rerank_recall_report,
        "ivf_pq_probe_sweep": sim.ivf_pq_probe_sweep,
        "streaming_pq_ingest": es.streaming_pq_ingest,
        "global_shuffle_shards": pl.global_shuffle_shards,
        "ivf_split_plan": sim.ivf_split_plan,
        # --- round-17 additions ---
        "rerank_cap_sweep": sim.rerank_cap_sweep,
        "pq_bits_recall_report": sim.pq_bits_recall_report,
        "ivf_split_apply": sim.ivf_split_apply,
        "ann_lsh": sim.ann_lsh,
        "ann_ivf": sim.ann_ivf,
        "word_count_mr": mr.word_count_mr,
        "grep_mr": mr.grep_mr,
        "except_op": adv.except_op,
        "approx_distinct_users": adv.approx_distinct_users,
        "prior_order": adv.prior_order,
        "union_all_op": adv.union_all_op,
        "map_explode": adv.map_explode,
        "minhash_lsh_neardup": dd.minhash_lsh_neardup,
        # round-6 additions (window candidates for the next rotation)
        "streaming_curated_ingest_watermarked": es.streaming_curated_ingest_watermarked,
        "token_budget_cap": pl.token_budget_cap,
        "kmeans_step": sim.kmeans_step,
        "bloom_decontaminate": pl.bloom_decontaminate,
        "langid_eval": ta.langid_eval,
        "quality_calibration": pl.quality_calibration,
        "dedup_rate_by_threshold": dd.dedup_rate_by_threshold,
        "semdedup_prune": sim.semdedup_prune,
        "packing_efficiency": pl.packing_efficiency,
        "hll_distinct_users": sk.hll_distinct_users,
        "countmin_heavy_hitters": sk.countmin_heavy_hitters,
        "time_weighted_avg": ts.time_weighted_avg,
        "ewma_anomaly": ts.ewma_anomaly,
        "ohlc_bars": ts.ohlc_bars,
        "scd2_intervals": ts.scd2_intervals,
        "market_basket_rules": gr.market_basket_rules,
        "label_prop_step": gr.label_prop_step,
        "streaming_distinct_users_hll": es.streaming_distinct_users_hll,
        "quantile_sketch_quality": sk.quantile_sketch_quality,
        "kmeans_iterate": sim.kmeans_iterate,
        # round-7 additions
        "embedding_neardup_strict": sim.embedding_neardup_strict,
        "orc_roundtrip": pl.orc_roundtrip,
        "hll_union_types": sk.hll_union_types,
        "bucketed_join_revenue": adv.bucketed_join_revenue,
        "label_prop_iterate": gr.label_prop_iterate,
        "streaming_heavy_hitters": es.streaming_heavy_hitters,
        "prefix_filter_neardup": dd.prefix_filter_neardup,
        "streaming_custom_sessions": es.streaming_custom_sessions,
        "hll_intersect_types": sk.hll_intersect_types,
        "kmv_intersect_types": sk.kmv_intersect_types,
        "streaming_quantile_quality": es.streaming_quantile_quality,
        "length_ks_by_source": pl.length_ks_by_source,
        # round-8 additions
        "ppjoin_neardup": dd.ppjoin_neardup,
        "pagerank_docs": gr.pagerank_docs,
        "compaction_roundtrip": pl.compaction_roundtrip,
        "streaming_funnel_pairs": es.streaming_funnel_pairs,
        "streaming_dedup_ingest": es.streaming_dedup_ingest,
        "runtime_filter_join": adv.runtime_filter_join,
        "cluster_diameter": dd.cluster_diameter,
        "cc_star": gr.cc_star,
        "kcore_peel": gr.kcore_peel,
        "zorder_layout": adv.zorder_layout,
        "skew_profile": adv.skew_profile,
        "range_partition_plan": adv.range_partition_plan,
        # round-9 additions
        "interval_concurrency": ts.interval_concurrency,
        "mad_outliers": ts.mad_outliers,
        "event_trigrams": ts.event_trigrams,
        "clustering_coeff": gr.clustering_coeff,
        "neyman_allocation": pl.neyman_allocation,
        "oov_rate": pl.oov_rate,
        "evolution_roundtrip": pl.evolution_roundtrip,
        "dq_referential_audit": adv.dq_referential_audit,
        "streaming_ohlc": es.streaming_ohlc,
        "sssp_parts": gr.sssp_parts,
        "array_funcs_catalog": adv.array_funcs_catalog,
        "null_safe_join": adv.null_safe_join,
        "ivm_source_stats": pl.ivm_source_stats,
        "streaming_abandoned_views": es.streaming_abandoned_views,
        "sentence_stats": ta.sentence_stats,
        "basket_triples": gr.basket_triples,
        "linreg_by_group": adv.linreg_by_group,
        "weighted_median": adv.weighted_median,
        "benford_digits": adv.benford_digits,
        "gaps_islands": ts.gaps_islands,
        "kaplan_meier": ts.kaplan_meier,
        "sorted_neighborhood_neardup": dd.sorted_neighborhood_neardup,
        # --- round-10 additions ---
        "degree_assortativity": gr.degree_assortativity,
        "cusum_drift": ts.cusum_drift,
        "media_type_profile": mm.media_type_profile,
        "rrf_fusion": sim.rrf_fusion,
        "readability": ta.readability,
        # --- round-13 second-session additions ---
        "bm25_topk": ta.bm25_topk,
        "bm25_pruned_topk": ta.bm25_pruned_topk,
        "lexical_semantic_rrf": ta.lexical_semantic_rrf,
        "bm25_recall_report": ta.bm25_recall_report,
        "pca_power_iter": sim.pca_power_iter,
        "pca_debias": sim.pca_debias,
        "ann_recall_report": sim.ann_recall_report,
        "cluster_balanced_sample": sim.cluster_balanced_sample,
        "streaming_index_ingest": es.streaming_index_ingest,
        "jsonl_roundtrip": pl.jsonl_roundtrip,
    }
    ordered = {k: reg[k] for k in DRIVER_WINDOW_R18}
    ordered.update((k, v) for k, v in reg.items() if k not in ordered)
    return ordered


_HLL_ORACLE = f"""
            -- from-scratch HyperLogLog, identical register construction
            WITH ev AS (
              SELECT event_type, user_id::VARCHAR AS u FROM events
            ),
            h AS (
              SELECT event_type, u,
                     ('0x' || substr(md5(u), 1, 12))::BIGINT AS hv
              FROM ev
            ),
            r AS (
              SELECT event_type, hv % {sk.HLL_M} AS bucket,
                     CASE WHEN hv // {sk.HLL_M} > 0
                          THEN {sk._HLL_HASH_BITS - sk.HLL_P + 1} - length(bin(hv // {sk.HLL_M}))
                          ELSE {sk._HLL_HASH_BITS - sk.HLL_P + 1} END AS rk
              FROM h
            ),
            regs AS (
              SELECT event_type, bucket, max(rk) AS r
              FROM r GROUP BY event_type, bucket
            ),
            pt AS (
              SELECT event_type, sum(power(2.0, -r)) AS s,
                     count(*) AS nonzero
              FROM regs GROUP BY event_type
            ),
            ex AS (
              SELECT event_type, count(DISTINCT u) AS n_exact FROM ev GROUP BY event_type
            ),
            est AS (
              SELECT pt.event_type,
                     CASE WHEN {sk.HLL_ALPHA!r}::DOUBLE * {sk.HLL_M} * {sk.HLL_M}
                               / (s + ({sk.HLL_M} - nonzero)) <= 2.5 * {sk.HLL_M}
                               AND {sk.HLL_M} - nonzero > 0
                          THEN {sk.HLL_M}::DOUBLE * ln({sk.HLL_M}::DOUBLE / ({sk.HLL_M} - nonzero))
                          ELSE {sk.HLL_ALPHA!r}::DOUBLE * {sk.HLL_M} * {sk.HLL_M}
                               / (s + ({sk.HLL_M} - nonzero)) END AS e
              FROM pt
            )
            SELECT ex.event_type, CAST(n_exact AS BIGINT) AS n_exact,
                   round(e, 4) AS n_hll,
                   round((e - n_exact) / n_exact, 6) AS rel_err
            FROM est JOIN ex ON est.event_type = ex.event_type
        """

_HLL_UNION_ORACLE = f"""
            -- per-type registers + the ALL row merged by max(r) over
            -- buckets: the oracle rebuilds the UNION SKETCH the same
            -- way the operator does (register algebra, not a rescan)
            WITH ev AS (
              SELECT event_type, user_id::VARCHAR AS u FROM events
            ),
            h AS (
              SELECT event_type, u,
                     ('0x' || substr(md5(u), 1, 12))::BIGINT AS hv
              FROM ev
            ),
            rr AS (
              SELECT event_type, hv % {sk.HLL_M} AS bucket,
                     CASE WHEN hv // {sk.HLL_M} > 0
                          THEN {sk._HLL_HASH_BITS - sk.HLL_P + 1} - length(bin(hv // {sk.HLL_M}))
                          ELSE {sk._HLL_HASH_BITS - sk.HLL_P + 1} END AS rk
              FROM h
            ),
            regs0 AS (
              SELECT event_type, bucket, max(rk) AS r
              FROM rr GROUP BY event_type, bucket
            ),
            regs AS (
              SELECT * FROM regs0
              UNION ALL
              SELECT 'ALL' AS event_type, bucket, max(r) AS r
              FROM regs0 GROUP BY bucket
            ),
            pt AS (
              SELECT event_type, sum(power(2.0, -r)) AS s,
                     count(*) AS nonzero
              FROM regs GROUP BY event_type
            ),
            ex AS (
              SELECT event_type, count(DISTINCT u) AS n_exact FROM ev GROUP BY event_type
              UNION ALL
              SELECT 'ALL', count(DISTINCT u) FROM ev
            ),
            est AS (
              SELECT pt.event_type,
                     CASE WHEN {sk.HLL_ALPHA!r}::DOUBLE * {sk.HLL_M} * {sk.HLL_M}
                               / (s + ({sk.HLL_M} - nonzero)) <= 2.5 * {sk.HLL_M}
                               AND {sk.HLL_M} - nonzero > 0
                          THEN {sk.HLL_M}::DOUBLE * ln({sk.HLL_M}::DOUBLE / ({sk.HLL_M} - nonzero))
                          ELSE {sk.HLL_ALPHA!r}::DOUBLE * {sk.HLL_M} * {sk.HLL_M}
                               / (s + ({sk.HLL_M} - nonzero)) END AS e
              FROM pt
            )
            SELECT ex.event_type, CAST(n_exact AS BIGINT) AS n_exact,
                   round(e, 4) AS n_hll,
                   round((e - n_exact) / n_exact, 6) AS rel_err
            FROM est JOIN ex ON est.event_type = ex.event_type
        """




def _skew_profile_sql() -> str:
    """DuckDB twin of operators.advanced.skew_profile — generated from
    the same SKEW_PROFILE_KEYS spec and the same md5 partitioner."""
    R = adv.SKEW_REDUCERS
    parts = []
    for label, table, col in adv.SKEW_PROFILE_KEYS:
        per_key = (
            f"SELECT coalesce({col}::VARCHAR, '∅') AS k, count(*) AS cnt "
            f"FROM {table} GROUP BY 1"
        )
        parts.append(f"""
        SELECT '{label}' AS key_name,
               ks.n_rows::BIGINT AS n_rows,
               ks.n_keys::BIGINT AS n_keys,
               ks.top_key_rows::BIGINT AS top_key_rows,
               round(ks.top_key_rows::DOUBLE / ks.n_rows, 6) AS top_share,
               ls.max_reducer_rows::BIGINT AS max_reducer_rows,
               ({R} - ls.n_nonempty)::BIGINT AS n_empty_reducers,
               round(ls.max_reducer_rows::DOUBLE * {R} / ks.n_rows, 6) AS skew_ratio
        FROM (
          SELECT sum(cnt) AS n_rows, count(*) AS n_keys, max(cnt) AS top_key_rows
          FROM ({per_key})
        ) ks, (
          SELECT max(load) AS max_reducer_rows, count(*) AS n_nonempty
          FROM (
            SELECT ('0x' || substr(md5(k), 1, 12))::BIGINT % {R} AS r,
                   sum(cnt) AS load
            FROM ({per_key}) GROUP BY 1
          )
        ) ls""")
    return " UNION ALL ".join(parts)


def _zvalue_sql(x: str, y: str) -> str:
    """The ANSI-SQL twin of operators.advanced._zvalue: bit i of x →
    position 2i, bit i of y → 2i+1, Z_BITS bits each."""
    from mapreduceinfrastructure_spark.operators import advanced as _adv

    terms = []
    for i in range(_adv.Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _pca_power_sql() -> str:
    """Unrolled power iterations mirroring similarity.pca_power_iter:
    the same mean, the same exact-binary start vector, the same
    fixed-order per-row folds and driver-fold normalization (seeded
    list_reduce), the same Rayleigh/(n-1) eigenvalue — per-pos row
    sums are each engine's own float agg, contracted by normalization
    and rounded at 6 (the kmeans_iterate discipline).  Degenerate
    all-zero/constant corpora are guarded the same way the Spark loop
    guards them: Spark breaks out when nrm == 0 (keeping the previous
    direction, a fixpoint since y stays all-zero afterwards), and the
    SQL w{i} CTE mirrors that with CASE WHEN nrm = 0 THEN w{p} — both
    engines then report lam = 0 and the PCA_START direction."""
    iters, d = sim.PCA_ITERS, sim.EMBED_DIM
    start = repr(sim.PCA_START)
    parts = [
        f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT count(*) AS n FROM e),
mu AS (
  SELECT array_agg(m ORDER BY pos) AS mu FROM (
    SELECT pos, avg(val) AS m FROM (
      SELECT unnest(v) AS val, unnest(range(1, len(v) + 1)) AS pos FROM e
    ) GROUP BY pos
  )
),
w0 AS (SELECT list_transform(range(1, {d + 1}), q -> {start}) AS w)"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f""",
s{i} AS (
  SELECT e.vec_id, e.v,
         list_reduce([0.0] || list_transform(range(1, {d + 1}),
             q -> (e.v[q] - mu.mu[q]) * w{p}.w[q]), (a, b) -> a + b) AS s
  FROM e CROSS JOIN mu CROSS JOIN w{p}
),
y{i} AS (
  SELECT array_agg(yv ORDER BY pos) AS y FROM (
    SELECT pos, sum((s{i}.v[pos] - mu.mu[pos]) * s{i}.s) AS yv
    FROM s{i} CROSS JOIN mu, unnest(range(1, {d + 1})) AS u(pos)
    GROUP BY pos
  )
),
l{i} AS (
  SELECT list_reduce([0.0] || list_transform(range(1, {d + 1}),
             q -> w{p}.w[q] * y{i}.y[q]), (a, b) -> a + b)
         / (n.n - 1) AS lam,
         sqrt(list_reduce([0.0] || list_transform(range(1, {d + 1}),
             q -> y{i}.y[q] * y{i}.y[q]), (a, b) -> a + b)) AS nrm
  FROM w{p}, y{i}, n
),
w{i} AS (
  SELECT list_transform(range(1, {d + 1}),
             q -> CASE WHEN l{i}.nrm = 0 THEN w{p}.w[q]
                       ELSE y{i}.y[q] / l{i}.nrm END) AS w
  FROM w{p}, y{i}, l{i}
)""")
    return "".join(parts)


def _cluster_balanced_sample_sql() -> str:
    """Twin of similarity.cluster_balanced_sample: the SAME unrolled
    deterministic-Lloyd recurrence as _ann_ivf_sql (seed vec_id %
    N_CLUSTERS_MOD = 0, LLOYD_ITERATIONS argmin/mean refinements,
    final assignment pass), then per-cid md5-ordered quota — integers
    and md5 end to end past the assignment."""
    k_mod, iters = sim.N_CLUSTERS_MOD, sim.LLOYD_ITERATIONS
    quota = sim.CLUSTER_SAMPLE_QUOTA

    def d2(v: str, c: str) -> str:
        return (
            f"list_reduce([0.0] || list_transform(range(1, len({v}) + 1), "
            f"j -> ({v}[j] - {c}[j]) * ({v}[j] - {c}[j])), "
            "(acc, x) -> acc + x)"
        )

    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),",
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {k_mod} = 0)",
    ]
    for i in range(1, iters + 2):
        parts.append(f""",
        a{i} AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY {d2('e.v', 'c.cv')}, c.cid) AS rn
            FROM e CROSS JOIN c{i - 1} c
          ) WHERE rn = 1
        )""")
        if i <= iters:
            parts.append(f""",
        c{i} AS (
          SELECT cid, array_agg(nv ORDER BY pos) AS cv FROM (
            SELECT cid, pos, avg(val) AS nv FROM (
              SELECT cid, unnest(v) AS val,
                     unnest(range(1, len(v) + 1)) AS pos
              FROM a{i}
            ) GROUP BY cid, pos
          ) GROUP BY cid
        )""")
    fin = iters + 1
    parts.append(f""",
        sz AS (SELECT cid, count(*) AS n_members FROM a{fin} GROUP BY 1)
        SELECT cid, vec_id, rk, n_members FROM (
          SELECT a.cid, a.vec_id, sz.n_members,
                 row_number() OVER (PARTITION BY a.cid
                   ORDER BY ('0x' || substr(md5(a.vec_id::VARCHAR), 1, 12))::BIGINT,
                            a.vec_id) AS rk
          FROM a{fin} a JOIN sz USING (cid)
        ) WHERE rk <= {quota}""")
    return "".join(parts)


def _pca_power_final_sql() -> str:
    """pca_power_iter's final SELECT over the shared chain."""
    iters, d = sim.PCA_ITERS, sim.EMBED_DIM
    return f"""
SELECT pos, round(loading, 6) AS loading, round(lam, 6) AS eigenvalue FROM (
  SELECT unnest(range(0, {d})) AS pos,
         unnest(w{iters}.w) AS loading, l{iters}.lam
  FROM w{iters}, l{iters}
)"""


def _pca_debias_final_sql() -> str:
    """pca_debias's per-row finals over the shared chain: the same
    fixed-order folds as the Spark projection — proj and norm_before
    named once in CTE p, the residual fold reading p.proj (one
    evaluation, mirroring the two-stage Project)."""
    iters, d = sim.PCA_ITERS, sim.EMBED_DIM
    return f""",
p AS (
  SELECT e.vec_id, e.v,
         list_reduce([0.0] || list_transform(range(1, {d + 1}),
             q -> (e.v[q] - mu.mu[q]) * w{iters}.w[q]),
             (a, b) -> a + b) AS proj,
         sqrt(list_reduce([0.0] || list_transform(range(1, {d + 1}),
             q -> (e.v[q] - mu.mu[q]) * (e.v[q] - mu.mu[q])),
             (a, b) -> a + b)) AS norm_before
  FROM e CROSS JOIN mu CROSS JOIN w{iters}
)
SELECT vec_id, round(proj, 6) AS proj,
       round(norm_before, 6) AS norm_before,
       round(sqrt(list_reduce([0.0] || list_transform(range(1, {d + 1}),
             q -> (p.v[q] - mu.mu[q] - p.proj * w{iters}.w[q])
                  * (p.v[q] - mu.mu[q] - p.proj * w{iters}.w[q])),
             (a, b) -> a + b)), 6) AS norm_after
FROM p CROSS JOIN mu CROSS JOIN w{iters}"""


# Shared BM25 CTE chain (bm25_topk + lexical_semantic_rrf): expects a
# preceding ``toks`` CTE (doc_id, t — the length-filtered token list).
# ``dl`` rides the tf key as len(t) (functionally dependent on doc_id,
# mirroring the Spark plan that removed the doc-length agg + join).
# ``branked`` holds the full per-query ranking; consumers filter
# rn <= BM25_TOPK.
_BM25_CTES = f"""
            bpairs AS (
              SELECT doc_id, len(t)::BIGINT AS dl, unnest(t) AS word
              FROM toks
            ),
            tf AS (
              SELECT doc_id, dl, word, count(*) AS tf
              FROM bpairs GROUP BY 1, 2, 3
            ),
            n AS (SELECT count(*) AS n FROM documents),
            tot AS (SELECT sum(len(t)) AS total FROM toks),
            dfx AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
            qt AS (
              SELECT tf.doc_id AS qid, tf.word, dfx.df
              FROM tf JOIN dfx USING (word) CROSS JOIN n
              WHERE tf.doc_id < {ta.BM25_N_QUERIES}
                AND dfx.df <= {ta.BM25_DF_CAP_FRAC!r} * n.n
            ),
            cand AS (
              SELECT qt.qid, tf.doc_id, qt.word,
                     ln(1.0 + (n.n - qt.df + 0.5) / (qt.df + 0.5))
                     * (tf.tf * {ta.BM25_K1 + 1.0!r})
                       / (tf.tf + {ta.BM25_K1!r}
                          * ({1.0 - ta.BM25_B!r}
                             + {ta.BM25_B!r} * tf.dl / (tot.total / n.n))) AS s
              FROM qt JOIN tf USING (word)
              CROSS JOIN n CROSS JOIN tot
              WHERE tf.doc_id <> qt.qid
            ),
            bscored AS (
              SELECT qid, doc_id,
                     list_reduce([0.0] || list(s ORDER BY word),
                                 (a, b) -> a + b) AS score
              FROM cand GROUP BY qid, doc_id
            ),
            branked AS (
              SELECT qid, doc_id, score,
                     row_number() OVER (
                       PARTITION BY qid ORDER BY score DESC, doc_id
                     ) AS rn
              FROM bscored
            )
"""


def oracle_sql() -> dict[str, str]:
    sw = ",".join(f"'{w}'" for w in ta.EN_STOPWORDS)
    sqls = {
        "word_count": f"""
            {_SQL_PAIRS}
            SELECT word, count(*) AS cnt FROM pairs GROUP BY word
        """,
        # the generic-engine parity query shares word_count's oracle
        "word_count_mr": f"""
            {_SQL_PAIRS}
            SELECT word, count(*) AS cnt FROM pairs GROUP BY word
        """,
        "grep": """
            SELECT doc_id, text FROM documents WHERE regexp_matches(text, 'fast join')
        """,
        "inverted_index": f"""
            {_SQL_PAIRS}
            SELECT word,
                   array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids,
                   count(DISTINCT doc_id) AS n_docs
            FROM pairs GROUP BY word
        """,
        "bigram_count": f"""
            {_SQL_TOKS}
            SELECT t[i] || ' ' || t[i + 1] AS bigram, count(*) AS cnt
            FROM toks, unnest(range(1, len(t))) AS u(i)
            GROUP BY bigram
        """,
        "tf_idf": f"""
            {_SQL_PAIRS},
            tf AS (SELECT doc_id, word, count(*) AS tf FROM pairs GROUP BY doc_id, word),
            idf AS (SELECT word, count(DISTINCT doc_id) AS df FROM pairs GROUP BY word),
            n AS (SELECT count(*) AS n FROM documents)
            SELECT tf.doc_id, tf.word, round(tf.tf * ln(n.n / idf.df), 4) AS tfidf
            FROM tf JOIN idf USING (word) CROSS JOIN n
        """,
        "token_stats": f"""
            {_SQL_TOKS}
            SELECT doc_id,
                   len(t) AS n_tokens,
                   len(list_distinct(t)) AS n_distinct,
                   round(coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                         / greatest(len(t), 1), 6) AS avg_token_len
            FROM toks
        """,
        "language_id": f"""
            {_SQL_TOKS},
            s AS (
              SELECT doc_id,
                     len(list_filter(list_distinct(t),
                         x -> list_contains([{sw}], x)))::DOUBLE
                       / greatest(len(list_distinct(t)), 1) AS ratio
              FROM toks
            )
            SELECT doc_id, round(ratio, 6) AS stopword_ratio,
                   CASE WHEN ratio >= 0.08 THEN 'en' ELSE 'other' END AS predicted_lang
            FROM s
        """,
        "quality_score": f"""
            {_SQL_TOKS},
            m AS (
              SELECT doc_id, len(t) AS n_tokens,
                     coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                       / greatest(len(t), 1) AS avg_len,
                     length(regexp_replace(text, '[^,.]', '', 'g'))::DOUBLE
                       / greatest(length(text), 1) AS punct_ratio
              FROM toks
            )
            SELECT doc_id, n_tokens, punct_ratio,
                   least(1.0, n_tokens / 100.0) * 0.5
                     + (1.0 - punct_ratio) * 0.3
                     + least(1.0, avg_len / 8.0) * 0.2 AS quality
            FROM m
        """,
        "fingerprint": r"""
            SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        "bpe_token_count": r"""
            SELECT doc_id,
                   len(list_filter(string_split_regex(text, '\s+'),
                       x -> length(x) > 0)) AS n_ws_tokens,
                   len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens
            FROM documents
        """,
        "bpe_merges": _bpe_merges_sql(),
        "wav_header_stats": _wav_stats_sql(),
        # pq_quantize (r15): Lloyd-TRAINED codebook on the production
        # encode path — the _pq_train_cte unrolled training replay,
        # then the trained assignment pass a{T+1} IS the encode (same
        # left-fold subspace distance sums as the Spark HOF aggregate,
        # bit-identical — the _ann_lsh_sql discipline; argmin ties
        # (d2, pos) = first-match-lowest-code)
        "pq_quantize": _pq_quantize_sql(),
        "pq_adc_topk": _pq_adc_sql(),
        "ann_ivf_adc": _ann_ivf_adc_sql(),
        "ivf_pq_residual": _ivf_pq_residual_sql(),
        "ivf_pq_adc_topk": _ivf_pq_adc_sql(),
        "adc_rerank_topk": _adc_rerank_sql(),
        "ivf_pq_rerank_topk": _ivf_pq_rerank_sql(),
        "ivf_pq_rerank_recall_report": _ivf_pq_rerank_recall_sql(),
        # the deterministic global training shuffle: md5-keyed shard +
        # within-shard key rank, integer-exact in both engines
        "global_shuffle_shards": f"""
            WITH keyed AS (
              SELECT doc_id,
                     ('0x' || substr(md5('{pl.SHUFFLE_SEED}_'
                                         || doc_id::VARCHAR),
                                     1, 12))::BIGINT AS k
              FROM documents
            )
            SELECT (k % {pl.N_SHUFFLE_SHARDS})::BIGINT AS shard,
                   row_number() OVER (
                     PARTITION BY k % {pl.N_SHUFFLE_SHARDS}
                     ORDER BY k, doc_id)::BIGINT AS pos,
                   doc_id
            FROM keyed
        """,
        "ivf_pq_probe_sweep": _ivf_pq_probe_sweep_sql(),
        "ivf_split_plan": _ivf_split_plan_sql(),
        # r17: the CAP sweep (the top-ranked recall lever priced),
        # the codebook-bits rung, and the split-apply maintenance step
        "rerank_cap_sweep": _rerank_cap_sweep_sql(),
        "pq_bits_recall_report": _pq_bits_recall_sql(),
        "ivf_split_apply": _ivf_split_apply_sql(),
        # the streaming IVF-PQ index writer's run-to-completion twin:
        # the banked batch residual-encode replay aggregated into the
        # per-(cell, subspace, code) posting histogram
        "streaming_pq_ingest": f"""
            WITH enc AS ({_ivf_pq_residual_sql()})
            SELECT cid, subspace, code,
                   count(*)::BIGINT AS n_vectors,
                   min(vec_id)::BIGINT AS min_vec_id,
                   max(vec_id)::BIGINT AS max_vec_id
            FROM enc GROUP BY 1, 2, 3
        """,
        "pq_train_codebooks": _pq_train_sql(),
        "pq_recall_report": _pq_recall_sql(),
        "sq8_quantize": _sq8_quantize_sql(),
        "sq8_topk": _sq8_topk_sql(),
        "sq8_recall_report": _sq8_recall_sql(),
        "rolling_fingerprint": """
            SELECT doc_id,
                   list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                     (h, c) -> (h * 31 + c) % 1000000007) AS rk_hash
            FROM documents
        """,
        "key_count": """
            SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
        """,
        "key_stats": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(min(l_quantity), 2) AS min_qty,
                   round(max(l_quantity), 2) AS max_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "select_project": """
            SELECT l_orderkey, l_linenumber,
                   round(l_extendedprice * (1 - l_discount), 4) AS net_price
            FROM lineitem
            WHERE l_discount >= 0.05 AND l_quantity > 40
        """,
        "histogram": """
            SELECT CAST(floor(l_quantity / 5) AS BIGINT) AS bucket, count(*) AS cnt
            FROM lineitem GROUP BY bucket
        """,
        "distinct_count": """
            SELECT l_returnflag,
                   count(DISTINCT l_partkey) AS n_parts,
                   count(DISTINCT l_suppkey) AS n_supps
            FROM lineitem GROUP BY l_returnflag
        """,
        "join_revenue_by_nation": """
            SELECT r_name AS region, n_name AS nation,
                   round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "join_semi": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "join_anti": """
            SELECT c_custkey, c_acctbal FROM customer
            WHERE NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
            )
        """,
        "edge_inversion": """
            SELECT o_custkey,
                   array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys
            FROM orders GROUP BY o_custkey
        """,
        "set_ops": """
            SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 1000
            INTERSECT
            SELECT o_custkey AS custkey FROM orders
        """,
        "distributed_sort": """
            SELECT l_orderkey, l_linenumber, l_quantity
            FROM lineitem ORDER BY l_orderkey, l_linenumber
        """,
        "global_rank": """
            SELECT p_partkey, p_retailprice,
                   row_number() OVER (ORDER BY p_retailprice, p_partkey) AS rnk
            FROM part
        """,
        "topk_per_group": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
            FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (
                       PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                     ) AS rn
              FROM orders
            ) WHERE rn <= 3
        """,
        "topk_global": """
            SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
            FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10
        """,
        "window_running": """
            SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 2) AS running_spend
            FROM orders
        """,
        "rollup_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_extendedprice), 2) AS sum_price, count(*) AS cnt
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "pivot_status": """
            SELECT o_orderpriority,
                   count(*) FILTER (o_orderstatus = 'O') AS "O",
                   count(*) FILTER (o_orderstatus = 'F') AS "F",
                   count(*) FILTER (o_orderstatus = 'P') AS "P"
            FROM orders GROUP BY o_orderpriority
        """,
        "sessionize": """
            WITH e AS (
              SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id, value, ts_us, event_id,
                     CAST(sum(brk) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS BIGINT) AS session_id
              FROM e
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   round(sum(value), 2) AS session_value,
                   min(ts_us) AS start_us,
                   max(ts_us) AS end_us
            FROM s GROUP BY user_id, session_id
        """,
        "dedup_exact": r"""
            SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
                   min(doc_id) AS keep_id, count(*) AS dup_cnt
            FROM documents GROUP BY fp
        """,
        "ngram_jaccard_neardup": f"""
            {_SQL_TOKS},
            sh0 AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            -- hot-shingle df cap, mirroring dedup.HOT_SHINGLE_DF_CAP
            sh AS (
              SELECT doc_id, shingle FROM sh0
              WHERE shingle IN (
                SELECT shingle FROM sh0 GROUP BY shingle
                HAVING count(*) <= {dd.HOT_SHINGLE_DF_CAP}
              )
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT da, db, i::DOUBLE / (ca.n + cb.n - i) AS jaccard
            FROM inter
            JOIN cnt ca ON da = ca.doc_id
            JOIN cnt cb ON db = cb.doc_id
            WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.1
        """,
        "cosine_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 50),
            pairs AS (
              SELECT qid, vec_id AS neighbor_id, list_cosine_similarity(qv, v) AS sim
              FROM q, e WHERE vec_id <> qid
            ),
            r AS (
              SELECT qid, neighbor_id, sim,
                     row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rn
              FROM pairs
            )
            SELECT qid, neighbor_id, round(sim, 6) AS cosine, rn
            FROM r WHERE rn <= 5
        """,
        # streaming_cell_occupancy (r15, 16th streaming signal): one
        # assignment pass against the SEED centroids (no Lloyd — the
        # streaming monitor uses the static coarse quantizer) with the
        # banked j-ascending fold and (d2, cid) ties, then exact
        # integer GROUP BY — the batch equivalent of the stream's one
        # stateful agg.
        "streaming_cell_occupancy": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            c0 AS (SELECT vec_id AS cid, v AS cv FROM e
                   WHERE vec_id % {sim.N_CLUSTERS_MOD} = 0),
            a AS (
              SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                         list_reduce([0.0] || list_transform(
                             range(1, len(e.v) + 1),
                             j -> (e.v[j] - c.cv[j]) * (e.v[j] - c.cv[j])),
                           (acc, x) -> acc + x), c.cid) AS rn
                FROM e CROSS JOIN c0 c
              ) WHERE rn = 1
            )
            SELECT cid, count(*)::BIGINT AS n_vectors,
                   min(vec_id)::BIGINT AS min_vec_id,
                   max(vec_id)::BIGINT AS max_vec_id
            FROM a GROUP BY cid
        """,
        # ann_filtered_topk (r15): per-query-language filtered search —
        # the cosine_topk pairing with the lang equality as the join
        # key; same round-6 cosine and (sim desc, neighbor_id) ties.
        "ann_filtered_topk": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            d AS (SELECT doc_id AS vec_id, lang FROM documents),
            c AS (SELECT e.vec_id, e.v, d.lang FROM e JOIN d USING (vec_id)),
            q AS (SELECT vec_id AS qid, v AS qv, lang AS qlang FROM c
                  WHERE vec_id < {sim.N_QUERIES}),
            pairs AS (
              SELECT q.qid, c.lang, c.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qv, c.v) AS sim
              FROM q JOIN c ON c.lang = q.qlang AND c.vec_id <> q.qid
            ),
            r AS (
              SELECT qid, lang, neighbor_id, sim,
                     row_number() OVER (
                       PARTITION BY qid
                       ORDER BY sim DESC, neighbor_id) AS rn
              FROM pairs
            )
            SELECT qid, lang, neighbor_id, round(sim, 6) AS cosine, rn
            FROM r WHERE rn <= {sim.TOPK}
        """,
        "embedding_neardup": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT a.vec_id AS da, b.vec_id AS db,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.4
        """,
        "embedding_neardup_strict": f"""
            WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            planted AS (
              SELECT vec_id + {sim.PLANT_ID_OFFSET} AS vec_id,
                     list_transform(embedding::DOUBLE[],
                       (x, i) -> x * CASE WHEN (i - 1) % 2 = 0
                                          THEN 1.3 ELSE 0.7 END) AS v
              FROM embeddings WHERE vec_id < {sim.PLANT_N}
            ),
            e AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
            SELECT a.vec_id AS da, b.vec_id AS db,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= {sim.STRICT_COS}
        """,
        # byte-exact header REPARSE: fmt from the signature bytes,
        # dims/channels from PNG IHDR / JPEG SOF0 fixed offsets in the
        # hex string — independent of the doc_id arithmetic that
        # GENERATED the headers, so a construction/parse mismatch on
        # either side fails the hash (VERDICT r9 #8)
        "multimodal_features": _MEDIA_FEATURES_SQL,
        "except_op": """
            SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 1000
            EXCEPT
            SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        """,
        "cube_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "unpivot_measures": """
            SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
        """,
        "percentile_by_brand": """
            SELECT p_brand,
                   round(quantile_cont(p_retailprice, 0.25), 6) AS p25,
                   round(quantile_cont(p_retailprice, 0.5), 6) AS p50,
                   round(quantile_cont(p_retailprice, 0.75), 6) AS p75,
                   count(*) AS cnt
            FROM part GROUP BY p_brand
        """,
        "json_extract_agg": """
            WITH e AS (
              SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events
            )
            SELECT event_type,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   min(k) AS min_k, max(k) AS max_k, count(k) AS n
            FROM e GROUP BY event_type
        """,
        "scalar_funcs": """
            SELECT o_orderkey,
                   year(o_orderdate) AS yr,
                   month(o_orderdate) AS mo,
                   upper(substring(o_orderpriority, 3, 20)) AS prio,
                   length(o_orderstatus) AS status_len,
                   round(abs(o_totalprice - 1000.0), 2) AS abs_delta,
                   o_orderkey % 7 AS key_mod,
                   concat_ws('-', o_orderstatus, o_orderpriority) AS tag
            FROM orders
        """,
        "prior_order": """
            SELECT o_custkey, o_orderkey,
                   lag(o_orderkey) OVER w AS prev_orderkey,
                   date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS gap_days
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        "asof_join": """
            WITH j AS (
              SELECT e.event_id, e.user_id, o.o_orderkey,
                     epoch_us(o.o_orderdate) AS order_us,
                     row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                     ) AS rn
              FROM events e
              JOIN orders o ON o.o_custkey = e.user_id
                           AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)
            )
            SELECT event_id, user_id, o_orderkey, order_us FROM j WHERE rn = 1
        """,
        "range_join_events": """
            WITH ev AS (SELECT event_id, user_id AS u, epoch_us(ts) AS t FROM events)
            SELECT a.u, a.event_id AS ea, b.event_id AS eb, b.t - a.t AS gap_us
            FROM ev a JOIN ev b
              ON a.u = b.u AND b.t > a.t AND b.t - a.t <= 300000000
        """,
        "join_outer": """
            SELECT c_custkey,
                   coalesce(u.n_urgent, 0) AS n_urgent,
                   coalesce(u.urgent_total, 0.0) AS urgent_total
            FROM customer
            LEFT JOIN (
              SELECT o_custkey, count(*) AS n_urgent,
                     round(sum(o_totalprice), 2) AS urgent_total
              FROM orders WHERE o_orderpriority = '1-URGENT'
              GROUP BY o_custkey
            ) u ON c_custkey = u.o_custkey
        """,
        "map_explode": """
            WITH kv AS (
              SELECT u.k AS k, CAST(json_extract(props, '$.' || u.k) AS BIGINT) AS v
              FROM events, unnest(json_keys(props)) AS u(k)
            )
            SELECT k, count(*) AS n,
                   CAST(sum(v) AS BIGINT) AS sum_v,
                   min(v) AS min_v, max(v) AS max_v
            FROM kv GROUP BY k
        """,
        "time_rollup": """
            SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS bucket_us,
                   event_type, count(*) AS n,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY bucket_us, event_type
        """,
        # Streaming tumbling-window counts run to completion equal the
        # batch GROUP BY over epoch-aligned hour buckets (UTC session).
        "streaming_hourly_counts": """
            SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS win_start_us,
                   event_type, count(*) AS n,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY win_start_us, event_type
        """,
        "union_all_op": """
            WITH t AS (
              SELECT 'order' AS src, o_totalprice AS amount FROM orders
              UNION ALL
              SELECT 'lineitem', l_extendedprice FROM lineitem
            )
            SELECT src, round(sum(amount), 2) AS total, count(*) AS n
            FROM t GROUP BY src
        """,
        "window_funcs_catalog": """
            SELECT o_custkey, o_orderkey,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk,
                   ntile(4) OVER w AS quartile,
                   lead(o_orderkey) OVER w AS next_orderkey,
                   percent_rank() OVER w AS pct_rank,
                   first_value(o_orderkey) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS first_orderkey
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        "scalar_subquery": """
            SELECT c_custkey, c_acctbal FROM customer
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        """,
        "skew_safe_distinct": """
            WITH p AS (
              SELECT event_type, user_id, count(*) AS n
              FROM events GROUP BY event_type, user_id
            )
            SELECT event_type, count(*) AS n_users,
                   CAST(sum(n) AS BIGINT) AS n_events
            FROM p GROUP BY event_type
        """,
        "token_positions": f"""
            {_SQL_TOKS}
            SELECT doc_id, i AS pos, t[i] AS token
            FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
        """,
        "deterministic_sample": """
            SELECT l_orderkey, l_linenumber, l_quantity
            FROM lineitem
            WHERE ('0x' || substring(
                    md5(concat_ws('_', l_orderkey, l_linenumber)), 1, 4
                  ))::INTEGER % 100 < 10
        """,
        "merge_upsert": """
            WITH changes AS (
              SELECT o_custkey AS c_custkey, round(max(o_totalprice), 2) AS new_bal
              FROM orders GROUP BY o_custkey HAVING count(*) > 8
            )
            SELECT c.c_custkey, ch.new_bal AS c_acctbal, TRUE AS restated
            FROM customer c JOIN changes ch USING (c_custkey)
            UNION ALL
            SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal, FALSE AS restated
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM changes ch WHERE ch.c_custkey = c.c_custkey)
        """,
        "retention_cohorts": """
            WITH act AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) - epoch_us(ts) % 604800000000 AS week_us
              FROM events
            ),
            coh AS (
              SELECT user_id, min(week_us) AS cohort_us FROM act GROUP BY user_id
            )
            SELECT cohort_us,
                   CAST((week_us - cohort_us) / 604800000000 AS BIGINT)
                     AS weeks_since,
                   count(DISTINCT a.user_id) AS n_users
            FROM act a JOIN coh USING (user_id)
            GROUP BY cohort_us, weeks_since
        """,
        "funnel_conversion": """
            WITH ev AS (
              SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
            ),
            v AS (
              SELECT user_id, min(ts_us) AS t_view FROM ev
              WHERE event_type = 'view' GROUP BY user_id
            ),
            c AS (
              SELECT e.user_id, min(e.ts_us) AS t_click
              FROM ev e JOIN v USING (user_id)
              WHERE e.event_type = 'click' AND e.ts_us > v.t_view
              GROUP BY e.user_id
            ),
            p AS (
              SELECT e.user_id, min(e.ts_us) AS t_purchase
              FROM ev e JOIN c USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts_us > c.t_click
              GROUP BY e.user_id
            ),
            u AS (
              SELECT 1 AS stage, 'view' AS step, user_id FROM v
              UNION ALL SELECT 2, 'click', user_id FROM c
              UNION ALL SELECT 3, 'purchase', user_id FROM p
            )
            SELECT stage, step, count(DISTINCT user_id) AS n_users
            FROM u GROUP BY stage, step
        """,
        "triangle_count": """
            WITH te AS (
              SELECT s_nationkey AS src, c_nationkey AS dst
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY 1, 2
            ),
            und AS (
              SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
              FROM te WHERE src <> dst
            ),
            tri AS (
              SELECT a.u AS x, a.v AS y, b.v AS z
              FROM und a
              JOIN und b ON a.v = b.u
              JOIN und c ON c.u = a.u AND c.v = b.v
            )
            SELECT node, count(*) AS n_triangles
            FROM (SELECT unnest([x, y, z]) AS node FROM tri)
            GROUP BY node
        """,
        "trade_edges": """
            SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_nationkey, c_nationkey
        """,
        "frame_offsets": f"""
            WITH {_MEDIA_HX}
            SELECT doc_id, CAST(o AS BIGINT) AS frame_offset
            FROM (SELECT doc_id, length(hx) // 2 AS n FROM med) t,
                 unnest(range(0, greatest(n - 1, 0) + 1, 100)) AS u(o)
        """,
        "pandas_udaf_geomean": """
            SELECT l_returnflag,
                   round(exp(avg(ln(l_quantity))), 6) AS geo_qty
            FROM lineitem
            WHERE l_quantity > 0
            GROUP BY l_returnflag
        """,
        "grouping_sets_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """,
        "udtf_chunk_text": f"""
            {_SQL_TOKS}
            SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                   array_to_string(t[(i - 1) * 10 + 1 : i * 10], ' ') AS chunk,
                   CAST(least(i * 10, len(t)) - (i - 1) * 10 AS BIGINT) AS n_tokens
            FROM toks, unnest(range(1, CAST(ceil(len(t) / 10.0) AS BIGINT) + 1)) AS u(i)
        """,
        "tpch_q3": """
            SELECT l_orderkey, epoch_us(o_orderdate) AS odate_us, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1996-01-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
        """,
        "tpch_q5": """
            SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY n_name
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE toks AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(text, {_D}), x -> length(x) > 0) AS t
              FROM documents
            ),
            sh0 AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            sh AS (
              SELECT doc_id, shingle FROM sh0
              WHERE shingle IN (
                SELECT shingle FROM sh0 GROUP BY shingle
                HAVING count(*) <= {dd.HOT_SHINGLE_DF_CAP}
              )
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT da, db
              FROM inter JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
              WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5
            ),
            edges AS (
              SELECT da AS a, db AS b FROM pairs UNION SELECT db, da FROM pairs
            ),
            walk(node, label) AS (
              SELECT a, a FROM (SELECT DISTINCT a FROM edges)
              UNION
              SELECT e.a, w.label FROM edges e JOIN walk w ON e.b = w.node
            )
            SELECT node AS doc_id, min(label) AS cluster_id
            FROM walk GROUP BY node
        """,
        "tpch_q6": """
            SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_extendedprice), 6) AS avg_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q10": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
        """,
        "tpch_q4": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
              AND EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
              )
            GROUP BY o_orderpriority
        """,
        "tpch_q7": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE s_nationkey IN (1, 2) AND c_nationkey IN (1, 2)
              AND s_nationkey <> c_nationkey
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY supp_nation, cust_nation, l_year
        """,
        "tpch_q8": """
            WITH v AS (
              SELECT year(o_orderdate) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume,
                     n2.n_name AS supp_nation
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON c_nationkey = n1.n_nationkey
              JOIN region ON n1.n_regionkey = r_regionkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n2 ON s_nationkey = n2.n_nationkey
              WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
                AND o_orderdate >= TIMESTAMP '1995-01-01'
                AND o_orderdate < TIMESTAMP '1997-01-01'
            )
            SELECT o_year,
                   round(sum(CASE WHEN supp_nation = 'NATION_3'
                                  THEN volume ELSE 0 END) / sum(volume),
                         6) AS mkt_share
            FROM v GROUP BY o_year
        """,
        "tpch_q9": """
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   round(sum(l_extendedprice * (1 - l_discount)
                             - p_retailprice * l_quantity), 4) AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%widget%'
            GROUP BY n_name, year(o_orderdate)
        """,
        "tpch_q12": """
            SELECT l_linestatus,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_linestatus
        """,
        "tpch_q13": """
            WITH c_orders AS (
              SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer
              LEFT JOIN orders ON c_custkey = o_custkey
                              AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey
            )
            SELECT c_count, count(*) AS custdist FROM c_orders GROUP BY c_count
        """,
        "tpch_q14": """
            SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                          THEN l_extendedprice * (1 - l_discount)
                                          ELSE 0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
        """,
        "tpch_q15": """
            WITH revenue AS (
              SELECT l_suppkey AS supplier_no,
                     round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN revenue ON s_suppkey = supplier_no
            WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        """,
        "tpch_q16": """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#1'
              AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
              AND l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
              )
            GROUP BY p_brand, p_type, p_size
        """,
        "tpch_q17": """
            WITH brand_li AS (
              SELECT l.* FROM lineitem l
              JOIN part ON l_partkey = p_partkey
              WHERE p_brand = 'Brand#3'
            ), th AS (
              SELECT l_partkey AS t_partkey,
                     0.2 * avg(l_quantity) AS qty_threshold
              FROM brand_li GROUP BY l_partkey
            )
            SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
                   count(*) AS n_rows
            FROM brand_li JOIN th ON l_partkey = t_partkey
            WHERE l_quantity < qty_threshold
        """,
        "tpch_q19": """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
                   count(*) AS n_rows
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "tpch_q21": """
            WITH l1 AS (
              SELECT DISTINCT l_orderkey, l_suppkey
              FROM lineitem WHERE l_returnflag = 'R'
            )
            SELECT s_name, count(*) AS numwait
            FROM l1
            JOIN supplier ON l1.l_suppkey = s_suppkey
            WHERE s_nationkey = 1
              AND EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey
              )
              AND NOT EXISTS (
                SELECT 1 FROM lineitem l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_returnflag = 'R'
              )
              AND EXISTS (
                SELECT 1 FROM orders
                WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
              )
            GROUP BY s_name
        """,
        "tpch_q22": """
            WITH cc AS (
              SELECT c_custkey, c_acctbal, c_custkey % 7 AS cntrycode
              FROM customer WHERE c_custkey % 7 IN (0, 1, 2, 3)
            )
            SELECT cntrycode, count(*) AS numcust,
                   round(sum(c_acctbal), 2) AS totacctbal
            FROM cc
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM cc WHERE c_acctbal > 0.0)
              AND NOT EXISTS (
                SELECT 1 FROM orders WHERE o_custkey = cc.c_custkey
              )
            GROUP BY cntrycode
        """,
        "gap_fill": """
            WITH hourly AS (
              SELECT user_id,
                     epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us,
                     round(avg(value), 6) AS hv
              FROM events GROUP BY 1, 2
            ), bounds AS (
              SELECT user_id, min(bucket_us) AS mn, max(bucket_us) AS mx
              FROM hourly GROUP BY user_id
            ), grid AS (
              SELECT user_id, unnest(range(mn, mx + 1, 3600000000)) AS bucket_us
              FROM bounds
            )
            SELECT g.user_id, g.bucket_us,
                   last_value(hv IGNORE NULLS) OVER (
                     PARTITION BY g.user_id ORDER BY g.bucket_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS value,
                   CAST(hv IS NOT NULL AS BIGINT) AS is_observed
            FROM grid g LEFT JOIN hourly h USING (user_id, bucket_us)
        """,
        "rolling_time_window": """
            SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                   count(*) OVER w AS n_1h,
                   round(avg(value) OVER w, 6) AS avg_1h
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        """,
        "pii_scrub": """
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+',
                                    '<EMAIL>', 'g'),
                     '[0-9]{3,}', '<NUM>', 'g') AS clean_text,
                   CAST(len(regexp_extract_all(
                     text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(
                     text, '[0-9]{3,}')) AS BIGINT) AS n_longnums
            FROM documents
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE ('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::INTEGER % 100
                  < CASE WHEN lang = 'en' THEN 50 ELSE 10 END
        """,
        "dup_spans": f"""
            {_SQL_TOKS},
            sp AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(t) - {dd.SPAN_WIDTH - 2}, {dd.SPAN_STRIDE}),
                       i -> md5(array_to_string(t[i : i + {dd.SPAN_WIDTH - 1}], ' '))
                     )) AS hs
              FROM toks WHERE len(t) >= {dd.SPAN_WIDTH}
            ),
            ex AS (SELECT doc_id, unnest(hs) AS h FROM sp),
            c AS (SELECT h, count(*) AS n_docs FROM ex GROUP BY h)
            SELECT doc_id, count(*) AS n_spans,
                   CAST(sum((n_docs >= 2)::INT) AS BIGINT) AS n_dup_spans,
                   round(sum((n_docs >= 2)::INT)::DOUBLE / count(*), 6) AS dup_frac
            FROM ex JOIN c USING (h) GROUP BY doc_id
        """,
        "neardup_audit": f"""
            {_SQL_TOKS},
            sh AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT da, db, i::DOUBLE / (ca.n + cb.n - i) AS jaccard
              FROM inter
              JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
              WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5
            ),
            top AS (
              SELECT da, db, jaccard,
                     row_number() OVER (ORDER BY jaccard DESC, da ASC, db ASC)
                       AS rank
              FROM pairs
            )
            SELECT rank, da, db, jaccard,
                   xa.snippet AS text_a, xb.snippet AS text_b
            FROM top
            JOIN (SELECT doc_id, substr(text, 1, 80) AS snippet FROM documents) xa
              ON da = xa.doc_id
            JOIN (SELECT doc_id, substr(text, 1, 80) AS snippet FROM documents) xb
              ON db = xb.doc_id
            WHERE rank <= {dd.AUDIT_TOP_K}
        """,
        "corpus_summary": f"""
            WITH toks AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            m AS (
              SELECT len(t) AS nt,
                     least(1.0, len(t) / 100.0) * 0.5
                       + (1.0 - length(regexp_replace(text, '[^,.]', '', 'g'))::DOUBLE
                              / greatest(length(text), 1)) * 0.3
                       + least(1.0,
                           (coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                              / greatest(len(t), 1)) / 8.0) * 0.2 AS q,
                     md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
              FROM toks
            )
            SELECT (SELECT count(*) FROM m) AS n_docs,
                   (SELECT CAST(sum(nt) AS BIGINT) FROM m) AS n_tokens,
                   (SELECT count(DISTINCT w)
                    FROM (SELECT unnest(t) AS w FROM toks)) AS vocab_size,
                   (SELECT round(avg(q), 6) FROM m) AS mean_quality,
                   round(1.0 - (SELECT count(DISTINCT fp) FROM m)::DOUBLE
                             / greatest((SELECT count(*) FROM m), 1)::DOUBLE,
                         6) AS exact_dup_rate
        """,
        "ngram_novelty": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id, unnest(list_distinct(
                       list_transform(range(1, len(t) - 3),
                                      i -> array_to_string(t[i:i+4], ' '))))
                       AS g
              FROM toks
            ),
            first AS (SELECT g, min(doc_id) AS first_id FROM grams GROUP BY g)
            SELECT doc_id, count(*) AS n_ngrams,
                   CAST(sum((doc_id = first_id)::INT) AS BIGINT) AS n_novel,
                   round(sum((doc_id = first_id)::INT)::DOUBLE / count(*), 6)
                     AS novelty
            FROM grams JOIN first USING (g)
            GROUP BY doc_id
        """,
        "cdc_dup_chunks": f"""
            WITH cp AS (
              SELECT doc_id, text, length(text) AS n,
                     list_transform(
                       list_filter(string_split(text, ''), c -> c != ''),
                       c -> unicode(c)::BIGINT) AS cps
              FROM documents
            ),
            b AS (
              SELECT doc_id, text, n,
                     list_filter(
                       range({dd.CDC_WINDOW}, greatest(n, {dd.CDC_WINDOW}) + 1),
                       i -> i <= n
                            AND ({" + ".join(f"cps[(i - {j})::INT] * {p}" for j, p in enumerate(dd.CDC_POW))})
                                % {dd.CDC_PRIME} % {dd.CDC_MODULUS} = 0
                     ) AS bpos
              FROM cp
            ),
            s AS (
              SELECT doc_id, text, n,
                     list_prepend(1, list_transform(bpos, x -> x + 1)) AS starts,
                     list_append(bpos, n) AS ends
              FROM b
            ),
            c AS (
              SELECT doc_id,
                     list_distinct(list_filter(
                       list_transform(range(1, len(starts) + 1),
                         j -> CASE WHEN ends[j] - starts[j] + 1 >= {dd.CDC_WINDOW}
                                   THEN md5(text[starts[j]:ends[j]]) END),
                       x -> x IS NOT NULL)) AS hs
              FROM s
            ),
            ex AS (SELECT doc_id, unnest(hs) AS h FROM c),
            cnt AS (SELECT h, count(*) AS n_docs FROM ex GROUP BY h)
            SELECT doc_id, count(*) AS n_chunks,
                   CAST(sum((n_docs >= 2)::INT) AS BIGINT) AS n_dup_chunks,
                   round(sum((n_docs >= 2)::INT)::DOUBLE / count(*), 6)
                     AS dup_frac
            FROM ex JOIN cnt USING (h) GROUP BY doc_id
        """,
        "streaming_curated_ingest_watermarked": f"""
            -- watermarked append-mode twin: windows emitted iff the
            -- final watermark (max ingest_ts - 10 min) passed win_end;
            -- ingest_ts is the synthesized (doc_id % 60) minutes.
            WITH toks AS (
              SELECT doc_id, source, text,
                     (doc_id % 60) * 60 AS ts_s,
                     list_filter(string_split_regex(text, '[ ,."'']'),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            mx AS (SELECT max(ts_s) AS mx FROM toks),
            m AS (
              SELECT doc_id, source, text, ts_s, len(t) AS nt,
                     coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                       / greatest(len(t), 1) AS avg_len,
                     length(regexp_replace(text, '[^,.]', '', 'g'))::DOUBLE
                       / greatest(length(text), 1) AS punct_ratio
              FROM toks
            ),
            kept AS (
              SELECT doc_id, source, nt, (ts_s // 600) * 600 AS win_start,
                     md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
              FROM m
              WHERE round(least(1.0, nt / 100.0) * 0.5
                          + (1.0 - punct_ratio) * 0.3
                          + least(1.0, avg_len / 8.0) * 0.2, 6) >= 0.5
            ),
            g AS (
              SELECT win_start, fp, min(doc_id) AS keep_id, count(*) AS dup_cnt
              FROM kept, mx
              WHERE win_start + 600 <= mx - 600
              GROUP BY win_start, fp
            )
            SELECT d.source, g.win_start,
                   count(*) AS n_admitted,
                   CAST(sum(g.dup_cnt) AS BIGINT) AS n_arrived,
                   CAST(sum(k.nt) AS BIGINT) AS n_tokens_admitted
            FROM g
            JOIN documents d ON g.keep_id = d.doc_id
            JOIN kept k ON g.keep_id = k.doc_id
            GROUP BY d.source, g.win_start
        """,
        "token_budget_cap": f"""
            WITH b AS (
              SELECT doc_id, source,
                     len(list_filter(string_split_regex(text, '[ ,."'']'),
                         x -> length(x) > 0))::BIGINT AS nt,
                     md5(doc_id::VARCHAR) AS pr
              FROM documents
            ),
            c AS (
              SELECT *, sum(nt) OVER (PARTITION BY source ORDER BY pr, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS cum
              FROM b
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum((cum <= {pl.TOKEN_BUDGET_PER_SOURCE})::INT) AS BIGINT) AS n_kept,
                   CAST(sum(CASE WHEN cum <= {pl.TOKEN_BUDGET_PER_SOURCE} THEN nt ELSE 0 END) AS BIGINT) AS tokens_kept,
                   CAST(sum(nt) AS BIGINT) AS tokens_arrived
            FROM c GROUP BY source
        """,
        "kmeans_step": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {sim.KMEANS_K}),
            p AS (
              SELECT e.vec_id, e.v, c.cid, c.cv,
                     list_sum(list_transform(range(1, len(e.v) + 1),
                         i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d2
              FROM e CROSS JOIN c
            ),
            a AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM p),
            asg AS (SELECT vec_id, v, cid, d2 FROM a WHERE rn = 1),
            d AS (SELECT cid, unnest(v) AS val, unnest(range(1, len(v) + 1)) AS pos FROM asg),
            m AS (SELECT cid, pos, avg(val) AS nv FROM d GROUP BY cid, pos),
            sh AS (
              SELECT m.cid, sqrt(sum((m.nv - c.cv[pos::INT]) * (m.nv - c.cv[pos::INT]))) AS shift
              FROM m JOIN c ON m.cid = c.cid GROUP BY m.cid
            ),
            st AS (SELECT cid, count(*) AS n, round(sum(d2), 4) AS inertia FROM asg GROUP BY cid)
            SELECT st.cid AS cluster, CAST(st.n AS BIGINT) AS n, st.inertia,
                   round(sh.shift, 6) AS centroid_shift
            FROM st JOIN sh ON st.cid = sh.cid
        """,
        "bloom_decontaminate": f"""
            WITH toks AS (
              SELECT doc_id, source,
                     list_filter(string_split_regex(text, '[ ,."'']'),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id, source, unnest(list_distinct(
                       list_transform(range(1, len(t) - {pl.NGRAM_N - 2}),
                           i -> array_to_string(t[i:i+{pl.NGRAM_N - 1}], ' ')))) AS g
              FROM toks
            ),
            benchg AS (SELECT DISTINCT g FROM grams WHERE doc_id % {pl.BENCH_MOD} = 0),
            bloom AS (
              SELECT DISTINCT unnest([
                {", ".join(f"('0x' || substr(md5('{j}' || g), 1, 8))::BIGINT % {pl.BLOOM_BITS}" for j in range(pl.BLOOM_K))}
              ]) AS bit
              FROM benchg
            ),
            train AS (SELECT * FROM grams WHERE doc_id % {pl.BENCH_MOD} <> 0),
            gh AS (
              SELECT doc_id, source, g,
                     ({" AND ".join(f"(('0x' || substr(md5('{j}' || g), 1, 8))::BIGINT % {pl.BLOOM_BITS}) IN (SELECT bit FROM bloom)" for j in range(pl.BLOOM_K))})::INT AS bloom_pos,
                     (g IN (SELECT g FROM benchg))::INT AS exact_pos
              FROM train
            ),
            pd AS (
              SELECT doc_id, source, max(bloom_pos) AS bf, max(exact_pos) AS ef
              FROM gh GROUP BY doc_id, source
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(bf) AS BIGINT) AS n_flagged_bloom,
                   CAST(sum(ef) AS BIGINT) AS n_flagged_exact,
                   CAST(sum(bf * (1 - ef)) AS BIGINT) AS n_false_pos
            FROM pd GROUP BY source
        """,
        "langid_eval": f"""
            WITH toks AS (
              SELECT lang,
                     list_filter(string_split_regex(text, '[ ,."'']'),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            pred AS (
              SELECT lang,
                     CASE WHEN
                       len(list_filter(list_distinct(t),
                           x -> list_contains([{", ".join(repr(w) for w in ta.EN_STOPWORDS)}], x)))::DOUBLE
                         / greatest(len(list_distinct(t)), 1) >= 0.08
                     THEN 'en' ELSE 'other' END AS predicted_lang
              FROM toks
            ),
            cell AS (
              SELECT lang, predicted_lang, count(*) AS n_docs
              FROM pred GROUP BY lang, predicted_lang
            )
            SELECT lang, predicted_lang, CAST(n_docs AS BIGINT) AS n_docs,
                   round(n_docs::DOUBLE / sum(n_docs) OVER (PARTITION BY lang), 6)
                     AS share_of_lang
            FROM cell
        """,
        "quality_calibration": f"""
            WITH toks AS (
              SELECT doc_id, source, text,
                     list_filter(string_split_regex(text, '[ ,."'']'),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            m AS (
              SELECT doc_id, source,
                     round(least(1.0, len(t) / 100.0) * 0.5
                           + (1.0 - length(regexp_replace(text, '[^,.]', '', 'g'))::DOUBLE
                                    / greatest(length(text), 1)) * 0.3
                           + least(1.0,
                               (coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                                / greatest(len(t), 1)) / 8.0) * 0.2, 6) AS q
              FROM toks
            ),
            r AS (
              SELECT doc_id, source, q,
                     row_number() OVER (PARTITION BY source ORDER BY q, doc_id) AS rn,
                     count(*) OVER (PARTITION BY source) AS n
              FROM m
            )
            SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
                   round(avg(q), 6) AS mean_q,
                   {", ".join(f"max(CASE WHEN rn = greatest(1, ceil({p} * n)) THEN q END) AS p{int(p * 100)}" for p in pl.CALIB_PS)}
            FROM r GROUP BY source
        """,
        "dedup_rate_by_threshold": f"""
            {_SQL_TOKS},
            sh0 AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            sh AS (
              SELECT doc_id, shingle FROM sh0
              WHERE shingle IN (
                SELECT shingle FROM sh0 GROUP BY shingle
                HAVING count(*) <= {dd.HOT_SHINGLE_DF_CAP}
              )
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT da, db, i::DOUBLE / (ca.n + cb.n - i) AS jaccard
              FROM inter
              JOIN cnt ca ON da = ca.doc_id
              JOIN cnt cb ON db = cb.doc_id
              WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.1
            ),
            pt AS (
              SELECT unnest(list_filter([{", ".join(str(t) for t in dd.SWEEP_THRESHOLDS)}],
                                        th -> th <= jaccard)) AS threshold,
                     da, db
              FROM pairs
            ),
            per_t AS (SELECT threshold, count(*) AS n_pairs FROM pt GROUP BY threshold),
            docs_t AS (
              SELECT threshold, count(DISTINCT d) AS n_docs_involved
              FROM (SELECT threshold, unnest([da, db]) AS d FROM pt)
              GROUP BY threshold
            )
            SELECT round(threshold, 1) AS threshold,
                   CAST(n_pairs AS BIGINT) AS n_pairs,
                   CAST(n_docs_involved AS BIGINT) AS n_docs_involved
            FROM per_t JOIN docs_t USING (threshold)
        """,
        "semdedup_prune": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {sim.KMEANS_K}),
            p AS (
              SELECT e.vec_id, e.v, c.cid,
                     list_sum(list_transform(range(1, len(e.v) + 1),
                         i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d2
              FROM e CROSS JOIN c
            ),
            a AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM p),
            asg AS (SELECT vec_id, v, cid AS cluster FROM a WHERE rn = 1),
            dup AS (
              SELECT DISTINCT x.cluster, x.vec_id
              FROM asg x JOIN asg y
                ON x.cluster = y.cluster AND y.vec_id < x.vec_id
              WHERE list_sum(list_transform(range(1, len(x.v) + 1), i -> x.v[i] * y.v[i]))
                    / (sqrt(list_sum(list_transform(x.v, q -> q * q)))
                       * sqrt(list_sum(list_transform(y.v, q -> q * q))))
                    > {sim.SEMDEDUP_COS}
            )
            SELECT asg.cluster, count(*) AS n,
                   CAST(sum(CASE WHEN dup.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
                   CAST(count(*) - sum(CASE WHEN dup.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
            FROM asg LEFT JOIN dup
              ON asg.cluster = dup.cluster AND asg.vec_id = dup.vec_id
            GROUP BY asg.cluster
        """,
        "packing_efficiency": f"""
            WITH d AS (
              SELECT source, doc_id,
                     len(list_filter(string_split_regex(text, '[ ,."'']'),
                                     x -> length(x) > 0)) AS n_tokens
              FROM documents
            ),
            c AS (
              SELECT source, doc_id, n_tokens,
                     CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS cum_excl
              FROM d
            ),
            pk AS (
              SELECT source, n_tokens,
                     cum_excl // {pl.PACK_LEN} AS pack_id,
                     cum_excl % {pl.PACK_LEN} AS pack_offset
              FROM c
            )
            SELECT source, count(*) AS n_docs,
                   CAST(ceil(sum(n_tokens)::DOUBLE / {pl.PACK_LEN}) AS BIGINT) AS n_packs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   round(sum(n_tokens)::DOUBLE
                         / (ceil(sum(n_tokens)::DOUBLE / {pl.PACK_LEN}) * {pl.PACK_LEN}), 6) AS fill_rate,
                   CAST(sum((pack_offset + n_tokens > {pl.PACK_LEN})::INT) AS BIGINT) AS n_split_docs
            FROM pk GROUP BY source
        """,
        "hll_distinct_users": _HLL_ORACLE,
        # approx_distinct_users (audited since r15, VERDICT r14 #5):
        # the exact cardinality leg is genuinely verified; the bound
        # checks are stated as literal TRUE — the oracle PINS the
        # advertised sketch bounds (HLL++ rsd=0.01 within 5%;
        # percentile_approx accuracy=1000 inside the exact [p40, p60]
        # band), so a Spark-side sketch regression reds the driver row.
        "approx_distinct_users": """
            SELECT event_type,
                   count(DISTINCT user_id)::BIGINT AS n_exact,
                   true AS cardinality_within_5pct,
                   true AS median_within_p40_p60
            FROM events GROUP BY event_type
        """,
        "hll_union_types": _HLL_UNION_ORACLE,
        "kmv_intersect_types": f"""
            WITH ev AS (
              SELECT DISTINCT event_type, user_id::VARCHAR AS u FROM events
            ),
            h AS (
              SELECT event_type, u,
                     ('0x' || substr(md5(u), 1, 12))::BIGINT AS hv
              FROM ev
            ),
            sk AS (
              SELECT event_type, hv FROM (
                SELECT event_type, hv,
                       row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
                FROM h
              ) WHERE rn <= {sk.KMV_K}
            ),
            tp AS (
              SELECT a.event_type AS ta, b.event_type AS tb
              FROM (SELECT DISTINCT event_type FROM ev) a
              JOIN (SELECT DISTINCT event_type FROM ev) b
                ON a.event_type < b.event_type
            ),
            merged AS (
              SELECT DISTINCT ta, tb, hv
              FROM tp JOIN sk ON event_type = ta OR event_type = tb
            ),
            union_k AS (
              SELECT ta, tb, hv FROM (
                SELECT ta, tb, hv,
                       row_number() OVER (PARTITION BY ta, tb ORDER BY hv) AS rn
                FROM merged
              ) WHERE rn <= {sk.KMV_K}
            ),
            flags AS (
              SELECT u.ta, u.tb, count(*) AS k_u, max(u.hv) AS theta_hv,
                     CAST(sum((a.hv IS NOT NULL AND b.hv IS NOT NULL)::INT) AS BIGINT) AS n_both
              FROM union_k u
              LEFT JOIN sk a ON a.event_type = u.ta AND a.hv = u.hv
              LEFT JOIN sk b ON b.event_type = u.tb AND b.hv = u.hv
              GROUP BY 1, 2
            ),
            est AS (
              SELECT ta, tb, n_both, k_u,
                     CASE WHEN k_u < {sk.KMV_K} THEN k_u::DOUBLE
                          ELSE (k_u - 1) / ((theta_hv + 1) / {sk._KMV_SCALE!r}::DOUBLE)
                     END AS e_union
              FROM flags
            ),
            ex AS (
              SELECT x.event_type AS ta, y.event_type AS tb,
                     count(*) AS n_exact_inter
              FROM ev x JOIN ev y
                ON x.u = y.u AND x.event_type < y.event_type
              GROUP BY 1, 2
            )
            SELECT est.ta, est.tb,
                   CAST(n_exact_inter AS BIGINT) AS n_exact_inter,
                   round(n_both::DOUBLE / k_u * e_union, 4) AS n_kmv_inter,
                   round((n_both::DOUBLE / k_u * e_union - n_exact_inter)
                         / n_exact_inter, 6) AS rel_err
            FROM est JOIN ex ON ex.ta = est.ta AND ex.tb = est.tb
        """,
        "hll_intersect_types": f"""
            WITH ev AS (
              SELECT event_type, user_id::VARCHAR AS u FROM events
            ),
            h AS (
              SELECT event_type, u,
                     ('0x' || substr(md5(u), 1, 12))::BIGINT AS hv
              FROM ev
            ),
            rr AS (
              SELECT event_type, hv % {sk.HLL_M} AS bucket,
                     CASE WHEN hv // {sk.HLL_M} > 0
                          THEN {sk._HLL_HASH_BITS - sk.HLL_P + 1} - length(bin(hv // {sk.HLL_M}))
                          ELSE {sk._HLL_HASH_BITS - sk.HLL_P + 1} END AS rk
              FROM h
            ),
            regs0 AS (
              SELECT event_type, bucket, max(rk) AS r
              FROM rr GROUP BY event_type, bucket
            ),
            tp AS (
              SELECT a.event_type AS ta, b.event_type AS tb
              FROM (SELECT DISTINCT event_type FROM ev) a
              JOIN (SELECT DISTINCT event_type FROM ev) b
                ON a.event_type < b.event_type
            ),
            pregs AS (
              SELECT ta, tb, bucket, max(r) AS r
              FROM tp JOIN regs0 ON event_type = ta OR event_type = tb
              GROUP BY 1, 2, 3
            ),
            ptu AS (
              SELECT ta, tb, sum(power(2.0, -r)) AS s, count(*) AS nonzero
              FROM pregs GROUP BY 1, 2
            ),
            eu AS (
              SELECT ta, tb,
                     CASE WHEN {sk.HLL_ALPHA!r}::DOUBLE * {sk.HLL_M} * {sk.HLL_M}
                               / (s + ({sk.HLL_M} - nonzero)) <= 2.5 * {sk.HLL_M}
                               AND {sk.HLL_M} - nonzero > 0
                          THEN {sk.HLL_M}::DOUBLE * ln({sk.HLL_M}::DOUBLE / ({sk.HLL_M} - nonzero))
                          ELSE {sk.HLL_ALPHA!r}::DOUBLE * {sk.HLL_M} * {sk.HLL_M}
                               / (s + ({sk.HLL_M} - nonzero)) END AS e_union
              FROM ptu
            ),
            pts AS (
              SELECT event_type, sum(power(2.0, -r)) AS s, count(*) AS nonzero
              FROM regs0 GROUP BY 1
            ),
            es1 AS (
              SELECT event_type,
                     CASE WHEN {sk.HLL_ALPHA!r}::DOUBLE * {sk.HLL_M} * {sk.HLL_M}
                               / (s + ({sk.HLL_M} - nonzero)) <= 2.5 * {sk.HLL_M}
                               AND {sk.HLL_M} - nonzero > 0
                          THEN {sk.HLL_M}::DOUBLE * ln({sk.HLL_M}::DOUBLE / ({sk.HLL_M} - nonzero))
                          ELSE {sk.HLL_ALPHA!r}::DOUBLE * {sk.HLL_M} * {sk.HLL_M}
                               / (s + ({sk.HLL_M} - nonzero)) END AS e
              FROM pts
            ),
            dx AS (SELECT DISTINCT event_type, u FROM ev),
            ex AS (
              SELECT x.event_type AS ta, y.event_type AS tb,
                     count(*) AS n_exact_inter
              FROM dx x JOIN dx y
                ON x.u = y.u AND x.event_type < y.event_type
              GROUP BY 1, 2
            )
            SELECT eu.ta, eu.tb, CAST(n_exact_inter AS BIGINT) AS n_exact_inter,
                   round(ea.e + eb.e - e_union, 4) AS n_hll_inter,
                   round((ea.e + eb.e - e_union - n_exact_inter)
                         / n_exact_inter, 6) AS rel_err
            FROM eu
            JOIN es1 ea ON ea.event_type = eu.ta
            JOIN es1 eb ON eb.event_type = eu.tb
            JOIN ex ON ex.ta = eu.ta AND ex.tb = eu.tb
        """,
        "bucketed_join_revenue": """
            SELECT o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items,
                   count(DISTINCT o_orderkey) AS n_orders
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "countmin_heavy_hitters": _CM_ORACLE,
        # ewma_anomaly: the trailing list is folded with the SAME
        # textual expression Spark uses (seed = first element, then
        # alpha*x + (1-alpha)*acc left-to-right; sums seeded 0.0), so
        # every double matches bit-for-bit — and they are emitted RAW
        # (no round(6)): explicit rounding is the one step whose
        # half-boundary behavior differs between engines, while the
        # driver hash rounds both sides with one implementation.
        # See timeseries.ewma_anomaly.
        "ewma_anomaly": f"""
            WITH e AS (
              SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
                     list(value) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id
                       ROWS BETWEEN {ts.EWMA_WIN} PRECEDING AND 1 PRECEDING) AS a
              FROM events
            ),
            m AS (
              SELECT user_id, event_id, ts_us, value, len(a)::DOUBLE AS n,
                     list_reduce(a, (acc, x) ->
                       {ts.EWMA_ALPHA!r} * x + {1 - ts.EWMA_ALPHA!r} * acc)
                       AS ewma_prev,
                     list_reduce(list_prepend(0.0::DOUBLE, a),
                                 (acc, x) -> acc + x) AS s1,
                     list_reduce(list_prepend(0.0::DOUBLE, a),
                                 (acc, x) -> acc + x * x) AS s2
              FROM e WHERE len(a) >= {ts.EWMA_MIN_N}
            ),
            z AS (
              SELECT *, sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0)) AS sd
              FROM m
            )
            SELECT user_id, event_id, ts_us, value, ewma_prev,
                   (value - ewma_prev) / sd AS zscore
            FROM z
            WHERE sd > 0
              AND abs((value - ewma_prev) / sd) >= {ts.ANOM_Z}
        """,
        # ohlc_bars: open/close via DuckDB's ordered-aggregate
        # first/last — same deterministic (ts_us, event_id) pick as
        # Spark's lexicographic struct min/max; raw doubles (picks,
        # not arithmetic) hash bit-identical.
        "ohlc_bars": """
            WITH e AS (
              SELECT event_type, epoch_us(ts) AS ts_us, event_id, value,
                     epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us
              FROM events
            )
            SELECT event_type, bucket_us,
                   first(value ORDER BY ts_us, event_id) AS open,
                   max(value) AS high,
                   min(value) AS low,
                   last(value ORDER BY ts_us, event_id) AS close,
                   count(*) AS n
            FROM e GROUP BY 1, 2
        """,
        "scd2_intervals": """
            WITH e AS (
              SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
                     CASE WHEN lag(event_type) OVER w IS NULL
                               OR lag(event_type) OVER w != event_type
                          THEN 1 ELSE 0 END AS chg
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
            ),
            r AS (
              SELECT *, sum(chg) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS run_idx
              FROM e
            )
            SELECT user_id, CAST(run_idx AS BIGINT) AS run_idx, event_type,
                   min(ts_us) AS start_us, max(ts_us) AS end_us,
                   count(*) AS n_events
            FROM r GROUP BY 1, 2, 3
        """,
        "time_weighted_avg": """
            -- LOCF time-weighted average; integer epoch-us durations
            WITH ev AS (
              SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
            ),
            d AS (
              SELECT user_id, value,
                     lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                       - ts_us AS dur
              FROM ev
            ),
            t AS (SELECT * FROM d WHERE dur IS NOT NULL)
            SELECT user_id, CAST(count(*) + 1 AS BIGINT) AS n_events,
                   round(sum(value * dur) / sum(dur)::DOUBLE, 6) AS twa_value,
                   round(avg(value), 6) AS naive_avg
            FROM t GROUP BY user_id
        """,
        "label_prop_iterate": _lpa_sql(),
        "kcore_peel": _kcore_sql(),
        # market_basket_rules: ratios of integer counts with the same
        # textual arithmetic — raw doubles hash bit-identical (the
        # ewma_anomaly convention).
        "market_basket_rules": f"""
            WITH op AS MATERIALIZED (
              SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
            ),
            pairs AS (
              SELECT a.pk AS antecedent, b.pk AS consequent,
                     count(*) AS n_both
              FROM op a JOIN op b ON a.ok = b.ok AND a.pk != b.pk
              GROUP BY 1, 2 HAVING count(*) >= {gr.COPURCHASE_MIN_W}
            ),
            per_part AS (SELECT pk, count(*) AS n_part FROM op GROUP BY 1),
            total AS (SELECT count(DISTINCT ok)::DOUBLE AS n_orders FROM op)
            SELECT p.antecedent, p.consequent,
                   CAST(p.n_both AS BIGINT) AS n_both,
                   p.n_both / t.n_orders AS support,
                   p.n_both / a.n_part AS confidence,
                   p.n_both * t.n_orders / (a.n_part * c.n_part) AS lift
            FROM pairs p
            JOIN per_part a ON p.antecedent = a.pk
            JOIN per_part c ON p.consequent = c.pk, total t
        """,
        # equi-depth range assignment mirrors operators.advanced.
        # range_partition_plan: day atomically assigned by rows-before,
        # so both engines compute identical integer range ids.
        "range_partition_plan": f"""
            WITH per_day AS (
              SELECT date_diff('day', DATE '1970-01-01', l_shipdate::DATE) AS day,
                     count(*) AS cnt
              FROM lineitem GROUP BY 1
            ),
            t AS (SELECT sum(cnt)::DOUBLE AS total FROM per_day),
            assigned AS (
              SELECT day, cnt, total,
                     1 + floor((sum(cnt) OVER (ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                                - cnt) * {adv.RANGE_PARTS} / total) AS range_id
              FROM per_day, t
            )
            SELECT CAST(range_id AS BIGINT) AS range_id,
                   CAST(min(day) AS BIGINT) AS lo_day,
                   CAST(max(day) AS BIGINT) AS hi_day,
                   count(*) AS n_days,
                   CAST(sum(cnt) AS BIGINT) AS n_rows,
                   round(sum(cnt) / max(total), 6) AS share,
                   round(sum(cnt) * {adv.RANGE_PARTS} / max(total), 6) AS skew_ratio
            FROM assigned GROUP BY 1
        """,
        "label_prop_step": """
            WITH e AS (
              SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
              FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY 1, 2
            ),
            und AS (
              SELECT src, dst, w FROM e
              UNION ALL
              SELECT dst AS src, src AS dst, w FROM e
            ),
            cand AS (
              SELECT dst AS node, src AS lbl, sum(w) AS wsum
              FROM und GROUP BY 1, 2
            ),
            r AS (
              SELECT node, lbl, wsum,
                     row_number() OVER (PARTITION BY node
                                        ORDER BY wsum DESC, lbl ASC) AS rn
              FROM cand
            )
            SELECT CAST(node AS BIGINT) AS node,
                   CAST(lbl AS BIGINT) AS new_label,
                   CAST(wsum AS BIGINT) AS support
            FROM r WHERE rn = 1
        """,
        # the streaming twin shares the batch HLL oracle (same registers,
        # same estimator — the stream only changes WHERE the max-agg runs)
        "streaming_distinct_users_hll": _HLL_ORACLE,
        "streaming_heavy_hitters": _CM_ORACLE,
        "streaming_quantile_quality": _QSK_ORACLE,
        "length_ks_by_source": """
            WITH lens AS (SELECT source, n_chars::BIGINT AS L FROM documents),
            g AS (SELECT L, count(*) AS gc FROM lens GROUP BY L),
            ns AS (SELECT source, count(*) AS n_docs FROM lens GROUP BY source),
            scnt AS (SELECT source, L, count(*) AS sc FROM lens GROUP BY source, L),
            grid AS (
              SELECT ns.source, ns.n_docs, g.L, g.gc, coalesce(scnt.sc, 0) AS sc
              FROM ns CROSS JOIN g
              LEFT JOIN scnt ON scnt.source = ns.source AND scnt.L = g.L
            ),
            cum AS (
              SELECT source, n_docs, L,
                     sum(sc) OVER (PARTITION BY source ORDER BY L
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE
                       / n_docs AS fs,
                     sum(gc) OVER (PARTITION BY source ORDER BY L
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE
                       / (SELECT count(*) FROM lens) AS fg
              FROM grid
            ),
            dd AS (
              SELECT source, n_docs, L, round(abs(fs - fg), 9) AS d FROM cum
            ),
            r AS (
              SELECT source, n_docs, L, d,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY d DESC, L ASC) AS rn
              FROM dd
            )
            SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                   round(d, 6) AS ks_stat, CAST(L AS BIGINT) AS ks_len
            FROM r WHERE rn = 1
        """,
        "streaming_custom_sessions": _CUSTOM_SESSIONS_ORACLE,
        "prefix_filter_neardup": f"""
            {_SQL_TOKS},
            sh AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT da, db,
                   round(i::DOUBLE / (ca.n + cb.n - i), 6) AS jaccard
            FROM inter
            JOIN cnt ca ON da = ca.doc_id
            JOIN cnt cb ON db = cb.doc_id
            WHERE i::DOUBLE / (ca.n + cb.n - i) >= {dd.PREFIX_JACCARD_T}
        """,
        # containment_neardup: the UNCAPPED all-pairs DIRECTED twin
        # (a.doc_id != b.doc_id, i / |A|) — a green row proves the
        # contained-side prefix candidate generation is complete.
        "containment_neardup": f"""
            {_SQL_TOKS},
            sh AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle
                                 AND a.doc_id != b.doc_id
              GROUP BY 1, 2
            )
            SELECT da, db, round(i::DOUBLE / ca.n, 6) AS containment
            FROM inter JOIN cnt ca ON da = ca.doc_id
            WHERE i::DOUBLE / ca.n >= {dd.CONTAINMENT_T}
        """,
        # ppjoin_neardup's length + positional filters are LOSSLESS, so
        # its oracle is the SAME uncapped all-pairs twin — a green row
        # proves the pruning dropped nothing (the prefix_filter gate).
        "ppjoin_neardup": f"""
            {_SQL_TOKS},
            sh AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT da, db,
                   round(i::DOUBLE / (ca.n + cb.n - i), 6) AS jaccard
            FROM inter
            JOIN cnt ca ON da = ca.doc_id
            JOIN cnt cb ON db = cb.doc_id
            WHERE i::DOUBLE / (ca.n + cb.n - i) >= {dd.PREFIX_JACCARD_T}
        """,
        "pagerank_docs": _pagerank_docs_sql(),
        # md5-derived sketch family — oracle-exact since r9 (VERDICT r8
        # #3 retired their rows-only status)
        "simhash": _simhash_sql(),
        "simhash_neardup": _simhash_neardup_sql(),
        "minhash_lsh_neardup": _minhash_lsh_sql(),
        # ---- round-9 additions ----
        # sweep-line peak concurrency: same per-timestamp NET deltas,
        # so the running sum is tie-order-free in both engines
        "interval_concurrency": """
            WITH iv AS (
              SELECT event_type, user_id,
                     min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
              FROM events GROUP BY 1, 2
            ),
            bnd AS (
              SELECT event_type, bts AS ts, sum(ds) AS ns, sum(de) AS ne FROM (
                SELECT event_type, s AS bts, 1 AS ds, 0 AS de FROM iv
                UNION ALL
                SELECT event_type, e AS bts, 0 AS ds, 1 AS de FROM iv
              ) GROUP BY 1, 2
            ),
            conc AS (
              SELECT event_type, ts, ns,
                     (sum(ns) OVER (PARTITION BY event_type ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      - coalesce(sum(ne) OVER (PARTITION BY event_type ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     )::BIGINT AS conc
              FROM bnd
            ),
            st AS (
              SELECT event_type, count(DISTINCT ts)::BIGINT AS n_boundaries,
                     max(conc) AS mc
              FROM conc WHERE ns > 0 GROUP BY 1
            )
            SELECT s.event_type, s.n_boundaries,
                   s.mc AS peak_concurrency,
                   min(c.ts)::BIGINT AS peak_ts_us
            FROM st s
            JOIN conc c ON c.event_type = s.event_type
                       AND c.conc = s.mc AND c.ns > 0
            GROUP BY 1, 2, 3
        """,
        # interpolating median of the same double multiset in both
        # engines; raw doubles out (the ewma_anomaly lesson)
        "mad_outliers": f"""
            WITH e AS (SELECT event_id, event_type, value FROM events),
            med AS (SELECT event_type, median(value) AS med FROM e GROUP BY 1),
            mad AS (
              SELECT e.event_type, median(abs(e.value - m.med)) AS mad
              FROM e JOIN med m USING (event_type) GROUP BY 1
            )
            SELECT e.event_id, e.event_type, e.value, m.med, d.mad,
                   abs(e.value - m.med) / ({ts.MAD_K!r}::DOUBLE * d.mad) AS robust_z
            FROM e JOIN med m USING (event_type) JOIN mad d USING (event_type)
            WHERE d.mad > 0
              AND abs(e.value - m.med) / ({ts.MAD_K!r}::DOUBLE * d.mad) >= {ts.MAD_Z!r}
        """,
        "event_trigrams": """
            WITH e AS (
              SELECT user_id, event_type,
                     lead(event_type, 1) OVER w AS s2,
                     lead(event_type, 2) OVER w AS s3
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
            )
            SELECT event_type AS s1, s2, s3, count(*)::BIGINT AS cnt
            FROM e WHERE s3 IS NOT NULL GROUP BY 1, 2, 3
        """,
        # triangles enumerated once via a<b<c chaining (the Spark side
        # uses degree ordering — same set, proven by the shared gate)
        "clustering_coeff": f"""
            WITH op AS (
              SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
            ),
            e0 AS (
              SELECT a.pk AS pa, b.pk AS pb
              FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
              GROUP BY 1, 2 HAVING count(*) >= {gr.COPURCHASE_MIN_W}
            ),
            deg AS (
              SELECT n, count(*)::BIGINT AS degree FROM (
                SELECT pa AS n FROM e0 UNION ALL SELECT pb AS n FROM e0
              ) GROUP BY 1
            ),
            tri AS (
              SELECT unnest([e1.pa, e1.pb, e2.pb]) AS n
              FROM e0 e1
              JOIN e0 e2 ON e1.pb = e2.pa
              JOIN e0 e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
            ),
            tcnt AS (SELECT n, count(*)::BIGINT AS triangles FROM tri GROUP BY 1)
            SELECT d.n AS node, d.degree,
                   coalesce(t.triangles, 0)::BIGINT AS triangles,
                   CASE WHEN d.degree >= 2
                        THEN 2.0::DOUBLE * coalesce(t.triangles, 0)
                             / (d.degree * (d.degree - 1))
                        ELSE 0.0::DOUBLE END AS coeff
            FROM deg d LEFT JOIN tcnt t ON d.n = t.n
        """,
        # exact-integer variance-weighted largest-remainder allocation
        "neyman_allocation": f"""
            WITH per AS (
              SELECT source,
                     len(list_filter(string_split_regex(text, {_D}),
                                     x -> length(x) > 0))::BIGINT AS x
              FROM documents
            ),
            st AS (
              SELECT source, count(*)::BIGINT AS n_docs,
                     sum(x)::BIGINT AS sx, sum(x * x)::BIGINT AS sxx
              FROM per GROUP BY 1
            ),
            w AS (
              SELECT source, n_docs,
                     (n_docs * (n_docs * sxx - sx * sx))::BIGINT AS weight
              FROM st
            ),
            tot AS (SELECT sum(weight)::BIGINT AS tw FROM w),
            alloc AS (
              SELECT source, n_docs, weight,
                     (({pl.ALLOC_BUDGET} * weight) // tw)::BIGINT AS base,
                     (({pl.ALLOC_BUDGET} * weight) % tw)::BIGINT AS rem
              FROM w, tot
            ),
            short AS (SELECT {pl.ALLOC_BUDGET} - sum(base) AS s FROM alloc)
            SELECT source, n_docs, weight,
                   (base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                                     <= (SELECT s FROM short)
                                THEN 1 ELSE 0 END)::BIGINT AS alloc
            FROM alloc
        """,
        "oov_rate": f"""
            WITH tok AS (
              SELECT source,
                     unnest(list_filter(string_split_regex(text, {_D}),
                                        x -> length(x) > 0)) AS tok
              FROM documents
            ),
            counts AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
            vocab AS (
              SELECT tok FROM counts ORDER BY c DESC, tok LIMIT {pl.OOV_VOCAB_K}
            )
            SELECT t.source, count(*)::BIGINT AS n_tokens,
                   sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
                   sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::BIGINT
                     / count(*) AS rate
            FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
            GROUP BY 1
        """,
        # recomputes the merged post-evolution state straight from the
        # source table (batch split doc_id % 3, flag n_chars >= 500)
        "evolution_roundtrip": """
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END)::BIGINT
                     AS n_pre_evolution,
                   sum(CASE WHEN doc_id % 3 = 0 AND n_chars >= 500
                            THEN 1 ELSE 0 END)::BIGINT AS n_hi,
                   sum(n_chars)::BIGINT AS sum_chars
            FROM documents GROUP BY source
        """,
        # streaming OHLC shares the batch bars' oracle: the green row
        # proves streaming partial struct-min/max state merge equals
        # the batch aggregation
        "streaming_ohlc": """
            WITH e AS (
              SELECT event_type, epoch_us(ts) AS ts_us, event_id, value,
                     epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us
              FROM events
            )
            SELECT event_type, bucket_us,
                   first(value ORDER BY ts_us, event_id) AS open,
                   max(value) AS high,
                   min(value) AS low,
                   last(value ORDER BY ts_us, event_id) AS close,
                   count(*) AS n
            FROM e GROUP BY 1, 2
        """,
        "sssp_parts": _sssp_sql(),
        # same regex sentence split + strtok token filter, all counts
        # integer; avg is int/int raw
        "sentence_stats": f"""
            WITH s AS (
              SELECT doc_id,
                     list_filter(
                       list_transform(string_split_regex(text, '[.!?]'),
                                      x -> trim(x)),
                       x -> length(x) > 0) AS sents
              FROM documents
            ),
            tc AS (
              SELECT doc_id,
                     list_transform(
                       sents,
                       x -> len(list_filter(string_split_regex(x, {_D}),
                                            y -> length(y) > 0))) AS tcs,
                     len(sents)::BIGINT AS n_sentences
              FROM s
            )
            SELECT doc_id, n_sentences,
                   coalesce(list_sum(tcs), 0)::BIGINT AS n_tokens,
                   coalesce(list_max(tcs), 0)::BIGINT AS max_sentence_tokens,
                   CASE WHEN n_sentences > 0
                        THEN coalesce(list_sum(tcs), 0)::BIGINT / n_sentences
                        ELSE 0.0::DOUBLE END AS avg_sentence_tokens
            FROM tc
        """,
        "basket_triples": f"""
            WITH op AS (
              SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
            )
            SELECT a.pk AS pa, b.pk AS pb, c.pk AS pc,
                   count(*)::BIGINT AS n_orders
            FROM op a
            JOIN op b ON a.ok = b.ok AND a.pk < b.pk
            JOIN op c ON b.ok = c.ok AND b.pk < c.pk
            GROUP BY 1, 2, 3 HAVING count(*) >= {gr.COPURCHASE_MIN_W}
        """,
        # Newman r over the symmetrized edge list reduces to
        # (M'·Σjk − (Σj)²) / (M'·Σj² − (Σj)²) — all-BIGINT sums, one
        # final double division (round 6); degenerate (regular/empty)
        # graphs emit 0.0 in both engines
        "degree_assortativity": f"""
            WITH op AS (
              SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
            ),
            e AS (
              SELECT a.pk AS pa, b.pk AS pb
              FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
              GROUP BY 1, 2 HAVING count(*) >= {gr.COPURCHASE_MIN_W}
            ),
            und AS (SELECT pa AS a, pb AS b FROM e
                    UNION ALL SELECT pb, pa FROM e),
            deg AS (SELECT a, count(*)::BIGINT AS d FROM und GROUP BY 1),
            jk AS (
              SELECT dx.d AS dx, dy.d AS dy
              FROM und JOIN deg dx ON und.a = dx.a
                       JOIN deg dy ON und.b = dy.a
            ),
            s AS (
              SELECT count(*)::BIGINT AS m,
                     coalesce(sum(dx), 0)::BIGINT AS sj,
                     coalesce(sum(dx * dy), 0)::BIGINT AS sjk,
                     coalesce(sum(dx * dx), 0)::BIGINT AS sjj
              FROM jk
            )
            SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
                   (m // 2)::BIGINT AS n_edges,
                   round(CASE WHEN m * sjj - sj * sj = 0 THEN 0.0::DOUBLE
                              ELSE (m * sjk - sj * sj) / (m * sjj - sj * sj)
                         END, 6) AS assortativity
            FROM s
        """,
        # integer CUSUM: drift_i = |T·prefix_i − i·C| over hourly
        # counts — every quantity BIGINT, argmax ties to earliest hour
        "cusum_drift": """
            WITH h AS (
              SELECT event_type,
                     epoch_us(ts) // 3600000000 AS hour_bucket,
                     count(*)::BIGINT AS c
              FROM events GROUP BY 1, 2
            ),
            p AS (
              SELECT event_type, hour_bucket,
                     sum(c) OVER (PARTITION BY event_type ORDER BY hour_bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     )::BIGINT AS prefix,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY hour_bucket)::BIGINT AS i,
                     sum(c) OVER (PARTITION BY event_type)::BIGINT AS total,
                     count(*) OVER (PARTITION BY event_type)::BIGINT AS t_hours
              FROM h
            ),
            d AS (
              SELECT event_type, hour_bucket,
                     abs(t_hours * prefix - i * total)::BIGINT AS drift,
                     t_hours, total,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY abs(t_hours * prefix - i * total) DESC,
                                hour_bucket) AS rn
              FROM p
            )
            SELECT event_type, hour_bucket AS peak_hour, drift AS max_drift,
                   t_hours, total AS n_events
            FROM d WHERE rn = 1
        """,
        # rollup over the byte-exact header reparse: int sums + two
        # exact int/int means
        "media_type_profile": f"""
            WITH f AS ({_MEDIA_FEATURES_SQL})
            SELECT fmt, count(*)::BIGINT AS n_docs,
                   sum(n_bytes)::BIGINT AS total_bytes,
                   round(sum(width) / count(*), 6) AS avg_width,
                   round(sum(height) / count(*), 6) AS avg_height,
                   sum(width * height * channels)::BIGINT AS px_volume
            FROM f GROUP BY 1
        """,
        # RRF of the two driver-verified rankings: each contribution is
        # one exact double division; a neighbor is in <= 2 lists so the
        # score is at most one (commutative) IEEE addition
        "rrf_fusion": f"""
            WITH ex AS ({{COSINE_TOPK}}),
            ap AS ({{ANN_LSH}}),
            u AS (
              SELECT qid, neighbor_id, rn FROM ex
              UNION ALL
              SELECT qid, neighbor_id, rn FROM ap
            ),
            g AS (
              SELECT qid, neighbor_id,
                     sum(1.0::DOUBLE / ({sim.RRF_K} + rn)) AS rrf,
                     count(*)::BIGINT AS n_lists
              FROM u GROUP BY 1, 2
            ),
            r AS (
              SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY rrf DESC, neighbor_id
              ) AS fused_rank FROM g
            )
            SELECT qid, neighbor_id, round(rrf, 6) AS rrf, n_lists,
                   fused_rank
            FROM r WHERE fused_rank <= {sim.TOPK}
        """,
        # Flesch proxy: int counts from the sentence_stats split + the
        # module tokenizer; identical literal/division tree both sides
        "readability": f"""
            WITH s AS (
              SELECT doc_id,
                     len(list_filter(
                       list_transform(string_split_regex(text, '[.!?]'),
                                      x -> trim(x)),
                       x -> length(x) > 0))::BIGINT AS n_s,
                     list_filter(string_split_regex(text, {_D}),
                                 y -> length(y) > 0) AS t
              FROM documents
            ),
            c AS (
              SELECT doc_id, n_s, len(t)::BIGINT AS n_w,
                     coalesce(list_sum(list_transform(t, x -> length(x))),
                              0)::BIGINT AS n_c
              FROM s
            )
            SELECT doc_id, n_s AS n_sentences, n_w AS n_words,
                   n_c AS n_chars,
                   CASE WHEN n_s > 0 AND n_w > 0
                        THEN round(206.835::DOUBLE
                                   - 1.015::DOUBLE * (n_w / n_s)
                                   - 84.6::DOUBLE * ((n_c / n_w) / 3.0::DOUBLE),
                                   4)
                        ELSE 0.0::DOUBLE END AS reading_ease
            FROM c
        """,
        # BM25: tf/df/dl/N are exact integers; avgdl and every per-term
        # score replay the Spark expression tree (int->double conversions
        # exact below 2^53), and the per-(qid, doc) sum is the SAME
        # word-ascending left fold both sides (list_reduce seeded [0.0]),
        # so scores are bit-identical and ties break on doc_id alike.
        "bm25_topk": f"""
            {_SQL_TOKS},
            {_BM25_CTES}
            SELECT qid, doc_id, round(score, 6) AS bm25, rn
            FROM branked WHERE rn <= {ta.BM25_TOPK}
        """,
        # Impact-pruned BM25: identical chain, but each term's posting
        # list truncates to the BM25_POSTINGS_CAP highest-impact rows
        # (impact = the same per-posting expression both engines rank;
        # ties to lower doc_id) before the candidate join.
        "bm25_pruned_topk": f"""
            {_SQL_TOKS},
            {_BM25_CTES},
            imp AS (
              SELECT tf.word, tf.doc_id,
                     ln(1.0 + (n.n - dfx.df + 0.5) / (dfx.df + 0.5))
                     * (tf.tf * {ta.BM25_K1 + 1.0!r})
                       / (tf.tf + {ta.BM25_K1!r}
                          * ({1.0 - ta.BM25_B!r}
                             + {ta.BM25_B!r} * tf.dl / (tot.total / n.n))) AS s
              FROM tf JOIN dfx USING (word)
              CROSS JOIN n CROSS JOIN tot
            ),
            ptf AS (
              SELECT word, doc_id, s FROM (
                SELECT *, row_number() OVER (
                         PARTITION BY word ORDER BY s DESC, doc_id
                       ) AS pr
                FROM imp
              ) WHERE pr <= {ta.BM25_POSTINGS_CAP}
            ),
            pcand AS (
              SELECT qt.qid, ptf.doc_id, ptf.word, ptf.s
              FROM qt JOIN ptf USING (word)
              WHERE ptf.doc_id <> qt.qid
            ),
            pscored AS (
              SELECT qid, doc_id,
                     list_reduce([0.0] || list(s ORDER BY word),
                                 (a, b) -> a + b) AS score
              FROM pcand GROUP BY qid, doc_id
            )
            SELECT qid, doc_id, round(score, 6) AS bm25, rn FROM (
              SELECT qid, doc_id, score,
                     row_number() OVER (
                       PARTITION BY qid ORDER BY score DESC, doc_id
                     ) AS rn
              FROM pscored
            ) WHERE rn <= {ta.BM25_TOPK}
        """,
        # Hybrid fusion: BM25 ranks (shared _BM25_CTES chain) x capped
        # shingle-Jaccard ranks (the ngram_jaccard_neardup set algebra),
        # fused as at most one commutative IEEE addition of exact
        # divisions — ranks and ties reproduce bit-identically.
        "lexical_semantic_rrf": f"""
            {_SQL_TOKS},
            {_BM25_CTES},
            sh0 AS (
              SELECT DISTINCT doc_id,
                     t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            sh AS (
              SELECT doc_id, shingle FROM sh0
              WHERE shingle IN (
                SELECT shingle FROM sh0 GROUP BY shingle
                HAVING count(*) <= {dd.HOT_SHINGLE_DF_CAP}
              )
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            qsh AS (
              SELECT doc_id AS qid, shingle FROM sh
              WHERE doc_id < {ta.BM25_N_QUERIES}
            ),
            inter AS (
              SELECT q.qid, d.doc_id, count(*) AS i
              FROM qsh q JOIN sh d
                ON d.shingle = q.shingle AND d.doc_id <> q.qid
              GROUP BY 1, 2
            ),
            jac AS (
              SELECT inter.qid, inter.doc_id,
                     inter.i::DOUBLE / (cq.n + cd.n - inter.i) AS j
              FROM inter
              JOIN cnt cq ON cq.doc_id = inter.qid
              JOIN cnt cd ON cd.doc_id = inter.doc_id
            ),
            jtop AS (
              SELECT qid, doc_id, rj FROM (
                SELECT qid, doc_id,
                       row_number() OVER (
                         PARTITION BY qid ORDER BY j DESC, doc_id
                       ) AS rj
                FROM jac
              ) WHERE rj <= {ta.BM25_TOPK}
            ),
            bt AS (
              SELECT qid, doc_id, rn FROM branked WHERE rn <= {ta.BM25_TOPK}
            ),
            f AS (
              SELECT coalesce(b.qid, j.qid) AS qid,
                     coalesce(b.doc_id, j.doc_id) AS doc_id,
                     coalesce(1.0 / ({sim.RRF_K} + b.rn), 0.0)
                       + coalesce(1.0 / ({sim.RRF_K} + j.rj), 0.0) AS rrf,
                     ((b.rn IS NOT NULL)::INT
                       + (j.rj IS NOT NULL)::INT)::BIGINT AS n_lists
              FROM bt b FULL OUTER JOIN jtop j
                ON b.qid = j.qid AND b.doc_id = j.doc_id
            )
            SELECT qid, doc_id, round(rrf, 6) AS rrf, n_lists, fused_rank
            FROM (
              SELECT *, row_number() OVER (
                       PARTITION BY qid ORDER BY rrf DESC, doc_id
                     ) AS fused_rank
              FROM f
            ) WHERE fused_rank <= {ta.BM25_TOPK}
        """,
        "pca_power_iter": _pca_power_sql() + _pca_power_final_sql(),
        "pca_debias": _pca_power_sql() + _pca_debias_final_sql(),
        "cluster_balanced_sample": _cluster_balanced_sample_sql(),
        # streaming_index_ingest: the batch twin of the stateful vocab
        # agg — df/tf_total are exact integers, idf replays the
        # bm25_topk expression over them.
        "streaming_index_ingest": f"""
            {_SQL_TOKS},
            ex AS (SELECT t, unnest(list_distinct(t)) AS word FROM toks),
            prs AS (
              SELECT word,
                     len(list_filter(t, x -> x = word))::BIGINT AS tf
              FROM ex
            ),
            agg AS (
              SELECT word, count(*)::BIGINT AS df,
                     sum(tf)::BIGINT AS tf_total
              FROM prs GROUP BY 1
            ),
            n AS (SELECT count(*) AS n FROM documents)
            SELECT word, df, tf_total,
                   round(ln(1.0 + (n.n - df + 0.5) / (df + 0.5)), 6) AS idf
            FROM agg CROSS JOIN n
        """,
        # integer moments (x = qty as BIGINT, y = cents as BIGINT) make
        # n/sx/sy/sxx/syy/sxy exact in both engines; the closed-form
        # slope/intercept/r2 then runs identical IEEE double math
        "linreg_by_group": """
            WITH li AS (
              SELECT l_partkey,
                     l_quantity::BIGINT AS x,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS yc
              FROM lineitem
            ),
            m AS (
              SELECT p_brand,
                     count(*)::BIGINT AS n,
                     -- HUGEINT sums kept wide (round-10): the ::BIGINT
                     -- casts errored exactly where Spark's former BIGINT
                     -- moments hit ARITHMETIC_OVERFLOW (ANSI default);
                     -- both engines now carry exact wide integers
                     -- (DECIMAL(38,0) on the Spark side) to the double
                     -- formula edge
                     sum(x) AS sx,
                     sum(yc) AS sy,
                     sum(x * x) AS sxx,
                     sum(yc * yc) AS syy,
                     sum(x * yc) AS sxy
              FROM li JOIN part ON l_partkey = p_partkey
              GROUP BY 1
            )
            SELECT p_brand, n,
                   round((n::DOUBLE * (sxy::DOUBLE / 100.0)
                          - sx::DOUBLE * (sy::DOUBLE / 100.0))
                         / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE),
                         6) AS slope,
                   round(((sy::DOUBLE / 100.0)
                          - ((n::DOUBLE * (sxy::DOUBLE / 100.0)
                              - sx::DOUBLE * (sy::DOUBLE / 100.0))
                             / (n::DOUBLE * sxx::DOUBLE
                                - sx::DOUBLE * sx::DOUBLE)) * sx::DOUBLE)
                         / n::DOUBLE, 6) AS intercept,
                   round(pow(n::DOUBLE * (sxy::DOUBLE / 100.0)
                             - sx::DOUBLE * (sy::DOUBLE / 100.0), 2)
                         / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                            * (n::DOUBLE * (syy::DOUBLE / 10000.0)
                               - (sy::DOUBLE / 100.0) * (sy::DOUBLE / 100.0))),
                         6) AS r2
            FROM m
        """,
        # unique (price, orderkey, linenumber) total order; pick rule is
        # exact integer 2*cum >= total — no float threshold to disagree on
        "weighted_median": """
            WITH li AS (
              SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
                     l_quantity::BIGINT AS w
              FROM lineitem
            ),
            c AS (
              SELECT l_returnflag, l_extendedprice, w,
                     sum(w) OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     )::BIGINT AS cw,
                     sum(w) OVER (PARTITION BY l_returnflag)::BIGINT AS tw
              FROM li
            )
            SELECT l_returnflag, min(l_extendedprice) AS wmedian,
                   min(tw)::BIGINT AS total_weight
            FROM c WHERE 2 * cw >= tw GROUP BY 1
        """,
        # first digit via integer string math (cents -> decimal print),
        # never log10 bucketing — power-of-10 boundaries are libm-unsafe
        "benford_digits": """
            WITH d AS (
              SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                      AS VARCHAR), 1, 1) AS INT) AS digit
              FROM orders
            ),
            c AS (
              SELECT digit, count(*)::BIGINT AS n FROM d
              WHERE digit >= 1 GROUP BY 1
            ),
            t AS (SELECT sum(n)::BIGINT AS tot FROM c)
            SELECT digit, n,
                   round(n::DOUBLE / tot::DOUBLE, 6) AS obs_share,
                   round(log10(1.0 + 1.0 / digit::DOUBLE), 6) AS benford_share,
                   round(pow(n::DOUBLE
                             - log10(1.0 + 1.0 / digit::DOUBLE) * tot::DOUBLE, 2)
                         / (log10(1.0 + 1.0 / digit::DOUBLE) * tot::DOUBLE),
                         6) AS chi2_term
            FROM c, t
        """,
        # islands: day - row_number constant within a run; all integer
        "gaps_islands": """
            WITH e AS (
              SELECT DISTINCT user_id,
                     (epoch_us(ts) - epoch_us(ts) % 86400000000)
                       // 86400000000 AS day
              FROM events
            ),
            r AS (
              SELECT user_id, day,
                     row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
              FROM e
            ),
            isl AS (
              SELECT user_id, day - rn AS grp, count(*)::BIGINT AS len,
                     min(day)::BIGINT AS start_day
              FROM r GROUP BY 1, 2
            ),
            wm AS (
              SELECT *, max(len) OVER (PARTITION BY user_id) AS wmax FROM isl
            )
            SELECT user_id, sum(len)::BIGINT AS active_days,
                   count(*)::BIGINT AS n_islands,
                   max(len)::BIGINT AS max_streak,
                   min(CASE WHEN len = wmax THEN start_day END)::BIGINT
                     AS max_streak_start
            FROM wm GROUP BY 1
        """,
        # product-limit via exp(sum(ln)) with the d=n CASE guard; both
        # engines drop d=0 steps AFTER computing at-risk counts
        "kaplan_meier": """
            WITH e AS (
              SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events
            ),
            pu AS (
              SELECT user_id, min(ts_us) AS t0, max(ts_us) AS t_last,
                     min(CASE WHEN event_type = 'purchase' THEN ts_us END)
                       AS t_buy
              FROM e GROUP BY 1
            ),
            dd_ AS (
              SELECT CASE WHEN t_buy IS NOT NULL THEN t_buy - t0
                          ELSE t_last - t0 END AS dur_us,
                     CASE WHEN t_buy IS NOT NULL THEN 1 ELSE 0 END AS observed
              FROM pu
            ),
            dh AS (
              SELECT (dur_us - dur_us % 3600000000) // 3600000000 AS t_hours,
                     observed
              FROM dd_
            ),
            bt AS (
              SELECT t_hours, count(*)::BIGINT AS n_total,
                     sum(observed)::BIGINT AS d
              FROM dh GROUP BY 1
            ),
            rk AS (
              SELECT t_hours, d,
                     sum(n_total) OVER (
                       ORDER BY t_hours ASC
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                     )::BIGINT AS n_risk
              FROM bt
            ),
            f AS (SELECT * FROM rk WHERE d > 0),
            g AS (
              SELECT t_hours, n_risk, d,
                     CASE WHEN d < n_risk
                          THEN ln(1.0 - d::DOUBLE / n_risk::DOUBLE) END AS lt,
                     max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (
                       ORDER BY t_hours
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS dead
              FROM f
            )
            SELECT t_hours, n_risk, d AS n_events,
                   CASE WHEN dead = 1 THEN 0.0
                        ELSE round(exp(sum(lt) OVER (
                               ORDER BY t_hours
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                             )), 6) END AS surv
            FROM g
        """,
        # blocked SNM: identical UNIQUE (key, doc_id) sort both engines;
        # verify = exact distinct-token Jaccard on the neighbor pairs
        "sorted_neighborhood_neardup": f"""
            WITH base AS (
              SELECT doc_id,
                     regexp_replace(lower(substr(text, 1, 64)),
                                    '[^a-z0-9]', '', 'g') AS k,
                     list_distinct(list_filter(string_split_regex(text, {_D}),
                                               x -> length(x) > 0)) AS toks
              FROM documents
            ),
            rn AS (
              SELECT doc_id, k, toks, substr(k, 1, 2) AS block,
                     row_number() OVER (
                       PARTITION BY substr(k, 1, 2) ORDER BY k, doc_id
                     ) AS rn
              FROM base
            ),
            cand AS (
              SELECT a.doc_id AS ida, b.doc_id AS idb,
                     a.toks AS ta, b.toks AS tb
              FROM rn a JOIN rn b
                ON a.block = b.block
               AND b.rn - a.rn BETWEEN 1 AND {dd.SNM_WINDOW - 1}
            ),
            j AS (
              SELECT least(ida, idb) AS da, greatest(ida, idb) AS db,
                     round(len(list_intersect(ta, tb))::DOUBLE
                           / (len(ta) + len(tb)
                              - len(list_intersect(ta, tb)))::DOUBLE,
                           6) AS jaccard
              FROM cand
            )
            SELECT da, db, jaccard FROM j
            WHERE jaccard >= {dd.SNM_JACCARD_T}
        """,
        # batch left-join twin of the stream-stream OUTER join: the
        # green row certifies the watermark timeout flushed every
        # abandoned view (none lost, none fabricated)
        "streaming_abandoned_views": """
            WITH v AS (
              SELECT user_id, event_id AS view_id, epoch_us(ts) AS v_ts
              FROM events WHERE event_type = 'view'
            ),
            p AS (
              SELECT user_id AS p_user, event_id AS purchase_id,
                     epoch_us(ts) AS p_ts
              FROM events WHERE event_type = 'purchase'
            ),
            j AS (
              SELECT v.user_id, v.view_id, p.purchase_id
              FROM v LEFT JOIN p
                ON v.user_id = p.p_user
               AND p.p_ts >= v.v_ts
               AND p.p_ts <= v.v_ts + 1800000000
            )
            SELECT user_id,
                   count(DISTINCT view_id)::BIGINT AS n_views,
                   sum(CASE WHEN purchase_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                     AS n_pairs,
                   sum(CASE WHEN purchase_id IS NULL THEN 1 ELSE 0 END)::BIGINT
                     AS n_abandoned
            FROM j GROUP BY 1
        """,
        "array_funcs_catalog": f"""
            {_SQL_TOKS}
            SELECT doc_id,
                   len(t)::BIGINT AS n_tokens,
                   array_to_string(t[1:5], '|') AS first5,
                   len(list_distinct(t))::BIGINT AS n_distinct,
                   list_sort(t)[1] AS min_token,
                   list_sort(t, 'DESC')[1] AS max_token,
                   len(list_filter(t, x -> length(x) > 4))::BIGINT AS n_long,
                   array_to_string(list_transform(t, x -> upper(x))[1:3], '|')
                     AS first3_upper,
                   coalesce(list_sum(list_transform(t, x -> length(x))), 0)::BIGINT
                     AS sum_len,
                   list_contains(t, 'the')::INT AS has_the,
                   coalesce(list_position(t, 'the'), 0)::BIGINT AS the_pos
            FROM toks
        """,
        "null_safe_join": """
            WITH li AS (SELECT nullif(l_returnflag, 'N') AS k FROM lineitem),
            dim AS (SELECT DISTINCT k, 1 AS tagged FROM li),
            a AS (
              SELECT coalesce(li.k, '<NULL>') AS key_bucket,
                     count(*)::BIGINT AS n_rows,
                     sum(CASE WHEN d.tagged IS NULL THEN 0 ELSE 1 END)::BIGINT
                       AS n_nullsafe_matched
              FROM li LEFT JOIN dim d ON li.k IS NOT DISTINCT FROM d.k
              GROUP BY 1
            ),
            b AS (
              SELECT coalesce(li.k, '<NULL>') AS key_bucket,
                     sum(CASE WHEN d.tagged IS NULL THEN 0 ELSE 1 END)::BIGINT
                       AS n_plain_matched
              FROM li LEFT JOIN dim d ON li.k = d.k
              GROUP BY 1
            )
            SELECT a.key_bucket, a.n_rows, a.n_nullsafe_matched,
                   b.n_plain_matched
            FROM a JOIN b USING (key_bucket)
        """,
        # full recompute over the whole corpus — equality with the
        # merged base+delta partials proves the IVM contract
        "ivm_source_stats": f"""
            WITH per AS (
              SELECT doc_id, source, n_chars,
                     len(list_filter(string_split_regex(text, {_D}),
                                     x -> length(x) > 0))::BIGINT AS n_toks
              FROM documents
            )
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(n_toks)::BIGINT AS n_tokens,
                   sum(n_chars)::BIGINT AS n_chars,
                   max(doc_id)::BIGINT AS max_doc_id,
                   sum(n_toks)::BIGINT / count(*) AS avg_tokens
            FROM per GROUP BY 1
        """,
        "dq_referential_audit": """
            SELECT 'orphan_lineitems' AS "check",
                   (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                     (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))::BIGINT
                   AS n_violations
            UNION ALL SELECT 'childless_orders',
                   (SELECT count(*) FROM orders o WHERE NOT EXISTS
                     (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))::BIGINT
            UNION ALL SELECT 'orders_unknown_customer',
                   (SELECT count(*) FROM orders o WHERE NOT EXISTS
                     (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))::BIGINT
            UNION ALL SELECT 'duplicate_line_keys',
                   (SELECT count(*) FROM (
                      SELECT 1 FROM lineitem GROUP BY l_orderkey, l_linenumber
                      HAVING count(*) > 1))::BIGINT
            UNION ALL SELECT 'null_line_keys',
                   (SELECT count(*) FROM lineitem
                    WHERE l_orderkey IS NULL OR l_partkey IS NULL)::BIGINT
            UNION ALL SELECT 'nonpositive_quantity',
                   (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)::BIGINT
            UNION ALL SELECT 'discount_out_of_range',
                   (SELECT count(*) FROM lineitem
                    WHERE l_discount < 0 OR l_discount > 1)::BIGINT
            UNION ALL SELECT 'ship_before_order',
                   (SELECT count(*) FROM lineitem l JOIN orders o
                      ON l.l_orderkey = o.o_orderkey
                    WHERE l.l_shipdate < o.o_orderdate)::BIGINT
        """,
        # cluster_diameter: the dedup_clusters CC chain extended with a
        # hop-capped min-plus walk — recursive UNION dedups (a, b, d)
        # tuples, so the walk is pair-bounded, never path-bounded
        "cluster_diameter": f"""
            WITH RECURSIVE toks AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(text, {_D}), x -> length(x) > 0) AS t
              FROM documents
            ),
            sh0 AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            sh AS (
              SELECT doc_id, shingle FROM sh0
              WHERE shingle IN (
                SELECT shingle FROM sh0 GROUP BY shingle
                HAVING count(*) <= {dd.HOT_SHINGLE_DF_CAP}
              )
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT da, db
              FROM inter JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
              WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5
            ),
            edges AS (
              SELECT da AS a, db AS b FROM pairs UNION SELECT db, da FROM pairs
            ),
            walk(node, label) AS (
              SELECT a, a FROM (SELECT DISTINCT a FROM edges)
              UNION
              SELECT e.a, w.label FROM edges e JOIN walk w ON e.b = w.node
            ),
            cl AS (
              SELECT node, min(label) AS cluster_id FROM walk GROUP BY node
            ),
            wd(a, b, d) AS (
              SELECT a, b, 1 FROM edges
              UNION
              SELECT w.a, e.b, w.d + 1
              FROM wd w JOIN edges e ON w.b = e.a
              WHERE w.a <> e.b AND w.d < {dd.DIAMETER_HOP_CAP}
            ),
            dist AS (
              SELECT a, b, min(d) AS d FROM wd GROUP BY a, b
            ),
            sizes AS (
              SELECT cluster_id, count(*) AS n_docs FROM cl GROUP BY cluster_id
            ),
            ne AS (
              SELECT c.cluster_id, count(*) AS n_edges
              FROM pairs p JOIN cl c ON p.da = c.node GROUP BY 1
            ),
            reach AS (
              SELECT c.cluster_id, count(*) AS n_reached, max(dd2.d) AS max_d
              FROM dist dd2 JOIN cl c ON dd2.a = c.node
              WHERE dd2.a < dd2.b GROUP BY 1
            )
            SELECT s.cluster_id,
                   CAST(s.n_docs AS BIGINT) AS n_docs,
                   CAST(ne.n_edges AS BIGINT) AS n_edges,
                   CAST(CASE WHEN r.n_reached = s.n_docs * (s.n_docs - 1) / 2
                             THEN r.max_d ELSE {dd.DIAMETER_HOP_CAP + 1}
                        END AS BIGINT) AS diameter
            FROM sizes s JOIN ne USING (cluster_id) JOIN reach r USING (cluster_id)
        """,
        # semantics of the runtime-bloom-filter join are those of the
        # plain join — the filter is a pure optimization, which is
        # exactly what the shared oracle proves
        "runtime_filter_join": """
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                     AS revenue,
                   count(DISTINCT o_orderkey) AS n_orders
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY 1
        """,
        # the stream-stream join's batch twin: an ordinary SQL self-
        # join — a green row certifies the watermark-bounded buffering
        # dropped/duplicated nothing
        # streaming_dedup_ingest: dropDuplicatesWithinWatermark with a
        # horizon beyond the feed span == batch COUNT(DISTINCT) per
        # type (arrival-order-free: only surviving-key counts are
        # reported, never the kept row).
        "streaming_dedup_ingest": """
            WITH k AS (
              SELECT user_id, event_type,
                     date_diff('day', DATE '1970-01-01', ts::DATE) AS day
              FROM events
            ),
            uniq AS (
              SELECT event_type, count(*) AS n_unique
              FROM (SELECT DISTINCT user_id, event_type, day FROM k)
              GROUP BY 1
            ),
            raw AS (
              SELECT event_type, count(*) AS n_raw FROM events GROUP BY 1
            )
            SELECT r.event_type, r.n_raw, u.n_unique,
                   round(1 - u.n_unique / r.n_raw::DOUBLE, 6) AS dup_share
            FROM raw r JOIN uniq u USING (event_type)
        """,
        "streaming_funnel_pairs": """
            SELECT v.user_id,
                   v.event_id AS view_id,
                   p.event_id AS purchase_id,
                   epoch_us(p.ts) - epoch_us(v.ts) AS gap_us,
                   round(p.value, 2) AS purchase_value
            FROM events v
            JOIN events p
              ON v.user_id = p.user_id
             AND v.event_type = 'view'
             AND p.event_type = 'purchase'
             AND p.ts >= v.ts
             AND epoch_us(p.ts) - epoch_us(v.ts) <= 1800000000
        """,
        "compaction_roundtrip": """
            -- expected merge-on-read state derived directly from
            -- documents: upserts are doc_id % 7 = 0 (minus tombstone
            -- overlap), tombstones doc_id % 13 = 0 drop out
            WITH merged AS (
              SELECT doc_id, source,
                     CASE WHEN doc_id % 7 = 0 AND doc_id % 13 <> 0
                          THEN text || ' [revised]' ELSE text END AS text,
                     CASE WHEN doc_id % 7 = 0 AND doc_id % 13 <> 0
                          THEN 1 ELSE 0 END AS version
              FROM documents WHERE doc_id % 13 <> 0
            )
            SELECT source,
                   count(*) AS n_docs,
                   CAST(sum(version) AS BIGINT) AS n_updated,
                   CAST(sum(length(text)) AS BIGINT) AS n_chars
            FROM merged GROUP BY source
        """,
        "quantile_sketch_quality": _QSK_ORACLE,
        "kmeans_iterate": _kmeans_iter_sql(),
        "ann_lsh": _ann_lsh_sql(),
        "ann_ivf": _ann_ivf_sql(),
        # rate-derived window geometry replayed from the WAV hex (r12:
        # audio_energy consumes parse_wav_header; see _audio_energy_sql)
        "audio_energy": _audio_energy_sql(),
        "pagerank_nations": _pagerank_sql(),
        "fuzzy_blocked_join": """
            -- composite canopy block: (first token, length band of 4),
            -- mirroring operators/dedup.py fuzzy_blocked_join
            WITH names AS (SELECT DISTINCT p_name AS name FROM part)
            SELECT a.name AS name_a, b.name AS name_b,
                   CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
            FROM names a JOIN names b
              ON string_split(a.name, ' ')[1] = string_split(b.name, ' ')[1]
             AND length(a.name) // 4 = length(b.name) // 4
             AND a.name < b.name
            WHERE levenshtein(a.name, b.name) <= 3
        """,
        "embedding_stats": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT vec_id, CAST(len(v) AS BIGINT) AS dim,
                   round(sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS l2_norm,
                   round(list_sum(v) / len(v), 6) AS mean_component
            FROM e
        """,
        "stats_aggregates": """
            SELECT l_returnflag,
                   round(stddev_samp(l_quantity), 6) AS sd_qty,
                   round(var_samp(l_quantity), 6) AS var_qty,
                   round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
                   round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        "not_in_null_aware": """
            SELECT c_custkey, c_nationkey FROM customer
            WHERE c_nationkey NOT IN (
              SELECT s_nationkey FROM supplier WHERE s_acctbal < 0
            )
        """,
        "argmax_order": """
            SELECT o_custkey,
                   max(struct_pack(p := o_totalprice, k := o_orderkey)).k
                     AS best_orderkey,
                   round(max(struct_pack(p := o_totalprice, k := o_orderkey)).p, 2)
                     AS best_price
            FROM orders GROUP BY o_custkey
        """,
        "salted_join": """
            SELECT c_nationkey, count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events JOIN customer ON user_id = c_custkey
            GROUP BY c_nationkey
        """,
        # one SQL text, two engines: the oracle IS the implementation
        "sql_segment_spend": sqlapi.ANSI_SEGMENT_SPEND,
        "nested_roundtrip": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        """,
        "tpch_q2": f"""
            WITH {_SQL_PS},
            cost AS (
              SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
              FROM ps
              JOIN supplier ON ps_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE'
                AND ps_partkey IN (
                  SELECT p_partkey FROM part
                  WHERE p_size = 15 AND p_type = 'SMALL'
                )
            )
            SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
                   ps_supplycost
            FROM cost c
            WHERE ps_supplycost = (
              SELECT min(ps_supplycost) FROM cost c2
              WHERE c2.ps_partkey = c.ps_partkey
            )
        """,
        "tpch_q11": f"""
            WITH {_SQL_PS},
            v AS (
              SELECT ps_partkey, round(sum(ps_supplycost * ps_availqty), 4) AS val
              FROM ps
              JOIN supplier ON ps_suppkey = s_suppkey
              WHERE s_nationkey = 5
              GROUP BY ps_partkey
            )
            SELECT ps_partkey, round(val, 2) AS val
            FROM v WHERE val > (SELECT sum(val) * 0.001 FROM v)
        """,
        "tpch_q20": f"""
            WITH {_SQL_PS},
            q96 AS (
              SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty96
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
              GROUP BY 1, 2
            )
            SELECT s_suppkey, s_name FROM supplier
            WHERE s_nationkey = 2 AND s_suppkey IN (
              SELECT ps_suppkey FROM ps
              JOIN q96 ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
              WHERE ps_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE '%red%'
              ) AND ps_availqty > 0.5 * qty96
            )
        """,
        "bag_except": """
            WITH r AS (
              SELECT o_custkey FROM orders
              EXCEPT ALL
              SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            )
            SELECT o_custkey, count(*) AS cnt FROM r GROUP BY o_custkey
        """,
        "date_funcs": """
            SELECT o_orderkey,
                   epoch_us(date_trunc('month', o_orderdate)) AS month_us,
                   epoch_us(last_day(o_orderdate)::TIMESTAMP) AS eom_us,
                   isodow(o_orderdate) AS isodow,
                   epoch_us(o_orderdate + INTERVAL 30 DAY) AS plus30_us
            FROM orders
        """,
        "window_frames": """
            SELECT o_custkey, o_orderkey,
                   round(avg(o_totalprice) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                   ), 6) AS sliding_avg3,
                   cume_dist() OVER w AS cd,
                   nth_value(o_orderkey, 3) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS third_orderkey
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        "join_full_outer": """
            WITH rich AS (SELECT * FROM customer WHERE c_acctbal > 2000),
            oa AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
            SELECT coalesce(c_custkey, o_custkey) AS custkey,
                   CAST(c_custkey IS NOT NULL AS BIGINT) AS has_customer,
                   coalesce(n_orders, 0) AS n_orders,
                   coalesce(round(c_acctbal, 2), -1.0) AS acctbal
            FROM rich FULL JOIN oa ON c_custkey = o_custkey
        """,
        "cross_join_grid": """
            WITH prios AS (SELECT DISTINCT o_orderpriority FROM orders),
            counts AS (SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1)
            SELECT p.o_orderpriority, r_name, coalesce(n, 0) AS n
            FROM prios p CROSS JOIN region
            LEFT JOIN counts c ON p.o_orderpriority = c.o_orderpriority
        """,
        "tpch_q18": """
            SELECT c_custkey, c_name, o_orderkey AS orderkey,
                   round(o_totalprice, 2) AS totalprice,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE l_orderkey IN (
                SELECT l_orderkey FROM lineitem
                GROUP BY l_orderkey HAVING sum(l_quantity) > 260
            )
            GROUP BY c_custkey, c_name, o_orderkey, round(o_totalprice, 2)
        """,
        "keep_best_dedup": f"""
            WITH kd AS (
              SELECT doc_id, n_chars, concat_ws(' ', t[1], t[2]) AS ck
              FROM (SELECT doc_id, n_chars,
                           list_filter(string_split_regex(text, {_D}),
                                       x -> length(x) > 0) AS t
                    FROM documents)
            )
            SELECT ck,
                   CAST(-(max(struct_pack(nc := n_chars, nid := -doc_id)).nid)
                        AS BIGINT) AS doc_id,
                   max(struct_pack(nc := n_chars, nid := -doc_id)).nc AS n_chars,
                   count(*) AS cluster_size
            FROM kd GROUP BY ck
        """,
        "decontamination": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, len(t) - 3),
                         i -> array_to_string(t[i:i+4], ' '))) AS gs
              FROM toks
            ),
            flat AS (SELECT doc_id, unnest(gs) AS g FROM grams),
            bench AS (SELECT DISTINCT g FROM flat WHERE doc_id % 20 = 0),
            hits AS (
              SELECT f.doc_id, count(*) AS n_hit
              FROM flat f JOIN bench b USING (g)
              WHERE f.doc_id % 20 <> 0 GROUP BY f.doc_id
            )
            SELECT g.doc_id, len(g.gs) AS n_doc_ngrams,
                   CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit_ngrams,
                   CAST(coalesce(h.n_hit, 0) > 0 AS BIGINT) AS contaminated
            FROM grams g LEFT JOIN hits h ON g.doc_id = h.doc_id
            WHERE g.doc_id % 20 <> 0
        """,
        "data_mixture": f"""
            WITH d AS (
              SELECT source, lang,
                     len(list_filter(string_split_regex(text, {_D}),
                                     x -> length(x) > 0)) AS nt
              FROM documents
            )
            SELECT source, lang, count(*) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens,
                   round(sum(nt)::DOUBLE / (sum(sum(nt)) OVER ())::DOUBLE, 6)
                     AS token_share
            FROM d GROUP BY source, lang
        """,
        "mixture_weights": f"""
            WITH d AS (
              SELECT source, lang,
                     len(list_filter(string_split_regex(text, {_D}),
                                     x -> length(x) > 0)) AS nt
              FROM documents
            ),
            agg AS (
              SELECT source, lang, count(*) AS n_docs,
                     CAST(sum(nt) AS BIGINT) AS n_tokens
              FROM d GROUP BY source, lang
            )
            SELECT source, lang, n_docs, n_tokens,
                   round(pow(n_tokens::DOUBLE, {pl.TEMPERATURE!r})
                         / (sum(pow(n_tokens::DOUBLE, {pl.TEMPERATURE!r})) OVER ()),
                         6) AS weight
            FROM agg
        """,
        "unigram_logprob_score": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            ex AS (SELECT doc_id, unnest(t) AS w FROM toks),
            freq AS (SELECT w, count(*) AS c FROM ex GROUP BY w),
            tot AS (SELECT count(*)::DOUBLE AS n FROM ex)
            SELECT doc_id, count(*) AS n_tokens,
                   round(avg(-ln(c::DOUBLE / (SELECT n FROM tot))), 6)
                     AS avg_neglogprob
            FROM ex JOIN freq USING (w)
            GROUP BY doc_id
        """,
        "dsir_weights": f"""
            WITH toks AS (
              SELECT doc_id, source,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            ex AS (SELECT doc_id, source, unnest(t) AS w FROM toks),
            freq AS (
              SELECT w, count(*) AS c_raw,
                     count(*) FILTER (
                       source = '{pl.DSIR_TARGET_SOURCE}') AS c_tgt
              FROM ex GROUP BY w
            ),
            tot AS (SELECT sum(c_raw)::DOUBLE AS n_raw,
                           sum(c_tgt)::DOUBLE AS n_tgt,
                           count(*)::DOUBLE AS v
                    FROM freq)
            SELECT doc_id, count(*) AS n_tokens,
                   round(sum(ln(
                     ((c_tgt + 1)::DOUBLE / (n_tgt + v))
                     / ((c_raw + 1)::DOUBLE / (n_raw + v)))), 6)
                     AS log_weight
            FROM ex JOIN freq USING (w), tot
            GROUP BY doc_id
        """,
        "curation_pipeline": f"""
            {_curation_final_sql(sw)}
            SELECT source, count(*) AS n_docs_kept,
                   CAST(sum(nt) AS BIGINT) AS n_tokens_kept
            FROM final GROUP BY source
        """,
        "shard_manifest": f"""
            {_curation_final_sql(sw)},
            packed AS (
              SELECT source, doc_id, nt,
                     CAST(coalesce(sum(nt) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) // {pl.PACK_LEN} AS pack_id
              FROM final
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens,
                   count(DISTINCT pack_id) AS n_packs
            FROM packed GROUP BY source
        """,
        "orc_roundtrip": f"""
            {_curation_final_sql(sw)},
            packed AS (
              SELECT source, doc_id, nt,
                     CAST(coalesce(sum(nt) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) // {pl.PACK_LEN} AS pack_id
              FROM final
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens,
                   count(DISTINCT pack_id) AS n_packs,
                   min(doc_id) AS first_doc, max(doc_id) AS last_doc
            FROM packed GROUP BY source
        """,
        # jsonl_roundtrip: lossless by contract, so the oracle is the
        # SAME manifest recomputation as orc_roundtrip (the format
        # never appears in the answer — the word_count_mr pairing)
        "jsonl_roundtrip": f"""
            {_curation_final_sql(sw)},
            packed AS (
              SELECT source, doc_id, nt,
                     CAST(coalesce(sum(nt) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) // {pl.PACK_LEN} AS pack_id
              FROM final
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens,
                   count(DISTINCT pack_id) AS n_packs,
                   min(doc_id) AS first_doc, max(doc_id) AS last_doc
            FROM packed GROUP BY source
        """,
        "repetition_filter": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(t)),
                         i -> t[i] || ' ' || t[i+1])) AS bg
              FROM toks
            ),
            f AS (SELECT doc_id, bg, count(*) AS c FROM g GROUP BY doc_id, bg),
            m AS (
              SELECT doc_id, max(c) AS mx, CAST(sum(c) AS BIGINT) AS tot,
                     count(*) AS n_distinct
              FROM f GROUP BY doc_id
            )
            SELECT doc_id, tot AS n_bigrams,
                   round(mx::DOUBLE / tot::DOUBLE, 6) AS top_bigram_frac,
                   round(1.0 - n_distinct::DOUBLE / tot::DOUBLE, 6)
                     AS dup_bigram_frac,
                   CAST(mx::DOUBLE / tot::DOUBLE > 0.10 AS BIGINT) AS flagged
            FROM m
        """,
        "pack_sequences": f"""
            WITH d AS (
              SELECT source, doc_id,
                     len(list_filter(string_split_regex(text, {_D}),
                                     x -> length(x) > 0)) AS n_tokens
              FROM documents
            ),
            c AS (
              SELECT source, doc_id, n_tokens,
                     CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS cum_excl
              FROM d
            )
            SELECT source, doc_id, n_tokens,
                   cum_excl // 2048 AS pack_id,
                   cum_excl % 2048 AS pack_offset
            FROM c
        """,
        "split_assign": f"""
            WITH d AS (
              SELECT CASE WHEN substr(md5(doc_id::VARCHAR), 1, 1) < 'c'
                            THEN 'train'
                          WHEN substr(md5(doc_id::VARCHAR), 1, 1) < 'e'
                            THEN 'val'
                          ELSE 'test' END AS split,
                     len(list_filter(string_split_regex(text, {_D}),
                                     x -> length(x) > 0)) AS nt
              FROM documents
            )
            SELECT split, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
            FROM d GROUP BY split
        """,
        "source_overlap": f"""
            {_SQL_TOKS},
            sh AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT da, db, i::DOUBLE / (ca.n + cb.n - i) AS j
              FROM inter
              JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
              WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5
            )
            SELECT least(x.source, y.source) AS source_a,
                   greatest(x.source, y.source) AS source_b,
                   count(*) AS n_pairs, round(avg(j), 6) AS avg_jaccard
            FROM pairs
            JOIN documents x ON da = x.doc_id
            JOIN documents y ON db = y.doc_id
            GROUP BY 1, 2
        """,
        "incremental_dedup": f"""
            {_SQL_TOKS},
            sh AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS bd, b.doc_id AS cd, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle
              WHERE a.doc_id % {dd.BATCH_MOD} >= {dd.BATCH_THRESHOLD}
                AND b.doc_id % {dd.BATCH_MOD} < {dd.BATCH_THRESHOLD}
              GROUP BY 1, 2
            ),
            near AS (
              SELECT DISTINCT bd FROM inter
              JOIN cnt ca ON bd = ca.doc_id JOIN cnt cb ON cd = cb.doc_id
              WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5
            ),
            sp AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(t) - {dd.SPAN_WIDTH - 2}, {dd.SPAN_STRIDE}),
                       i -> md5(array_to_string(t[i : i + {dd.SPAN_WIDTH - 1}], ' '))
                     )) AS hs
              FROM toks WHERE len(t) >= {dd.SPAN_WIDTH}
            ),
            ex AS (SELECT doc_id, unnest(hs) AS h FROM sp),
            spand AS (
              SELECT DISTINCT a.doc_id FROM ex a
              WHERE a.doc_id % {dd.BATCH_MOD} >= {dd.BATCH_THRESHOLD}
                AND EXISTS (
                  SELECT 1 FROM ex b
                  WHERE b.h = a.h
                    AND b.doc_id % {dd.BATCH_MOD} < {dd.BATCH_THRESHOLD}
                )
            )
            SELECT d.doc_id,
                   (d.doc_id IN (SELECT bd FROM near))::INT AS near_dup,
                   (d.doc_id IN (SELECT doc_id FROM spand))::INT AS span_dup
            FROM documents d
            WHERE d.doc_id % {dd.BATCH_MOD} >= {dd.BATCH_THRESHOLD}
        """,
        "word_pmi": f"""
            {_SQL_TOKS},
            pos AS (
              SELECT doc_id, i, t[i] AS w
              FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
            ),
            ev AS (
              SELECT least(a.w, b.w) AS wa, greatest(a.w, b.w) AS wb
              FROM pos a JOIN pos b
                ON a.doc_id = b.doc_id
               AND b.i > a.i AND b.i <= a.i + {ta.COOC_WINDOW}
            ),
            pc AS (
              SELECT wa, wb, count(*) AS n_cooc FROM ev GROUP BY 1, 2
              HAVING count(*) >= {ta.PMI_MIN_COUNT}
            ),
            uni AS (SELECT w, count(*) AS c FROM pos GROUP BY w),
            tot AS (
              SELECT (SELECT count(*) FROM ev)::DOUBLE AS P,
                     (SELECT count(*) FROM pos)::DOUBLE AS T
            )
            SELECT wa AS word_a, wb AS word_b, n_cooc,
                   round(ln((n_cooc::DOUBLE / P)
                            / ((ua.c::DOUBLE / T) * (ub.c::DOUBLE / T))), 6)
                     AS pmi
            FROM pc JOIN uni ua ON wa = ua.w JOIN uni ub ON wb = ub.w, tot
        """,
        "event_transitions": """
            WITH ev AS (
              SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
              FROM events
            ),
            steps AS (
              SELECT event_type AS from_type,
                     lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                     ) AS to_type
              FROM ev
            ),
            mat AS (
              SELECT from_type, to_type, count(*) AS n
              FROM steps WHERE to_type IS NOT NULL GROUP BY 1, 2
            )
            SELECT from_type, to_type, n,
                   n::DOUBLE / (sum(n) OVER (PARTITION BY from_type))::DOUBLE
                     AS prob
            FROM mat
        """,
        "trade_flows_2hop": """
            WITH edges AS (
              SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY 1, 2
            )
            SELECT a.src AS src, b.dst AS dst,
                   CAST(sum(a.w * b.w) AS BIGINT) AS flow2
            FROM edges a JOIN edges b ON a.dst = b.src
            GROUP BY 1, 2
        """,
        "grep_mr": """
            SELECT doc_id, text FROM documents WHERE regexp_matches(text, 'fast join')
        """,
        # the collecting-reduce parity query shares inverted_index's oracle
        "inverted_index_mr": f"""
            {_SQL_PAIRS}
            SELECT word,
                   array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids,
                   count(DISTINCT doc_id) AS n_docs
            FROM pairs GROUP BY word
        """,
        "contamination_report": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, len(t) - 3),
                         i -> array_to_string(t[i:i+4], ' '))) AS gs
              FROM toks
            ),
            bex AS (
              SELECT doc_id AS bench_id, unnest(gs) AS g FROM grams
              WHERE doc_id % {pl.BENCH_MOD} = 0
            ),
            tex AS (
              SELECT doc_id AS train_id, unnest(gs) AS g FROM grams
              WHERE doc_id % {pl.BENCH_MOD} <> 0
            ),
            h AS (
              SELECT bench_id,
                     count(DISTINCT train_id) AS n_leaking_docs,
                     count(DISTINCT g) AS n_compromised_ngrams
              FROM bex JOIN tex USING (g) GROUP BY bench_id
            )
            SELECT g.doc_id AS bench_id, CAST(len(g.gs) AS BIGINT) AS n_ngrams,
                   CAST(coalesce(h.n_leaking_docs, 0) AS BIGINT)
                     AS n_leaking_docs,
                   CAST(coalesce(h.n_compromised_ngrams, 0) AS BIGINT)
                     AS n_compromised_ngrams
            FROM grams g LEFT JOIN h ON g.doc_id = h.bench_id
            WHERE g.doc_id % {pl.BENCH_MOD} = 0
        """,
        "streaming_active_users": """
            WITH a AS (
              SELECT DISTINCT date_trunc('hour', ts) AS h, user_id
              FROM events
            )
            SELECT epoch_us(h) AS hour_us, count(*) AS n_users
            FROM a GROUP BY 1
        """,
        "zipf_slope": f"""
            {_SQL_PAIRS},
            freq AS (SELECT word AS w, count(*) AS c FROM pairs GROUP BY word),
            ranked AS (
              SELECT w, c, row_number() OVER (ORDER BY c DESC, w ASC) AS rnk
              FROM freq
            )
            SELECT count(*) AS n_vocab,
                   round(regr_slope(ln(c::DOUBLE), ln(rnk::DOUBLE)), 6) AS slope,
                   round(regr_intercept(ln(c::DOUBLE), ln(rnk::DOUBLE)), 6)
                     AS intercept,
                   round(regr_r2(ln(c::DOUBLE), ln(rnk::DOUBLE)), 6) AS r2
            FROM ranked
        """,
        "bigram_logprob_score": f"""
            {_SQL_TOKS},
            t2 AS (SELECT doc_id, t FROM toks WHERE len(t) >= 2),
            ev AS (
              SELECT doc_id, t[i] AS p, t[i + 1] AS w
              FROM t2, unnest(range(1, len(t))) AS u(i)
            ),
            big AS (SELECT p, w, count(*) AS cb FROM ev GROUP BY 1, 2),
            ctx AS (SELECT p, CAST(sum(cb) AS BIGINT) AS cp FROM big GROUP BY 1),
            ex AS (SELECT unnest(t) AS w FROM t2),
            uni AS (SELECT w, count(*) AS cu FROM ex GROUP BY 1),
            tot AS (SELECT count(*)::DOUBLE AS n FROM ex)
            SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(-ln({pl.BIGRAM_LAMBDA!r} * (cb::DOUBLE / cp::DOUBLE)
                             + {1.0 - pl.BIGRAM_LAMBDA!r}
                               * (cu::DOUBLE / (SELECT n FROM tot)))), 6)
                     AS avg_neglogprob
            FROM ev JOIN big USING (p, w) JOIN ctx USING (p) JOIN uni USING (w)
            GROUP BY doc_id
        """,
        # session_window semantics: break on gap >= 30 min (strict
        # in-window merge), see streaming/event_stream.streaming_sessions
        "streaming_sessions": """
            WITH e AS (
              SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                  >= 1800000000
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id, value, ts_us,
                     CAST(sum(brk) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS BIGINT) AS sid
              FROM e
            )
            SELECT user_id, min(ts_us) AS session_start_us,
                   count(*) AS n_events,
                   round(sum(value), 2) AS session_value
            FROM s GROUP BY user_id, sid
        """,
        "streaming_enriched_revenue": """
            SELECT c_nationkey, count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events JOIN customer ON user_id = c_custkey
            GROUP BY c_nationkey
        """,
        "weighted_sample": f"""
            {_SQL_TOKS},
            t2 AS (
              SELECT doc_id, source,
                     greatest(len(t), 1)::DOUBLE AS w
              FROM toks JOIN documents USING (doc_id)
            ),
            k AS (
              SELECT source, doc_id,
                     pow((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                          + 1.0) / 4294967296.0, 1.0 / w) AS ky
              FROM t2
            )
            SELECT source, doc_id, rank FROM (
              SELECT source, doc_id,
                     row_number() OVER (
                       PARTITION BY source ORDER BY ky DESC, doc_id ASC
                     ) AS rank
              FROM k
            ) WHERE rank <= {pl.WEIGHTED_SAMPLE_K}
        """,
        "streaming_curated_ingest": f"""
            WITH toks AS (
              SELECT doc_id, source, text,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            m AS (
              SELECT doc_id, source, text, len(t) AS nt,
                     coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                       / greatest(len(t), 1) AS avg_len,
                     length(regexp_replace(text, '[^,.]', '', 'g'))::DOUBLE
                       / greatest(length(text), 1) AS punct_ratio
              FROM toks
            ),
            kept AS (
              SELECT doc_id, nt,
                     md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
              FROM m
              WHERE round(least(1.0, nt / 100.0) * 0.5
                          + (1.0 - punct_ratio) * 0.3
                          + least(1.0, avg_len / 8.0) * 0.2, 6) >= 0.5
            ),
            g AS (
              SELECT fp, min(doc_id) AS keep_id, count(*) AS dup_cnt
              FROM kept GROUP BY fp
            )
            SELECT d.source,
                   count(*) AS n_admitted,
                   CAST(sum(g.dup_cnt) AS BIGINT) AS n_arrived,
                   CAST(sum(k.nt) AS BIGINT) AS n_tokens_admitted
            FROM g
            JOIN documents d ON g.keep_id = d.doc_id
            JOIN kept k ON g.keep_id = k.doc_id
            GROUP BY d.source
        """,
        # source_signature: the lift is pure IEEE rational arithmetic
        # (no log), so both engines rank bit-identical doubles; ties
        # and the K boundary break on the token string.
        "source_signature": f"""
            WITH tok AS (
              SELECT source, unnest(list_filter(string_split_regex(text, {_D}),
                                    x -> length(x) > 0)) AS w
              FROM documents
            ),
            sw AS (SELECT source, w, count(*) AS c_sw FROM tok GROUP BY 1, 2),
            cw AS (SELECT w, sum(c_sw) AS c_w FROM sw GROUP BY 1),
            stot AS (SELECT source, sum(c_sw) AS n_s FROM sw GROUP BY 1),
            ctot AS (SELECT sum(c_w)::DOUBLE AS n_c FROM cw),
            scored AS (
              SELECT source, w, c_sw,
                     (c_sw / n_s) / ((c_w - c_sw + 1) / (n_c - n_s + 1)) AS lift
              FROM sw JOIN cw USING (w) JOIN stot USING (source), ctot
              WHERE c_sw >= {pl.SIGNATURE_MIN_SUPPORT}
            )
            SELECT source, CAST(rank AS BIGINT) AS rank, w AS token,
                   CAST(c_sw AS BIGINT) AS n_in_source,
                   round(lift, 6) AS lift
            FROM (
              SELECT *, row_number() OVER (PARTITION BY source
                                           ORDER BY lift DESC, w) AS rank
              FROM scored
            ) WHERE rank <= {pl.SIGNATURE_K}
        """,
        # kl_source_divergence: p·ln(p/q) summed per source over the
        # vocabulary — cross-engine float-sum order differs, round(6)
        # absorbs the ~1e-15 drift (the repo-wide convention).
        "kl_source_divergence": f"""
            WITH tok AS (
              SELECT source, unnest(list_filter(string_split_regex(text, {_D}),
                                    x -> length(x) > 0)) AS w
              FROM documents
            ),
            sw AS (SELECT source, w, count(*) AS c_sw FROM tok GROUP BY 1, 2),
            cw AS (SELECT w, sum(c_sw) AS c_w FROM sw GROUP BY 1),
            stot AS (SELECT source, sum(c_sw) AS n_s FROM sw GROUP BY 1),
            ctot AS (SELECT sum(c_w)::DOUBLE AS n_c FROM cw)
            SELECT sw.source,
                   CAST(max(n_s) AS BIGINT) AS n_tokens,
                   count(*) AS vocab,
                   round(sum((c_sw / n_s) * ln((c_sw / n_s) / (c_w / n_c))), 6)
                     AS kl_vs_corpus
            FROM sw
            JOIN cw USING (w)
            JOIN stot USING (source), ctot
            GROUP BY sw.source
        """,
        "lang_entropy": """
            WITH cell AS (
              SELECT source, lang, count(*) AS n
              FROM documents GROUP BY source, lang
            ),
            probs AS (
              SELECT source, lang, n,
                     n::DOUBLE / (sum(n) OVER (PARTITION BY source))::DOUBLE
                       AS p
              FROM cell
            )
            SELECT source,
                   count(*) AS n_langs,
                   CAST(sum(n) AS BIGINT) AS n_docs,
                   round(-sum(p * ln(p)), 6) AS entropy,
                   round(exp(-sum(p * ln(p))), 6) AS effective_langs,
                   max(struct_pack(n := n, lang := lang)).lang
                     AS majority_lang
            FROM probs GROUP BY source
        """,
        "embedding_outliers": """
            WITH e AS (
              SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
            ),
            ex AS (
              SELECT label, i AS pos, v[i] AS x
              FROM e, unnest(range(1, len(v) + 1)) AS u(i)
            ),
            cent AS (SELECT label, pos, avg(x) AS c FROM ex GROUP BY 1, 2),
            cv AS (
              SELECT label, list(c ORDER BY pos) AS cvec FROM cent GROUP BY label
            )
            SELECT vec_id, label,
                   round(list_cosine_similarity(v, cvec), 6) AS cos_centroid
            FROM e JOIN cv USING (label)
        """,
    }
    # cc_star: star contraction computes the SAME (doc_id, cluster_id =
    # component min) frame as dedup_clusters from the same edge
    # generation — one oracle, two driver-gated CC algorithms.
    sqls["cc_star"] = sqls["dedup_clusters"]
    # rrf_fusion composes the two ranking oracles verbatim as CTE
    # bodies (the fused result must be exactly the fusion of what the
    # driver already verifies for each list).
    sqls["rrf_fusion"] = (
        sqls["rrf_fusion"]
        .replace("{COSINE_TOPK}", sqls["cosine_topk"])
        .replace("{ANN_LSH}", sqls["ann_lsh"])
    )
    sqls["skew_profile"] = _skew_profile_sql()
    # zorder_layout: the oracle recomputes every per-file min/max
    # envelope from lineitem with the same 16-bit grid + Morton
    # interleave (bit arithmetic generated from one spec, see
    # _zvalue_sql) — the Spark side must reproduce it through a real
    # parquet write→read round trip.
    sqls["zorder_layout"] = f"""
        WITH li AS (
          SELECT date_diff('day', TIMESTAMP '1970-01-01', l_shipdate)::BIGINT AS ship_day,
                 l_partkey::BIGINT AS partkey
          FROM lineitem
        ),
        mm AS (
          SELECT min(ship_day) AS d_lo, max(ship_day) AS d_hi,
                 min(partkey) AS p_lo, max(partkey) AS p_hi
          FROM li
        ),
        sc AS (
          SELECT ship_day, partkey,
                 (ship_day - d_lo) * {1 << adv.Z_BITS} // (d_hi - d_lo + 1) AS dx,
                 (partkey - p_lo) * {1 << adv.Z_BITS} // (p_hi - p_lo + 1) AS dy
          FROM li, mm
        ),
        zc AS (
          SELECT ship_day, partkey,
                 ({_zvalue_sql("dx", "dy")}) >> {2 * adv.Z_BITS - adv.Z_FILES_LOG2} AS zb
          FROM sc
        )
        SELECT zb, count(*) AS n_rows,
               min(ship_day) AS min_day, max(ship_day) AS max_day,
               min(partkey) AS min_part, max(partkey) AS max_part
        FROM zc GROUP BY zb
    """
    # Composed post-dict (needs the cosine_topk text + _ann_lsh_sql()):
    # both rank lists are their already-banked oracles verbatim as
    # nested CTEs; the report is integer set algebra + one exact
    # int/int division on top.
    sqls["ann_recall_report"] = f"""
        WITH ex AS ({sqls["cosine_topk"]}),
        lsh AS ({_ann_lsh_sql()}),
        ivf AS ({_ann_ivf_sql()}),
        pq AS (SELECT qid, count(*) AS n_exact FROM ex GROUP BY 1),
        lh AS (
          SELECT ex.qid, count(*) AS n_hit
          FROM ex JOIN lsh
            ON ex.qid = lsh.qid AND ex.neighbor_id = lsh.neighbor_id
          GROUP BY 1
        ),
        ih AS (
          SELECT ex.qid, count(*) AS n_hit
          FROM ex JOIN ivf
            ON ex.qid = ivf.qid AND ex.neighbor_id = ivf.neighbor_id
          GROUP BY 1
        )
        SELECT 'lsh' AS index, pq.qid, pq.n_exact,
               coalesce(lh.n_hit, 0)::BIGINT AS n_hit,
               round(coalesce(lh.n_hit, 0)::DOUBLE / pq.n_exact, 6) AS recall
        FROM pq LEFT JOIN lh ON pq.qid = lh.qid
        UNION ALL
        SELECT 'ivf' AS index, pq.qid, pq.n_exact,
               coalesce(ih.n_hit, 0)::BIGINT AS n_hit,
               round(coalesce(ih.n_hit, 0)::DOUBLE / pq.n_exact, 6) AS recall
        FROM pq LEFT JOIN ih ON pq.qid = ih.qid
    """
    # Composed post-dict (needs the cosine_topk text): the IVF
    # nprobe↔recall curve (r15, VERDICT r14 #4) — the exact leg is the
    # banked cosine_topk oracle verbatim, the sweep leg the unrolled
    # Lloyd chain with a level join; the report is integer set algebra
    # + one exact int/int division, zero-filled over the (nprobe x
    # qid-with-exact-neighbors) grid.
    _lv = ", ".join(str(p) for p in sim.ANN_PROBE_SET)
    sqls["ann_probe_sweep"] = f"""
        WITH ex AS ({sqls["cosine_topk"]}),
        sw AS ({_ann_probe_sweep_core_sql()}),
        pq AS (SELECT qid, count(*) AS n_exact FROM ex GROUP BY 1),
        hh AS (
          SELECT sw.nprobe, sw.qid, count(*) AS n_hit
          FROM sw JOIN ex
            ON sw.qid = ex.qid AND sw.neighbor_id = ex.neighbor_id
          GROUP BY 1, 2
        ),
        lvls AS (SELECT unnest([{_lv}]) AS nprobe)
        SELECT lvls.nprobe::BIGINT AS nprobe, pq.qid,
               pq.n_exact::BIGINT AS n_exact,
               coalesce(hh.n_hit, 0)::BIGINT AS n_hit,
               round(coalesce(hh.n_hit, 0)::DOUBLE / pq.n_exact, 6)
                 AS recall
        FROM pq CROSS JOIN lvls
        LEFT JOIN hh ON hh.nprobe = lvls.nprobe AND hh.qid = pq.qid
    """
    # Composed post-dict: the r15 raw-vs-residual IVF-PQ audit — both
    # rank lists are their banked oracles verbatim as nested CTEs, the
    # exact leg is a self-contained brute-force L2 top-K, and the
    # report is integer set algebra + one exact int/int division.
    sqls["ivf_pq_recall_report"] = f"""
        WITH em AS (SELECT vec_id, embedding::DOUBLE[] AS v
                    FROM embeddings),
        qq AS (SELECT vec_id AS qid, v AS qv FROM em
               WHERE vec_id < {sim.N_QUERIES}),
        ex AS (
          SELECT qid, neighbor_id FROM (
            SELECT qq.qid, em.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY qq.qid ORDER BY
                     list_reduce([0.0] || list_transform(
                         range(1, {sim.EMBED_DIM} + 1),
                         j -> (em.v[j] - qq.qv[j]) * (em.v[j] - qq.qv[j])),
                       (acc, x) -> acc + x), em.vec_id) AS rn
            FROM em, qq WHERE em.vec_id <> qq.qid
          ) WHERE rn <= {sim.TOPK}
        ),
        raw AS ({_ann_ivf_adc_sql()}),
        resid AS ({_ivf_pq_adc_sql()}),
        got AS (
          SELECT 'raw' AS variant, qid, neighbor_id FROM raw
          UNION ALL
          SELECT 'residual' AS variant, qid, neighbor_id FROM resid
        ),
        nx AS (SELECT qid, count(*) AS n_exact FROM ex GROUP BY qid),
        h AS (
          SELECT g.variant, g.qid, count(*) AS hits
          FROM got g JOIN ex
            ON g.qid = ex.qid AND g.neighbor_id = ex.neighbor_id
          GROUP BY g.variant, g.qid
        )
        SELECT v.variant, nx.qid, nx.n_exact::BIGINT AS n_exact,
               coalesce(h.hits, 0)::BIGINT AS hits,
               round(coalesce(h.hits, 0)::DOUBLE / nx.n_exact, 6) AS recall
        FROM nx CROSS JOIN (VALUES ('raw'), ('residual')) v(variant)
        LEFT JOIN h ON h.variant = v.variant AND h.qid = nx.qid
    """
    # Composed post-dict: the r15 filtered-ANN audit — the exact leg
    # is the banked ann_filtered_topk oracle verbatim, the approx leg
    # the unrolled post-filtered IVF chain; integer set algebra + one
    # exact int/int division on top.
    sqls["filtered_ann_recall_report"] = f"""
        WITH ex AS ({sqls["ann_filtered_topk"]}),
        pf AS ({_filtered_ann_postfilter_core_sql()}),
        nx AS (SELECT qid, count(*) AS n_exact FROM ex GROUP BY qid),
        h AS (
          SELECT pf.qid, count(*) AS n_hit
          FROM pf JOIN ex
            ON pf.qid = ex.qid AND pf.neighbor_id = ex.neighbor_id
          GROUP BY pf.qid
        )
        SELECT nx.qid, nx.n_exact::BIGINT AS n_exact,
               coalesce(h.n_hit, 0)::BIGINT AS n_hit,
               round(coalesce(h.n_hit, 0)::DOUBLE / nx.n_exact, 6) AS recall
        FROM nx LEFT JOIN h ON h.qid = nx.qid
    """
    # Composed post-dict (needs the three lexical rank-list texts):
    # the ann_recall_report pattern applied to the lexical leg — all
    # three rank lists are their already-banked oracles verbatim as
    # nested CTEs; the report is integer set algebra + one exact
    # int/int division on top.
    sqls["bm25_recall_report"] = f"""
        WITH ex AS ({sqls["bm25_topk"]}),
        pr AS ({sqls["bm25_pruned_topk"]}),
        rf AS ({sqls["lexical_semantic_rrf"]}),
        pq AS (SELECT qid, count(*) AS n_exact FROM ex GROUP BY 1),
        ph AS (
          SELECT ex.qid, count(*) AS n_hit
          FROM ex JOIN pr ON ex.qid = pr.qid AND ex.doc_id = pr.doc_id
          GROUP BY 1
        ),
        rh AS (
          SELECT ex.qid, count(*) AS n_hit
          FROM ex JOIN rf ON ex.qid = rf.qid AND ex.doc_id = rf.doc_id
          GROUP BY 1
        )
        SELECT 'pruned' AS index, pq.qid, pq.n_exact,
               coalesce(ph.n_hit, 0)::BIGINT AS n_hit,
               round(coalesce(ph.n_hit, 0)::DOUBLE / pq.n_exact, 6) AS recall
        FROM pq LEFT JOIN ph ON pq.qid = ph.qid
        UNION ALL
        SELECT 'rrf' AS index, pq.qid, pq.n_exact,
               coalesce(rh.n_hit, 0)::BIGINT AS n_hit,
               round(coalesce(rh.n_hit, 0)::DOUBLE / pq.n_exact, 6) AS recall
        FROM pq LEFT JOIN rh ON pq.qid = rh.qid
    """
    return sqls

