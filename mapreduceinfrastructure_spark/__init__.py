"""PySpark-native analytics engine with the query/data-processing
capabilities of hemangdash/MapReduceInfrastructure.

The reference (C++14/gRPC MapReduce framework, /root/reference) exposes a
map/emit + reduce/emit programming model over newline-delimited text
(external/include/mr_task_factory.h:20,37).  This engine re-expresses that
capability surface — and the OSDI'04 query-pattern catalog MapReduce was
designed for — as idiomatic Spark DataFrame/SQL plans, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) the north star demands.

Layout:
    session       SparkSession factory tuned for the target scale
    config        JobSpec — the reference's config.ini knobs → Spark conf
    sources       table / text readers
    operators     query patterns (relational, text, dedup, similarity, mapreduce)
    functions     reusable column expression builders (tokenizer, vector math)
    sinks         reference-faithful ``key value\\n`` partitioned text sink
    streaming     Structured Streaming variants (sessionization, windows)
"""

__version__ = "0.1.0"
