"""Large-scale training-data-pipeline operators.

Green-field extensions beyond the reference's query surface (the
reference has none of these — SURVEY.md §2.7): deduplication, similarity
search, text analysis, multimodal column plumbing. All built Spark-first:
JVM-side expressions wherever possible, Arrow-batched Pandas UDFs only
where semantics require imperative code (multimodal decode).

Cross-engine determinism: every hash used here is derived from md5
(``conv(substr(md5(x),1,8),16,10)``), reproducible in DuckDB as
``('0x'||substr(md5(x),1,8))::BIGINT`` so the driver's oracle can verify
results value-for-value.
"""

from grasper_spark.functions import (  # noqa: F401
    bpe,
    classifier,
    dedup,
    embeddings,
    multimodal,
    packing,
    pq,
    similarity,
    sketches,
    text,
)
