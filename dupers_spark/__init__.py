"""dupers_spark — a from-scratch PySpark-native near-duplicate detection,
clustering, and search engine.

Reimplements the query semantics of bengarrett/dupers (exact-hash duplicate
buckets, fuzzy near-dup matching, substring search, incremental index
maintenance — see SURVEY.md) as distributed DataFrame pipelines over a table
of image+caption pairs, plus the large-scale training-data-pipeline
operators (MinHash/SimHash dedup, ANN similarity search, text analysis).

Design rules (enforced by tests):
  * DataFrame / Spark SQL first; Catalyst picks the physical plan.
  * No per-row Python UDFs — pandas/Arrow UDFs only where SQL can't express
    the semantics (image decode, numpy suffix sort).
  * Every hash expression is overflow-safe under ANSI mode (Spark 4 default).
"""

__version__ = "0.1.0"
