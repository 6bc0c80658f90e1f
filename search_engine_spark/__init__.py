"""search_engine_spark — a PySpark-native full-text (inverted index + BM25) engine.

Built from scratch against the semantics of the reference repo
``avadheshy/search-engine`` (see SURVEY.md), which delegates its search core to
MongoDB Atlas Search / Lucene.  Here the whole core — posting-list construction,
delta+varint compression, salted merge with head-term skew splitting, BM25
top-k with block-max pruning — is implemented on pyspark.sql DataFrames with
vectorized Arrow/pandas UDFs.  No RDDs, no per-row Python in hot paths.

Layout
------
- ``analysis``   — pinned tokenizer / HTML text extraction / query preprocessing
- ``index``      — varint codec, posting-segment builder, manifest (resume)
- ``query``      — query planner + BM25 executor (sort-limit and block-max WAND)
- ``operators``  — relational parity ops (SURVEY.md §2.B) + training-data ops
                   (dedup, similarity search, text stats, multimodal plumbing)
- ``fixtures``   — deterministic webtext corpus + query-set generators
- ``oracle``     — pure-Python reference model (rank-identity ground truth)
"""

__version__ = "0.1.0"
