"""Distributed inverted-index builder.

Re-implements, Spark-first, the index that the reference delegated to Atlas
Search / Lucene (reference search_utils.py:79-97 implies Lucene indexes on the
``name``/``barcode`` paths; here the corpus is the webtext table from
BASELINE.json's input_hint).

Pipeline (pyspark.sql DataFrames; Python appears only in the Arrow codec
kernel; no RDDs, no per-row Python):

1. **doc_id assignment** — zero-based dense rank of ``url`` in lexicographic
   order, computed distributed: ``repartitionByRange(url)`` + per-partition
   local ranks + a driver-side prefix sum over per-partition counts (the
   classic two-phase distributed dense rank; no global sort on one node).
   The (url -> doc_id) map joins back broadcast when it fits, so the text
   payload never crosses a shuffle.
2. **tokenize** — pure JVM whole-stage-codegen: lower + regex split +
   explode + hash-aggregate to (term, doc_id, tf, dl), materialized once as
   compressed columnar parquet (``tokens_tmp``: column-pruned stats re-reads,
   resume reuse, no executor-cache GC pressure).  Doc length ``dl`` rides
   along so it can be encoded inline with postings (query-time BM25 then
   needs no doc-stats join).
3. **stats pass** — corpus stats (N, avgdl), term stats (df), postings-
   weighted term-range partition boundaries, and a (term, term_id, pid)
   dimension — ALL distributed: boundary cuts come from per-partition prefix
   sums (the driver sees only the ≤ n_partitions-1 boundary terms), term ids
   from a two-phase dense rank.  Boundaries give every build partition a
   contiguous term range (-> honest ``term_lo/term_hi`` lineage + query-time
   partition pruning) and are weighted by postings count so Zipf head terms
   don't melt one reducer.  The vocabulary is never collected or broadcast
   above ``BuildConfig.dict_budget``: web-scale vocabularies shuffle-join
   ids onto tokens and join strings back onto encoded blocks.
4. **segment build** — ONE shuffle: tokens gain ``pid`` via a broadcast
   term->pid dimension join (JVM) and are bucketed on a *global doc-id grid*
   (``sseg = doc_id // range_docs``).  The grid is shared by all terms, so at
   query time per-range score upper bounds can be summed across query terms —
   that is what makes distributed block-max WAND pruning possible.  Within a
   partition the rows are sorted by (term, sseg, doc_id) and encoded by a
   ``mapInArrow`` kernel into 1024-posting blocks with delta+varint
   compression and per-block max-score metadata — dictionary-encoded terms,
   zero-copy ints, no per-group Python loop, no python string objects.
5. **manifest** — one lineage row per (partition, wave) with input split, term
   range, postings count, bytes; committed atomically after each wave so a
   killed build resumes from completed partitions (Iceberg MERGE at cluster
   scale; atomic-rename parquet here — see catalog.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis.text import extract_text_series, tokenize_series
from ..catalog import IndexCatalog
from .codec import encode_varints

K1 = 1.2
B = 0.75

# Separator between field name and term in a multi-field posting key.  U+001F
# (unit separator) is outside the analyzer's token codepoint class, so a
# prefixed key can never collide with a single-field term or another field's
# keys, and the term dictionary's lexicographic order groups each field's
# terms contiguously (field-scoped prefix scans come free).
FIELD_SEP = "\x1f"

TOKENS_SCHEMA = "term string, doc_id long, tf int, dl int"
# positional builds carry each (doc, term)'s sorted occurrence offsets
# through the token stream; the encoder folds them into a per-block varint
# blob (codec.encode_position_lists) stored as a SEPARATE segment column
TOKENS_SCHEMA_POS = TOKENS_SCHEMA + ", positions array<int>"
SEGMENT_SCHEMA = (
    "pid int, term string, sseg int, block_id int, first_doc long, last_doc long, "
    "doc_count int, max_tf_norm double, nbytes long, postings binary"
)
# distributed-dictionary mode: blocks carry the integer term_id through the
# encoder; a post-encode join on the term dimension restores the string AND
# the pid (neither ships through the token shuffle)
SEGMENT_SCHEMA_IDS = (
    "term_id long, sseg int, block_id int, first_doc long, last_doc long, "
    "doc_count int, max_tf_norm double, nbytes long, postings binary"
)
SEGMENT_SCHEMA_POS = SEGMENT_SCHEMA + ", positions binary"
SEGMENT_SCHEMA_IDS_POS = SEGMENT_SCHEMA_IDS + ", positions binary"


@dataclass
class BuildConfig:
    block_docs: int = 1024          # postings per encoded block
    target_ranges: int = 256        # doc-grid ranges (scales with corpus)
    min_range_docs: int = 8192      # lower bound on docs per grid range
    n_partitions: int = 32          # term-range build partitions (lineage grain)
    waves: int = 4                  # manifest commits per build (resume grain)
    shuffle_partitions: int | None = None
    # vocabularies up to this size use a driver-built broadcast term
    # dictionary (one toPandas of the term dim); above it the builder never
    # materializes the vocabulary anywhere: term ids come from a distributed
    # two-phase rank, tokens gain ids via a shuffle join, and the encoder
    # emits ids that a post-encode join maps back to strings.  Web-scale
    # vocabularies (10^9+ terms from typos/urls) take the distributed path.
    dict_budget: int = 2_000_000
    # "auto": JVM tokenizer unless the sampled NFC check fails; "jvm" /
    # "pandas" pin the path (pandas applies NFC — choose it for corpora
    # known to mix normalization forms beyond what sampling can see)
    tokenizer: str = "auto"
    # store per-occurrence token offsets (Lucene DOCS_AND_FREQS_AND_POSITIONS)
    # so the engine can answer phrase queries; costs ~1 varint byte per token
    # occurrence in a separate segment column that non-phrase queries never
    # read.  Off by default: the docs+freqs index is the north-rule build.
    positions: bool = False
    # multi-field index paths (the reference's Lucene fields: every $search
    # clause addresses a named path — name/barcode as should-clauses,
    # store_id/wh_id as must-clauses; reference search_utils.py:79-97,181-203,
    # app.py:472-486).  Each listed column is tokenized separately; posting
    # keys become "<field>\x1f<term>" so the whole segment/WAND machinery
    # (term cuts, doc-grid, block metadata) works unchanged, and corpus stats
    # gain per-field df/doc_count/avgdl so each clause scores BM25 against
    # ITS field's statistics.  None = the classic single-'text'-field build.
    field_cols: tuple | None = None
    # doc-values sidecar (Lucene's column-stride DocValues re-expressed as
    # parquet columns on the doc_stats table): each listed corpus column is
    # stored per doc_id so the engine can evaluate Atlas ``range`` /
    # ``equals`` filter clauses (compound.filter operators beyond text) as a
    # predicate-pushed doc_stats scan + semi-join against the candidate set.
    # Postings stay untouched — doc values are a per-doc columnar sidecar,
    # never an inverted structure.
    docvalues_cols: tuple = ()

    def __post_init__(self):
        # a typo like "panda" would otherwise silently fall through to the
        # auto-sampling path instead of honoring the (misspelled) pin
        if self.tokenizer not in ("auto", "jvm", "pandas"):
            raise ValueError(
                f"tokenizer must be 'auto', 'jvm', or 'pandas'; got {self.tokenizer!r}"
            )
        if self.field_cols is not None:
            self.field_cols = tuple(self.field_cols)
            if not self.field_cols:
                raise ValueError("field_cols must be a non-empty tuple or None")
            for f in self.field_cols:
                if FIELD_SEP in f:
                    raise ValueError(f"field name may not contain the separator: {f!r}")
            if self.tokenizer == "pandas":
                raise NotImplementedError(
                    "field_cols builds use the JVM tokenizer; NFC-normalize at "
                    "ingest (the pandas multi-field tokenizer is not implemented)"
                )
        self.docvalues_cols = tuple(self.docvalues_cols or ())
        # doc_id/url/dl/doc_id_pre live on doc_stats already; "score" would
        # collide with the engine's score column in the field-sort joins;
        # "gen" is the streaming generation partition key inside doc_stats
        reserved = {"doc_id", "url", "dl", "doc_id_pre", "score", "gen"}
        for c in self.docvalues_cols:
            if not isinstance(c, str) or not c:
                raise ValueError(f"docvalues_cols entries must be column names; got {c!r}")
            if c in reserved:
                raise ValueError(
                    f"docvalues column {c!r} collides with a reserved doc_stats column"
                )
        content = set(self.field_cols or ("text",))
        bad = content & set(self.docvalues_cols)
        if bad:
            raise ValueError(
                f"docvalues_cols overlap the indexed content columns: {sorted(bad)}"
            )


# ---------------------------------------------------------------------------
# Phase 1: doc ids
# ---------------------------------------------------------------------------

def assign_doc_ids(docs: DataFrame, n_parts: int = 32) -> DataFrame:
    """(url) -> (url, doc_id) where doc_id = dense lex rank of url.

    Two-phase distributed dense rank, pure JVM: range-partition by url, sort
    within partitions, take ``monotonically_increasing_id`` (a per-partition
    0-based counter in row order) as the local rank, then shift each
    partition by the prefix sum of earlier partition counts.  No global sort
    on one node, no Python workers.
    """
    ranked = (
        docs.select("url")
        .repartitionByRange(n_parts, "url")
        .sortWithinPartitions("url")
        .select(
            "url",
            F.spark_partition_id().alias("pid"),
            F.monotonically_increasing_id().alias("mid"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stats = ranked.groupBy("pid").agg(
        F.count("*").alias("cnt"), F.min("mid").alias("mn"), F.max("mid").alias("mx")
    ).collect()
    rows, acc = [], 0
    for r in sorted(stats, key=lambda r: r["pid"]):
        # monotonically_increasing_id is documented monotonic+unique, not
        # consecutive; its implementation is a per-partition counter, which
        # this relies on — verify before trusting the dense-rank arithmetic
        if int(r["mx"]) - int(r["mn"]) != int(r["cnt"]) - 1:
            raise AssertionError(
                f"monotonically_increasing_id not consecutive in partition "
                f"{r['pid']}: span {int(r['mx']) - int(r['mn']) + 1} != count {r['cnt']}"
            )
        rows.append((int(r["pid"]), int(acc), int(r["mn"])))
        acc += r["cnt"]
    spark = docs.sparkSession
    off_df = spark.createDataFrame(rows, "pid int, offset long, mn long")
    out = (
        ranked.join(F.broadcast(off_df), "pid")
        .select(
            "url",
            (F.col("offset") + (F.col("mid") - F.col("mn"))).alias("doc_id"),
        )
    )
    return out, ranked, acc  # caller unpersists ranked; acc = total docs


# ---------------------------------------------------------------------------
# Phase 1b: distributed vocabulary handling (no full-vocab driver collect)
# ---------------------------------------------------------------------------

def build_vocab(
    spark: SparkSession,
    term_stats_path: str,
    n_partitions: int,
    cuts: list[str] | None = None,
):
    """Distributed vocabulary pass: boundary cuts + (term, term_id, pid) dim.

    ONE range-partitioned sorted scan of term stats feeds everything:

    - per-partition (Σdf, count, min/max mid) comes to the driver — one row
      per range partition, never the vocabulary;
    - postings-weighted boundary cuts: a partition-local running df sum
      flags the terms whose global cumulative postings count crosses each
      ``k * total/n_partitions`` target; only those ≤ n_partitions-1
      boundary terms are collected.  Cut k is the first term reaching
      target k, so a mega-term crossing several targets yields duplicate
      cuts (neighboring partitions come out empty — harmless; the head-term
      split happens on the doc grid, not here);
    - term_id = dense lexicographic rank (partition-local counter + driver
      prefix sum, consecutiveness asserted like ``assign_doc_ids``);
    - pid = count of cuts < term (the cuts literal is tiny and lives in the
      plan).

    Pass ``cuts`` to reuse committed boundaries (resume); returns
    ``(cuts, total_postings, dim_df, backing_df_to_unpersist, n_terms)``.
    """
    from pyspark.sql import Window

    ts = spark.read.parquet(term_stats_path).select("term", "df")
    p = max(4, n_partitions // 4)
    ranked = (
        ts.repartitionByRange(p, "term")
        .sortWithinPartitions("term")
        .select(
            "term",
            "df",
            F.spark_partition_id().alias("tp"),
            F.monotonically_increasing_id().alias("mid"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pstats = ranked.groupBy("tp").agg(
        F.sum("df").alias("s"),
        F.count("*").alias("cnt"),
        F.min("mid").alias("mn"),
        F.max("mid").alias("mx"),
    ).collect()
    rows, acc_df, acc_n = [], 0, 0
    for r in sorted(pstats, key=lambda r: r["tp"]):
        if int(r["mx"]) - int(r["mn"]) != int(r["cnt"]) - 1:
            raise AssertionError(
                f"monotonically_increasing_id not consecutive in partition {r['tp']}"
            )
        rows.append((int(r["tp"]), int(acc_df), int(acc_n), int(r["mn"])))
        acc_df += int(r["s"])
        acc_n += int(r["cnt"])
    total_postings, n_terms = acc_df, acc_n
    off_df = spark.createDataFrame(rows, "tp int, doff long, roff long, mn long")
    joined = ranked.join(F.broadcast(off_df), "tp")

    if cuts is None:
        per_part = max(1, total_postings // n_partitions)
        w = Window.partitionBy("tp").orderBy("term").rowsBetween(
            Window.unboundedPreceding, 0
        )
        g = joined.withColumn("gcum", F.col("doff") + F.sum("df").over(w))
        crossing = g.filter(
            (F.floor(F.col("gcum") / per_part) > F.floor((F.col("gcum") - F.col("df")) / per_part))
            & (F.col("gcum") - F.col("df") < per_part * (n_partitions - 1))
        )
        cut_rows = crossing.select("term", "gcum", "df").collect()
        keyed_cuts = []
        for r in cut_rows:
            gcum, df = int(r["gcum"]), int(r["df"])
            lo, hi = (gcum - df) // per_part, gcum // per_part
            for k in range(lo + 1, hi + 1):
                if 1 <= k <= n_partitions - 1:
                    keyed_cuts.append((k, r["term"]))
        cuts = [t for _, t in sorted(keyed_cuts)]

    cuts_lit = F.array(*[F.lit(c) for c in cuts]) if cuts else F.array().cast("array<string>")
    pid = F.size(F.filter(cuts_lit, lambda c: c < F.col("term")))
    dim = joined.select(
        "term",
        (F.col("roff") + (F.col("mid") - F.col("mn"))).alias("term_id"),
        pid.cast("int").alias("pid"),
    )
    return cuts, total_postings, dim, ranked, n_terms


# ---------------------------------------------------------------------------
# Phase 2: tokenization
# ---------------------------------------------------------------------------

# Analyzer codepoint class (FIXTURES.md §3) as a Java regex, applied after
# lower().  NFC normalization is the ingest contract (the pandas path below
# applies it; the corpora here are NFC already) — everything else matches the
# pinned python analyzer exactly, which the rank-identity tests enforce.
_TOKEN_SPLIT_RE = "[^0-9A-Za-zÀ-￿]+"


def tokens_from_docs(docs_with_ids: DataFrame, positions: bool = False) -> DataFrame:
    """(doc_id, text) -> (term, doc_id, tf, dl) — pure JVM, whole-stage codegen.

    explode + hash-aggregate: every operator codegens (higher-order-function
    variants run interpreted and measured slower; a pandas tokenizer is
    Python-allocation-bound and stops scaling past ~8 concurrent workers).
    Map-side partial aggregation collapses the exploded stream to one row per
    (doc, term) before the shuffle because a doc's tokens never span
    partitions.

    ``positions=True`` adds each (doc, term)'s sorted occurrence offsets
    (0-based index in the token sequence, == what ``posexplode`` yields over
    the filtered array) as an ``array<int>`` column — still JVM-side
    (``collect_list`` object-hash aggregate).
    """
    arr = F.array_remove(F.split(F.lower(F.col("text")), _TOKEN_SPLIT_RE), "")
    d1 = docs_with_ids.select("doc_id", arr.alias("arr")).filter(F.size("arr") > 0)
    if positions:
        d2 = d1.select(
            "doc_id",
            F.size("arr").cast("int").alias("dl"),
            F.posexplode("arr").alias("pos", "term"),
        )
        return (
            d2.groupBy("doc_id", "term")
            .agg(
                F.count("*").cast("int").alias("tf"),
                F.max("dl").alias("dl"),
                F.sort_array(F.collect_list(F.col("pos").cast("int"))).alias("positions"),
            )
            .select("term", "doc_id", "tf", "dl", "positions")
        )
    d2 = d1.select(
        "doc_id",
        F.size("arr").cast("int").alias("dl"),
        F.explode("arr").alias("term"),
    )
    return (
        d2.groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"), F.max("dl").alias("dl"))
        .select("term", "doc_id", "tf", "dl")
    )


def tokens_from_docs_fields(
    docs_with_ids: DataFrame, fields: tuple, positions: bool = False
) -> DataFrame:
    """Multi-field token stream: one single-field pass per field, unioned.

    Each field tokenizes independently (pure JVM, same explode+hash-aggregate
    plan as :func:`tokens_from_docs`); its rows carry the posting key
    ``"<field>\\x1f<term>"`` and ``dl`` = THAT field's token count — exactly
    what per-field BM25 needs at query time (Lucene norms are per field).
    ``positions`` are offsets within the field's own token sequence.

    The union is a no-shuffle concatenation: each branch aggregates
    map-side like the single-field plan, and the branches' outputs flow
    straight into the caller's stats/encode shuffles.
    """
    parts = []
    for f_name in fields:
        arr = F.array_remove(F.split(F.lower(F.col(f_name)), _TOKEN_SPLIT_RE), "")
        d1 = docs_with_ids.select("doc_id", arr.alias("arr")).filter(F.size("arr") > 0)
        key = F.concat(F.lit(f_name + FIELD_SEP), F.col("term")).alias("term")
        if positions:
            d2 = d1.select(
                "doc_id",
                F.size("arr").cast("int").alias("dl"),
                F.posexplode("arr").alias("pos", "term"),
            )
            grouped = (
                d2.groupBy("doc_id", "term")
                .agg(
                    F.count("*").cast("int").alias("tf"),
                    F.max("dl").alias("dl"),
                    F.sort_array(F.collect_list(F.col("pos").cast("int"))).alias("positions"),
                )
                .select(key, "doc_id", "tf", "dl", "positions")
            )
        else:
            d2 = d1.select(
                "doc_id",
                F.size("arr").cast("int").alias("dl"),
                F.explode("arr").alias("term"),
            )
            grouped = (
                d2.groupBy("doc_id", "term")
                .agg(F.count("*").cast("int").alias("tf"), F.max("dl").alias("dl"))
                .select(key, "doc_id", "tf", "dl")
            )
        parts.append(grouped)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def sampled_nfc_ok(docs: DataFrame, rows_per_split: int = 4) -> bool:
    """Cheap ingest-contract check: does sampled ``text`` look NFC?

    The JVM tokenize path assumes NFC input (its regex split has no
    normalization step); when the sample shows non-NFC text the builder
    auto-routes to the spec-exact pandas tokenizer, which applies NFC.

    Sampling discipline: ``rows_per_split`` rows from the head of EVERY
    input partition (``mapPartitions`` + ``islice`` — iterator laziness
    stops each split's read after a few rows, so the cost is one row-group
    touch per split, never a corpus scan).  Unlike a driver-side ``limit``
    — which short-circuits on the first partitions and never sees later
    files — every input split contributes, so a corpus whose early files
    are ASCII and whose later files are NFD is caught.  Residual bias: the
    rows are split HEADS, not uniform within a split; a file that is NFC
    for its first rows and NFD later still slips through, which is the
    price of not scanning — the pandas route remains selectable via
    ``BuildConfig`` for corpora known to be mixed.
    """
    import unicodedata
    from itertools import islice

    txt = docs.select("text").filter(F.col("text").isNotNull())
    heads = txt.rdd.mapPartitions(
        lambda it, n=rows_per_split: list(islice(it, n))
    ).collect()
    if not heads:
        return True
    return all(unicodedata.is_normalized("NFC", r["text"]) for r in heads)


def tokens_from_docs_pandas(docs_with_ids: DataFrame, positions: bool = False) -> DataFrame:
    """(doc_id, text) -> exploded (term, doc_id, tf, dl); Arrow/pandas path.

    Spec-exact fallback (applies NFC) for corpora that are not NFC at ingest;
    the JVM path above is the default build path.  ``positions=True`` adds
    the per-(doc, term) sorted occurrence offsets, grouped with one stable
    lexsort + ``np.split`` (no per-group pandas apply).
    """

    def tok(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            tok_lists = tokenize_series(pdf["text"])
            lens = tok_lists.str.len().to_numpy(dtype=np.int64)
            nz = lens > 0
            if not nz.any():
                continue
            flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists[nz]])
            doc_rep = np.repeat(pdf["doc_id"].to_numpy()[nz], lens[nz])
            dl_rep = np.repeat(lens[nz], lens[nz])
            if not positions:
                tdf = pd.DataFrame({"term": flat, "doc_id": doc_rep, "dl": dl_rep})
                out = (
                    tdf.groupby(["doc_id", "term"], sort=False)
                    .agg(tf=("term", "size"), dl=("dl", "first"))
                    .reset_index()
                )
                yield out[["term", "doc_id", "tf", "dl"]].astype(
                    {"tf": np.int32, "dl": np.int32}
                )
                continue
            # occurrence offset within each doc = local arange per doc
            pos = np.concatenate([np.arange(n, dtype=np.int64) for n in lens[nz]])
            # stable sort by (doc, term); pos stays ascending within groups
            order = np.lexsort((pos, flat, doc_rep))
            doc_s, term_s, dl_s, pos_s = (
                doc_rep[order], flat[order], dl_rep[order], pos[order]
            )
            change = np.empty(len(doc_s), dtype=bool)
            change[0] = True
            change[1:] = (doc_s[1:] != doc_s[:-1]) | (term_s[1:] != term_s[:-1])
            starts = np.flatnonzero(change)
            counts = np.diff(np.append(starts, len(doc_s)))
            yield pd.DataFrame(
                {
                    "term": term_s[starts],
                    "doc_id": doc_s[starts],
                    "tf": counts.astype(np.int32),
                    "dl": dl_s[starts].astype(np.int32),
                    "positions": np.split(pos_s.astype(np.int32), starts[1:]),
                }
            )

    schema = TOKENS_SCHEMA_POS if positions else TOKENS_SCHEMA
    return docs_with_ids.select("doc_id", "text").mapInPandas(tok, schema=schema)


def with_extracted_text(docs: DataFrame) -> DataFrame:
    """Fill missing ``text`` from ``html`` via the pinned extractor (Arrow UDF)."""
    import pyspark.sql.types as T

    @F.pandas_udf(T.StringType())
    def extract_udf(html: pd.Series) -> pd.Series:
        return extract_text_series(html)

    if "html" in docs.columns and "text" in docs.columns:
        return docs.withColumn(
            "text", F.when(F.col("text").isNull(), extract_udf("html")).otherwise(F.col("text"))
        )
    if "text" not in docs.columns:
        return docs.withColumn("text", extract_udf("html"))
    return docs


# ---------------------------------------------------------------------------
# Phase 4: vectorized segment encoding (runs inside mapInPandas)
# ---------------------------------------------------------------------------

def _varint_nbytes(v: np.ndarray) -> np.ndarray:
    """Byte width of each value's varint encoding (vectorized)."""
    v = v.astype(np.uint64)
    nb = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += tmp > 0
        tmp >>= np.uint64(7)
    return nb


def encode_sorted_arrays(
    term_codes: np.ndarray,
    term_uniques: np.ndarray,
    sseg: np.ndarray,
    doc: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    pid: np.ndarray | None,
    avgdl: float | np.ndarray,
    block_docs: int,
    pos_flat: np.ndarray | None = None,
    pos_offsets: np.ndarray | None = None,
) -> dict:
    """Encode a (term, sseg, doc_id)-sorted slab into block columns.

    Vectorized across ALL groups at once: group/block boundaries via
    dictionary codes + reduceat, varints encoded in one pass over every value
    in the slab, then sliced per block from byte-length cumsums.  No
    per-group Python loop — this is the hot path of the whole build.
    Term strings enter as (codes, uniques) so the 10^8-row slab never
    materializes python string objects (only the ~10^4 uniques do).

    Positional builds pass ``pos_flat`` (every row's occurrence offsets,
    concatenated in row order) + ``pos_offsets`` (n+1 prefix offsets into
    it); the kernel emits one extra ``positions`` varint blob per block
    (codec layout: deltas restarting absolute at each doc/row), sliced from
    the same one-pass varint encode discipline as the postings sections.

    ``avgdl`` may be a scalar (single-field index: one corpus-wide average)
    or a per-row array (multi-field index: each posting's field avgdl), so
    the baked ``max_tf_norm`` is the block max of EXACTLY the tf_norm that
    query-time scoring computes — tight and attained, which is what makes
    the WAND θ floor sound on compound multi-field queries.
    """
    n = doc.size
    if n == 0:
        return None
    grp_change = np.empty(n, dtype=bool)
    grp_change[0] = True
    grp_change[1:] = (term_codes[1:] != term_codes[:-1]) | (sseg[1:] != sseg[:-1])
    grp_start_of = np.maximum.accumulate(np.where(grp_change, np.arange(n), 0))
    idx_in_grp = np.arange(n) - grp_start_of
    # block boundaries: every block_docs postings within a group
    blk_change = grp_change | (idx_in_grp % block_docs == 0)
    blk_starts = np.flatnonzero(blk_change)
    blk_ends = np.empty_like(blk_starts)
    blk_ends[:-1] = blk_starts[1:]
    blk_ends[-1] = n
    block_id = (idx_in_grp[blk_starts] // block_docs).astype(np.int32)

    # delta within block
    gaps = np.empty_like(doc)
    gaps[1:] = doc[1:] - doc[:-1]
    gaps[blk_starts] = doc[blk_starts]

    # per-value varint widths -> per-block byte spans for each section
    def section_spans(vals):
        nb = _varint_nbytes(vals)
        cum = np.concatenate(([0], np.cumsum(nb)))
        return cum[blk_starts], cum[blk_ends]  # byte [start, end) per block

    g_lo, g_hi = section_spans(gaps)
    t_lo, t_hi = section_spans(tf)
    d_lo, d_hi = section_spans(dl)
    gap_bytes = np.frombuffer(encode_varints(gaps), dtype=np.uint8)
    tf_bytes = np.frombuffer(encode_varints(tf), dtype=np.uint8)
    dl_bytes = np.frombuffer(encode_varints(dl), dtype=np.uint8)

    # per-block BM25 tf-norm upper bound (idf applied at query time)
    tf_norm = tf / (tf + K1 * (1.0 - B + B * dl / avgdl))
    max_tf_norm = np.maximum.reduceat(tf_norm, blk_starts)

    header_arrs = [
        np.frombuffer(
            encode_varints(np.array([ghi - glo, thi - tlo], dtype=np.uint64)), dtype=np.uint8
        )
        for glo, ghi, tlo, thi in zip(g_lo, g_hi, t_lo, t_hi)
    ]
    postings = [
        np.concatenate(
            (h, gap_bytes[gl:gh], tf_bytes[tl:th], dl_bytes[dlo:dhi])
        ).tobytes()
        for h, gl, gh, tl, th, dlo, dhi in zip(
            header_arrs, g_lo, g_hi, t_lo, t_hi, d_lo, d_hi
        )
    ]

    pos_out = {}
    if pos_flat is not None:
        # per-row delta restart: deltas[row_start] is absolute, the rest are
        # gaps — exactly codec.encode_position_lists, computed slab-wide
        row_starts_flat = pos_offsets[:-1][np.diff(pos_offsets) > 0]
        pdeltas = np.empty_like(pos_flat)
        if pos_flat.size:
            pdeltas[1:] = pos_flat[1:] - pos_flat[:-1]
            pdeltas[row_starts_flat] = pos_flat[row_starts_flat]
        pnb = _varint_nbytes(pdeltas)
        pcum = np.concatenate(([0], np.cumsum(pnb)))
        p_lo = pcum[pos_offsets[blk_starts]]
        p_hi = pcum[pos_offsets[blk_ends]]
        pos_bytes = np.frombuffer(encode_varints(pdeltas), dtype=np.uint8)
        pos_out = {
            "positions": [pos_bytes[lo:hi].tobytes() for lo, hi in zip(p_lo, p_hi)]
        }
    term_out = (
        {"term": term_uniques.take(term_codes[blk_starts])}
        if term_uniques is not None
        else {"term_id": term_codes[blk_starts].astype(np.int64)}
    )
    pid_out = {"pid": pid[blk_starts].astype(np.int32)} if pid is not None else {}
    return {
        **pid_out,
        **term_out,
        "sseg": sseg[blk_starts].astype(np.int32),
        "block_id": block_id,
        "first_doc": doc[blk_starts],
        "last_doc": doc[blk_ends - 1],
        "doc_count": (blk_ends - blk_starts).astype(np.int32),
        "max_tf_norm": max_tf_norm,
        "nbytes": np.array([len(p) for p in postings], dtype=np.int64),
        "postings": postings,
        **pos_out,
    }


def make_arrow_encoder(
    avgdl: float, block_docs: int, range_docs: int, term_dict=None, packed=False,
    with_positions: bool = False,
    field_avgdl: tuple[np.ndarray, np.ndarray] | None = None,
):
    """mapInArrow kernel: Arrow batches in, encoded block batches out.

    ``term_dict`` (broadcast of ``(terms_arr, pids_arr)`` indexed by the
    dense ``term_id``) maps ids back to strings and pids inside the kernel —
    every input column is fixed-width (zero-copy out of Arrow) and only the
    dictionary's uniques ever materialize python strings.  With
    ``term_dict=None`` (vocabulary above the broadcast budget) the kernel
    emits ``term_id`` only; string AND pid are attached afterwards by a join
    on the (distributed) term dimension.

    Shuffle-row diet (the encode phase is memory-bandwidth-bound, so every
    shuffled byte costs multi-core scaling):

    - ``sseg`` never ships: it is ``doc_id // range_docs`` — monotone in
      doc_id, so sorting by (term_id, doc_id) IS sorting by (term_id, sseg,
      doc_id) and the kernel recomputes it in one vectorized div;
    - ``packed=True``: ``tfdl = tf*4096 + dl`` in one int32 instead of two
      (exact whenever the corpus max doc length < 4096 — tf ≤ dl bounds tf);
    - ``doc_id`` arrives int32 when the corpus has < 2^31 docs (the caller
      chooses; widened back to int64 here).

    Together with dropping pid the shuffled row shrinks 28 -> 12 fixed
    bytes at sub-2^31-doc scale, 28 -> 20 at full web scale.

    ``field_avgdl`` (multi-field indexes only) is ``(tid_starts, avgdls)``:
    the sorted first term_id of each field's contiguous id interval and that
    field's avgdl.  The kernel maps every posting's term_id to its field
    avgdl with one vectorized searchsorted — O(rows · log #fields), no
    strings — so ``max_tf_norm`` bakes at the SAME avgdl query-time scoring
    uses for that field (tight + attained bounds; see encode_sorted_arrays).
    ``None`` keeps the scalar-avgdl bake (single-field indexes, and resumes
    of multi-field indexes built before per-field baking existed).
    """
    import pyarrow as pa

    id_mode = term_dict is None
    term_field = (
        pa.field("term_id", pa.int64()) if id_mode else pa.field("term", pa.string())
    )
    fields = [] if id_mode else [pa.field("pid", pa.int32())]
    fields += [
        term_field,
        pa.field("sseg", pa.int32()),
        pa.field("block_id", pa.int32()),
        pa.field("first_doc", pa.int64()),
        pa.field("last_doc", pa.int64()),
        pa.field("doc_count", pa.int32()),
        pa.field("max_tf_norm", pa.float64()),
        pa.field("nbytes", pa.int64()),
        pa.field("postings", pa.binary()),
    ]
    if with_positions:
        fields.append(pa.field("positions", pa.binary()))
    out_schema = pa.schema(fields)
    term_key = "term_id" if id_mode else "term"

    def encode_part(batches):
        blist = [b for b in batches if b.num_rows]
        if not blist:
            return
        tbl = pa.Table.from_batches(blist)
        if with_positions:
            # Spark ships array<int> as list<int32> (32-bit offsets); a
            # partition whose total position count exceeds 2^31 elements
            # would fail combine_chunks with an offset-capacity error.  Cast
            # to large_list (64-bit offsets) first so positional encode
            # partitions aren't capped by int32 list offsets.
            i = tbl.schema.get_field_index("positions")
            tbl = tbl.set_column(
                i,
                pa.field("positions", pa.large_list(pa.int32())),
                tbl.column("positions").cast(pa.large_list(pa.int32())),
            )
        tbl = tbl.combine_chunks()
        codes = tbl.column("term_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if id_mode:
            terms_arr, pid_arr = None, None
        else:
            terms_arr, pids_arr = term_dict.value
            pid_arr = pids_arr[codes].astype(np.int64)
        if packed:
            tfdl = tbl.column("tfdl").to_numpy(zero_copy_only=False).astype(np.int64)
            tf_arr = tfdl >> 12
            dl_arr = tfdl & 4095
        else:
            tf_arr = tbl.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
            dl_arr = tbl.column("dl").to_numpy(zero_copy_only=False).astype(np.int64)
        doc_arr = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if field_avgdl is not None:
            tid_starts, f_avgdls = field_avgdl
            row_avgdl = f_avgdls[
                np.searchsorted(tid_starts, codes, side="right") - 1
            ]
        else:
            row_avgdl = avgdl
        pos_flat = pos_offsets = None
        if with_positions:
            la = tbl.column("positions").chunk(0)
            off = la.offsets.to_numpy().astype(np.int64)
            vals = la.values.to_numpy(zero_copy_only=False).astype(np.int64)
            # normalize away any leading slice offset so row i's positions
            # are pos_flat[pos_offsets[i]:pos_offsets[i+1]]
            pos_flat = np.ascontiguousarray(vals[off[0] : off[-1]])
            pos_offsets = off - off[0]
        cols = encode_sorted_arrays(
            term_codes=codes,
            term_uniques=terms_arr,
            sseg=doc_arr // range_docs,
            doc=doc_arr,
            tf=tf_arr,
            dl=dl_arr,
            pid=pid_arr,
            avgdl=row_avgdl,
            block_docs=block_docs,
            pos_flat=pos_flat,
            pos_offsets=pos_offsets,
        )
        arrs = [] if id_mode else [pa.array(cols["pid"], pa.int32())]
        arrs += [
            pa.array(cols[term_key], term_field.type),
            pa.array(cols["sseg"], pa.int32()),
            pa.array(cols["block_id"], pa.int32()),
            pa.array(cols["first_doc"], pa.int64()),
            pa.array(cols["last_doc"], pa.int64()),
            pa.array(cols["doc_count"], pa.int32()),
            pa.array(cols["max_tf_norm"], pa.float64()),
            pa.array(cols["nbytes"], pa.int64()),
            pa.array(cols["postings"], pa.binary()),
        ]
        if with_positions:
            arrs.append(pa.array(cols["positions"], pa.binary()))
        yield pa.record_batch(arrs, schema=out_schema)

    return encode_part


# ---------------------------------------------------------------------------
# The build driver
# ---------------------------------------------------------------------------

def build_index(
    spark: SparkSession,
    corpus_path: str,
    index_dir: str,
    cfg: BuildConfig | None = None,
    run_id: str = "run-0",
    fail_after_wave: int | None = None,  # test hook for kill/resume
    id_col: str | None = None,  # pre-assigned unique long doc ids (skips rank)
) -> dict:
    """Build (or resume) the index for ``corpus_path`` under ``index_dir``."""
    import time as _time

    phase_t: dict[str, float] = {}
    _t0 = _time.time()

    def _mark(name):
        nonlocal _t0
        now = _time.time()
        phase_t[name] = round(now - _t0, 2)
        _t0 = now

    cfg = cfg or BuildConfig()
    cat = IndexCatalog(index_dir)
    docs_raw = spark.read.parquet(corpus_path)

    done = cat.completed_partitions()
    phase1_done = -1 in done and cat.has_corpus_stats()
    # positional layout and field layout are committed index properties: a
    # resume honors what phase 1 recorded, not the (possibly different) cfg
    # of the resuming run
    use_pos = bool(cfg.positions)
    field_cols = tuple(cfg.field_cols) if cfg.field_cols else None
    dv_cols = tuple(cfg.docvalues_cols or ())
    if phase1_done:
        _committed = cat.read_corpus_stats()
        use_pos = bool(_committed.get("with_positions", False))
        field_cols = tuple(_committed["field_cols"]) if _committed.get("field_cols") else None
        dv_cols = tuple(_committed.get("docvalues_cols") or ())
    content_cols = list(field_cols) if field_cols else ["text"]

    # multi-field corpora carry their named field columns directly; the
    # html->text extraction contract only applies to the single-field build
    docs = docs_raw if field_cols else with_extracted_text(docs_raw)
    if id_col is not None:
        # corpus carries its own unique long id; synthesize a url key from it
        # and drop the source column so later joins on doc_id are unambiguous
        docs = docs.withColumn("doc_id_pre", F.col(id_col).cast("long")).drop(id_col)
        if "url" not in docs.columns:
            docs = docs.withColumn("url", F.col("doc_id_pre").cast("string"))

    shuffle_n = cfg.shuffle_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Broadcasting the (url -> doc_id) map keeps the TEXT payload out of any
    # shuffle: the corpus streams map-side through the id join straight into
    # tokenize, whose explode+agg shuffles only compact token rows.  Above
    # the broadcast budget (cluster scale) fall back to a shuffled join —
    # there the text crosses the wire once, unavoidably.
    _BCAST_DOCS_MAX = 20_000_000

    # JVM tokenize assumes NFC input; auto-route to the spec-exact pandas
    # tokenizer (which applies NFC) when a sampled check fails the contract,
    # or honor an explicit cfg.tokenizer pin.  Checked once per build
    # (memoized), not per _tokenize call; resume paths that never
    # re-tokenize never pay the sample collect.
    _nfc_memo: list[bool] = []

    def _tokenize(df):
        if field_cols:
            # JVM-only (validated in BuildConfig): auto mode still runs the
            # sampled NFC contract check on every field column and fails loud
            # rather than silently mis-tokenizing a non-NFC corpus
            if cfg.tokenizer == "auto":
                if not _nfc_memo:
                    _nfc_memo.append(
                        all(
                            sampled_nfc_ok(docs.select(F.col(f).alias("text")))
                            for f in field_cols
                        )
                    )
                if not _nfc_memo[0]:
                    raise ValueError(
                        "field_cols build sampled non-NFC text; NFC-normalize "
                        "the corpus at ingest (the pandas fallback tokenizer "
                        "has no multi-field form)"
                    )
            return tokens_from_docs_fields(df, field_cols, positions=use_pos)
        if cfg.tokenizer == "jvm":
            return tokens_from_docs(df, positions=use_pos)
        if cfg.tokenizer == "pandas":
            return tokens_from_docs_pandas(df, positions=use_pos)
        if not _nfc_memo:
            _nfc_memo.append(sampled_nfc_ok(docs))
        fn = tokens_from_docs if _nfc_memo[0] else tokens_from_docs_pandas
        return fn(df, positions=use_pos)

    if not phase1_done:
        if id_col is not None:
            doc_ids = docs.select("url", F.col("doc_id_pre").alias("doc_id"))
            ranked = None
            small = True
        else:
            doc_ids, ranked, n_docs_pre = assign_doc_ids(docs, n_parts=cfg.n_partitions)
            small = n_docs_pre <= _BCAST_DOCS_MAX
        joined = (
            docs.join(F.broadcast(doc_ids) if small else doc_ids, "url")
            .select("doc_id", "url", *content_cols)
        )
        # Materialize the token stream as compressed columnar parquet rather
        # than executor-memory cache: at 10^8+ rows an in-memory cache causes
        # GC pressure that *worsens* with core count (measured: doc_stats
        # slower at 32 cores than 8), while parquet gives column-pruned
        # re-reads for the stats passes and survives for resume.
        _tokenize(joined).write.mode("overwrite").parquet(cat.tokens_tmp)
        tokens = spark.read.parquet(cat.tokens_tmp)

        # corpus + term stats in one pass over tokens; url kept so results can
        # hydrate and so resume reuses the committed doc_id assignment
        if field_cols:
            # one row per (doc, field) -> per-doc dl = Σ field lengths, and
            # per-field corpus stats (doc_count, avgdl) in the same pass
            per_fd = tokens.groupBy(
                "doc_id", F.substring_index("term", FIELD_SEP, 1).alias("field")
            ).agg(F.max("dl").alias("dl"))
            dl_df = per_fd.groupBy("doc_id").agg(F.sum("dl").alias("dl"))
        else:
            dl_df = tokens.groupBy("doc_id").agg(F.max("dl").alias("dl"))
        doc_stats = doc_ids.join(dl_df, "doc_id", "left").select(
            "doc_id", "url", F.coalesce("dl", F.lit(0)).alias("dl")
        )
        if dv_cols:
            # doc-values sidecar: ride the per-doc attribute columns on the
            # doc_stats parquet (column-pruned away by every existing reader;
            # predicate-pushed by the engine's range/equals filter scan).
            # Join key = the corpus's identity: doc_id_pre when the caller
            # supplied unique ids (urls may then repeat — a url join would
            # multiply doc_stats rows and corrupt n_docs/avgdl), url
            # otherwise (unique by contract; ids are its dense rank).
            missing = [c for c in dv_cols if c not in docs.columns]
            if missing:
                raise ValueError(
                    f"docvalues_cols not in the corpus: {missing}; "
                    f"corpus columns: {sorted(docs.columns)}"
                )
            if id_col is not None:
                dv_df = docs.select(
                    F.col("doc_id_pre").alias("doc_id"), *dv_cols
                )
                doc_stats = doc_stats.join(dv_df, "doc_id", "left")
            else:
                doc_stats = doc_stats.join(
                    docs.select("url", *dv_cols), "url", "left"
                )
        _mark("plan_phase1")
        doc_stats.write.mode("overwrite").parquet(cat.doc_stats)
        _mark("doc_stats")
        # value histograms for LOW-CARDINALITY string doc-values columns
        # (Lucene-style index stats powering query planning): the engine
        # uses them to estimate an equals/exists clause's selectivity and
        # flip the filter join to the null-safe COMPLEMENT anti-join when
        # the predicate keeps most docs — the build side becomes the small
        # minority instead of the corpus-sized majority.  approx-count
        # gate first so a high-cardinality column (urls, ids) never pays
        # an exact full groupBy.
        dv_value_stats: dict = {}
        if dv_cols:
            ds_df = spark.read.parquet(cat.doc_stats)
            dtypes = dict(ds_df.dtypes)
            for c in dv_cols:
                if dtypes.get(c) != "string":
                    continue
                approx = ds_df.agg(
                    F.approx_count_distinct(c).alias("n")
                ).collect()[0]["n"]
                if approx > 72:  # > 64 with rsd headroom
                    continue
                rows = ds_df.groupBy(c).count().collect()
                if sum(1 for r in rows if r[c] is not None) > 64:
                    continue
                dv_value_stats[c] = {
                    "values": {r[c]: int(r["count"]) for r in rows
                               if r[c] is not None},
                    "n_null": sum(int(r["count"]) for r in rows
                                  if r[c] is None),
                }
        agg = spark.read.parquet(cat.doc_stats).agg(
            F.count("*").alias("n_docs"),
            F.sum("dl").alias("total_dl"),
            F.max("dl").alias("max_dl"),
        ).collect()[0]
        n_docs, total_dl = agg["n_docs"], agg["total_dl"]
        max_dl = int(agg["max_dl"] or 0)
        avgdl = total_dl / n_docs
        field_stats: dict[str, dict] = {}
        if field_cols:
            frows = per_fd.groupBy("field").agg(
                F.count("*").alias("doc_count"), F.sum("dl").alias("sum_dl")
            ).collect()
            field_stats = {
                r["field"]: {
                    "doc_count": int(r["doc_count"]),
                    "avgdl": float(r["sum_dl"]) / int(r["doc_count"]),
                }
                for r in frows
            }
            # the scalar stat keeps the old "largest per-field avgdl"
            # convention (any reader of stats["avgdl"] sees a value at which
            # every baked bound would be sound), but the blocks themselves
            # are baked per-field below (per_field_mtn): each posting's
            # tf_norm is computed at ITS field's avgdl — the exact quantity
            # query-time scoring uses — so block bounds are tight AND
            # attained, which keeps the WAND θ floor sound on compound
            # queries instead of merely keeping the upper bound sound.
            avgdl = max(s["avgdl"] for s in field_stats.values())

        term_stats = tokens.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("cf")
        )
        term_stats.repartitionByRange(max(4, cfg.n_partitions // 4), "term").sortWithinPartitions(
            "term"
        ).write.mode("overwrite").parquet(cat.term_stats)
        _mark("term_stats")

        # postings-weighted term-range boundaries + (term, term_id, pid)
        # dimension — one distributed pass; the driver only ever sees the
        # ≤ n_partitions-1 boundary terms and per-partition counts
        cuts, total_postings, dim, ranked_t, n_terms = build_vocab(
            spark, cat.term_stats, cfg.n_partitions
        )
        dim.write.mode("overwrite").parquet(cat.term_dim)
        ranked_t.unpersist()
        _mark("term_dim")
        if field_cols:
            # per-field dense-term-id ranges: term_id is the lexicographic
            # rank and every posting key is "<field>\x1f<term>", so each
            # field's terms occupy one contiguous id interval.  The encoder
            # maps term_id -> field avgdl with one searchsorted over these
            # starts (works in BOTH dict and id mode — no strings needed
            # kernel-side).  #fields rows, asserted contiguous + exhaustive.
            frng = (
                spark.read.parquet(cat.term_dim)
                .groupBy(F.substring_index("term", FIELD_SEP, 1).alias("field"))
                .agg(
                    F.min("term_id").alias("lo"),
                    F.max("term_id").alias("hi"),
                    F.count("*").alias("cnt"),
                )
                .collect()
            )
            if {r["field"] for r in frng} != set(field_stats):
                raise AssertionError(
                    f"term_dim fields {sorted(r['field'] for r in frng)} != "
                    f"corpus fields {sorted(field_stats)}"
                )
            for r in frng:
                if int(r["hi"]) - int(r["lo"]) + 1 != int(r["cnt"]):
                    raise AssertionError(
                        f"field {r['field']!r} term_ids not contiguous: "
                        f"[{r['lo']}, {r['hi']}] holds {r['cnt']} terms"
                    )
                field_stats[r["field"]]["tid_lo"] = int(r["lo"])
        range_docs = max(cfg.min_range_docs, -(-n_docs // cfg.target_ranges))
        cat.write_corpus_stats(
            {
                "n_docs": int(n_docs),
                "avgdl": float(avgdl),
                "range_docs": int(range_docs),
                "block_docs": int(cfg.block_docs),
                "term_cuts": cuts,
                "n_partitions": cfg.n_partitions,
                "n_terms": int(n_terms),
                "max_dl": max_dl,
                "corpus_path": corpus_path,
                "with_positions": bool(use_pos),
                **({"docvalues_cols": list(dv_cols)} if dv_cols else {}),
                **({"docvalues_stats": dv_value_stats} if dv_value_stats else {}),
                **(
                    {
                        "field_cols": list(field_cols),
                        "field_sep": FIELD_SEP,
                        "fields": field_stats,
                        # block bounds bake at each posting's OWN field avgdl
                        # (tight + attained) — the engine may use the per-
                        # range achievable θ floor on compound queries.
                        # Absent on pre-r5 multi-field indexes (scalar bake).
                        "per_field_mtn": True,
                    }
                    if field_cols
                    else {}
                ),
            }
        )
        cat.append_manifest(
            [
                {
                    "run_id": run_id,
                    "partition_id": -1,
                    "segment_id": "phase1",
                    "input_split": corpus_path,
                    "term_lo": "",
                    "term_hi": "",
                    "postings_count": int(total_postings),
                    "bytes": 0,
                    "status": "done",
                }
            ]
        )
        if ranked is not None:
            ranked.unpersist()
    else:
        tokens = None

    stats = cat.read_corpus_stats()
    avgdl, range_docs, block_docs = stats["avgdl"], stats["range_docs"], stats["block_docs"]
    cuts = stats["term_cuts"]
    n_partitions = stats["n_partitions"]

    # wave plan first: a fully-built index (no pending partitions) must not
    # pay a token-stream reconstruction just to discover there is no work
    all_pids = [p for p in range(n_partitions)]
    pending = [p for p in all_pids if p not in done]
    if not pending:
        m = cat.read_manifest()
        _mark("manifest")
        return {
            "phase_sec": phase_t,
            "n_docs": stats["n_docs"],
            "avgdl": avgdl,
            "partitions_built": 0,
            "partitions_skipped": len(done - {-1}),
            "manifest_rows": m.num_rows,
            "total_bytes": sum(
                b
                for b, s in zip(m.column("bytes").to_pylist(), m.column("status").to_pylist())
                if s == "done"
            ),
        }

    if tokens is None:
        # resume path: reuse the materialized token stream if it survived;
        # else rebuild it deterministically, joining the COMMITTED doc_id
        # assignment from doc_stats so segment contents are bit-identical to
        # the interrupted run.
        tokens = None
        if os.path.exists(os.path.join(cat.tokens_tmp, "_SUCCESS")):
            cand = spark.read.parquet(cat.tokens_tmp)
            # a surviving stream from before the positional layout cannot
            # serve a positional resume; fall through to the rebuild
            if not use_pos or "positions" in cand.columns:
                tokens = cand
        if tokens is None:
            committed = spark.read.parquet(cat.doc_stats).select("url", "doc_id")
            small = stats["n_docs"] <= _BCAST_DOCS_MAX
            docs_with_ids = docs.join(
                F.broadcast(committed) if small else committed, "url"
            ).select("doc_id", *content_cols)
            _tokenize(docs_with_ids).write.mode("overwrite").parquet(cat.tokens_tmp)
            tokens = spark.read.parquet(cat.tokens_tmp)

    # assign build partition + a dense integer term_id from the term
    # dimension, so everything downstream shuffles and sorts on fixed-width
    # ints: radix-friendly sort keys and a ~30% smaller shuffle than
    # shipping term strings.  Vocabularies within the dict budget ride a
    # broadcast dictionary (the same in-process-dimension pattern as the
    # reference's STORE_WH_MAP dict, reference constants.py:17); above it
    # NOTHING materializes the vocabulary in one place — tokens gain ids via
    # a shuffle join and the encoder emits ids that a post-encode join maps
    # back to strings.
    if not os.path.exists(os.path.join(cat.term_dim, "_SUCCESS")):
        # resume rebuild: reuse the COMMITTED cuts so pids match the
        # already-written segments
        _, _, dim, ranked_t, _ = build_vocab(
            spark, cat.term_stats, n_partitions, cuts=cuts
        )
        dim.write.mode("overwrite").parquet(cat.term_dim)
        ranked_t.unpersist()
    term_dim_df = spark.read.parquet(cat.term_dim)
    n_terms = int(stats.get("n_terms", -1))
    if n_terms < 0:
        n_terms = term_dim_df.count()

    id_mode = n_terms > cfg.dict_budget
    # shuffle-row diet (see make_arrow_encoder): pid rides only to the wave
    # filter; sseg never ships (derived from doc_id in the kernel; sorting
    # by doc_id subsumes it); tf/dl pack into one int32 when the corpus max
    # doc length allows exact unpacking; doc_id narrows to int32 below 2^31
    # docs.  12 fixed bytes/row here instead of 28.
    max_dl = int(stats.get("max_dl", 1 << 30))
    packed = 0 < max_dl < 4096
    # multi-field per-field bound bake: (sorted field tid starts, avgdls)
    # for the encoder's term_id -> field-avgdl searchsorted.  Requires the
    # tid_lo ranges written by THIS builder version; a resume of an older
    # multi-field index falls back to the scalar bake its existing segments
    # used (stats["avgdl"] = max field avgdl, sound at bound_scale 1.0).
    field_avgdl = None
    fstats = stats.get("fields") or {}
    if fstats and stats.get("per_field_mtn") and all(
        "tid_lo" in v for v in fstats.values()
    ):
        pairs = sorted(
            (int(v["tid_lo"]), float(v["avgdl"])) for v in fstats.values()
        )
        if pairs[0][0] != 0:
            raise AssertionError(
                f"field term_id intervals do not start at 0: {pairs}"
            )
        field_avgdl = (
            np.array([p[0] for p in pairs], dtype=np.int64),
            np.array([p[1] for p in pairs], dtype=np.float64),
        )
    doc32 = int(stats["n_docs"]) < (1 << 31)
    doc_col = F.col("doc_id").cast("int").alias("doc_id") if doc32 else F.col("doc_id")
    val_cols = (
        [(F.col("tf") * 4096 + F.col("dl")).cast("int").alias("tfdl")]
        if packed
        else [F.col("tf"), F.col("dl")]
    )
    if use_pos:
        val_cols = val_cols + [F.col("positions")]
    base_cols = [F.col("term_id"), F.col("pid"), doc_col]
    if not id_mode:
        pdf = term_dim_df.toPandas().sort_values("term_id").reset_index(drop=True)
        terms_arr = pdf["term"].to_numpy(dtype=object)
        pids_arr = pdf["pid"].to_numpy(dtype=np.int32)
        pdf["term_id"] = pdf["term_id"].astype(np.int32)  # tighter shuffle rows
        pid_map = spark.createDataFrame(pdf)
        keyed = tokens.join(F.broadcast(pid_map), "term").select(*base_cols, *val_cols)
        dict_b = spark.sparkContext.broadcast((terms_arr, pids_arr))
        encoder = make_arrow_encoder(
            avgdl=avgdl, block_docs=block_docs, range_docs=int(range_docs),
            term_dict=dict_b, packed=packed, with_positions=use_pos,
            field_avgdl=field_avgdl,
        )
    else:
        keyed = tokens.join(term_dim_df, "term").select(*base_cols, *val_cols)
        encoder = make_arrow_encoder(
            avgdl=avgdl, block_docs=block_docs, range_docs=int(range_docs),
            term_dict=None, packed=packed, with_positions=use_pos,
            field_avgdl=field_avgdl,
        )
    sseg_key = F.expr(f"CAST(doc_id DIV {int(range_docs)} AS INT)")

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # wave loop: commit manifest rows per wave; resume skips done partitions
    wave_size = max(1, -(-n_partitions // cfg.waves))
    waves = [pending[i : i + wave_size] for i in range(0, len(pending), wave_size)]

    for w, wave_pids in enumerate(waves):
        wave = (
            keyed.filter(F.col("pid").isin(wave_pids))
            .drop("pid")  # derivable at/after encode; keep the shuffle lean
            .repartition(shuffle_n, F.col("term_id"), sseg_key)
            .sortWithinPartitions("term_id", "doc_id")  # sseg monotone in doc_id
            .mapInArrow(
                encoder,
                schema=(
                    (SEGMENT_SCHEMA_IDS_POS if id_mode else SEGMENT_SCHEMA_POS)
                    if use_pos
                    else (SEGMENT_SCHEMA_IDS if id_mode else SEGMENT_SCHEMA)
                ),
            )
        )
        if id_mode:
            # restore term string + pid: one join of BLOCK rows (≈ postings
            # / block_docs) against the term dimension — linear, never a
            # driver materialization
            wave = wave.join(term_dim_df, "term_id").select(
                "pid", "term", "sseg", "block_id", "first_doc", "last_doc",
                "doc_count", "max_tf_norm", "nbytes", "postings",
                *(["positions"] if use_pos else []),
            )
        wave.write.mode("overwrite").partitionBy("pid").parquet(cat.segments)
        _mark(f"wave{w}_segments")
        # lineage from what actually landed on disk
        landed = (
            spark.read.parquet(cat.segments)
            .filter(F.col("pid").isin(wave_pids))
            .groupBy("pid")
            .agg(
                F.min("term").alias("term_lo"),
                F.max("term").alias("term_hi"),
                F.sum("doc_count").alias("postings_count"),
                F.sum("nbytes").alias("bytes"),
            )
            .collect()
        )
        rows = [
            {
                "run_id": run_id,
                "partition_id": int(r["pid"]),
                "segment_id": f"{run_id}-p{int(r['pid'])}",
                "input_split": f"{corpus_path}#wave{w}",
                "term_lo": r["term_lo"],
                "term_hi": r["term_hi"],
                "postings_count": int(r["postings_count"]),
                "bytes": int(r["bytes"]),
                "status": "done",
            }
            for r in landed
        ]
        # partitions that produced no segments still count as done
        landed_pids = {int(r["pid"]) for r in landed}
        for p in wave_pids:
            if p not in landed_pids:
                rows.append(
                    {
                        "run_id": run_id,
                        "partition_id": p,
                        "segment_id": f"{run_id}-p{p}",
                        "input_split": f"{corpus_path}#wave{w}",
                        "term_lo": "",
                        "term_hi": "",
                        "postings_count": 0,
                        "bytes": 0,
                        "status": "done",
                    }
                )
        cat.append_manifest(rows)
        if fail_after_wave is not None and w + 1 >= fail_after_wave:
            raise RuntimeError(f"injected failure after wave {w}")

    import shutil

    shutil.rmtree(cat.tokens_tmp, ignore_errors=True)
    m = cat.read_manifest()
    _mark("manifest")
    return {
        "phase_sec": phase_t,
        "n_docs": stats["n_docs"],
        "avgdl": avgdl,
        "partitions_built": len(pending),
        "partitions_skipped": len(done - {-1}),
        "manifest_rows": m.num_rows,
        "total_bytes": sum(
            b for b, s in zip(m.column("bytes").to_pylist(), m.column("status").to_pylist()) if s == "done"
        ),
    }
