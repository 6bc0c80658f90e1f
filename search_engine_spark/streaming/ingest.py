"""Streaming incremental index ingestion — Structured Streaming micro-batches
appended to a growing BM25 index as immutable *generations*.

The reference's ingest story is a batch reload plus Atlas's own incremental
sync (reference lamda/etl scripts + settings.py Atlas delegation); Lucene —
the engine Atlas delegates to — grows an index as immutable segment
generations merged at read time.  This module is that design on Spark:

- ``readStream`` over a document directory; every micro-batch becomes one
  **generation**: ``segments/gen=E/pid=P/``, ``doc_stats/gen=E/``,
  ``term_stats/gen=E/`` (per-term df DELTAS), ``gen_stats/gen=E/`` (one row
  of batch-level stats).  The query engine reads the union: partition
  discovery merges segment generations, term stats aggregate by term, and
  ``corpus_stats.json`` carries cumulative N/avgdl.
- **Exactly-once on at-least-once replays**: every per-generation artifact
  is written with ``mode("overwrite")`` under a deterministic epoch-named
  path, and the LAST artifact written (``gen_stats/gen=E``) doubles as the
  commit marker — a replayed ``foreachBatch`` epoch that finds it returns
  immediately; a replay after a partial crash deterministically rewrites
  the same bytes.  (The same write-then-rename discipline as the batch
  builder's manifest, reference-free.)
- **Global grid + partition map are frozen at generation 0** (``range_docs``,
  ``block_docs``, ``term_cuts``, ``n_partitions``): every generation buckets
  postings on the SAME doc-id grid and the same term->pid rule
  (count of cuts < term == the engine's ``searchsorted(cuts, t, "left")``),
  so cross-generation WAND range bounds stay summable and term->pid pruning
  stays exact.  At cluster scale set ``expected_docs`` so the grid is sized
  for the corpus the stream will become, not the first batch.
- **BM25 exactness under growth**: scores decode tf+dl from postings and
  apply the CURRENT cumulative avgdl/N/df at query time, so every exact
  path (driver, sort, grouped) returns precisely what a full rebuild over
  the union corpus returns.  The one stats-sensitive *metadata* field —
  per-block ``max_tf_norm``, baked with the avgdl known at encode time — is
  corrected by ``wand_bound_scale = max_g(avgdl_now / avgdl_build_g, 1)``:
  for avgdl1 > avgdl0, ``tf_norm(avgdl1) = tf/(tf+c0+x*avgdl0/avgdl1)
  <= tf_norm(avgdl0) * avgdl1/avgdl0``, so scaled bounds stay sound upper
  bounds and WAND results stay bit-identical to the sort baseline (pinned
  by test).  The scale only loosens pruning as avgdl drifts; a periodic
  re-encode (Lucene's merge) resets it.

Doc-id contract: with ``id_col`` the corpus brings its own unique long ids
(rebuild-identical by construction).  Without it, ids are
``(docs ingested so far) + lexicographic url rank within the batch`` —
assignment-order-stable like Lucene's internal doc ids.  A full REBUILD
ranks urls globally, so incremental doc_ids equal rebuild doc_ids iff
batches arrive in url-lex order; under arbitrary arrival the (url, score)
result sets still match the rebuild exactly and only same-score tiebreak
order can differ (both pinned by tests).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import IndexCatalog
from ..index.builder import (
    BuildConfig,
    assign_doc_ids,
    build_vocab,
    make_arrow_encoder,
    sampled_nfc_ok,
    tokens_from_docs,
    tokens_from_docs_pandas,
    with_extracted_text,
    SEGMENT_SCHEMA,
    SEGMENT_SCHEMA_IDS,
    SEGMENT_SCHEMA_IDS_POS,
    SEGMENT_SCHEMA_POS,
)


def _gen_dir(root: str, epoch: int) -> str:
    return os.path.join(root, f"gen={int(epoch)}")


def _gen_stats_root(index_dir: str) -> str:
    return os.path.join(index_dir, "gen_stats")


def _frozen_path(index_dir: str) -> str:
    return os.path.join(index_dir, "frozen.json")


def _write_frozen(index_dir: str, frozen: dict) -> None:
    """Atomic (temp+rename) write of the frozen corpus geometry.

    Lands BEFORE any generation's commit marker, so a crash anywhere after
    generation 0's artifacts can always rebuild corpus_stats.json — the
    geometry is never recoverable only from a file a crash can lose."""
    import json
    import uuid

    os.makedirs(index_dir, exist_ok=True)
    tmp = _frozen_path(index_dir) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(frozen, f)
    os.rename(tmp, _frozen_path(index_dir))


def _read_frozen(index_dir: str) -> dict | None:
    import json

    p = _frozen_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


# same broadcast budget as build_index's url->doc_id join: above it the map
# itself is too big to ship to every executor and the join must shuffle
_BCAST_DOCS_MAX = 20_000_000


def _committed_gens(spark: SparkSession, index_dir: str, before: int | None = None):
    """Rows of gen_stats for committed generations (optionally gen < before).

    Committed = the generation dir carries ``_SUCCESS``.  A crash during
    the very first gen_stats write can leave ``gen=E/`` containing only
    Spark's hidden ``_temporary`` staging — reading the root then fails
    schema inference and would brick every replay, so dirs without the
    marker are excluded BEFORE the read (and filtered from the rows as
    defense against committers that expose task files early)."""
    root = _gen_stats_root(index_dir)
    if not os.path.isdir(root):
        return []
    committed = [
        int(e.split("=", 1)[1])
        for e in os.listdir(root)
        if e.startswith("gen=")
        and os.path.exists(os.path.join(root, e, "_SUCCESS"))
    ]
    if not committed:
        return []
    df = spark.read.parquet(root).filter(F.col("gen").isin(committed))
    if before is not None:
        df = df.filter(F.col("gen") < int(before))
    return sorted(df.collect(), key=lambda r: int(r["gen"]))


def _resolve_tokenizer(docs: DataFrame, cfg: BuildConfig) -> str:
    """Resolve "auto" to a concrete analyzer choice via the NFC sample."""
    if cfg.tokenizer != "auto":
        return cfg.tokenizer
    return "jvm" if sampled_nfc_ok(docs) else "pandas"


def _tokenize_like_builder(
    docs: DataFrame, tokenizer: str, positions: bool = False
) -> DataFrame:
    fn = tokens_from_docs if tokenizer == "jvm" else tokens_from_docs_pandas
    return fn(docs, positions=positions)


@dataclass
class IngestResult:
    epoch: int
    skipped: bool
    n_docs: int = 0
    postings: int = 0
    avgdl_build: float = 0.0
    wall_sec: float = 0.0
    phase_sec: dict | None = None  # per-phase walls (observability)


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    index_dir: str,
    epoch: int,
    cfg: BuildConfig | None = None,
    id_col: str | None = None,
    expected_docs: int | None = None,
) -> IngestResult:
    """Index one micro-batch of documents as generation ``epoch``.

    Idempotent: an epoch whose ``gen_stats`` marker exists is skipped, and a
    partially-crashed epoch rewrites every artifact deterministically —
    together the exactly-once contract ``foreachBatch`` needs on top of its
    at-least-once replay semantics.
    """
    t0 = time.time()
    phase_t: dict[str, float] = {}
    _tp = [time.time()]

    def _mark(name):
        now = time.time()
        phase_t[name] = round(now - _tp[0], 2)
        _tp[0] = now

    cfg = cfg or BuildConfig()
    cat = IndexCatalog(index_dir)
    gstats_dir = _gen_dir(_gen_stats_root(index_dir), epoch)
    if os.path.exists(os.path.join(gstats_dir, "_SUCCESS")):
        # replayed epoch: nothing to ingest, but a crash may have landed
        # between the commit marker and the stats refresh — heal it here so
        # corpus_stats.json always reflects every committed generation
        _ensure_stats_fresh(spark, cat)
        return IngestResult(epoch=epoch, skipped=True)
    if batch_df.isEmpty():
        # an empty trigger must not become a generation — at gen 0 it would
        # freeze empty term cuts for the index's whole life
        _ensure_stats_fresh(spark, cat)
        return IngestResult(epoch=epoch, skipped=True)

    _mark("preamble")
    prior = _committed_gens(spark, index_dir, before=epoch)
    prior_n = sum(int(r["n_docs"]) for r in prior)
    prior_dl = sum(int(r["sum_dl"]) for r in prior)

    # positional layout is frozen index geometry: generation 0's cfg decides
    # it; later generations must agree or the merged segment schema would
    # mix positional and non-positional generations
    frozen_pre = _read_frozen(index_dir)
    use_pos = (
        bool(cfg.positions) if frozen_pre is None
        else bool(frozen_pre.get("with_positions", False))
    )
    if frozen_pre is not None and bool(cfg.positions) != use_pos:
        raise ValueError(
            f"index at {index_dir} was frozen with with_positions={use_pos}; "
            f"ingest cfg.positions={cfg.positions} does not match"
        )
    if cat.has_corpus_stats() and cat.read_corpus_stats().get("fields"):
        # a multi-field index keys postings as "<field><sep><term>" with
        # per-field stats and per-field-baked bounds; this single-text-column
        # ingest would write unprefixed keys no field clause can match and
        # scalar-baked bounds under a per_field_mtn flag — fail loud
        raise ValueError(
            f"index at {index_dir} is multi-field "
            "(builder.BuildConfig.field_cols); incremental ingest supports "
            "single-field indexes only — rebuild with build_index"
        )

    docs = with_extracted_text(batch_df)

    # the ANALYZER is frozen geometry too: "auto" re-sampled per batch could
    # tokenize generations of one index with different normalization (JVM
    # no-NFC vs pandas NFC), silently diverging from a full rebuild.  Gen 0
    # resolves it once and records it; later generations honor the record
    # (an explicit pin that disagrees raises; indexes frozen before this
    # field existed fall back to the old per-batch sampling).
    if frozen_pre is None:
        tokenizer = _resolve_tokenizer(docs, cfg)
    else:
        tokenizer = frozen_pre.get("tokenizer")
        if tokenizer is None:
            tokenizer = _resolve_tokenizer(docs, cfg)
        elif cfg.tokenizer not in ("auto", tokenizer):
            raise ValueError(
                f"index at {index_dir} was frozen with tokenizer={tokenizer!r}; "
                f"ingest cfg.tokenizer={cfg.tokenizer!r} does not match"
            )
    # doc-values sidecar columns are frozen index geometry like the
    # tokenizer: generation 0's cfg decides them; later generations honor
    # the record (an explicit disagreeing pin raises), and every batch must
    # carry the columns
    if frozen_pre is None:
        dv_cols = tuple(cfg.docvalues_cols or ())
    else:
        dv_cols = tuple(frozen_pre.get("docvalues_cols") or ())
        if cfg.docvalues_cols and tuple(cfg.docvalues_cols) != dv_cols:
            raise ValueError(
                f"index at {index_dir} was frozen with docvalues_cols="
                f"{dv_cols}; ingest cfg.docvalues_cols="
                f"{tuple(cfg.docvalues_cols)} does not match"
            )
    missing_dv = [c for c in dv_cols if c not in docs.columns]
    if missing_dv:
        raise ValueError(
            f"batch is missing docvalues columns {missing_dv}; "
            f"batch columns: {sorted(docs.columns)}"
        )
    if id_col is not None:
        ranked = None
        with_ids = docs.withColumn("doc_id", F.col(id_col).cast("long"))
        if "url" not in with_ids.columns:
            with_ids = with_ids.withColumn("url", F.col("doc_id").cast("string"))
        with_ids = with_ids.select("doc_id", "url", "text", *dv_cols)
    else:
        ids, ranked, n_pre = assign_doc_ids(docs, n_parts=cfg.n_partitions)
        ids = ids.select("url", (F.col("doc_id") + F.lit(prior_n)).alias("doc_id"))
        # broadcast budget mirrors build_index: a catch-up batch draining a
        # huge backlog must fall back to the shuffled join
        ids = F.broadcast(ids) if n_pre <= _BCAST_DOCS_MAX else ids
        with_ids = docs.join(ids, "url").select("doc_id", "url", "text", *dv_cols)

    _mark("ids_plan")
    # Materialize the generation's token stream as compressed columnar
    # parquet, NOT .persist(): a deserialized JVM cache of ~10^7 token rows
    # is GC-bound (measured: the doc_stats pass took 38 s of a 68 s
    # generation under .persist(); the batch builder hit the same wall and
    # stages tokens_tmp for the same reason — builder.py phase 2 notes).
    # Every downstream consumer (doc stats, term stats, encode) re-reads
    # column-pruned.
    tokens_tmp = _gen_dir(os.path.join(index_dir, "tokens_tmp"), epoch)
    _tokenize_like_builder(
        with_ids.select("doc_id", "url", "text"), tokenizer, positions=use_pos
    ).write.mode("overwrite").parquet(tokens_tmp)
    tokens = spark.read.parquet(tokens_tmp)
    _mark("tokenize")

    # per-generation doc stats (hydration + dl); docs with zero tokens keep dl=0
    dl_df = tokens.groupBy("doc_id").agg(F.max("dl").alias("dl"))
    doc_stats = (
        with_ids.select("doc_id", "url", *dv_cols)
        .join(dl_df, "doc_id", "left")
        .select("doc_id", "url", F.coalesce("dl", F.lit(0)).alias("dl"), *dv_cols)
    )
    doc_stats.write.mode("overwrite").parquet(_gen_dir(cat.doc_stats, epoch))
    _mark("doc_stats")
    agg = spark.read.parquet(_gen_dir(cat.doc_stats, epoch)).agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("s"),
        F.max("dl").alias("m"),
        F.max("doc_id").alias("mx"),
    ).collect()[0]
    batch_n, batch_dl = int(agg["n"]), int(agg["s"] or 0)
    batch_max_dl, batch_max_id = int(agg["m"] or 0), int(agg["mx"] or 0)
    if ranked is not None:
        ranked.unpersist()

    _mark("doc_agg")
    # per-generation term-df deltas; the engine and later stats reads
    # aggregate SUM(df) by term across generations
    gen_ts_path = _gen_dir(cat.term_stats, epoch)
    tokens.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    ).write.mode("overwrite").parquet(gen_ts_path)
    # the landed stats have exactly one row per term, so the vocabulary
    # size is a parquet row-count — no re-shuffle of the token table
    _mark("term_stats")
    n_batch_terms = spark.read.parquet(gen_ts_path).count()
    id_mode = n_batch_terms > cfg.dict_budget
    gen0_dim = None

    # frozen corpus geometry: generation 0 computes it and commits it to
    # frozen.json BEFORE encoding anything (atomic rename), every later
    # generation — and every corpus_stats refresh — reads it from there.
    # Keeping it out of corpus_stats.json means a crash between a
    # generation's commit marker and the stats refresh can never lose the
    # geometry (replays recompute identical values from this gen's term
    # stats, but only ever run if the marker is absent).
    frozen = _read_frozen(index_dir)
    if frozen is None:
        n_partitions = cfg.n_partitions
        cuts, _, dim0, ranked_t, _ = build_vocab(
            spark, gen_ts_path, n_partitions
        )
        if id_mode:
            # the dim this call already computed (keyed by THESE cuts) is
            # exactly what the id_mode encode needs — keep it instead of
            # paying the distributed vocabulary pass a second time
            gen0_dim = dim0.persist()
            gen0_dim.count()
        ranked_t.unpersist()
        size_basis = expected_docs or batch_n
        frozen = {
            "term_cuts": cuts,
            "range_docs": max(
                cfg.min_range_docs, -(-size_basis // cfg.target_ranges)
            ),
            "block_docs": cfg.block_docs,
            "n_partitions": n_partitions,
            "with_positions": bool(use_pos),
            "tokenizer": tokenizer,
            "docvalues_cols": list(dv_cols),
        }
        _write_frozen(index_dir, frozen)
    cuts = list(frozen["term_cuts"])
    range_docs = int(frozen["range_docs"])
    block_docs = int(frozen["block_docs"])
    n_partitions = int(frozen["n_partitions"])

    # cumulative avgdl at encode time — recorded so the engine can rescale
    # this generation's max_tf_norm bounds if avgdl later drifts
    avgdl_build = (prior_dl + batch_dl) / max(1, prior_n + batch_n)

    # batch vocabulary -> (term, term_id, pid) with the FROZEN cuts; the
    # term->pid rule is count(cuts < term), identical to the engine's
    # searchsorted(cuts, term, side="left") pruning rule.  The same two-path
    # policy as build_index/compact_index: vocabularies within dict_budget
    # broadcast; above it NOTHING materializes the batch vocabulary in one
    # place (a catch-up batch draining a web-scale backlog brings a
    # web-scale vocabulary with it) — ids ride a shuffle join and a
    # post-encode join on the distributed dim restores term + pid.
    if id_mode:
        if gen0_dim is not None:
            term_dim_df = gen0_dim
        else:
            _, _, dim, ranked_t, _ = build_vocab(
                spark, gen_ts_path, n_partitions, cuts=cuts
            )
            term_dim_df = dim.persist()
            term_dim_df.count()
            ranked_t.unpersist()
        pid_map = term_dim_df.select("term", "term_id")
        dict_b = None
    else:
        cuts_arr = np.array(cuts, dtype=object)
        # the landed per-gen term stats are the batch vocabulary (one row
        # per term) — a column-pruned parquet read, not a token re-shuffle
        vocab = (
            spark.read.parquet(gen_ts_path).select("term")
            .toPandas().sort_values("term")
        )
        terms_arr = vocab["term"].to_numpy(dtype=object)
        pids_arr = np.searchsorted(cuts_arr, terms_arr, side="left").astype(np.int32)
        vocab = vocab.reset_index(drop=True)
        vocab["term_id"] = np.arange(len(vocab), dtype=np.int32)
        pid_map = F.broadcast(spark.createDataFrame(vocab[["term", "term_id"]]))
        dict_b = spark.sparkContext.broadcast((terms_arr, pids_arr))

    _mark("vocab")
    packed = 0 < batch_max_dl < 4096
    doc32 = batch_max_id < (1 << 31)
    doc_col = F.col("doc_id").cast("int").alias("doc_id") if doc32 else F.col("doc_id")
    val_cols = (
        [(F.col("tf") * 4096 + F.col("dl")).cast("int").alias("tfdl")]
        if packed
        else [F.col("tf"), F.col("dl")]
    )
    if use_pos:
        val_cols = val_cols + [F.col("positions")]
    keyed = tokens.join(pid_map, "term").select(
        F.col("term_id"), doc_col, *val_cols
    )
    encoder = make_arrow_encoder(
        avgdl=avgdl_build, block_docs=block_docs, range_docs=range_docs,
        term_dict=dict_b, packed=packed, with_positions=use_pos,
    )
    shuffle_n = cfg.shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    sseg_key = F.expr(f"CAST(doc_id DIV {int(range_docs)} AS INT)")
    if id_mode:
        enc_schema = SEGMENT_SCHEMA_IDS_POS if use_pos else SEGMENT_SCHEMA_IDS
    else:
        enc_schema = SEGMENT_SCHEMA_POS if use_pos else SEGMENT_SCHEMA
    encoded = (
        keyed.repartition(shuffle_n, F.col("term_id"), sseg_key)
        .sortWithinPartitions("term_id", "doc_id")
        .mapInArrow(encoder, schema=enc_schema)
    )
    if id_mode:
        encoded = encoded.join(term_dim_df, "term_id").select(
            "pid", "term", "sseg", "block_id", "first_doc", "last_doc",
            "doc_count", "max_tf_norm", "nbytes", "postings",
            *(["positions"] if use_pos else []),
        )
    (
        encoded.write.mode("overwrite")
        .partitionBy("pid")
        .parquet(_gen_dir(cat.segments, epoch))
    )
    _mark("encode")
    if id_mode:
        term_dim_df.unpersist()
    import shutil

    shutil.rmtree(tokens_tmp, ignore_errors=True)

    # lineage (observability; a replay after this append but before the
    # gen_stats commit can duplicate rows — harmless, documented)
    landed = (
        spark.read.parquet(_gen_dir(cat.segments, epoch))
        .groupBy("pid")
        .agg(
            F.min("term").alias("term_lo"),
            F.max("term").alias("term_hi"),
            F.sum("doc_count").alias("postings_count"),
            F.sum("nbytes").alias("bytes"),
        )
        .collect()
    )
    _mark("lineage")
    postings = sum(int(r["postings_count"]) for r in landed)
    cat.append_manifest(
        [
            {
                "run_id": f"stream-epoch{epoch}",
                "partition_id": int(r["pid"]),
                "segment_id": f"gen{epoch}-p{int(r['pid'])}",
                "input_split": f"stream-epoch{epoch}",
                "term_lo": r["term_lo"],
                "term_hi": r["term_hi"],
                "postings_count": int(r["postings_count"]),
                "bytes": int(r["bytes"]),
                "status": "done",
            }
            for r in landed
        ]
    )

    # THE commit point: gen_stats lands last, so its presence implies every
    # other artifact of this generation is complete
    # the gen value rides the partition directory name (gen=E), not a data
    # column — partition discovery on the root supplies it at read time
    spark.createDataFrame(
        [
            (
                batch_n,
                batch_dl,
                batch_max_dl,
                batch_max_id,
                float(avgdl_build),
                n_batch_terms,
            )
        ],
        "n_docs long, sum_dl long, max_dl int, max_doc_id long, "
        "avgdl_build double, n_terms long",
    ).coalesce(1).write.mode("overwrite").parquet(gstats_dir)

    _mark("commit")
    _refresh_corpus_stats(spark, cat)
    _mark("stats_refresh")
    return IngestResult(
        epoch=epoch, skipped=False, n_docs=batch_n, postings=postings,
        avgdl_build=avgdl_build, wall_sec=round(time.time() - t0, 2),
        phase_sec=phase_t,
    )


def _ensure_stats_fresh(spark: SparkSession, cat: IndexCatalog) -> None:
    """Heal corpus_stats.json if a crash separated a generation's commit
    marker from its stats refresh (replay then skips the generation, so
    this is the only place the refresh can catch up)."""
    gens = _committed_gens(spark, cat.root)
    if not gens:
        return
    committed = [int(r["gen"]) for r in gens]
    if cat.has_corpus_stats():
        if cat.read_corpus_stats().get("generations") == committed:
            return
    _refresh_corpus_stats(spark, cat)


def _refresh_corpus_stats(spark: SparkSession, cat: IndexCatalog) -> dict:
    """Derive corpus_stats.json purely from committed gen_stats + the
    frozen geometry file (both replay-safe inputs)."""
    frozen = _read_frozen(cat.root)
    if frozen is None:
        raise FileNotFoundError(
            f"{_frozen_path(cat.root)} missing — not an incremental index, "
            "or generation 0 never committed"
        )
    cuts = list(frozen["term_cuts"])
    range_docs = int(frozen["range_docs"])
    block_docs = int(frozen["block_docs"])
    n_partitions = int(frozen["n_partitions"])
    gens = _committed_gens(spark, cat.root)
    n_docs = sum(int(r["n_docs"]) for r in gens)
    total_dl = sum(int(r["sum_dl"]) for r in gens)
    avgdl = total_dl / max(1, n_docs)
    scale = max(
        [1.0] + [avgdl / float(r["avgdl_build"]) for r in gens if r["avgdl_build"] > 0]
    )
    # dual of wand_bound_scale for the θ achievable FLOOR: when cumulative
    # avgdl SHRANK below a generation's build-time avgdl, that generation's
    # baked mtn is no longer attained by its block-max doc — but
    # tf_norm(a1) >= tf_norm(a0) * a1/a0 for a1 < a0 (the same linear bound,
    # shrink direction), so idf·mtn·min_g(avgdl_now/avgdl_g) IS attained.
    # 1.0 whenever avgdl only grew (the common case: ingest adds docs drawn
    # from the same distribution).
    floor_scale = min(
        [1.0] + [avgdl / float(r["avgdl_build"]) for r in gens if r["avgdl_build"] > 0]
    )
    stats = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "range_docs": range_docs,
        "block_docs": block_docs,
        "term_cuts": cuts,
        "n_partitions": n_partitions,
        # per-gen vocab sizes overlap across generations; the sum is only
        # compared against the engine's cache threshold, where an
        # overcount errs toward the distributed path — safe
        "n_terms": sum(int(r["n_terms"]) for r in gens),
        "max_dl": max([0] + [int(r["max_dl"]) for r in gens]),
        "corpus_path": "incremental",
        "wand_bound_scale": float(scale),
        "wand_floor_scale": float(floor_scale),
        "generations": [int(r["gen"]) for r in gens],
        "with_positions": bool(frozen.get("with_positions", False)),
        **(
            {"docvalues_cols": list(frozen["docvalues_cols"])}
            if frozen.get("docvalues_cols")
            else {}
        ),
    }
    cat.write_corpus_stats(stats)
    return stats


def stream_documents(spark: SparkSession, docs_dir: str, schema: str) -> DataFrame:
    """File-source stream of documents (new parquet files = new docs)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(docs_dir)
    )


def incremental_index_stream(
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    cfg: BuildConfig | None = None,
    id_col: str | None = None,
    expected_docs: int | None = None,
    available_now: bool = True,
):
    """Wire a document stream into the incremental index sink.

    ``availableNow`` drains everything currently in the source then stops —
    the batch-friendly trigger for tests and catch-up runs; pass
    ``available_now=False`` for a continuously-running micro-batch ingest.
    The checkpoint gives ordered, replayable epochs; ``ingest_batch``'s
    commit marker upgrades the replays to exactly-once.

    The index and its checkpoint are PAIRED: epoch numbers are the
    idempotence key, and a fresh checkpoint renumbers batches from 0 — so
    pointing a new checkpoint at an already-ingested index would silently
    skip every colliding batch.  A stream-id marker written into both
    directories turns that operator error into a loud ``ValueError``
    (recovering from a lost checkpoint means re-pairing deliberately:
    delete ``stream_id`` from the index dir, accepting that already-indexed
    files will re-ingest as new generations, or compact first).
    """
    spark = docs_stream.sparkSession

    import uuid

    os.makedirs(checkpoint_dir, exist_ok=True)
    ckpt_marker = os.path.join(checkpoint_dir, "_ses_stream_id")
    idx_marker = os.path.join(index_dir, "stream_id")
    ckpt_id = open(ckpt_marker).read() if os.path.exists(ckpt_marker) else None
    idx_id = open(idx_marker).read() if os.path.exists(idx_marker) else None
    if idx_id is not None and idx_id != ckpt_id:
        raise ValueError(
            f"index {index_dir} was ingested under a different checkpoint "
            f"(stream_id {idx_id!r} != {ckpt_id!r}); a fresh checkpoint "
            "renumbers epochs from 0 and its batches would be silently "
            "skipped — re-pair deliberately (see docstring)"
        )
    if ckpt_id is None:
        ckpt_id = uuid.uuid4().hex
        with open(ckpt_marker, "w") as f:
            f.write(ckpt_id)
    if idx_id is None:
        os.makedirs(index_dir, exist_ok=True)
        with open(idx_marker, "w") as f:
            f.write(ckpt_id)

    def sink(batch_df: DataFrame, epoch: int) -> None:
        ingest_batch(
            spark, batch_df, index_dir, epoch,
            cfg=cfg, id_col=id_col, expected_docs=expected_docs,
        )

    writer = (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
