"""Similarity search over the ``embeddings`` table.

- ``sim_knn_brute`` — exact cosine top-k for a fixed query set.  The scale
  path broadcasts the (tiny) query matrix and scans the corpus once; ranking
  happens on rounded scores with a vec_id tiebreak so float noise can't flip
  ranks between engines.
- ``sim_ann_ivf`` — real IVF ANN: √N coarse centroids trained from the
  data (seed average + a Lloyd reassign/re-average refinement), every
  vector assigned to its nearest centroid via a broadcast centroid join,
  search restricted to the query's ``nprobe`` nearest cells.  The oracle
  recomputes the identical train/assign/search pipeline in SQL; the
  serving path is ``ivf_topk_arrow`` (one Arrow corpus pass, no joins).
- ``sim_centroids`` — per-label centroid (the k-means M-step, gated
  separately).

A vectorized numpy/Arrow production kernel (broadcast query matrix, per-batch
matrix multiply inside ``mapInPandas``) lives in ``brute_topk_arrow`` below —
same results, one pass, no join; the declarative forms exist so DuckDB can
verify the math.
"""

from __future__ import annotations

import numpy as np

from ..numerics import round_half_away
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from ._common import t

_QUERY_IDS = (0, 1, 2, 3, 4)


def _pairs_scored(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    ev = e.select("vec_id", F.posexplode("embedding").alias("pos", "x"))
    norms = ev.groupBy("vec_id").agg(F.round(F.sum(F.col("x") * F.col("x")), 9).alias("nrm"))
    q = ev.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("qid"), "pos", F.col("x").alias("qx")
    )
    c = ev.select(F.col("vec_id").alias("cid"), "pos", F.col("x").alias("cx"))
    j = q.join(c, ["pos"]).filter(F.col("qid") != F.col("cid"))
    dots = j.groupBy("qid", "cid").agg(F.sum(F.col("qx") * F.col("cx")).alias("dot"))
    nq = norms.select(F.col("vec_id").alias("qid"), F.col("nrm").alias("nq"))
    nc = norms.select(F.col("vec_id").alias("cid"), F.col("nrm").alias("nc"))
    return (
        dots.join(nq, "qid")
        .join(nc, "cid")
        .withColumn("cosine", F.round(F.col("dot") / F.sqrt(F.col("nq") * F.col("nc")), 6))
    )


def _sql_pairs() -> str:
    ids = ", ".join(str(i) for i in _QUERY_IDS)
    return f"""
WITH ev AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos, unnest(embedding) AS x
  FROM embeddings
), norms AS (
  SELECT vec_id, round(SUM(x * x), 9) AS nrm FROM ev GROUP BY vec_id
), dots AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, SUM(q.x * c.x) AS dot
  FROM ev q JOIN ev c ON q.pos = c.pos AND q.vec_id <> c.vec_id
  WHERE q.vec_id IN ({ids})
  GROUP BY q.vec_id, c.vec_id
), scored AS (
  SELECT qid, cid, round(dot / sqrt(nq.nrm * nc.nrm), 6) AS cosine
  FROM dots
  JOIN norms nq ON nq.vec_id = qid
  JOIN norms nc ON nc.vec_id = cid
)
"""


def knn_brute(spark, sf_dir):
    scored = _pairs_scored(spark, sf_dir)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("qid", "cid", "cosine", "rk")
    )


KNN_BRUTE_SQL = _sql_pairs() + """
SELECT qid, cid, cosine, rk
FROM (SELECT qid, cid, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
      FROM scored)
WHERE rk <= 5
"""


# --------------------------------------------------------------------------
# real IVF: train coarse cells from the data (seed partition -> averaged
# centroids -> one Lloyd reassign/re-average refinement), assign every
# vector to its nearest centroid, then search only the query's nprobe
# nearest cells.  All arithmetic is declarative and mirrored in the SQL
# oracle; distances/cosines are rounded with id tiebreaks so float
# summation order can't flip an argmin or a rank.
#
# Scale shape: ncells GROWS with the corpus (≈ √N, so cell lists stay
# ~√N long and the assignment join stays O(N·√N) work spread map-side —
# at 10^9 vectors: ~31k cells), the centroid table (ncells x d) broadcasts,
# and each Lloyd iteration is one broadcast join + groupBy — no all-pairs
# stage anywhere.  The serving path is ``ivf_topk_arrow``: one corpus pass,
# numpy assignment + probe against broadcast centroids, per-partition
# bounded top-k — no posexplode row blowup.
# --------------------------------------------------------------------------

_NPROBE = 2  # GATE parity default only — see ivf_default_nprobe for serving
_TRAIN_ITERS = 2  # averaging steps: seed average + one Lloyd refinement


def ivf_ncells(n_vectors: int) -> int:
    """Coarse cell count ≈ √N (floor), never below 8."""
    import math

    return max(8, math.isqrt(max(n_vectors, 1)))


def ivf_default_nprobe(ncells: int) -> int:
    """Serving default: probe ceil(ncells/3) cells, at least 8.

    The gate keeps nprobe=2 because it verifies algorithm parity against
    the SQL oracle, but 2 as a *serving* default silently returns
    near-random neighbors on weak-structure corpora (recall@3 = 0.07 on the
    sf0.01 fixture, where top cosines are ~0.4 — sweep in BENCH/BASELINE.md).
    ceil(ncells/3) recalls ≥0.95 on clustered corpora (the regime IVF
    serves; pinned by ``test_ivf_serving_recall_floor``) and 0.47 on the
    adversarially-flat fixture — corpora that flat want nprobe → ncells
    (i.e. brute force; no cell partition can help when neighbors scatter
    uniformly across cells).
    """
    return max(8, -(-ncells // 3))


_NCELLS_SQL = "greatest(8, CAST(floor(sqrt(COUNT(*))) AS INT))"


def ivf_assignments(spark, sf_dir, ncells: int | None = None, materialize_dist: bool = True):
    """(ev, dist, assign, cent): trained centroids + nearest-cell per vector.

    Training: deterministic seed cells (vec_id % ncells) -> averaged
    centroids -> reassign -> re-average (``_TRAIN_ITERS`` averaging steps,
    i.e. one full Lloyd iteration past the seed).  Every average is rounded
    to 6 decimals (+0.0 normalizes IEEE -0.0) so the SQL oracle reproduces
    the training bit-for-bit.
    """
    e = t(spark, sf_dir, "embeddings")
    if ncells is None:
        ncells = ivf_ncells(e.count())
    ev = e.select("vec_id", F.posexplode("embedding").alias("pos", "x"))

    def dist_to(cent):
        return (
            ev.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "cell")
            .agg(
                F.round(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))), 6).alias("d")
            )
        )

    def argmin(dist):
        return (
            dist.groupBy("vec_id")
            .agg(F.min(F.struct("d", "cell")).alias("m"))
            .select("vec_id", F.col("m.cell").alias("cell"))
        )

    seed = ev.withColumn("cell", F.pmod(F.col("vec_id"), F.lit(ncells)).cast("int"))
    cent = (
        seed.groupBy("cell", "pos")
        .agg((F.round(F.avg("x"), 6) + F.lit(0.0)).alias("c"))
        .select("cell", "pos", "c")
    )
    for _ in range(_TRAIN_ITERS - 1):
        assign = argmin(dist_to(cent))
        cent = (
            ev.join(assign, "vec_id")
            .groupBy("cell", "pos")
            .agg((F.round(F.avg("x"), 6) + F.lit(0.0)).alias("c"))
            .select("cell", "pos", "c")
        )
    # materialize the trained centroids (ncells × dim — tiny) and, for the
    # declarative search path, the distance table (N × ncells): both fan
    # out into assignment and probe-cell selection, which otherwise
    # re-execute the whole training chain per reference.  The Arrow
    # serving kernel passes materialize_dist=False — it derives both
    # assignment and probe cells from the broadcast centroid matrix and
    # never executes the corpus × ncells shuffle at all.  At cluster
    # scale: .persist() (the distance table shards across executors).
    cent = cent.localCheckpoint()
    dist = dist_to(cent)
    if materialize_dist:
        dist = dist.localCheckpoint()
    assign = argmin(dist)
    return ev, dist, assign, cent


def ann_ivf(spark, sf_dir, nprobe: int = _NPROBE, k: int = 3):
    ev, dist, assign, _ = ivf_assignments(spark, sf_dir)
    # nprobe nearest cells per query vector (by centroid distance)
    wq = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("cell"))
    qcells = (
        dist.filter(F.col("vec_id").isin(*_QUERY_IDS))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select(F.col("vec_id").alias("qid"), "cell")
    )
    cands = (
        qcells.join(assign.select(F.col("vec_id").alias("cid"), "cell"), "cell")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
    )
    # score only what can appear in the output: the query side is the fixed
    # id set (filter pushes to the scan), the corpus side is semi-joined to
    # candidate ids — the exact-score shuffle is O(candidates × dim), never
    # corpus × dim (the serving path, ivf_topk_arrow, has no joins at all)
    qev = ev.filter(F.col("vec_id").isin(*_QUERY_IDS))
    cev = ev.join(cands.select(F.col("cid").alias("vec_id")).distinct(), "vec_id", "left_semi")
    a = qev.select(F.col("vec_id").alias("qid"), "pos", F.col("x").alias("qx"))
    b = cev.select(F.col("vec_id").alias("cid"), "pos", F.col("x").alias("cx"))
    dots = (
        cands.join(a, "qid")
        .join(b, ["cid", "pos"])
        .groupBy("qid", "cid")
        .agg(F.sum(F.col("qx") * F.col("cx")).alias("dot"))
    )
    nq = qev.groupBy("vec_id").agg(F.round(F.sum(F.col("x") * F.col("x")), 9).alias("nrm")) \
        .select(F.col("vec_id").alias("qid"), F.col("nrm").alias("nq"))
    nc = cev.groupBy("vec_id").agg(F.round(F.sum(F.col("x") * F.col("x")), 9).alias("nrm")) \
        .select(F.col("vec_id").alias("cid"), F.col("nrm").alias("nc"))
    scored = (
        dots.join(nq, "qid")
        .join(nc, "cid")
        .withColumn("cosine", F.round(F.col("dot") / F.sqrt(F.col("nq") * F.col("nc")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "cid", "cosine", "rk")
    )


_IVF_IDS = ", ".join(str(i) for i in _QUERY_IDS)

ANN_IVF_SQL = f"""
WITH ev AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos, unnest(embedding) AS x
  FROM embeddings
), params AS (
  SELECT {_NCELLS_SQL} AS nc FROM embeddings
), cent0 AS (
  SELECT CAST(vec_id % params.nc AS INT) AS cell, pos, round(AVG(x), 6) + 0.0 AS c
  FROM ev, params GROUP BY 1, pos
), dist0 AS (
  SELECT ev.vec_id, cent0.cell, round(SUM((ev.x - cent0.c) * (ev.x - cent0.c)), 6) AS d
  FROM ev JOIN cent0 ON cent0.pos = ev.pos
  GROUP BY ev.vec_id, cent0.cell
), assign0 AS (
  SELECT vec_id, cell
  FROM (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM dist0)
  WHERE rn = 1
), cent AS (
  SELECT a.cell, ev.pos, round(AVG(ev.x), 6) + 0.0 AS c
  FROM ev JOIN assign0 a ON a.vec_id = ev.vec_id
  GROUP BY a.cell, ev.pos
), dist AS (
  SELECT ev.vec_id, cent.cell, round(SUM((ev.x - cent.c) * (ev.x - cent.c)), 6) AS d
  FROM ev JOIN cent ON cent.pos = ev.pos
  GROUP BY ev.vec_id, cent.cell
), assign AS (
  SELECT vec_id, cell
  FROM (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM dist)
  WHERE rn = 1
), qcells AS (
  SELECT vec_id AS qid, cell
  FROM (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM dist WHERE vec_id IN ({_IVF_IDS}))
  WHERE rn <= {_NPROBE}
), cands AS (
  SELECT q.qid, a.vec_id AS cid
  FROM qcells q JOIN assign a ON a.cell = q.cell AND a.vec_id <> q.qid
), norms AS (
  SELECT vec_id, round(SUM(x * x), 9) AS nrm FROM ev GROUP BY vec_id
), dots AS (
  SELECT c.qid, c.cid, SUM(a.x * b.x) AS dot
  FROM cands c
  JOIN ev a ON a.vec_id = c.qid
  JOIN ev b ON b.vec_id = c.cid AND b.pos = a.pos
  GROUP BY c.qid, c.cid
), scored AS (
  SELECT qid, cid, round(dot / sqrt(nq.nrm * nc.nrm), 6) AS cosine
  FROM dots
  JOIN norms nq ON nq.vec_id = qid
  JOIN norms nc ON nc.vec_id = cid
)
SELECT qid, cid, cosine, rk
FROM (SELECT qid, cid, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
      FROM scored)
WHERE rk <= 3
"""


def centroids(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    ev = e.select("label", F.posexplode("embedding").alias("pos", "x"))
    # "+ 0.0" normalizes IEEE -0.0 to +0.0 (engines disagree on the sign of
    # a rounded near-zero mean)
    return (
        ev.groupBy("label", "pos")
        .agg((F.round(F.avg("x"), 3) + F.lit(0.0)).alias("c"), F.count("*").alias("n"))
    )


CENTROIDS_SQL = """
SELECT label, pos, round(AVG(x), 3) + 0.0 AS c, COUNT(*) AS n
FROM (SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
             unnest(embedding) AS x
      FROM embeddings)
GROUP BY label, pos
"""

# --------------------------------------------------------------------------
# production kernel: one-pass Arrow-vectorized brute-force top-k.
# Broadcast Q (k_q x d), per-batch C @ Q.T matrix multiply, per-partition
# bounded top-k, driver merge — zero joins, zero shuffles over the corpus.
# --------------------------------------------------------------------------

def brute_topk_arrow(spark, sf_dir, query_ids=_QUERY_IDS, k: int = 5):
    """One-pass brute top-k, arithmetic-identical to the declarative twin:
    float32 products (Spark multiplies two FLOAT columns in single
    precision before SUM's double accumulation), norms rounded to 9,
    cosine = round(dot / sqrt(nq·nc), 6), and every rank decision taken on
    the ROUNDED cosine with a cid tiebreak — so a near-tie can't order
    differently than the declarative/oracle path."""
    e = t(spark, sf_dir, "embeddings")
    qrows = e.filter(F.col("vec_id").isin(*list(query_ids))).select("vec_id", "embedding").collect()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float32)
    qn = round_half_away((qmat * qmat).astype(np.float64).sum(axis=1), 9)
    qb = spark.sparkContext.broadcast((qids, qmat, qn))

    import pyarrow as pa

    from ._common import iter_id_matrix

    def topk_part(batches):
        qids_, qmat_, qn_ = qb.value
        for cids, cmat in iter_id_matrix(batches):
            cn = round_half_away((cmat * cmat).astype(np.float64).sum(axis=1), 9)
            dots = (cmat[:, None, :] * qmat_[None, :, :]).astype(np.float64).sum(axis=2)
            sims = round_half_away(dots / np.sqrt(cn[:, None] * qn_[None, :]), 6)
            out_qid, out_cid, out_cos = [], [], []
            for qi, qid in enumerate(qids_):
                s = sims[:, qi]
                mask = cids != qid
                order = np.lexsort((cids[mask], -s[mask]))[:k]
                sel = np.flatnonzero(mask)[order]
                out_qid.append(np.full(len(sel), qid, dtype=np.int64))
                out_cid.append(cids[sel])
                out_cos.append(s[sel])
            yield pa.RecordBatch.from_pydict(
                {
                    "qid": pa.array(np.concatenate(out_qid)),
                    "cid": pa.array(np.concatenate(out_cid)),
                    "cosine": pa.array(np.concatenate(out_cos)),
                }
            )

    parts = e.select("vec_id", "embedding").mapInArrow(
        topk_part, schema="qid long, cid long, cosine double"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        parts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "cid", "cosine", "rk")
    )


# --------------------------------------------------------------------------
# Arrow IVF *training*: the declarative ivf_assignments computes every
# Lloyd distance via a posexplode join — corpus×dim rows joined against
# ncells×dim centroid rows, i.e. O(N·ncells) shuffled rows (6.4×10^10 at
# 1M vectors / 1000 cells).  That form exists so DuckDB can verify the
# training bit-for-bit; at scale the assignment step must be a matmul.
# This path computes the SAME training math (seed cells = vec_id % ncells,
# round(avg, 6)+0.0 centroids, round(||x−c||², 6) argmin with ascending-
# cell tiebreak) but each training step — seed average AND Lloyd
# reassign/re-average — is one Arrow corpus pass emitting per-partition
# partial sums; the only shuffle per step is partitions × ncells × dim
# partial rows.  Parity with the declarative training is pinned by
# test_ivf_arrow_training_matches_declarative.
# --------------------------------------------------------------------------


def _cent_matrix(cent_pdf, dim: int = 64):
    cells = np.sort(cent_pdf["cell"].unique()).astype(np.int64)
    cix = {int(c): i for i, c in enumerate(cells)}
    cmat = np.zeros((len(cells), dim), dtype=np.float64)
    for cell, pos, c in zip(cent_pdf["cell"], cent_pdf["pos"], cent_pdf["c"]):
        cmat[cix[int(cell)], int(pos)] = c
    return cells, cmat


def _assign_chunked(X, cmat, c2, chunk: int | None = None):
    """Nearest-centroid assignment indices: round(||x−c||², 6) argmin with
    ascending-cell tiebreak (argmin's first-minimum over the cell-ascending
    column order IS that rule).

    Chunked so the (rows × ncells) float64 distance matrix stays ~2 MB —
    CACHE-resident — at any ncells.  This is a memory-bandwidth problem,
    not a flops problem: a 100k-row Arrow batch × 1000 cells materializes
    ~800 MB of distance temporaries per worker, and with 32 concurrent
    workers the host's DRAM bandwidth collapses (measured on the 1M-vector
    corpus: 25 s per 31k-row task at a 64 MB chunk vs 0.69 s at a 2 MB
    chunk — same machine, same math, 32-way concurrency; one Lloyd pass
    cost 3,365 s of executor time before this fix + the session-level
    BLAS thread cap)."""
    ncells = len(c2)
    if chunk is None:
        chunk = max(64, (2 << 20) // (8 * max(ncells, 1)))
    out = np.empty(len(X), dtype=np.int64)
    for s in range(0, len(X), chunk):
        Xc = X[s : s + chunk]
        x2 = (Xc * Xc).sum(axis=1)
        D = round_half_away(x2[:, None] + c2[None, :] - 2.0 * (Xc @ cmat.T), 6)
        out[s : s + chunk] = np.argmin(D, axis=1)
    return out


def _cell_partials_arrow(e, assigner, ncells: int, dim: int = 64):
    """One corpus pass -> per-partition partial (cell, pos, psum, pcnt).

    ``assigner(ids, X) -> cell index array``.  Each partition accumulates a
    dense (ncells x dim) partial-sum matrix and emits AT MOST ncells*dim
    rows — so a Lloyd re-average shuffles O(partitions * ncells * dim)
    rows instead of the N*dim posexploded corpus (64M rows at 1M vectors;
    at 10^9 vectors the posexplode re-average would shuffle 6.4e10 rows
    per iteration while this stays at partitions * 2M).  The average
    sum(psum)/sum(pcnt) is the same double arithmetic Spark's partial-
    aggregating F.avg performs; order noise is absorbed by round(.,6)
    per the _common.py policy."""

    import pyarrow as pa

    from ._common import iter_id_matrix

    def partials(batches):
        sums = np.zeros((ncells, dim), dtype=np.float64)
        cnts = np.zeros(ncells, dtype=np.int64)
        for ids, X32 in iter_id_matrix(batches, dim=dim):
            X = X32.astype(np.float64)
            idx = assigner(ids, X)
            # per-dim weighted bincount beats np.add.at's unbuffered
            # scatter ~10x; summation-order noise between the two is
            # absorbed by the shared round(avg, 6) rule
            for d in range(dim):
                sums[:, d] += np.bincount(idx, weights=X[:, d], minlength=ncells)
            cnts += np.bincount(idx, minlength=ncells)
        nz = np.flatnonzero(cnts)
        if len(nz) == 0:
            return
        yield pa.RecordBatch.from_pydict(
            {
                "cell": pa.array(np.repeat(nz, dim).astype(np.int32), pa.int32()),
                "pos": pa.array(np.tile(np.arange(dim, dtype=np.int32), len(nz)), pa.int32()),
                "psum": pa.array(sums[nz].reshape(-1)),
                "pcnt": pa.array(np.repeat(cnts[nz], dim)),
            }
        )

    return e.select("vec_id", "embedding").mapInArrow(
        partials, schema="cell int, pos int, psum double, pcnt long"
    )


def ivf_train_arrow(spark, sf_dir, ncells: int | None = None):
    """Trained (cell, pos, c) centroids, Arrow-trained — the scale path.

    Identical training schedule to ``ivf_assignments`` (_TRAIN_ITERS
    averaging steps: seed cells = vec_id % ncells, then Lloyd
    reassign/re-average via the shared rounded-distance argmin), but with
    ZERO posexplode anywhere: every step is one matmul/scatter-add corpus
    pass emitting per-partition partial sums, combined by a tiny
    groupBy(cell, pos) over partitions x ncells x dim rows.  Centroid
    parity with the declarative form is pinned by
    test_ivf_arrow_training_matches_declarative."""
    e = t(spark, sf_dir, "embeddings")
    if ncells is None:
        ncells = ivf_ncells(e.count())

    def reavg(partials):
        return partials.groupBy("cell", "pos").agg(
            (F.round(F.sum("psum") / F.sum("pcnt"), 6) + F.lit(0.0)).alias("c")
        )

    cent = reavg(
        _cell_partials_arrow(e, lambda ids, X: (ids % ncells).astype(np.int64), ncells)
    )
    for _ in range(_TRAIN_ITERS - 1):
        cells, cmat = _cent_matrix(cent.toPandas())
        c2 = (cmat * cmat).sum(axis=1)

        def lloyd_assign(ids, X, cmat=cmat, c2=c2):
            return _assign_chunked(X, cmat, c2)

        # argmin index == cell id: cells is the sorted unique cell array and
        # seed cells are 0..ncells-1 dense, but map through `cells` anyway
        # in case a cell emptied out during Lloyd
        part = _cell_partials_arrow(
            e, lambda ids, X: cells[lloyd_assign(ids, X)], len(cells) and int(cells.max()) + 1
        )
        cent = reavg(part)
    return cent.localCheckpoint()


# --------------------------------------------------------------------------
# production IVF serving kernel: broadcast the trained centroid matrix
# (ncells x d — ~√N rows, small by construction), then ONE corpus pass in
# Arrow batches: numpy nearest-centroid assignment, probe-cell filtering,
# per-partition bounded top-k.  No posexplode (the declarative form
# multiplies corpus rows x dim for the oracle's benefit), no join over the
# corpus.  Gated against ANN_IVF_SQL exactly like sim_knn_brute_kernel.
# --------------------------------------------------------------------------

def ivf_topk_arrow(
    spark, sf_dir, nprobe: int | None = None, k: int = 3, query_ids=_QUERY_IDS,
    train: str = "arrow",
):
    """IVF serving kernel.  ``nprobe=None`` derives the serving default from
    the trained cell count (``ivf_default_nprobe``); the gate passes the
    parity value explicitly.  ``train`` picks the centroid-training path:
    ``"arrow"`` (default — matmul Lloyd assignment, the only form viable
    past ~10^5 vectors) or ``"declarative"`` (the posexplode-join form the
    SQL oracle mirrors; the gate pins it)."""
    e = t(spark, sf_dir, "embeddings")
    if train == "arrow":
        cent = ivf_train_arrow(spark, sf_dir)
    elif train == "declarative":
        # training only — the corpus × ncells distance table is NOT
        # materialized for serving (probe cells and assignments both derive
        # from the tiny centroid matrix below)
        _, _, _, cent = ivf_assignments(spark, sf_dir, materialize_dist=False)
    else:
        raise ValueError(f"train must be 'arrow' or 'declarative'; got {train!r}")

    # centroid matrix: ncells x d — driver-small by construction (√N rows;
    # the corpus never leaves executors)
    cells, cmat = _cent_matrix(cent.toPandas())
    if nprobe is None:
        nprobe = ivf_default_nprobe(len(cells))
    c2 = (cmat * cmat).sum(axis=1)  # ||c||² per cell, reused by every batch

    qrows = e.filter(F.col("vec_id").isin(*list(query_ids))).select("vec_id", "embedding").collect()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q32 = np.array([r["embedding"] for r in qrows], dtype=np.float32)
    qmat = q32.astype(np.float64)
    qnrm = round_half_away((q32 * q32).astype(np.float64).sum(axis=1), 9)

    # nprobe nearest cells per query, computed on the driver from cmat with
    # the shared rounding rule: round(||q-c||^2, 6), ties broken by
    # ascending cell (cells is sorted, lexsort is stable on it)
    # per-query probe set as a boolean mask over CELL INDEX (not id), so
    # batch-side membership is one O(rows) gather instead of np.isin's
    # sort-based search per query per batch
    qmask = np.zeros((len(qids), len(cells)), dtype=bool)
    for qi, qid in enumerate(qids):
        diff = qmat[qi] - cmat
        d = round_half_away((diff * diff).sum(axis=1), 6)
        qmask[qi, np.lexsort((cells, d))[:nprobe]] = True
    bc = spark.sparkContext.broadcast((cells, cmat, c2, qids, q32, qnrm, qmask))

    import pyarrow as pa

    from ._common import iter_id_matrix

    def probe_part(batches):
        cells_, cmat_, c2_, qids_, q32_, qnrm_, qmask_ = bc.value
        for cids, X32 in iter_id_matrix(batches):
            X = X32.astype(np.float64)
            # nearest-centroid assignment, mirroring the declarative rule:
            # round(||x-c||^2, 6) argmin with ascending-cell tiebreak —
            # vectorized ||x||² + ||c||² − 2·X@C.T in bounded chunks (the
            # per-cell Python loop this replaces cost ncells=√N iterations
            # per Arrow batch; the unchunked matmul materialized ~800 MB of
            # distance temporaries per 100k-row batch).
            # (x promotes to double against double centroids — FLOAT*DOUBLE
            # is double in the declarative plan too.)
            assigned_ix = _assign_chunked(X, cmat_, c2_)
            # cosine against the query is FLOAT*FLOAT in the declarative
            # plan: float32 products, double accumulation (_common.py policy)
            cnrm = round_half_away((X32 * X32).astype(np.float64).sum(axis=1), 9)
            out_qid, out_cid, out_cos = [], [], []
            for qi, qid in enumerate(qids_):
                mask = qmask_[qi][assigned_ix] & (cids != qid)
                if not mask.any():
                    continue
                dots = (X32[mask] * q32_[qi][None, :]).astype(np.float64).sum(axis=1)
                cos = round_half_away(dots / np.sqrt(qnrm_[qi] * cnrm[mask]), 6)
                sel_ids = cids[mask]
                order = np.lexsort((sel_ids, -cos))[:k]
                out_qid.append(np.full(len(order), qid, dtype=np.int64))
                out_cid.append(sel_ids[order])
                out_cos.append(cos[order])
            if out_qid:
                yield pa.RecordBatch.from_pydict(
                    {
                        "qid": pa.array(np.concatenate(out_qid)),
                        "cid": pa.array(np.concatenate(out_cid)),
                        "cosine": pa.array(np.concatenate(out_cos)),
                    }
                )

    parts = e.select("vec_id", "embedding").mapInArrow(
        probe_part, schema="qid long, cid long, cosine double"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        parts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "cid", "cosine", "rk")
    )


QUERIES = {
    "sim_knn_brute": knn_brute,
    # the production kernels are gated against the same SQL oracles as the
    # declarative join forms — the scale path is what gets verified
    "sim_knn_brute_kernel": brute_topk_arrow,
    "sim_ann_ivf": ann_ivf,
    # gate pins the parity nprobe + declarative training explicitly (the
    # oracle SQL bakes both in); bare ivf_topk_arrow(...) serves at
    # ivf_default_nprobe(ncells) with Arrow-matmul training
    "sim_ann_ivf_kernel": lambda spark, sf_dir: ivf_topk_arrow(
        spark, sf_dir, nprobe=_NPROBE, train="declarative"
    ),
    "sim_centroids": centroids,
}

ORACLES = {
    "sim_knn_brute": KNN_BRUTE_SQL,
    "sim_knn_brute_kernel": KNN_BRUTE_SQL,
    "sim_ann_ivf": ANN_IVF_SQL,
    "sim_ann_ivf_kernel": ANN_IVF_SQL,
    "sim_centroids": CENTROIDS_SQL,
}
