"""Similarity search over the ``embeddings`` table.

- ``sim_knn_brute`` — exact cosine top-k for a fixed query set.  The scale
  path broadcasts the (tiny) query matrix and scans the corpus once; ranking
  happens on rounded scores with a vec_id tiebreak so float noise can't flip
  ranks between engines.
- ``sim_ann_ivf`` — IVF-style bucketed ANN: candidates restricted to the
  query's coarse cell (the ``label`` column stands in for a k-means
  assignment; at scale the cell id comes from a centroid join computed the
  same declarative way as ``sim_centroids``).
- ``sim_centroids`` — per-cell centroid (the IVF training step's M-step).

A vectorized numpy/Arrow production kernel (broadcast query matrix, per-batch
matrix multiply inside ``mapInPandas``) lives in ``brute_topk_arrow`` below —
same results, one pass, no join; the declarative forms exist so DuckDB can
verify the math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from ._common import t

_QUERY_IDS = (0, 1, 2, 3, 4)


def _pairs_scored(spark, sf_dir, same_label_only: bool):
    e = t(spark, sf_dir, "embeddings")
    ev = e.select("vec_id", "label", F.posexplode("embedding").alias("pos", "x"))
    norms = ev.groupBy("vec_id").agg(F.round(F.sum(F.col("x") * F.col("x")), 9).alias("nrm"))
    q = ev.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("qlabel"), "pos", F.col("x").alias("qx")
    )
    c = ev.select(
        F.col("vec_id").alias("cid"), F.col("label").alias("clabel"), "pos", F.col("x").alias("cx")
    )
    cond = ["pos"]
    j = q.join(c, cond).filter(F.col("qid") != F.col("cid"))
    if same_label_only:
        j = j.filter(F.col("qlabel") == F.col("clabel"))
    dots = j.groupBy("qid", "cid").agg(F.sum(F.col("qx") * F.col("cx")).alias("dot"))
    nq = norms.select(F.col("vec_id").alias("qid"), F.col("nrm").alias("nq"))
    nc = norms.select(F.col("vec_id").alias("cid"), F.col("nrm").alias("nc"))
    return (
        dots.join(nq, "qid")
        .join(nc, "cid")
        .withColumn("cosine", F.round(F.col("dot") / F.sqrt(F.col("nq") * F.col("nc")), 6))
    )


def _sql_pairs(same_label_pred: str) -> str:
    ids = ", ".join(str(i) for i in _QUERY_IDS)
    return f"""
WITH ev AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS pos, unnest(embedding) AS x
  FROM embeddings
), norms AS (
  SELECT vec_id, round(SUM(x * x), 9) AS nrm FROM ev GROUP BY vec_id
), dots AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, SUM(q.x * c.x) AS dot
  FROM ev q JOIN ev c ON q.pos = c.pos AND q.vec_id <> c.vec_id {same_label_pred}
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
    scored = _pairs_scored(spark, sf_dir, same_label_only=False)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("qid", "cid", "cosine", "rk")
    )


KNN_BRUTE_SQL = _sql_pairs("") + """
SELECT qid, cid, cosine, rk
FROM (SELECT qid, cid, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
      FROM scored)
WHERE rk <= 5
"""


def ann_ivf(spark, sf_dir):
    scored = _pairs_scored(spark, sf_dir, same_label_only=True)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("qid", "cid", "cosine", "rk")
    )


ANN_IVF_SQL = _sql_pairs("AND q.label = c.label") + """
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
    e = t(spark, sf_dir, "embeddings")
    qrows = e.filter(F.col("vec_id").isin(*list(query_ids))).select("vec_id", "embedding").collect()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    qb = spark.sparkContext.broadcast((qids, qmat))

    def topk_part(it):
        qids_, qmat_ = qb.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            cids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cmat = np.array(list(pdf["embedding"]), dtype=np.float64)
            cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
            sims = cmat @ qmat_.T  # (n_batch, n_q)
            out = []
            for qi, qid in enumerate(qids_):
                s = sims[:, qi]
                mask = cids != qid
                order = np.lexsort((cids[mask], -s[mask]))[:k]
                sel = np.flatnonzero(mask)[order]
                out.append(
                    pd.DataFrame({"qid": qid, "cid": cids[sel], "cosine": s[sel]})
                )
            yield pd.concat(out, ignore_index=True)

    parts = e.select("vec_id", "embedding").mapInPandas(
        topk_part, schema="qid long, cid long, cosine double"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        parts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "cid", F.round("cosine", 6).alias("cosine"), "rk")
    )


QUERIES = {
    "sim_knn_brute": knn_brute,
    "sim_ann_ivf": ann_ivf,
    "sim_centroids": centroids,
}

ORACLES = {
    "sim_knn_brute": KNN_BRUTE_SQL,
    "sim_ann_ivf": ANN_IVF_SQL,
    "sim_centroids": CENTROIDS_SQL,
}
