"""Serving-grade IVF config: derived nprobe default + recall floor.

The gate verifies IVF *parity* at nprobe=2; these tests pin the *serving*
contract: ``ivf_topk_arrow`` with no explicit nprobe derives
``ivf_default_nprobe(ncells)`` and recalls ≥0.8 of brute-force top-k on a
corpus with real cluster structure (the regime IVF exists to serve — the
sf0.01 fixture's neighbors are adversarially flat, sweep in
BENCH/BASELINE.md).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_spark.operators.similarity import (
    brute_topk_arrow,
    ivf_default_nprobe,
    ivf_ncells,
    ivf_topk_arrow,
)

N_VEC = 500
N_CLUSTERS = 20
DIM = 64
QUERY_IDS = (0, 1, 2, 3, 4)


@pytest.fixture(scope="module")
def clustered_dir(tmp_path_factory):
    """500 unit vectors in 20 tight clusters (in-cluster cosine ≈0.997,
    cross-cluster ≈0) — written as an embeddings.parquet sf-dir."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(N_VEC) % N_CLUSTERS
    pts = centers[labels] + 0.05 * rng.standard_normal((N_VEC, DIM))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(N_VEC), type=pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in pts], type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    d = tmp_path_factory.mktemp("clustered_sf")
    pq.write_table(tbl, os.path.join(str(d), "embeddings.parquet"))
    return str(d)


def test_ivf_default_nprobe_derivation():
    # ceil(ncells/3), floored at 8 — never the parity value 2
    assert ivf_default_nprobe(8) == 8
    assert ivf_default_nprobe(22) == 8
    assert ivf_default_nprobe(45) == 15
    assert ivf_default_nprobe(1000) == 334
    assert ivf_default_nprobe(ivf_ncells(N_VEC)) >= 8


def test_ivf_arrow_training_matches_declarative(spark):
    """The matmul training path (the only form viable past ~10^5 vectors)
    produces bit-identical centroids to the posexplode-join form the SQL
    oracle verifies — same seed, same rounded averages, same rounded-
    distance argmin."""
    from search_engine_spark.operators.similarity import (
        ivf_assignments,
        ivf_train_arrow,
    )

    sf = "/root/testdata/sf0.01"
    _, _, _, cent_d = ivf_assignments(spark, sf, materialize_dist=False)
    a = ivf_train_arrow(spark, sf).toPandas().sort_values(["cell", "pos"]).reset_index(drop=True)
    d = cent_d.toPandas().sort_values(["cell", "pos"]).reset_index(drop=True)
    assert len(a) == len(d) > 0
    assert (a["cell"].to_numpy() == d["cell"].to_numpy()).all()
    assert (a["pos"].to_numpy() == d["pos"].to_numpy()).all()
    assert (a["c"].to_numpy() == d["c"].to_numpy()).all()


def _topk_sets(pdf, k):
    out = {}
    for qid, grp in pdf.groupby("qid"):
        out[int(qid)] = set(grp.sort_values("rk")["cid"].head(k).astype(int))
    return out


def test_ivf_serving_recall_floor(spark, clustered_dir):
    k = 3
    brute = _topk_sets(
        brute_topk_arrow(spark, clustered_dir, query_ids=QUERY_IDS, k=k).toPandas(), k
    )
    # no nprobe argument: this IS the serving default under test
    ivf = _topk_sets(
        ivf_topk_arrow(spark, clustered_dir, k=k, query_ids=QUERY_IDS).toPandas(), k
    )
    hits = sum(len(brute[q] & ivf.get(q, set())) for q in brute)
    total = sum(len(brute[q]) for q in brute)
    recall = hits / total
    assert recall >= 0.8, f"serving-default recall@{k} = {recall:.2f} < 0.8"
