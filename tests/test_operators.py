"""Operator-library gate: every Spark operator vs its DuckDB oracle at
sf0.001, mirroring the driver's correctness check (row count, column names,
order-insensitive value hash)."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

from search_engine_spark.operators import all_oracles, all_queries
from search_engine_spark.operators._common import TABLES


def canon(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    pdf = pdf[cols].copy()
    for c in cols:
        col = pdf[c]
        if str(col.dtype).startswith("datetime"):
            pdf[c] = col.astype("datetime64[us]").astype(str)
        elif col.dtype.kind == "f":
            pdf[c] = col.map(lambda v: f"{v:.9f}")
        else:
            pdf[c] = col.astype(str)
    rows = sorted(map(tuple, pdf.itertuples(index=False, name=None)))
    return len(rows), cols, hashlib.md5(repr(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TABLES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con


_QUERIES = all_queries()
_ORACLES = all_oracles()
_GATED = sorted(n for n in _QUERIES if n in _ORACLES)
_ROWS_ONLY = sorted(n for n in _QUERIES if n not in _ORACLES)


@pytest.mark.parametrize("name", _GATED)
def test_gated_operator_matches_oracle(name, spark, sf_dir, duck):
    sdf = _QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.sql(_ORACLES[name]).df()
    ns, cs, hs = canon(sdf)
    no, co, ho = canon(odf)
    assert ns == no, f"{name}: rowcount {ns} != {no}"
    assert cs == co, f"{name}: columns {cs} != {co}"
    assert hs == ho, f"{name}: value hash mismatch"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_operator_runs(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_arrow_brute_topk_matches_declarative(spark, sf_dir):
    """The one-pass numpy kernel returns the same neighbors as the join plan."""
    from search_engine_spark.operators.similarity import brute_topk_arrow, knn_brute

    a = brute_topk_arrow(spark, sf_dir, k=5).toPandas()
    b = knn_brute(spark, sf_dir).toPandas()
    a = a.sort_values(["qid", "rk"]).reset_index(drop=True)
    b = b.sort_values(["qid", "rk"]).reset_index(drop=True)
    assert list(a["cid"]) == list(b["cid"])
    assert (a["cosine"] - b["cosine"]).abs().max() < 1e-6


def test_ppm_codec_contract():
    """The real P6 decoder: round-trip, geometry, and strict rejection."""
    import numpy as np
    import pytest as _pytest

    from search_engine_spark.operators.multimodal import decode_ppm, synthesize_ppm

    img = decode_ppm(synthesize_ppm("hello world", w=16, h=8))
    assert img.shape == (8, 16, 3) and img.dtype.name == "uint8"
    # handcrafted 2x1 image: red pixel then blue pixel
    raw = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 0, 255])
    img2 = decode_ppm(raw)
    assert img2.shape == (1, 2, 3)
    assert img2[0, 0].tolist() == [255, 0, 0] and img2[0, 1].tolist() == [0, 0, 255]
    for bad in (b"P5\n1 1\n255\n\x00", b"P6\n2 1\n255\n\x00", b"P6\n2 1\n65535\n" + bytes(12)):
        with _pytest.raises(ValueError):
            decode_ppm(bad)
    assert (np.sort(np.unique(img)) >= 0).all()


def test_wav_codec_contract():
    """The real PCM16 WAV decoder: round-trip, values, strict rejection."""
    import struct

    import numpy as np
    import pytest as _pytest

    from search_engine_spark.operators.multimodal import decode_wav_pcm16, synthesize_wav

    pcm = decode_wav_pcm16(synthesize_wav("hello", frames=64))
    assert pcm.shape == (64, 2) and pcm.dtype == np.dtype("<i2")
    # handcrafted mono file with known samples
    data = np.array([-1, 0, 32767], dtype="<i2").tobytes()
    raw = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assert decode_wav_pcm16(raw).reshape(-1).tolist() == [-1, 0, 32767]
    for bad in (b"RIFX" + raw[4:], raw[:40] + struct.pack("<I", 999) + data):
        with _pytest.raises(ValueError):
            decode_wav_pcm16(bad)


def test_codec_roundtrip_properties():
    """encode->decode identity for arbitrary images and PCM buffers."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from search_engine_spark.operators.multimodal import (
        decode_ppm,
        decode_wav_pcm16,
        encode_ppm,
        encode_wav,
    )

    @given(
        arrays(
            np.uint8,
            st.tuples(st.integers(1, 8), st.integers(1, 8), st.just(3)),
        )
    )
    @settings(max_examples=50, deadline=None)
    def ppm_roundtrip(img):
        assert (decode_ppm(encode_ppm(img)) == img).all()

    @given(
        arrays(
            np.dtype("<i2"),
            st.tuples(st.integers(1, 32), st.integers(1, 3)),
        )
    )
    @settings(max_examples=50, deadline=None)
    def wav_roundtrip(pcm):
        assert (decode_wav_pcm16(encode_wav(pcm)) == pcm).all()

    ppm_roundtrip()
    wav_roundtrip()


def test_png_codec_contract():
    """The real stdlib-zlib PNG codec: strict parse, CRC check, filters."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from search_engine_spark.operators.multimodal import (
        decode_png,
        encode_png,
        synthesize_png,
    )

    img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    for ft in range(5):  # every filter type round-trips alone
        assert (decode_png(encode_png(img, row_filters=[ft] * 4)) == img).all()
    # mixed per-row filters (what synthesize_png emits) round-trip too
    syn = synthesize_png("hello", w=6, h=5)
    assert decode_png(syn).shape == (5, 6, 3)
    # RGBA
    rgba = np.arange(3 * 4 * 4, dtype=np.uint8).reshape(3, 4, 4)
    assert (decode_png(encode_png(rgba)) == rgba).all()

    good = encode_png(img)
    # corrupt one IDAT byte -> CRC failure must raise, not decode garbage
    idat_at = good.find(b"IDAT") + 4
    bad_crc = good[:idat_at] + bytes([good[idat_at] ^ 0xFF]) + good[idat_at + 1 :]
    for bad in (
        b"JUNK" + good[4:],             # bad signature
        good[:40],                      # truncated
        bad_crc,                        # CRC mismatch
    ):
        with _pytest.raises(ValueError):
            decode_png(bad)
    # 16-bit / interlaced headers rejected loudly
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr16)) + b"IHDR" + ihdr16 + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr16) & 0xFFFFFFFF
    )
    with _pytest.raises(ValueError):
        decode_png(good[:8] + chunk + good[8 + 12 + 13 :])


def test_png_roundtrip_property():
    """encode->decode identity over arbitrary images and filter rows."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from search_engine_spark.operators.multimodal import decode_png, encode_png

    @given(
        arrays(
            np.uint8,
            st.tuples(st.integers(1, 8), st.integers(1, 8), st.sampled_from([3, 4])),
        ),
        st.randoms(use_true_random=False),
    )
    @settings(max_examples=50, deadline=None)
    def png_roundtrip(img, rnd):
        filters = [rnd.randint(0, 4) for _ in range(img.shape[0])]
        assert (decode_png(encode_png(img, row_filters=filters)) == img).all()

    png_roundtrip()


def test_y4m_codec_contract():
    """The real Y4M parser: round-trip, frame count, strict rejection."""
    import pytest as _pytest

    from search_engine_spark.operators.multimodal import decode_y4m, synthesize_y4m

    frames = decode_y4m(synthesize_y4m("hello", n_frames=3, w=4, h=2))
    assert len(frames) == 3
    assert frames[0]["y"].shape == (2, 4) and set(frames[0]) == {"y", "u", "v"}
    for bad in (
        b"JUNK W4 H2\nFRAME\n" + bytes(24),
        b"YUV4MPEG2 W4 H2 C420\nFRAME\n" + bytes(24),  # unsupported subsampling
        b"YUV4MPEG2 W4 H2 C444\nFRAME\n" + bytes(10),  # truncated planes
    ):
        with _pytest.raises(ValueError):
            decode_y4m(bad)


def test_jpeg_codec_contract():
    """The real baseline JPEG codec: exactness on flat blocks, bounded
    error on general images, restart markers, strict rejection."""
    import numpy as np
    import pytest as _pytest

    from search_engine_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(7)
    # flat 8x8 blocks + unit quant round-trip EXACTLY (the gate's contract)
    vals = rng.integers(0, 256, size=(2, 4), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    assert (decode_jpeg(encode_jpeg_baseline(img))[:, :, 0] == img).all()
    # ... including through restart markers (DC prediction resets)
    assert (
        decode_jpeg(encode_jpeg_baseline(img, restart_interval=3))[:, :, 0] == img
    ).all()

    # general grayscale with unit quant: only FDCT-quantize-IDCT float
    # noise remains, bounded by a couple of gray levels
    g = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg_baseline(g))[:, :, 0]
    assert np.abs(d.astype(int) - g.astype(int)).max() <= 2

    # odd (non-multiple-of-8) dimensions pad at encode and crop at decode
    o = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    do = decode_jpeg(encode_jpeg_baseline(o))
    assert do.shape == (13, 21, 1)
    assert np.abs(do[:, :, 0].astype(int) - o.astype(int)).max() <= 2

    # color 4:4:4: adds YCbCr<->RGB rounding, still tightly bounded
    c = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    dc = decode_jpeg(encode_jpeg_baseline(c))
    assert dc.shape == (16, 16, 3)
    assert np.abs(dc.astype(int) - c.astype(int)).max() <= 4

    # color 4:2:0 on a horizontally-smooth image (chroma constant per 2x2)
    base = np.linspace(0, 255, 32).astype(np.uint8)
    sm = np.stack([np.tile(base, (32, 1))] * 3, axis=-1)
    d420 = decode_jpeg(encode_jpeg_baseline(sm, subsampling="420"))
    assert np.abs(d420.astype(int) - sm.astype(int)).max() <= 2

    # a real quant table quantizes: error scales with the table, shape holds
    q = np.clip(np.arange(1, 65).reshape(8, 8), 1, 255)
    dq = decode_jpeg(encode_jpeg_baseline(g, quant_luma=q))
    assert dq.shape == (24, 40, 1)

    good = encode_jpeg_baseline(img)
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    sof_at = good.find(b"\xff\xc0")
    bad_samp = (
        good[: sof_at + 13] + b"\x33" + good[sof_at + 14 :]
    )  # sampling 3x3 in the (single-component) SOF
    for bad in (b"nope", good[:40], good[:-20], progressive, bad_samp):
        with _pytest.raises(ValueError):
            decode_jpeg(bad)


def test_jpeg_flat_roundtrip_property():
    """Flat-block exactness (the SQL-verifiability contract) over arbitrary
    block values, geometries, and restart intervals."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from search_engine_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    @given(
        arrays(np.uint8, st.tuples(st.integers(1, 4), st.integers(1, 4))),
        st.integers(0, 3),
    )
    @settings(max_examples=40, deadline=None)
    def flat_roundtrip(vals, rst):
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
        dec = decode_jpeg(encode_jpeg_baseline(img, restart_interval=rst))
        assert (dec[:, :, 0] == img).all()

    flat_roundtrip()


def test_jpeg_synthesize_digest_exactness():
    """synthesize_jpeg's decoded pixels ARE the digest bytes — the identity
    the mm_decode_jpeg_features oracle relies on."""
    import hashlib

    import numpy as np

    from search_engine_spark.operators.jpegcodec import decode_jpeg
    from search_engine_spark.operators.multimodal import synthesize_jpeg

    text = "hello world"
    img = decode_jpeg(synthesize_jpeg(text))
    d = np.frombuffer(
        hashlib.sha256(text.encode() + b"j").digest(), dtype=np.uint8
    )[:8].reshape(2, 4)
    assert (img[:, :, 0] == np.repeat(np.repeat(d, 8, axis=0), 8, axis=1)).all()
    assert float(img.mean()) == float(d.mean())


def test_multimodal_stub_contract(spark, sf_dir):
    from search_engine_spark.operators.multimodal import decode_image_stub, extract_features

    with pytest.raises(NotImplementedError):
        decode_image_stub(b"payload")
    img = decode_image_stub(b"payload", fake=True)
    assert img.shape == (32, 32, 3) and img.dtype.name == "uint8"

    feats = extract_features(spark, sf_dir).toPandas()
    assert set(feats.columns) == {"doc_id", "mean_r", "mean_g", "mean_b"}
    assert len(feats) == spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert feats[["mean_r", "mean_g", "mean_b"]].notna().all().all()


def test_shingles_short_docs_yield_no_rows(spark):
    """Docs with < 4 tokens must emit zero shingles, not crash.

    Spark's sequence(1, size-3) infers step -1 when size < 4 and the
    downstream slice(toks, 0, 4) throws; the guard mirrors the oracle's
    empty range(1, 1).
    """
    from search_engine_spark.operators.dedup import _shingles_from

    d = spark.createDataFrame(
        [(1, "one two three"), (2, "a b"), (3, ""), (4, "w x y z extra")],
        "doc_id long, text string",
    )
    out = _shingles_from(d).toPandas()
    assert set(out["doc_id"]) == {4}
    assert sorted(out["shingle"]) == ["w x y z", "x y z extra"]


def test_minhash_ladder_recall_floor(spark, tmp_path):
    """Candidate recall of the minhash/LSH ladder on a corpus with realistic
    dedup structure: mostly-distinct docs plus injected near-identical
    clones (token jaccard ≈0.9).  The ladder must surface ≥90% of the
    planted clone pairs as candidates, while enumerating far fewer pairs
    than all-pairs (the bound that makes it the scale path).

    The sf0.01 fixture can NOT pin this floor honestly: 92k of its 125k
    doc pairs exceed the verify threshold (a wall-to-wall boilerplate
    corpus), so band buckets blow past the degeneracy cap and get dropped
    by design — measured candidate recall there is ~0.05, the documented
    cap-vs-boilerplate tradeoff (such corpora are exact-dedup jobs, not
    LSH jobs).  On separable corpora — the regime MinHash-LSH exists for —
    the ladder recalls planted pairs near-perfectly.
    """
    import os
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_spark.operators.dedup import lsh_candidate_pairs

    rng = random.Random(11)

    def word():
        return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(8))

    n_base, n_tok = 120, 40
    docs, planted = [], []
    for i in range(n_base):
        toks = [word() for _ in range(n_tok)]
        docs.append((2 * i, " ".join(toks)))
        clone = list(toks)
        for j in rng.sample(range(n_tok), 2):  # ~2/40 edits -> jaccard ≈0.905
            clone[j] = word()
        docs.append((2 * i + 1, " ".join(clone)))
        planted.append((2 * i, 2 * i + 1))
    d = tmp_path / "clone_sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([x[0] for x in docs], type=pa.int64()),
                "text": pa.array([x[1] for x in docs]),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    cand = {
        (int(r["doc1"]), int(r["doc2"]))
        for r in lsh_candidate_pairs(spark, str(d)).collect()
    }
    hits = sum(1 for p in planted if p in cand)
    recall = hits / len(planted)
    assert recall >= 0.9, f"minhash-ladder candidate recall {recall:.2f} < 0.9"
    # pair enumeration stays bucket-bounded: nowhere near the 28k all-pairs
    n_docs = len(docs)
    assert len(cand) < n_docs * (n_docs - 1) / 8, len(cand)


def test_dedup_decisions_distributed_matches_driver(spark, sf_dir):
    """The distributed min-label fixpoint loop == the driver union-find fast
    path, row for row (same budget-takeover policy the query engine uses)."""
    from search_engine_spark.operators.dedup import dedup_decisions

    drv = dedup_decisions(spark, sf_dir).toPandas()
    dist = dedup_decisions(spark, sf_dir, driver_budget=-1).toPandas()
    key = ["doc_id"]
    drv = drv.sort_values(key).reset_index(drop=True)
    dist = dist.sort_values(key).reset_index(drop=True)
    assert len(drv) == len(dist) > 0
    for c in ["doc_id", "keep_doc", "is_dup"]:
        assert (drv[c].to_numpy() == dist[c].to_numpy()).all(), c


def test_deep_chain_converges_via_shortcut(spark):
    """A 200-node path graph cannot converge in 30 plain rounds (reach is
    one hop per round); with shortcutting engaged after round 5 the reach
    doubles per round and the loop converges well inside the cap — and
    every node labels to the chain minimum."""
    from search_engine_spark.operators.dedup import _distributed_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "doc1 long, doc2 long"
    ).repartition(4)
    out = _distributed_components(edges, shortcut_after=5, max_rounds=30).toPandas()
    assert len(out) == 200
    assert (out["keep_doc"] == 0).all()
    assert int(out["is_dup"].sum()) == 199


def test_sketch_accuracy_bounds(spark, sf_dir):
    """The one-pass sketch forms a 100 TB profile job uses, bounded against
    their exact gated twins: approx_count_distinct (HLL++) within its
    configured rsd, percentile_approx within the accuracy-parameter rank
    error.  The sketches are mergeable map-side aggregates — the scale
    path; the exact forms exist for the value-hash gate."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators._common import t, tokens_col

    d = t(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens_col()).alias("tok"))
    exact = tok.agg(F.countDistinct("tok")).collect()[0][0]
    approx = tok.agg(F.approx_count_distinct("tok", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.06, (approx, exact)

    n = d.select(F.size(tokens_col()).cast("double").alias("n"))
    ex = n.agg(F.expr("percentile(n, 0.5)")).collect()[0][0]
    ap = n.agg(F.percentile_approx("n", 0.5, 10000)).collect()[0][0]
    assert abs(ap - ex) <= max(2.0, 0.02 * ex), (ap, ex)


def test_embedding_lsh_recall_floor_and_cap_guard(spark, sf_dir):
    """Banded-LSH near-dup recall vs the exact all-pairs form, plus the
    degenerate-bucket observability hook.

    The LSH path trades recall for never being corpus-quadratic; the floor
    pins that the multi-band OR-amplification keeps it useful (measured
    ~0.50 on this fixture at threshold 0.35 — a deliberately weak
    similarity for sign-LSH; real near-dup thresholds ~0.9 collide far
    more reliably).
    """
    from search_engine_spark.operators.dedup import (
        embedding_lsh_dropped_buckets,
        embedding_neardup,
        embedding_neardup_lsh,
    )

    exact = embedding_neardup(spark, sf_dir).toPandas()  # vec_id < 300 slice
    lsh = embedding_neardup_lsh(spark, sf_dir).toPandas()
    eset = set(zip(exact.id1, exact.id2))
    lset = {p for p in zip(lsh.id1, lsh.id2) if p[0] < 300 and p[1] < 300}
    assert eset, "fixture contract: exact near-dup pairs exist"
    recall = len(lset & eset) / len(eset)
    assert recall >= 0.35, f"LSH recall@0.35 too low: {recall}"
    # every LSH pair is exact-verified, so the <300 slice must be a subset
    assert lset <= eset
    # cap guard: observable, and empty on this healthy fixture
    assert embedding_lsh_dropped_buckets(spark, sf_dir).count() == 0


def test_embedding_lsh_bucketlocal_kernel_matches_declarative(spark, sf_dir):
    """The full serving kernel (Arrow bucketing + bucket-local verify) is
    row-identical to the declarative candidate-join form — same buckets,
    same cap, same rounded cosines — while shuffling O(N·bands) array rows
    instead of O(candidates × dim) posexploded rows."""
    from search_engine_spark.operators.dedup import (
        embedding_neardup_lsh,
        embedding_neardup_lsh_kernel,
    )

    decl = (
        embedding_neardup_lsh(spark, sf_dir)
        .toPandas()
        .sort_values(["id1", "id2"])
        .reset_index(drop=True)
    )
    kern = (
        embedding_neardup_lsh_kernel(spark, sf_dir)
        .toPandas()
        .sort_values(["id1", "id2"])
        .reset_index(drop=True)
    )
    assert len(decl) == len(kern) > 0
    assert (decl["id1"].to_numpy() == kern["id1"].to_numpy()).all()
    assert (decl["id2"].to_numpy() == kern["id2"].to_numpy()).all()
    assert (decl["cosine"].to_numpy() == kern["cosine"].to_numpy()).all()


def test_ivf_recall_and_full_probe_exactness(spark, sf_dir):
    """IVF nprobe recall floor; probing every cell == brute force.

    The full-probe equality is the structural check that the train->assign->
    search pipeline is a real partition of the corpus: probing every cell
    must recover the exact brute-force top-k (same rounding, same tiebreaks).
    Checked for the declarative form AND the Arrow serving kernel.
    """
    from search_engine_spark.operators.similarity import ann_ivf, ivf_topk_arrow, knn_brute

    brute = knn_brute(spark, sf_dir).toPandas()
    b3 = brute[brute.rk <= 3]

    ivf = ann_ivf(spark, sf_dir).toPandas()
    hits = sum(
        len(set(b3[b3.qid == q].cid) & set(ivf[ivf.qid == q].cid))
        for q in set(b3.qid)
    )
    recall = hits / len(b3)
    assert recall >= 0.35, f"nprobe=2 recall@3 too low: {recall}"

    b3s = b3.sort_values(["qid", "rk"]).reset_index(drop=True)
    for fn in (ann_ivf, ivf_topk_arrow):
        full = fn(spark, sf_dir, nprobe=1_000_000).toPandas()
        full = full.sort_values(["qid", "rk"]).reset_index(drop=True)
        assert list(full["cid"]) == list(b3s["cid"]), fn.__name__
        assert (full["cosine"] - b3s["cosine"]).abs().max() == 0.0, fn.__name__


def test_jpeg_420_with_restart_interval_roundtrips():
    """The 420+restart combination: one MCU = four luma blocks, so restart
    bookkeeping must count MCUs, not luma blocks (a per-block count emits
    RSTn mid-MCU and every conforming decoder rejects the stream)."""
    import numpy as np

    from search_engine_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    rng = np.random.RandomState(3)
    # 3x2 MCUs of 16x16 so several restart boundaries occur
    vals = rng.randint(0, 256, size=(6, 4), dtype=np.uint8)
    gray = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    img = np.stack([gray, gray, gray], axis=2)
    for rst in (1, 2, 3):
        dec = decode_jpeg(encode_jpeg_baseline(img, subsampling="420",
                                               restart_interval=rst))
        assert dec.shape == img.shape
        # flat-block luma survives 420 exactly; chroma of a gray image is
        # neutral so decoded channels stay equal
        assert (dec[:, :, 0] == img[:, :, 0]).all()
