"""Deduplication operators over the ``documents`` table.

Pipeline forms of the standard training-data dedup ladder:

- exact duplicate grouping (hash-groupBy on a normalized fingerprint),
- n-gram shingle Jaccard pairs (explode -> self-join on shingle -> integer
  set algebra; the Jaccard threshold is an *integer* comparison so no float
  can flip it),
- MinHash signatures + banded LSH buckets,
- SimHash.

Scale notes: shingles are capped at the first 32 tokens per doc so the
self-join's per-shingle fan-out is bounded; at 100 TB the shingle join keys
are ``xxhash64`` values (JVM-side) instead of md5-derived ints, and the pair
enumeration is restricted to LSH candidate buckets rather than all shared
shingles — the md5 form here exists so DuckDB can verify the algorithm
end-to-end.  The LSH gate emits per-bucket stats (band, signature, size)
rather than exploding bucket cliques into pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._common import MD5_LONG_SQL, TOKENS_SQL, md5_long, t, tokens_col

_P = 2147483647  # modulus for minhash/simhash integer math
_NHASH = 16
_BANDS = 4  # 4 rows per band


def _sid(col):
    """60-bit md5 hash -> 31-bit shingle/token id (portable to DuckDB)."""
    return md5_long(col) % F.lit(_P)


_SID_SQL = f"({MD5_LONG_SQL} % {_P})"

# --------------------------------------------------------------------------
# exact dedup on a normalized-prefix fingerprint
# --------------------------------------------------------------------------

def exact_dup_groups(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.slice(tokens_col(), 1, 5)))
    return (
        d.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc"))
        .filter(F.col("n_docs") > 1)
    )


EXACT_DUP_GROUPS_SQL = f"""
SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc
FROM (SELECT doc_id, md5(array_to_string(list_slice({TOKENS_SQL}, 1, 5), ' ')) AS fp
      FROM documents)
GROUP BY fp
HAVING COUNT(*) > 1
"""

# --------------------------------------------------------------------------
# n-gram (4-token shingle) Jaccard pairs — integer-exact threshold
# --------------------------------------------------------------------------

def _shingles_df(spark, sf_dir):
    return _shingles_from(t(spark, sf_dir, "documents"))


def _shingles_from(d):
    toks = F.slice(tokens_col(), 1, 32)
    sh = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(3)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 4)),
    )
    # docs shorter than one shingle emit none: sequence(1, size-3) infers step
    # -1 when size < 4 (yielding slice(toks, 0, 4), which throws), so the
    # whole expression is gated — mirroring the oracle's empty range(1, 1)
    sh = F.when(F.size(toks) >= 4, sh).otherwise(F.array().cast("array<string>"))
    return d.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))


_SHINGLES_SQL = f"""
SELECT doc_id, unnest(list_distinct(
         list_transform(range(1, greatest(len(toks32) - 3, 0) + 1),
                        i -> array_to_string(list_slice(toks32, i, i + 3), ' '))
       )) AS shingle
FROM (SELECT doc_id, list_slice({TOKENS_SQL}, 1, 32) AS toks32 FROM documents)
"""


def jaccard_pairs(spark, sf_dir):
    sh = _shingles_df(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc1"), F.col("n_sh").alias("n1"))
    sb = sizes.select(F.col("doc_id").alias("doc2"), F.col("n_sh").alias("n2"))
    out = (
        inter.join(sa, "doc1")
        .join(sb, "doc2")
        .withColumn("n_union", F.col("n1") + F.col("n2") - F.col("n_inter"))
        # jaccard >= 1/60 as pure integers: 60*inter >= union (no float flip)
        .filter(F.lit(60) * F.col("n_inter") >= F.col("n_union"))
    )
    return out.select(
        "doc1", "doc2", "n_inter", "n_union",
        F.round(F.col("n_inter").cast("double") / F.col("n_union").cast("double"), 6).alias("jaccard"),
    )


JACCARD_PAIRS_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc1, doc2, n_inter, (n1 + n2 - n_inter) AS n_union,
       round(CAST(n_inter AS DOUBLE) / CAST(n1 + n2 - n_inter AS DOUBLE), 6) AS jaccard
FROM inter
JOIN (SELECT doc_id AS doc1, n_sh AS n1 FROM sizes) USING (doc1)
JOIN (SELECT doc_id AS doc2, n_sh AS n2 FROM sizes) USING (doc2)
WHERE 60 * n_inter >= (n1 + n2 - n_inter)
"""

# --------------------------------------------------------------------------
# MinHash signatures (token-set minhash, 16 hash functions)
# --------------------------------------------------------------------------

def minhash_signatures(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.array_distinct(tokens_col())).alias("tok"))
    tok = tok.withColumn("sid", _sid(F.col("tok")))
    hashes = spark.range(_NHASH).select(
        F.col("id").cast("int").alias("h_i"),
        (F.lit(2) * F.col("id") + F.lit(1)).alias("a"),
        (F.lit(104729) * F.col("id")).alias("b"),
    )
    return (
        tok.crossJoin(F.broadcast(hashes))
        .select(
            "doc_id", "h_i",
            ((F.col("a") * F.col("sid") + F.col("b")) % F.lit(_P)).alias("h"),
        )
        .groupBy("doc_id", "h_i")
        .agg(F.min("h").alias("minhash"))
    )


MINHASH_SIGNATURES_SQL = f"""
WITH tok AS (
  SELECT doc_id, {_SID_SQL.format(x='tok')} AS sid
  FROM (SELECT doc_id, unnest(list_distinct({TOKENS_SQL})) AS tok FROM documents)
), hashes AS (
  SELECT CAST(i AS INT) AS h_i, 2 * i + 1 AS a, 104729 * i AS b
  FROM (SELECT unnest(range({_NHASH})) AS i)
)
SELECT doc_id, h_i, MIN((a * sid + b) % {_P}) AS minhash
FROM tok CROSS JOIN hashes
GROUP BY doc_id, h_i
"""

# --------------------------------------------------------------------------
# LSH buckets: band the 16-value signature into 4 bands of 4, bucket on the
# band signature; emit candidate buckets (size >= 2)
# --------------------------------------------------------------------------

def lsh_buckets(spark, sf_dir):
    sig = minhash_signatures(spark, sf_dir)
    sig = sig.withColumn(
        "band", F.floor(F.col("h_i") / F.lit(_NHASH // _BANDS)).cast("int")
    )
    band_sig = (
        sig.groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    "-",
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("h_i", "minhash"))),
                        lambda s: s["minhash"].cast("string"),
                    ),
                )
            ).alias("sig")
        )
    )
    return (
        band_sig.groupBy("band", "sig")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .filter(F.col("n_docs") >= 2)
    )


LSH_BUCKETS_SQL = f"""
WITH tok AS (
  SELECT doc_id, {_SID_SQL.format(x='tok')} AS sid
  FROM (SELECT doc_id, unnest(list_distinct({TOKENS_SQL})) AS tok FROM documents)
), hashes AS (
  SELECT CAST(i AS INT) AS h_i, 2 * i + 1 AS a, 104729 * i AS b
  FROM (SELECT unnest(range({_NHASH})) AS i)
), sig AS (
  SELECT doc_id, h_i, CAST(h_i // {_NHASH // _BANDS} AS INT) AS band,
         MIN((a * sid + b) % {_P}) AS minhash
  FROM tok CROSS JOIN hashes
  GROUP BY doc_id, h_i
), band_sig AS (
  SELECT doc_id, band, md5(string_agg(CAST(minhash AS VARCHAR), '-' ORDER BY h_i)) AS sig
  FROM sig GROUP BY doc_id, band
)
SELECT band, sig, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
FROM band_sig
GROUP BY band, sig
HAVING COUNT(*) >= 2
"""

# --------------------------------------------------------------------------
# SimHash (16-bit, tf-weighted)
# --------------------------------------------------------------------------

def simhash(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(tokens_col()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", _sid(F.col("tok")))
    )
    bits = spark.range(16).select(
        F.col("id").cast("int").alias("bit"),
        F.pow(F.lit(2.0), F.col("id")).cast("long").alias("p2"),
    )
    contrib = tok.crossJoin(F.broadcast(bits)).select(
        "doc_id", "bit", "p2",
        F.when(F.floor(F.col("h") / F.col("p2")).cast("long") % 2 == 1, F.col("tf")).otherwise(-F.col("tf")).alias("c"),
    )
    bitsum = contrib.groupBy("doc_id", "bit", "p2").agg(F.sum("c").alias("s"))
    return (
        bitsum.groupBy("doc_id")
        .agg(F.sum(F.when(F.col("s") > 0, F.col("p2")).otherwise(F.lit(0))).alias("simhash16"))
    )


SIMHASH_SQL = f"""
WITH tok AS (
  SELECT doc_id, tok, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({TOKENS_SQL}) AS tok FROM documents)
  GROUP BY doc_id, tok
), tok_h AS (
  SELECT doc_id, tf, {_SID_SQL.format(x='tok')} AS h FROM tok
), bits AS (
  SELECT CAST(i AS INT) AS bit, CAST(pow(2.0, i) AS BIGINT) AS p2
  FROM (SELECT unnest(range(16)) AS i)
), bitsum AS (
  SELECT doc_id, bit, p2,
         SUM(CASE WHEN (h // p2) % 2 = 1 THEN tf ELSE -tf END) AS s
  FROM tok_h CROSS JOIN bits
  GROUP BY doc_id, bit, p2
)
SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN p2 ELSE 0 END) AS BIGINT) AS simhash16
FROM bitsum GROUP BY doc_id
"""

# --------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs (data-driven threshold; corpus max
# cosine is ~0.44 so 0.35 marks the near-dup tail)
# --------------------------------------------------------------------------

def embedding_neardup(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    ev = e.select("vec_id", F.posexplode("embedding").alias("pos", "x"))
    norms = ev.groupBy("vec_id").agg(F.round(F.sum(F.col("x") * F.col("x")), 9).alias("nrm"))
    a = ev.select(F.col("vec_id").alias("id1"), "pos", F.col("x").alias("x1"))
    b = ev.select(F.col("vec_id").alias("id2"), "pos", F.col("x").alias("x2"))
    dots = (
        a.join(b, "pos")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("x1") * F.col("x2")).alias("dot"))
    )
    na = norms.select(F.col("vec_id").alias("id1"), F.col("nrm").alias("n1"))
    nb = norms.select(F.col("vec_id").alias("id2"), F.col("nrm").alias("n2"))
    out = (
        dots.join(na, "id1")
        .join(nb, "id2")
        .withColumn("cosine", F.round(F.col("dot") / F.sqrt(F.col("n1") * F.col("n2")), 6))
        .filter(F.col("cosine") >= 0.35)
    )
    return out.select("id1", "id2", "cosine")


EMBEDDING_NEARDUP_SQL = """
WITH ev AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding) AS x
  FROM embeddings WHERE vec_id < 300
), norms AS (
  SELECT vec_id, round(SUM(x * x), 9) AS nrm FROM ev GROUP BY vec_id
), dots AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2, SUM(a.x * b.x) AS dot
  FROM ev a JOIN ev b ON a.pos = b.pos AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT id1, id2, round(dot / sqrt(n1 * n2), 6) AS cosine
FROM dots
JOIN (SELECT vec_id AS id1, nrm AS n1 FROM norms) USING (id1)
JOIN (SELECT vec_id AS id2, nrm AS n2 FROM norms) USING (id2)
WHERE round(dot / sqrt(n1 * n2), 6) >= 0.35
"""


QUERIES = {
    "dd_exact_groups": exact_dup_groups,
    "dd_jaccard_pairs": jaccard_pairs,
    "dd_minhash_signatures": minhash_signatures,
    "dd_lsh_buckets": lsh_buckets,
    "dd_simhash": simhash,
    "dd_embedding_neardup": embedding_neardup,
}

ORACLES = {
    "dd_exact_groups": EXACT_DUP_GROUPS_SQL,
    "dd_jaccard_pairs": JACCARD_PAIRS_SQL,
    "dd_minhash_signatures": MINHASH_SIGNATURES_SQL,
    "dd_lsh_buckets": LSH_BUCKETS_SQL,
    "dd_simhash": SIMHASH_SQL,
    "dd_embedding_neardup": EMBEDDING_NEARDUP_SQL,
}
