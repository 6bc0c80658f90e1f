"""Deduplication operators over the ``documents`` table.

Pipeline forms of the standard training-data dedup ladder:

- exact duplicate grouping (hash-groupBy on a normalized fingerprint),
- n-gram shingle Jaccard pairs (explode -> self-join on shingle -> integer
  set algebra; the Jaccard threshold is an *integer* comparison so no float
  can flip it),
- MinHash signatures + banded LSH buckets,
- SimHash.

- LSH candidate pairs (bucket-bounded enumeration, degenerate-bucket cap),
- exact-Jaccard verification of candidates, and connected-component keep-min
  dedup decisions — the full ladder, end to end.

Scale notes: shingles are capped at the first 32 tokens per doc so the
shingle self-join's per-shingle fan-out is bounded; ``dd_jaccard_pairs``'
all-shared-shingle join is the oracle-checkable SMALL form — the scale path
is the LSH ladder (``dd_lsh_candidate_pairs`` -> ``dd_dedup_decisions``),
where pairs are enumerated only inside minhash-band buckets.  At 100 TB the
join keys are ``xxhash64`` values (JVM-side) instead of md5-derived ints;
the md5 form exists so DuckDB can verify the algorithms end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..numerics import round_half_away

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

def _minhash_wide(spark, sf_dir):
    """(doc_id, mh0..mh15): all hash functions as ONE wide aggregate.

    The textbook crossJoin-with-hash-functions form multiplies the token
    stream ×16 before aggregating (corpus × nhash rows through the
    shuffle); computing every minhash as its own min-expression keeps the
    stream at corpus size with map-side partial aggregation — same values,
    16× fewer shuffled rows (measured 3× faster at sf0.1).
    """
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.array_distinct(tokens_col())).alias("tok"))
    tok = tok.withColumn("sid", _sid(F.col("tok")))
    aggs = [
        F.min(
            (F.lit(2 * i + 1) * F.col("sid") + F.lit(104729 * i)) % F.lit(_P)
        ).alias(f"mh{i}")
        for i in range(_NHASH)
    ]
    return tok.groupBy("doc_id").agg(*aggs)


def minhash_signatures(spark, sf_dir):
    wide = _minhash_wide(spark, sf_dir)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("h_i"), F.col(f"mh{i}").alias("minhash")
            )
            for i in range(_NHASH)
        ]
    )
    return wide.select("doc_id", F.explode(pairs).alias("x")).select(
        "doc_id", F.col("x.h_i").alias("h_i"), F.col("x.minhash").alias("minhash")
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

def _band_sigs(spark, sf_dir):
    """(doc_id, band, sig): md5 of the band's minhashes in h_i order —
    computed straight from the wide signature row (no collect_list)."""
    wide = _minhash_wide(spark, sf_dir)
    r = _NHASH // _BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.md5(
                    F.concat_ws(
                        "-", *[F.col(f"mh{b * r + j}").cast("string") for j in range(r)]
                    )
                ).alias("sig"),
            )
            for b in range(_BANDS)
        ]
    )
    return wide.select("doc_id", F.explode(bands).alias("x")).select(
        "doc_id", F.col("x.band").alias("band"), F.col("x.sig").alias("sig")
    )


def lsh_buckets(spark, sf_dir):
    return (
        _band_sigs(spark, sf_dir)
        .groupBy("band", "sig")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .filter(F.col("n_docs") >= 2)
    )


_BAND_SIG_CTES = f"""tok AS (
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
)"""

LSH_BUCKETS_SQL = f"""
WITH {_BAND_SIG_CTES}
SELECT band, sig, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
FROM band_sig
GROUP BY band, sig
HAVING COUNT(*) >= 2
"""

# --------------------------------------------------------------------------
# LSH candidate pairs -> exact-Jaccard verify -> keep-min dedup decisions.
# This is the scale path the ladder feeds: pair enumeration happens ONLY
# inside LSH buckets (never across the corpus), degenerate buckets above
# _BUCKET_CAP docs are skipped (the standard guard: a template/boilerplate
# bucket of B docs would emit B^2/2 pairs; its members are caught by exact
# dedup on content fingerprints instead), and the verified-pair graph is
# resolved to connected components by iterative min-label propagation
# (at cluster scale: the same loop with localCheckpoint every iteration, or
# the large-star/small-star variant — the per-iteration plan is one
# edge-join + groupBy-min either way).
# --------------------------------------------------------------------------

_BUCKET_CAP = 32  # skip buckets larger than this (degenerate/boilerplate)
_JACCARD_NUM, _JACCARD_DEN = 1, 2  # verify threshold: jaccard >= 1/2


def _token_sids(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.array_distinct(tokens_col())).alias("tok"))
    return tok.select("doc_id", _sid(F.col("tok")).alias("sid")).distinct()


def lsh_candidate_pairs(spark, sf_dir):
    # one materialization of the banded signatures: they fan out into the
    # bucket-size filter AND both sides of the in-bucket self-join, which
    # otherwise re-executes the minhash pipeline ~4x (measured: 11.4s ->
    # 3.4s for candidate generation at sf0.1).  At cluster scale: .persist().
    bs = _band_sigs(spark, sf_dir).localCheckpoint()
    sizes = bs.groupBy("band", "sig").agg(F.count("*").alias("n_docs"))
    ok = sizes.filter((F.col("n_docs") >= 2) & (F.col("n_docs") <= _BUCKET_CAP))
    in_ok = bs.join(ok.select("band", "sig"), ["band", "sig"])
    a = in_ok.select("band", "sig", F.col("doc_id").alias("doc1"))
    b = in_ok.select("band", "sig", F.col("doc_id").alias("doc2"))
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("n_bands"))
    )


_CAND_CTES = f"""{_BAND_SIG_CTES}, bsizes AS (
  SELECT band, sig, COUNT(*) AS n_docs FROM band_sig GROUP BY band, sig
), in_ok AS (
  SELECT b.doc_id, b.band, b.sig
  FROM band_sig b JOIN bsizes s ON s.band = b.band AND s.sig = b.sig
  WHERE s.n_docs >= 2 AND s.n_docs <= {_BUCKET_CAP}
), cand AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_bands
  FROM in_ok a JOIN in_ok b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""

LSH_CANDIDATE_PAIRS_SQL = f"""
WITH {_CAND_CTES}
SELECT doc1, doc2, n_bands FROM cand
"""


def _verified_pairs(spark, sf_dir):
    """Candidates verified with exact token-set Jaccard >= 1/2 (integers).

    The token stream is semi-join-filtered to candidate docs BEFORE the
    intersection joins: candidates are a vanishing fraction of the corpus,
    so this turns a full-corpus token shuffle into a (usually broadcast)
    id filter + a small shuffle — the result is identical (only candidate
    docs' rows ever survive those joins).
    """
    # materialize the candidate set once: it fans out into cand_docs, the
    # intersection join AND (via the semi-joined tok) every size lookup —
    # without this the whole LSH ladder re-executes per reference (~5x;
    # measured 11s -> 4s at sf0.1).  At cluster scale: .persist().
    cand = lsh_candidate_pairs(spark, sf_dir).localCheckpoint()
    cand_docs = (
        cand.select(F.col("doc1").alias("doc_id"))
        .unionByName(cand.select(F.col("doc2").alias("doc_id")))
        .distinct()
    )
    tok = (
        _token_sids(spark, sf_dir)
        .join(cand_docs, "doc_id", "left_semi")
        .localCheckpoint()
    )
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    t1 = tok.select(F.col("doc_id").alias("doc1"), "sid")
    t2 = tok.select(F.col("doc_id").alias("doc2"), "sid")
    inter = (
        cand.join(t1, "doc1")
        .join(t2, ["doc2", "sid"])
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("n_inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("n_tok").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("n_tok").alias("n2"))
    return (
        inter.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn("n_union", F.col("n1") + F.col("n2") - F.col("n_inter"))
        .filter(F.lit(_JACCARD_DEN) * F.col("n_inter") >= F.lit(_JACCARD_NUM) * F.col("n_union"))
        .select("doc1", "doc2")
    )


_VERIFIED_CTES = f"""{_CAND_CTES}, tsizes AS (
  SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id
), vinter AS (
  SELECT c.doc1, c.doc2, COUNT(*) AS n_inter
  FROM cand c
  JOIN tok t1 ON t1.doc_id = c.doc1
  JOIN tok t2 ON t2.doc_id = c.doc2 AND t2.sid = t1.sid
  GROUP BY 1, 2
), verified AS (
  SELECT v.doc1, v.doc2
  FROM vinter v
  JOIN tsizes s1 ON s1.doc_id = v.doc1
  JOIN tsizes s2 ON s2.doc_id = v.doc2
  WHERE {_JACCARD_DEN} * v.n_inter >= {_JACCARD_NUM} * (s1.n_tok + s2.n_tok - v.n_inter)
)"""


# Verified-edge graphs below this size resolve on the driver (a 5M-edge
# collect is ~80 MB); above it the distributed fixpoint loop takes over —
# the same budgeted fast-path/takeover policy the query engine applies to
# small candidate sets (query/engine.py SMALL_QUERY_POSTINGS).
_DRIVER_EDGE_BUDGET = 5_000_000


def _driver_components(edges_rows):
    """Union-find keep-min over collected (doc1, doc2) edges — exact same
    fixpoint as the distributed loop (component-min labels)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edges_rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # root = smaller id
    # with min-rooted unions the root IS the component minimum
    return {d: find(d) for d in parent}


def dedup_decisions(spark, sf_dir, driver_budget: int = _DRIVER_EDGE_BUDGET):
    """Verified-pair graph -> per-doc keep decision (component-min doc_id).

    Small graphs (≤ ``driver_budget`` edges) resolve by driver union-find
    in one collect; larger graphs run iterative min-label propagation to a
    fixpoint: label(doc) starts at doc, each round takes the min over
    itself and its neighbors' labels.  Both produce the unique component
    minimum, so the result is identical and deterministic
    (``test_dedup_decisions_distributed_matches_driver``); convergence of
    the loop is detected by the (strictly decreasing until fixpoint)
    global label sum.
    """
    edges = _verified_pairs(spark, sf_dir).localCheckpoint()
    if edges.count() <= driver_budget:
        import pandas as pd

        labels = _driver_components(
            [(r["doc1"], r["doc2"]) for r in edges.collect()]
        )
        pdf = pd.DataFrame(
            {
                "doc_id": list(labels.keys()),
                "keep_doc": list(labels.values()),
            }
        )
        pdf["is_dup"] = (pdf["doc_id"] != pdf["keep_doc"]).astype("int32")
        return spark.createDataFrame(pdf, "doc_id long, keep_doc long, is_dup int")
    return _distributed_components(edges)


def _distributed_components(edges, shortcut_after: int = 20, max_rounds: int = 80):
    """(doc1, doc2) edge DataFrame -> (doc_id, keep_doc, is_dup) via
    distributed min-label propagation to a fixpoint.

    Plain min-propagation by default: pointer doubling (new_lbl(d) =
    lbl(lbl(d)) each round) was implemented and measured on the fixture —
    it cut 10 rounds to 8 but the extra per-round join cost more than the
    saved rounds (3.3s -> 4.2s loop time at sf0.1); single-shot
    composition only extends reach ~2r+1 vs r+1 per round.  Near-dup
    components are shallow by construction (verified-similarity cliques
    bridged by short chains), so the low-constant loop wins — but a graph
    still unconverged after ``shortcut_after`` rounds has proven itself
    deep, and from then on the label-of-label shortcut joins in (reach
    roughly doubles per round), so even a diameter-10^6 chain finishes in
    ~shortcut_after + log2(diameter) rounds
    (``test_deep_chain_converges_via_shortcut``).  The final guard turns
    an impossible non-fixpoint into a loud error, never a silent wrong
    keep_doc/is_dup.
    """
    fwd = edges.select(F.col("doc1").alias("src"), F.col("doc2").alias("dst"))
    rev = edges.select(F.col("doc2").alias("src"), F.col("doc1").alias("dst"))
    nbrs = fwd.unionByName(rev).localCheckpoint()
    # localCheckpoint (not just persist) each iteration: persist truncates
    # *execution* but the logical plan still doubles per round, and Catalyst
    # re-optimization goes exponential (measured: 1.5s -> 97s by round 5)
    labels = (
        nbrs.select(F.col("src").alias("doc")).distinct().withColumn("lbl", F.col("doc"))
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    converged = False
    for rnd in range(max_rounds):
        prop = (
            labels.join(nbrs, labels.doc == nbrs.src)
            .select(F.col("dst").alias("doc"), "lbl")
        )
        step = labels.unionByName(prop)
        if rnd >= shortcut_after:
            l2 = labels.select(F.col("doc").alias("lbl"), F.col("lbl").alias("lbl2"))
            step = step.unionByName(
                labels.join(l2, "lbl").select("doc", F.col("lbl2").alias("lbl"))
            )
        labels = (
            step.groupBy("doc").agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint()
        new_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"min-label propagation did not converge in {max_rounds} rounds "
            f"despite pointer-doubling past round {shortcut_after} — "
            "this indicates a bug, not a feasible graph"
        )
    return labels.select(
        F.col("doc").alias("doc_id"),
        F.col("lbl").alias("keep_doc"),
        (F.col("doc") != F.col("lbl")).cast("int").alias("is_dup"),
    )


DEDUP_DECISIONS_SQL = f"""
WITH RECURSIVE {_VERIFIED_CTES}, edges AS (
  SELECT doc1 AS src, doc2 AS dst FROM verified
  UNION ALL
  SELECT doc2 AS src, doc1 AS dst FROM verified
), comp(doc, lbl) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, c.lbl FROM comp c JOIN edges e ON e.src = c.doc
)
SELECT doc AS doc_id, MIN(lbl) AS keep_doc,
       CAST(MIN(lbl) <> doc AS INT) AS is_dup
FROM comp GROUP BY doc
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
# embedding-cosine near-duplicate pairs — SMALL/oracle form (all-pairs over
# a capped slice; data-driven threshold: corpus max cosine is ~0.44 so 0.35
# marks the near-dup tail).  The scale path is dd_embedding_neardup_lsh
# above: hyperplane buckets bound the pair enumeration.
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


# --------------------------------------------------------------------------
# embedding near-dup, scale path: banded random-hyperplane LSH -> pair
# enumeration inside band buckets only -> exact-cosine verify.  The
# hyperplanes are deterministic pseudo-random vectors derived from the
# portable md5 hash, so the oracle reproduces them bit-for-bit.
#
# Scale shape (the three guards a 10^9-vector corpus needs):
# - the per-band plane count r GROWS with the corpus: r = max(4,
#   ceil(log2 N) - 4), so the bucket space per band is ~N/16 buckets and
#   mean bucket size stays ~16 regardless of N (at 10^9 vectors: r = 26,
#   2^26 buckets/band) — never a fixed 64-bucket space;
# - recall lost to more planes is bought back by OR-amplification across
#   _EMB_BANDS independent bands (a pair is a candidate if it collides in
#   ANY band): P(candidate) = 1 - (1 - s^r)^b for sign-agreement rate s;
# - degenerate buckets (mirror-payload/boilerplate clusters) above
#   _EMB_BUCKET_CAP members are dropped from pair enumeration (the same
#   guard the minhash ladder applies at _BUCKET_CAP); their members are
#   still caught by exact dedup on content fingerprints.
#   ``embedding_lsh_dropped_buckets`` reports what the cap dropped, so the
#   skipped mass is observable rather than silent.
# --------------------------------------------------------------------------

_EMB_BANDS = 8
_EMB_BUCKET_CAP = 64
_EMB_MIN_PLANES = 4


def _emb_nplanes(n_vectors: int) -> int:
    """Planes per band, scaled so mean bucket occupancy stays ~16."""
    import math

    return max(_EMB_MIN_PLANES, math.ceil(math.log2(max(n_vectors, 2))) - 4)


# identical derivation in SQL (log2/ceil agree on doubles across engines)
_EMB_NPLANES_SQL = (
    f"greatest({_EMB_MIN_PLANES}, CAST(ceil(log2(greatest(COUNT(*), 2))) AS INT) - 4)"
)


def _banded_hyperplanes(spark, nplanes: int):
    """(band, h, pos, v): band's plane h component at dimension pos, [-1, 1]."""
    bands = spark.range(_EMB_BANDS).select(F.col("id").cast("int").alias("band"))
    planes = spark.range(nplanes).select(F.col("id").cast("int").alias("h"))
    dims = spark.range(64).select(F.col("id").cast("int").alias("pos"))
    key = F.concat_ws("-", F.col("band"), F.col("h"), F.col("pos"))
    v = (md5_long(key) % F.lit(2001) - F.lit(1000)).cast("double") / F.lit(1000.0)
    return bands.crossJoin(planes).crossJoin(dims).select("band", "h", "pos", v.alias("v"))


def _emb_band_buckets(spark, sf_dir):
    """(vec_id, band, bucket): one sign-bit bucket per vector per band."""
    e = t(spark, sf_dir, "embeddings")
    nplanes = _emb_nplanes(e.count())
    ev = e.select("vec_id", F.posexplode("embedding").alias("pos", "x"))
    hp = _banded_hyperplanes(spark, nplanes)
    # sign bits: round the projection so a last-ulp sum difference at ~0
    # cannot flip a bucket bit between engines
    proj = (
        ev.join(F.broadcast(hp), "pos")
        .groupBy("vec_id", "band", "h")
        .agg(F.round(F.sum(F.col("x") * F.col("v")), 6).alias("p"))
    )
    buckets = proj.groupBy("vec_id", "band").agg(
        F.sum(
            F.when(F.col("p") > 0, F.pow(F.lit(2.0), F.col("h")).cast("long")).otherwise(F.lit(0))
        ).alias("bucket")
    )
    return ev, buckets


def _emb_band_buckets_arrow(spark, sf_dir):
    """Arrow form of the bucketing stage: ONE corpus pass, numpy matmul
    against the broadcast (bands x planes x dim) hyperplane tensor —
    replaces the posexplode x planes join (corpus x dim x planes rows) the
    declarative form shuffles.  Bit-compatible: projections round to 6
    before the sign test, same as the declarative/oracle rule.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    e = t(spark, sf_dir, "embeddings")
    nplanes = _emb_nplanes(e.count())
    V = np.empty((_EMB_BANDS * nplanes, 64), dtype=np.float64)
    for b in range(_EMB_BANDS):
        for h in range(nplanes):
            for p in range(64):
                hx = hashlib.md5(f"{b}-{h}-{p}".encode()).hexdigest()[:15]
                V[b * nplanes + h, p] = (int(hx, 16) % 2001 - 1000) / 1000.0
    powers = np.array([1 << h for h in range(nplanes)], dtype=np.int64)
    bc = spark.sparkContext.broadcast((V, powers))

    import pyarrow as pa

    from ._common import iter_id_matrix

    def bucketize(batches):
        V_, powers_ = bc.value
        for vec_ids, X32 in iter_id_matrix(batches):
            # x promotes to double against the double hyperplanes, exactly
            # like the declarative FLOAT*DOUBLE projection
            X = X32.astype(np.float64)
            P = round_half_away(X @ V_.T, 6)  # (batch, bands*planes)
            bits = (P > 0).reshape(len(X), _EMB_BANDS, len(powers_))
            buckets = (bits * powers_).sum(axis=2)  # (batch, bands)
            yield pa.RecordBatch.from_pydict(
                {
                    "vec_id": pa.array(np.repeat(vec_ids, _EMB_BANDS)),
                    "band": pa.array(
                        np.tile(np.arange(_EMB_BANDS, dtype=np.int32), len(X)), pa.int32()
                    ),
                    "bucket": pa.array(buckets.reshape(-1)),
                }
            )

    ev = e.select("vec_id", F.posexplode("embedding").alias("pos", "x"))
    buckets = e.select("vec_id", "embedding").mapInArrow(
        bucketize, schema="vec_id long, band int, bucket long"
    )
    return ev, buckets


def _emb_candidates(spark, sf_dir, buckets_fn=None):
    """Distinct candidate pairs: in-band bucket collisions, capped buckets."""
    ev, buckets = (buckets_fn or _emb_band_buckets)(spark, sf_dir)
    # one materialization: buckets feed the size filter AND both self-join
    # sides — without it the bucketing stage re-executes per reference
    # (the lsh_candidate_pairs lesson).  At cluster scale: .persist().
    buckets = buckets.localCheckpoint()
    sizes = buckets.groupBy("band", "bucket").agg(F.count("*").alias("n_vec"))
    ok = sizes.filter((F.col("n_vec") >= 2) & (F.col("n_vec") <= _EMB_BUCKET_CAP))
    in_ok = buckets.join(ok.select("band", "bucket"), ["band", "bucket"])
    a = in_ok.select("band", "bucket", F.col("vec_id").alias("id1"))
    b = in_ok.select("band", "bucket", F.col("vec_id").alias("id2"))
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()  # OR-amplification: a pair may collide in several bands
    )
    return ev, cand


def embedding_lsh_dropped_buckets(spark, sf_dir, buckets_fn=None):
    """(band, bucket, n_vec) for buckets the cap excluded — the observability
    hook for the degenerate-bucket guard (empty on healthy corpora).  Pass
    ``buckets_fn=_emb_band_buckets_arrow`` at scale (the declarative
    bucketing is the oracle form; its posexplode×planes join is corpus ×
    dim × planes rows)."""
    _, buckets = (buckets_fn or _emb_band_buckets)(spark, sf_dir)
    return (
        buckets.groupBy("band", "bucket")
        .agg(F.count("*").alias("n_vec"))
        .filter(F.col("n_vec") > _EMB_BUCKET_CAP)
    )


def embedding_neardup_lsh(spark, sf_dir, buckets_fn=None):
    ev, cand = _emb_candidates(spark, sf_dir, buckets_fn=buckets_fn)
    # verify only candidate vectors: semi-join ev down to candidate ids so
    # the exact-cosine joins shuffle O(candidates × dim), not corpus × dim.
    # cand/ev are materialized once — both fan out into several joins below,
    # and without the checkpoint the bucketing pipeline re-executes per
    # reference (at cluster scale: .persist()).
    cand = cand.localCheckpoint()
    cand_ids = (
        cand.select(F.col("id1").alias("vec_id"))
        .unionByName(cand.select(F.col("id2").alias("vec_id")))
        .distinct()
    )
    ev = ev.join(cand_ids, "vec_id", "left_semi").localCheckpoint()
    av = ev.select(F.col("vec_id").alias("id1"), "pos", F.col("x").alias("x1"))
    bv = ev.select(F.col("vec_id").alias("id2"), "pos", F.col("x").alias("x2"))
    dots = (
        cand.join(av, "id1")
        .join(bv, ["id2", "pos"])
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("x1") * F.col("x2")).alias("dot"))
    )
    norms = ev.groupBy("vec_id").agg(F.round(F.sum(F.col("x") * F.col("x")), 9).alias("nrm"))
    na = norms.select(F.col("vec_id").alias("id1"), F.col("nrm").alias("n1"))
    nb = norms.select(F.col("vec_id").alias("id2"), F.col("nrm").alias("n2"))
    return (
        dots.join(na, "id1")
        .join(nb, "id2")
        .withColumn("cosine", F.round(F.col("dot") / F.sqrt(F.col("n1") * F.col("n2")), 6))
        .filter(F.col("cosine") >= 0.35)
        .select("id1", "id2", "cosine")
    )


def _gram_pairs(ids, X32, out):
    """All-pairs rounded cosines of one bucket -> append kept pairs to out.

    float32 products, float64 accumulation: Spark's declarative twin
    multiplies two FLOAT columns (single-precision product, ~6e-8
    quantization) before SUM casts to double — a systematic offset, not
    order noise, so the kernel must reproduce it or boundary pairs flip
    their 6th decimal (observed at sf0.001: pair 116/235, true cosine
    1.1e-9 below the .3633755 grid line).
    """
    import numpy as np

    m = len(ids)
    if m < 2 or m > _EMB_BUCKET_CAP:
        return
    n = round_half_away((X32 * X32).astype(np.float64).sum(axis=1), 9)
    G = (X32[:, None, :] * X32[None, :, :]).astype(np.float64).sum(axis=2)
    C = round_half_away(G / np.sqrt(n[:, None] * n[None, :]), 6)
    iu, ju = np.triu_indices(m, k=1)
    cos = C[iu, ju]
    keep = cos >= 0.35
    if not keep.any():
        return
    a, b = ids[iu][keep], ids[ju][keep]
    out.append((np.minimum(a, b), np.maximum(a, b), cos[keep]))


def embedding_neardup_lsh_kernel(spark, sf_dir):
    """Full serving form of the embedding near-dup ladder: Arrow bucketing
    (one matmul corpus pass) + BUCKET-LOCAL verification.

    The declarative verify (``embedding_neardup_lsh``) joins each candidate
    pair against posexploded vectors — candidates × dim shuffled rows, which
    at 10^6 vectors / ~5×10^7 candidates is ~6×10^9 rows (measured: >60 GB
    of spill, the round-4 1M-run killer).  Here every capped bucket
    (≤ _EMB_BUCKET_CAP members) verifies ITS OWN members: the only shuffle
    is bucket-membership × whole-array rows, O(N · bands · vec_bytes) —
    ~2 GB at 1M×64-dim, independent of how many candidate pairs the
    buckets imply.  Per bucket, all-pairs cosine is one ≤64×64 numpy Gram
    matrix; a pair colliding in several bands yields identical rounded
    cosines, collapsed by the final distinct (same rounding rule as the
    declarative twin: norms to 9, cosine to 6 — cross-engine float noise
    ≪ the grid per the _common.py rounding policy).

    The verify stage streams Arrow batches over partitions sorted by
    (band, bucket) — ``repartition + sortWithinPartitions + mapInArrow``
    with a carry for the bucket straddling a batch boundary — instead of
    ``groupBy().applyInPandas``: one pandas DataFrame per ≤64-row bucket
    (~400k of them at 1M vectors) dominated the whole ladder's cost
    (profiled: 1,976 s of executor time, 62 s of the 116 s wall, vs ~5 s
    of actual Gram arithmetic).  Same shuffle bytes, same math, same
    output, ~10× less Python overhead.

    Same output contract and SQL oracle as ``embedding_neardup_lsh``.
    """
    import numpy as np
    import pyarrow as pa

    _, buckets = _emb_band_buckets_arrow(spark, sf_dir)
    # buckets feed the size filter AND the membership join; the size filter
    # must run BEFORE any array bytes move so a degenerate over-cap bucket
    # never ships its members.  Deliberately NOT materialized: the two
    # consumers recompute the bucketize pass (a ~2 s broadcast matmul over
    # the corpus), which measures far cheaper than checkpointing the
    # N·bands skinny rows (at 1M vectors: localCheckpoint cost 776 s of
    # executor time and the stage graph serialized behind it — dropping it
    # took the kernel 65 s -> 32 s wall at local[32])
    sizes = buckets.groupBy("band", "bucket").agg(F.count("*").alias("n_vec"))
    ok = sizes.filter((F.col("n_vec") >= 2) & (F.col("n_vec") <= _EMB_BUCKET_CAP))
    in_ok = buckets.join(ok.select("band", "bucket"), ["band", "bucket"])
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    members = in_ok.join(e, "vec_id")
    stream = (
        members.select("band", "bucket", "vec_id", "embedding")
        .repartition("band", "bucket")
        .sortWithinPartitions("band", "bucket")
    )

    def verify_stream(batches):
        cb = cu = ci = cx = None  # carry: the bucket straddling the boundary
        for rb in batches:
            if rb.num_rows == 0:
                continue
            band = rb.column(0).to_numpy().astype(np.int64, copy=False)
            bucket = rb.column(1).to_numpy().astype(np.int64, copy=False)
            ids = rb.column(2).to_numpy().astype(np.int64, copy=False)
            flat = rb.column(3).flatten().to_numpy(zero_copy_only=False)
            X = flat.reshape(rb.num_rows, 64)
            if cb is not None:
                band = np.concatenate([cb, band])
                bucket = np.concatenate([cu, bucket])
                ids = np.concatenate([ci, ids])
                X = np.concatenate([cx, X])
            change = np.flatnonzero((band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1]))
            starts = np.concatenate([[0], change + 1])
            # the last group may continue in the next batch — carry it
            out: list = []
            for s, e_ in zip(starts[:-1], starts[1:]):
                _gram_pairs(ids[s:e_], X[s:e_], out)
            tail = starts[-1]
            cb, cu, ci, cx = band[tail:], bucket[tail:], ids[tail:], X[tail:]
            if out:
                yield pa.RecordBatch.from_pydict(
                    {
                        "id1": pa.array(np.concatenate([o[0] for o in out])),
                        "id2": pa.array(np.concatenate([o[1] for o in out])),
                        "cosine": pa.array(np.concatenate([o[2] for o in out])),
                    }
                )
        if cb is not None and len(cb):
            out = []
            _gram_pairs(ci, np.ascontiguousarray(cx), out)
            if out:
                yield pa.RecordBatch.from_pydict(
                    {
                        "id1": pa.array(out[0][0]),
                        "id2": pa.array(out[0][1]),
                        "cosine": pa.array(out[0][2]),
                    }
                )

    pairs = stream.mapInArrow(
        verify_stream, schema="id1 long, id2 long, cosine double"
    )
    return pairs.distinct()


EMBEDDING_NEARDUP_LSH_SQL = f"""
WITH ev AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos, unnest(embedding) AS x
  FROM embeddings
), params AS (
  SELECT {_EMB_NPLANES_SQL} AS r FROM embeddings
), hp AS (
  SELECT band, h, pos,
         CAST(({MD5_LONG_SQL.format(x="concat(band, '-', h, '-', pos)")} % 2001 - 1000) AS DOUBLE) / 1000.0 AS v
  FROM (SELECT CAST(unnest(range({_EMB_BANDS})) AS INT) AS band),
       (SELECT CAST(unnest(range(64)) AS INT) AS h),
       (SELECT CAST(unnest(range(64)) AS INT) AS pos),
       params
  WHERE h < params.r
), proj AS (
  SELECT ev.vec_id, hp.band, hp.h, round(SUM(ev.x * hp.v), 6) AS p
  FROM ev JOIN hp ON hp.pos = ev.pos
  GROUP BY ev.vec_id, hp.band, hp.h
), buckets AS (
  SELECT vec_id, band,
         CAST(SUM(CASE WHEN p > 0 THEN CAST(pow(2.0, h) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id, band
), bsizes AS (
  SELECT band, bucket, COUNT(*) AS n_vec FROM buckets GROUP BY band, bucket
), in_ok AS (
  SELECT b.vec_id, b.band, b.bucket
  FROM buckets b JOIN bsizes s ON s.band = b.band AND s.bucket = b.bucket
  WHERE s.n_vec >= 2 AND s.n_vec <= {_EMB_BUCKET_CAP}
), cand AS (
  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
  FROM in_ok a JOIN in_ok b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
), norms AS (
  SELECT vec_id, round(SUM(x * x), 9) AS nrm FROM ev GROUP BY vec_id
), dots AS (
  SELECT c.id1, c.id2, SUM(a.x * b.x) AS dot
  FROM cand c
  JOIN ev a ON a.vec_id = c.id1
  JOIN ev b ON b.vec_id = c.id2 AND b.pos = a.pos
  GROUP BY c.id1, c.id2
)
SELECT id1, id2, round(dot / sqrt(n1 * n2), 6) AS cosine
FROM dots
JOIN (SELECT vec_id AS id1, nrm AS n1 FROM norms) USING (id1)
JOIN (SELECT vec_id AS id2, nrm AS n2 FROM norms) USING (id2)
WHERE round(dot / sqrt(n1 * n2), 6) >= 0.35
"""

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
    "dd_lsh_candidate_pairs": lsh_candidate_pairs,
    "dd_dedup_decisions": dedup_decisions,
    "dd_simhash": simhash,
    "dd_embedding_neardup": embedding_neardup,
    "dd_embedding_neardup_lsh": embedding_neardup_lsh,
    # serving form: Arrow bucketing + bucket-local verify, same oracle as
    # the declarative twin
    "dd_embedding_neardup_lsh_kernel": embedding_neardup_lsh_kernel,
}

ORACLES = {
    "dd_exact_groups": EXACT_DUP_GROUPS_SQL,
    "dd_jaccard_pairs": JACCARD_PAIRS_SQL,
    "dd_minhash_signatures": MINHASH_SIGNATURES_SQL,
    "dd_lsh_buckets": LSH_BUCKETS_SQL,
    "dd_lsh_candidate_pairs": LSH_CANDIDATE_PAIRS_SQL,
    "dd_dedup_decisions": DEDUP_DECISIONS_SQL,
    "dd_simhash": SIMHASH_SQL,
    "dd_embedding_neardup": EMBEDDING_NEARDUP_SQL,
    "dd_embedding_neardup_lsh": EMBEDDING_NEARDUP_LSH_SQL,
    "dd_embedding_neardup_lsh_kernel": EMBEDDING_NEARDUP_LSH_SQL,
}
