"""BM25 top-k query engine over the posting-segment index.

Reproduces the search semantics the reference delegated to Atlas Search
(reference search_utils.py:75-117 text/autocomplete dispatch,
search_utils.py:104-151 compound must/should, search_utils.py:157-171 boosts,
pipelines.py:27-42 facet count + skip/limit pagination) — rank-identically to
the pure-Python oracle.

Two physical strategies:

- ``mode="sort"`` (correctness baseline): decode candidate blocks -> vectorized
  BM25 -> groupBy(doc_id) with ascending-term-order float summation ->
  ``orderBy(score desc, doc_id asc).offset(skip).limit(k)``.  Catalyst executes
  the limit as TakeOrderedAndProject — a per-partition bounded heap + driver
  k-way merge, which is exactly the distributed top-k the north star asks for.

- ``mode="wand"`` (block-max pruned): because every term's postings are
  bucketed on the SAME global doc-id grid (builder.py), per-range score upper
  bounds can be summed across query terms.  Phase 1 scores the most promising
  ranges exactly and takes a threshold θ from the running top-k heap; phase 2
  skips every remaining range — and, inside surviving ranges, every block —
  whose upper bound is strictly below θ.  Pruning uses strict inequality so
  θ-ties (which doc_id tiebreaks could still admit) are never dropped:
  results stay bit-identical to the baseline.

Float determinism: per-doc scores are summed in ascending term order via
``sort_array(collect_list(struct(term, score)))`` + ``F.aggregate`` — a
JVM-side deterministic fold, immune to shuffle/partition ordering.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis.text import (
    edit_distance_leq,
    preprocess_query,
    regex_pattern_parts,
    tokenize,
    wildcard_pattern_parts,
)
from ..catalog import IndexCatalog
from ..index.codec import decode_position_lists, decode_postings
from ..numerics import round_half_away

K1 = 1.2
B = 0.75
CONSTANT_BOOST = 5.0  # reference constants.py:16
AVAIL_BOOST = 10.0  # reference search_utils.py:157
# derived group key for grouped search (reference /v2/search groups scored
# hits by g_id, app.py:488-520); like boosted/avail it derives from dl so
# the engine and every oracle compute it identically from the corpus
GROUP_MOD = 53

_SCORED_SCHEMA = "doc_id long, term string, score double, dl int"


@dataclass
class SearchResult:
    total: int
    page: pd.DataFrame  # columns: doc_id, score (ranked)


def _math_idf(n_docs: int, df: int) -> float:
    import math

    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


# term dictionaries up to this size are cached in driver memory; above it the
# engine falls back to distributed parquet range scans (the cluster-scale path)
_TERM_DICT_CACHE_MAX = 2_000_000


def _phrase_match_arrays(
    terms_seq: list[str], decoded: dict[str, tuple], max_gap: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Phrase / ordered-proximity matching over decoded positional postings.

    ``decoded[t] = (doc_ids, tfs, dls, pos_flat)`` concatenated over t's
    blocks (``pos_flat`` groups by posting row, each run sorted ascending).
    Occurrences become composite keys ``doc_id * stride + pos`` with
    ``stride`` exceeding the largest possible in-doc shift, so "term_{i}
    at position p+d in the same doc" is exactly "key + d" — the whole
    chain is sorted-set intersections with NO per-doc loop.  Works
    unchanged for repeated phrase terms ("milk milk": K + 1 ∩ K).

    ``max_gap=0`` is the exact phrase.  ``max_gap=g`` is ordered proximity
    (the Lucene Intervals "ordered NEAR with maxgaps" semantics, NOT
    SloppyPhraseQuery's transposition slop): every adjacent pair may be
    separated by up to g extra tokens, terms strictly in order; tf counts
    the distinct LAST-term positions that complete a chain.

    Returns matched (doc_ids, tfs, dls, first_starts); ``first_starts`` is
    each doc's first phrase START offset for the exact phrase, and -1 when
    ``max_gap > 0`` (variable gaps make the start unrecoverable from the
    end key alone — highlight refuses proximity queries for this reason).
    Keys never leave this function, so callers on different partitions may
    see different strides.
    """
    empty = (np.empty(0, np.int64),) * 4
    if any(t not in decoded or decoded[t][0].size == 0 for t in terms_seq):
        return empty
    m = len(terms_seq)
    max_dl = max(int(decoded[t][2].max()) for t in set(terms_seq))
    stride = max_dl + (m - 1) * (max_gap + 1) + 2
    keys: dict[str, np.ndarray] = {}
    for t in set(terms_seq):
        ids, tfs, _, pos = decoded[t]
        keys[t] = np.sort(np.repeat(ids, tfs) * stride + pos)
    s = keys[terms_seq[0]]
    for t in terms_seq[1:]:
        if max_gap == 0:
            s = np.intersect1d(s + 1, keys[t], assume_unique=True)
        else:
            s = np.unique(
                np.concatenate(
                    [
                        np.intersect1d(s + d, keys[t], assume_unique=True)
                        for d in range(1, max_gap + 2)
                    ]
                )
            )
        if s.size == 0:
            return empty
    # s is sorted, holds the LAST term's keys -> per doc, the first key is
    # the first occurrence; exact-phrase START = end position - (m-1)
    uniq, first_ix, counts = np.unique(s // stride, return_index=True,
                                       return_counts=True)
    if max_gap == 0:
        firsts = s[first_ix] % stride - (m - 1)
    else:
        firsts = np.full(uniq.size, -1, dtype=np.int64)
    # dl lookup from the first term's postings (matched docs ⊆ its docs;
    # a (term, doc) posting lives in exactly one block, so ids are unique)
    ids0, _, dls0, _ = decoded[terms_seq[0]]
    order = np.argsort(ids0)
    dl_out = dls0[order][np.searchsorted(ids0[order], uniq)]
    return uniq, counts.astype(np.int64), dl_out.astype(np.int64), firsts.astype(np.int64)


def _concat_decoded(parts: dict[str, list]) -> dict[str, tuple]:
    return {
        t: tuple(np.concatenate([p[j] for p in ps]) for j in range(4))
        for t, ps in parts.items()
    }


def predict_wand_decode(
    meta: pd.DataFrame,
    idf: dict[str, float],
    k: int,
    bound_scale: float = 1.0,
    boost_ceiling: float = 0.0,
    floor_scale: float = 1.0,
) -> dict:
    """Metadata-only estimate of the postings WAND will actually decode.

    The dispatch cost model (mode="auto"): decides sort-vs-WAND from the
    (term, sseg, max_tf_norm, doc_count) frame BEFORE touching any postings
    bytes.  Measured motivation (BENCH §3c): at 10^6 docs WAND loses ~1.5×
    on dense-dense disjunctions ("the oil" — every range holds both terms at
    similar bounds, nothing prunes, and WAND pays an extra Spark job) and
    wins multiples on rare-dominated ones ("the cadbury" — θ lands above
    every stopword-only range bound and phase 2 skips almost everything).

    Mechanics: θ_lb = k-th largest PER-RANGE single-term achievable score
    (idf·mtn is attained by the doc realizing the block max, and distinct
    ranges contain distinct docs, so θ_lb is a sound lower bound on the true
    θ).  Predicted decode = phase-1 ranges (scored exactly, no θ yet) plus
    every remaining (term, range) cell whose range bound + boost ceiling
    reaches θ_lb.  θ_lb ≤ θ and the per-cell mtn aggregates over that
    range's blocks, so the estimate only OVER-predicts decode — auto never
    picks WAND on an optimistic guess.  ("Attained" assumes bounds baked at
    the avgdl scoring uses: always true single-field batch, true multi-field
    only under the per-field bake (stats per_field_mtn), and true on
    incremental indexes after multiplying by ``floor_scale`` =
    min_g(avgdl_now/avgdl_g, 1) — a pre-r5 multi-field index inflates θ_lb
    here and the prediction can run optimistic, a dispatch-quality issue
    only; result correctness never depends on it.)

    Returns {total_dc, predicted_dc, theta_lb, n_ranges}.
    """
    if meta.empty:
        return {"total_dc": 0, "predicted_dc": 0, "theta_lb": 0.0, "n_ranges": 0}
    m = meta.copy()
    m["ub"] = m["term"].map(idf).fillna(0.0) * (m["mtn"] * bound_scale)
    # θ_lb must be ATTAINED, so it uses the baked mtn times floor_scale —
    # mirroring _wand_scored's floor.  floor_scale is 1.0 on batch indexes
    # (mtn is exactly what the block-max doc scores); on generational
    # indexes whose cumulative avgdl SHRANK below a generation's build-time
    # avgdl, mtn·min_g(avgdl_now/avgdl_g) is the attained lower bound
    # (tf_norm(a1) >= tf_norm(a0)·a1/a0 for a1 < a0).  Never bound_scale:
    # that inflates bounds to stay a sound UPPER bound and no doc attains
    # the inflated value.  ub keeps bound_scale: it is the sound upper
    # bound the alive-set test prunes against.
    m["ach"] = m["term"].map(idf).fillna(0.0) * (m["mtn"] * floor_scale)
    rng = m.groupby("sseg").agg(
        ub=("ub", "sum"), dc=("dc", "sum"), best=("ach", "max")
    )
    total_dc = int(rng["dc"].sum())
    best_sorted = np.sort(rng["best"].to_numpy())
    if best_sorted.size < k:
        # fewer ranges than k: no sound θ floor; assume nothing prunes
        return {
            "total_dc": total_dc, "predicted_dc": total_dc,
            "theta_lb": 0.0, "n_ranges": int(len(rng)),
        }
    theta_lb = float(best_sorted[-k])
    # phase-1 selection mirrors _wand_scored: ranges by best achievable
    rng_sorted = rng.sort_values("best", ascending=False)
    cum = rng_sorted["dc"].cumsum().to_numpy()
    n1 = int(np.searchsorted(cum, k) + 1)
    phase1 = set(rng_sorted.index[:n1])
    pred = int(rng_sorted["dc"].iloc[:n1].sum())
    rest = m[~m["sseg"].isin(phase1)]
    alive = (rest["sseg"].map(rng["ub"]) + boost_ceiling) >= theta_lb
    pred += int(rest.loc[alive, "dc"].sum())
    return {
        "total_dc": total_dc, "predicted_dc": int(pred),
        "theta_lb": theta_lb, "n_ranges": int(len(rng)),
    }


def _fuzzy_term_cond(operand, term: str, fuzzy: int, transpositions: bool):
    """The distributed edit-distance filter over a term (or key-suffix)
    column — THE three-way dispatch both dictionary-scale expansions share:
    plain ``levenshtein``; at transpositions+k=1 the exact closed form
    ``levenshtein <= 1 OR operand IN swap_variants(q)``; and only for the
    no-closed-form transpositions+k>=2 shape (beyond Lucene's own cap) an
    Arrow-batched pandas_udf running the banded OSA DP."""
    if not transpositions:
        return F.levenshtein(operand, F.lit(term)) <= fuzzy
    if fuzzy == 1:
        from ..analysis.text import swap_variants

        cond = F.levenshtein(operand, F.lit(term)) <= fuzzy
        swaps = swap_variants(term)
        if swaps:
            cond = cond | operand.isin(swaps)
        return cond
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _osa_leq(vals: pd.Series) -> pd.Series:
        return vals.map(lambda t: edit_distance_leq(t, term, fuzzy, True))

    return _osa_leq(operand)


def soundex_key_col(c):
    """``analysis.text.soundex_key`` as a pure-JVM Spark column expression —
    the chain the distributed phonetic expansion and the declarative twins
    share with the python and DuckDB forms (one definition, three stacks):
    translate a..z to codes -> collapse adjacent-duplicate codes -> drop the
    first code (the kept letter's own) -> drop vowel zeros -> pad/cut to 3.
    Non-[a-z]+ terms key to themselves."""
    from ..analysis.text import _SOUNDEX_MAP

    codes = F.translate(c, "abcdefghijklmnopqrstuvwxyz", _SOUNDEX_MAP)
    deduped = F.regexp_replace(codes, r"(.)\1+", "$1")
    rest = F.regexp_replace(F.substring(deduped, 2, 1_000_000), "0", "")
    key = F.concat(
        F.upper(F.substring(c, 1, 1)),
        F.substring(F.rpad(rest, 3, "0"), 1, 3),
    )
    return F.when(c.rlike("^[a-z]+$"), key).otherwise(c)


class SearchEngine:
    def __init__(self, spark: SparkSession, index_dir: str, log_queries: bool = False):
        self.spark = spark
        self.cat = IndexCatalog(index_dir)
        # C7 query-log sink (reference logs request/response on every search
        # endpoint, app.py:62-64,436-438): when enabled, every search()
        # appends one row to the catalog's append-only query_log table
        self.log_queries = log_queries
        # resume qids from the existing append-only log: a second engine
        # instance (or a restart) against the same index must not reuse qids,
        # or qid stops being a usable log key (the log table is shared)
        self._qid = 0
        if log_queries:
            existing = self.cat.read_query_log()
            if existing.num_rows:
                # default=0 guards a log whose every qid is null (a corrupt
                # or hand-written table must not crash engine construction)
                self._qid = max(
                    (q for q in existing.column("qid").to_pylist() if q is not None),
                    default=0,
                )
        self.stats = self.cat.read_corpus_stats()
        self.n_docs = int(self.stats["n_docs"])
        self.avgdl = float(self.stats["avgdl"])
        self.cuts = list(self.stats["term_cuts"])
        # incremental indexes (streaming/ingest.py) bake each generation's
        # max_tf_norm with the avgdl known AT that generation; if avgdl has
        # since grown, old block bounds under-estimate and WAND pruning would
        # be unsound.  bound_scale = max_g(avgdl_now / avgdl_build_g, 1) is a
        # sound uniform correction (tf_norm(avgdl1) <= tf_norm(avgdl0) *
        # avgdl1/avgdl0 for avgdl1 > avgdl0); batch indexes carry 1.0 and
        # x * 1.0 == x leaves their plans bit-identical.
        self.bound_scale = float(self.stats.get("wand_bound_scale", 1.0))
        # dual correction for the θ achievable floor: min_g(avgdl_now /
        # avgdl_build_g, 1).  1.0 on batch indexes (mtn is exactly what the
        # block-max doc scores today) and on incremental indexes whose
        # avgdl only grew; < 1 when a generation baked at a LARGER avgdl
        # than the current corpus — its mtn is then attained by NO doc and
        # an uncorrected floor could exceed the true θ and prune a top-k
        # range.  The attained correction is the linear shrink bound
        # tf_norm(a1) >= tf_norm(a0)·a1/a0 for a1 < a0.  An incremental
        # index whose stats predate the key gives no per-generation data to
        # rule shrink out, so the floor is disabled outright (0.0 — every
        # θ candidate then comes from phase-1's exact scores, always sound).
        if "wand_floor_scale" in self.stats:
            self.floor_scale = float(self.stats["wand_floor_scale"])
        elif self.stats.get("corpus_path") == "incremental":
            self.floor_scale = 0.0
        else:
            self.floor_scale = 1.0
        # multi-field index (builder.BuildConfig.field_cols): posting keys are
        # "<field><sep><term>" and each field carries its own doc_count/avgdl
        # (Lucene per-field norms; reference clauses address named paths,
        # search_utils.py:79-97,181-203).  Empty dict = single-field index.
        self.fields: dict[str, dict] = dict(self.stats.get("fields") or {})
        self.field_sep: str = str(self.stats.get("field_sep", "\x1f"))
        # True when block bounds were baked at each posting's OWN field
        # avgdl (builder per-field bake): bounds are then attained — the
        # exact quantity query-time scoring computes — so the per-range
        # achievable θ floor is sound on multi-field compound queries too.
        # Pre-r5 multi-field indexes baked at max field avgdl (sound upper
        # bound only) and carry no flag → floor stays disabled for them.
        self.per_field_mtn = bool(self.stats.get("per_field_mtn", False))
        # doc-values sidecar columns (builder.BuildConfig.docvalues_cols):
        # per-doc attributes stored on doc_stats for Atlas range/equals
        # filter clauses.  Empty = no doc values baked.
        self.docvalues_cols: tuple = tuple(self.stats.get("docvalues_cols") or ())
        # build-time value histograms for low-cardinality string dv columns
        # (builder dv_value_stats): power the semi-vs-anti filter-join plan
        self.docvalues_stats: dict = dict(self.stats.get("docvalues_stats") or {})
        # observability: the last dv filter plan ({"fraction", "anti"})
        self.last_dv_plan: dict | None = None
        self._segments_df = spark.read.parquet(self.cat.segments)
        # doc_stats pinned at construction like the segments frame: dv
        # filters / field sorts / facets / url hydration all read it, and
        # re-planning spark.read.parquet per query pays a footer/file-listing
        # round trip that a serving tier multiplexing queries cannot afford.
        # (An index grown by ingest is served by a NEW engine instance —
        # the existing contract for every cached structure here.)
        self._doc_stats_df = spark.read.parquet(self.cat.doc_stats)
        # small term dicts: one-time sorted load, then O(log V) lookups with
        # zero Spark jobs per query (the reference's Atlas term dictionary is
        # equally memory-resident inside Lucene).  Incremental indexes store
        # term stats as per-generation df DELTAS — every read aggregates by
        # term (identity for a batch index, whose terms are unique).
        self._terms_arr: np.ndarray | None = None
        self._dfs_arr: np.ndarray | None = None
        self._term_lens: np.ndarray | None = None
        # per-(term, fuzzy, cap) expansion memo — repeated misspellings are
        # the common case in real query logs; bounded, cleared wholesale
        self._fuzzy_cache: dict[tuple, list[str]] = {}
        # lazy per-dictionary-term Soundex keys (expand_phonetic)
        self._phonetic_keys: np.ndarray | None = None
        tdf = spark.read.parquet(self.cat.term_stats)
        n_terms = tdf.count()
        if n_terms <= _TERM_DICT_CACHE_MAX:
            pdf = (
                tdf.groupBy("term").agg(F.sum("df").alias("df"))
                .toPandas().sort_values("term")
            )
            self._terms_arr = pdf["term"].to_numpy(dtype=object)
            self._dfs_arr = pdf["df"].to_numpy(dtype=np.int64)

    # ------------------------------------------------------------------ dims
    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        if not terms:
            return {}
        if self._terms_arr is not None:
            idx = np.searchsorted(self._terms_arr, np.array(terms, dtype=object))
            out = {}
            for t, i in zip(terms, idx):
                if i < len(self._terms_arr) and self._terms_arr[i] == t:
                    out[t] = int(self._dfs_arr[i])
            return out
        rows = (
            self.spark.read.parquet(self.cat.term_stats)
            .filter(F.col("term").isin(list(terms)))
            .groupBy("term").agg(F.sum("df").alias("df"))
            .collect()
        )
        return {r["term"]: r["df"] for r in rows}

    def expand_prefix(self, prefix: str, max_expansions: int | None = None) -> list[str]:
        """Term-dictionary prefix range scan (reference $search.autocomplete,
        search_utils.py:182-186; pinned to a range scan in FIXTURES.md)."""
        if self._terms_arr is not None:
            lo = np.searchsorted(self._terms_arr, prefix)
            hi = np.searchsorted(self._terms_arr, prefix + "\U0010ffff")
            out = [str(t) for t in self._terms_arr[lo:hi] if str(t).startswith(prefix)]
            return out[:max_expansions] if max_expansions else out
        q = (
            self.spark.read.parquet(self.cat.term_stats)
            .filter(F.col("term").startswith(prefix))
            .select("term")
            .distinct()
            .orderBy("term")
        )
        if max_expansions:
            q = q.limit(max_expansions)
        return [r["term"] for r in q.collect()]

    def _require_single_field(self, surface: str) -> None:
        """Bare-term dictionary surfaces silently match NOTHING against a
        multi-field index's prefixed keys (and the length prefilter would
        reject every key anyway) — same fail-loud rule as plain search()."""
        if self.fields:
            raise ValueError(
                f"{surface} addresses the bare term dictionary; this is a "
                f"multi-field index (fields: {sorted(self.fields)}) — use "
                "the field-scoped clause forms (search_fields / "
                "search_field_phrase)"
            )

    def expand_fuzzy(
        self, term: str, fuzzy: int, max_expansions: int | None = None,
        transpositions: bool = False,
    ) -> list[str]:
        """Dictionary terms within edit distance ``fuzzy`` of ``term``
        (Atlas/Lucene fuzzy matching: the query term expands to its
        edit-distance neighborhood, then scores as a disjunction).

        ``transpositions=True`` counts an adjacent swap as ONE edit —
        Lucene's ``fuzzy.transpositions``, the Atlas default the reference's
        ``$search`` fuzzy option inherits ('teh' now reaches 'the').

        Cached-dictionary path: numpy length prefilter (|len diff| <= fuzzy)
        + banded DP over the survivors.  Above the cache budget the
        expansion is one JVM-side filter over the distributed term stats —
        plain ``F.levenshtein``, plus (transpositions at fuzzy=1) the exact
        closed form ``levenshtein(t, q) <= 1 OR t IN swap_variants(q)``; for
        the one shape with no JVM closed form (transpositions at fuzzy >= 2,
        beyond Lucene's own max of 2) an Arrow-batched pandas_udf runs the
        same banded DP over the term dictionary — dictionary-scale, never
        corpus-scale.  ``max_expansions`` keeps the first N in ascending
        term order (the deterministic cap every oracle can reproduce).
        Results memoize per engine instance (bounded) — repeat misspellings
        skip the scan.
        """
        self._require_single_field("expand_fuzzy")
        key = (term, int(fuzzy), max_expansions, bool(transpositions))
        hit = self._fuzzy_cache.get(key)
        if hit is not None:
            return list(hit)
        if self._terms_arr is not None:
            if self._term_lens is None:
                self._term_lens = np.fromiter(
                    (len(t) for t in self._terms_arr), dtype=np.int64,
                    count=len(self._terms_arr),
                )
            cand = self._terms_arr[np.abs(self._term_lens - len(term)) <= fuzzy]
            out = [
                str(t) for t in cand
                if edit_distance_leq(str(t), term, fuzzy, transpositions)
            ]
        else:
            rows = (
                self.spark.read.parquet(self.cat.term_stats)
                .select("term").distinct()
                .filter(_fuzzy_term_cond(F.col("term"), term, fuzzy, transpositions))
                .collect()
            )
            out = sorted(r["term"] for r in rows)
        out = out[:max_expansions] if max_expansions else out
        if len(self._fuzzy_cache) > 10_000:
            self._fuzzy_cache.clear()
        self._fuzzy_cache[key] = out
        return list(out)

    def expand_wildcard(
        self, pattern: str, max_expansions: int | None = None
    ) -> list[str]:
        """Dictionary terms matching a Lucene/Atlas ``wildcard`` pattern
        (``*`` = any run, ``?`` = one char); the expansion scores as a
        disjunction like every other term-expansion surface.

        Cached-dictionary path: the pattern's fixed prefix bounds a range
        scan (the same bound Lucene's term enumeration seeks to) and the
        shared anchored regex filters the slice; above the cache budget the
        SAME regex runs JVM-side (``rlike``) over the distributed term
        stats, prefix-pruned by ``startswith``.  ``max_expansions`` keeps
        the first N ascending — the deterministic cap every oracle twin
        reproduces.
        """
        self._require_single_field("expand_wildcard")
        fixed, regex = wildcard_pattern_parts(pattern)
        if self._terms_arr is not None:
            lo = np.searchsorted(self._terms_arr, fixed)
            hi = np.searchsorted(self._terms_arr, fixed + "\U0010ffff")
            rx = re.compile(regex)
            out = [str(t) for t in self._terms_arr[lo:hi] if rx.match(str(t))]
        else:
            q = (
                self.spark.read.parquet(self.cat.term_stats)
                .select("term").distinct()
                .filter(
                    F.col("term").startswith(fixed) & F.col("term").rlike(regex)
                )
                .orderBy("term")
            )
            if max_expansions:
                q = q.limit(max_expansions)
            out = [r["term"] for r in q.collect()]
        return out[:max_expansions] if max_expansions else out

    def _expand_wildcard_in_field(
        self, field: str, pattern: str, max_expansions: int | None = None
    ) -> list[str]:
        """Wildcard expansion scoped to one field's vocabulary (the Atlas
        ``wildcard`` operator's ``path``): the fixed prefix extends the
        field's contiguous key range, the regex matches the key SUFFIX.
        Returns prefixed keys, ascending."""
        fixed, regex = wildcard_pattern_parts(pattern)
        sep = self.field_sep
        kpfx = f"{field}{sep}{fixed}"
        if self._terms_arr is not None:
            lo = np.searchsorted(self._terms_arr, kpfx)
            hi = np.searchsorted(self._terms_arr, kpfx + "\U0010ffff")
            rx = re.compile(regex)
            plen = len(field) + len(sep)
            out = [
                str(t) for t in self._terms_arr[lo:hi] if rx.match(str(t)[plen:])
            ]
        else:
            suffix = F.substring(F.col("term"), len(field) + len(sep) + 1, 1_000_000)
            q = (
                self.spark.read.parquet(self.cat.term_stats)
                .select("term").distinct()
                .filter(F.col("term").startswith(kpfx) & suffix.rlike(regex))
                .orderBy("term")
            )
            if max_expansions:
                q = q.limit(max_expansions)
            return [r["term"] for r in q.collect()]
        return out[:max_expansions] if max_expansions else out

    def expand_regex(
        self, pattern: str, max_expansions: int | None = None
    ) -> list[str]:
        """Dictionary terms fully matching an Atlas/Lucene ``regex``-operator
        pattern (the dialect-safe subset ``regex_pattern_parts`` pins: the
        same pattern text means the same language to python ``re``, Java
        ``rlike``, and DuckDB's RE2).  Same shape as ``expand_wildcard``:
        fixed-prefix-bounded range scan + fullmatch on the cached
        dictionary; ``startswith`` + anchored ``rlike`` JVM-side above the
        cache budget; first-N-ascending cap."""
        self._require_single_field("expand_regex")
        fixed, rx_src = regex_pattern_parts(pattern)
        if self._terms_arr is not None:
            lo = np.searchsorted(self._terms_arr, fixed)
            hi = np.searchsorted(self._terms_arr, fixed + "\U0010ffff")
            rx = re.compile(rx_src)
            out = [str(t) for t in self._terms_arr[lo:hi] if rx.fullmatch(str(t))]
        else:
            q = (
                self.spark.read.parquet(self.cat.term_stats)
                .select("term").distinct()
                .filter(
                    F.col("term").startswith(fixed)
                    & F.col("term").rlike(f"^(?:{rx_src})$")
                )
                .orderBy("term")
            )
            if max_expansions:
                q = q.limit(max_expansions)
            out = [r["term"] for r in q.collect()]
        return out[:max_expansions] if max_expansions else out

    def _expand_regex_in_field(
        self, field: str, pattern: str, max_expansions: int | None = None
    ) -> list[str]:
        """Regex expansion scoped to one field's vocabulary (the Atlas
        ``regex`` operator's ``path``), mirroring the wildcard form."""
        fixed, rx_src = regex_pattern_parts(pattern)
        sep = self.field_sep
        kpfx = f"{field}{sep}{fixed}"
        if self._terms_arr is not None:
            lo = np.searchsorted(self._terms_arr, kpfx)
            hi = np.searchsorted(self._terms_arr, kpfx + "\U0010ffff")
            rx = re.compile(rx_src)
            plen = len(field) + len(sep)
            return [
                str(t) for t in self._terms_arr[lo:hi]
                if rx.fullmatch(str(t)[plen:])
            ][: max_expansions or None]
        suffix = F.substring(F.col("term"), len(field) + len(sep) + 1, 1_000_000)
        q = (
            self.spark.read.parquet(self.cat.term_stats)
            .select("term").distinct()
            .filter(
                F.col("term").startswith(kpfx)
                & suffix.rlike(f"^(?:{rx_src})$")
            )
            .orderBy("term")
        )
        if max_expansions:
            q = q.limit(max_expansions)
        return [r["term"] for r in q.collect()]

    def expand_prefix_fuzzy(
        self, term: str, fuzzy: int, max_expansions: int | None = None
    ) -> list[str]:
        """Fuzzy autocomplete expansion (Atlas ``autocomplete`` with the
        ``fuzzy`` option): dictionary terms having a PREFIX within
        Levenshtein distance ``fuzzy`` of the query term.

        Closed form shared by every twin: ``min over L in
        [len(q)-fuzzy, len(q)+fuzzy] of levenshtein(t[:L], q) <= fuzzy``
        (a matching prefix's length is within ``fuzzy`` of len(q)).  The
        cached-dictionary path computes it with a banded DP
        (``prefix_edit_distance_leq``); above the cache budget it is one
        JVM-side ``least(levenshtein(substring(term, 1, L), q))`` filter
        over the distributed term stats — same definition, cluster-scale.
        """
        from ..analysis.text import prefix_edit_distance_leq

        self._require_single_field("expand_prefix_fuzzy")
        key = ("pf", term, int(fuzzy), max_expansions)
        hit = self._fuzzy_cache.get(key)
        if hit is not None:
            return list(hit)
        lq = len(term)
        if self._terms_arr is not None:
            if self._term_lens is None:
                self._term_lens = np.fromiter(
                    (len(t) for t in self._terms_arr), dtype=np.int64,
                    count=len(self._terms_arr),
                )
            cand = self._terms_arr[self._term_lens >= lq - fuzzy]
            out = [str(t) for t in cand if prefix_edit_distance_leq(term, str(t), fuzzy)]
        else:
            exprs = [
                F.levenshtein(F.substring("term", 1, L), F.lit(term))
                for L in range(max(1, lq - fuzzy), lq + fuzzy + 1)
            ]
            cond = (F.least(*exprs) if len(exprs) > 1 else exprs[0]) <= fuzzy
            rows = (
                self.spark.read.parquet(self.cat.term_stats)
                .select("term").distinct().filter(cond).collect()
            )
            out = sorted(r["term"] for r in rows)
        out = out[:max_expansions] if max_expansions else out
        if len(self._fuzzy_cache) > 10_000:
            self._fuzzy_cache.clear()
        self._fuzzy_cache[key] = out
        return list(out)

    def expand_phonetic(self, term: str) -> list[str]:
        """Dictionary terms sharing ``term``'s pinned Soundex key (ascending)
        — SURVEY §2 A11, the reference's commented-out "sounds_like" phonetic
        pipeline (reference metaphone.py:37-47) re-expressed as key-equal
        dictionary expansion scored as the standard disjunction.

        Cached-dictionary path: the per-term key array is computed once,
        lazily, then every expansion is a numpy mask.  Above the cache budget
        the expansion is one JVM-side filter over the distributed term stats
        using the same translate/regexp chain (``soundex_key_col``) — the
        identical definition, cluster-scale, no Python in the filter.
        """
        from ..analysis.text import soundex_key

        self._require_single_field("expand_phonetic")
        key = ("ph", term)
        hit = self._fuzzy_cache.get(key)
        if hit is not None:
            return list(hit)
        want = soundex_key(term)
        if self._terms_arr is not None:
            if self._phonetic_keys is None:
                self._phonetic_keys = np.array(
                    [soundex_key(str(t)) for t in self._terms_arr], dtype=object
                )
            out = [str(t) for t in self._terms_arr[self._phonetic_keys == want]]
        else:
            rows = (
                self.spark.read.parquet(self.cat.term_stats)
                .select("term").distinct()
                .filter(soundex_key_col(F.col("term")) == F.lit(want))
                .collect()
            )
            out = sorted(r["term"] for r in rows)
        if len(self._fuzzy_cache) > 10_000:
            self._fuzzy_cache.clear()
        self._fuzzy_cache[key] = out
        return list(out)

    def suggest(
        self, term: str, fuzzy: int = 1, transpositions: bool = False
    ) -> str | None:
        """"Did you mean": the most frequent dictionary term within edit
        distance ``fuzzy`` (df desc, term asc tiebreak) — None when nothing
        is in range.  A term already in the dictionary suggests itself
        (distance 0 dominates nothing; df decides).  ``transpositions``
        counts an adjacent swap as one edit, so 'teh' suggests 'the'."""
        cands = self.expand_fuzzy(term, fuzzy, transpositions=transpositions)
        if not cands:
            return None
        dfs = self.term_dfs(cands)
        return min(cands, key=lambda t: (-dfs.get(t, 0), t))

    def _pids_for_terms(self, terms: list[str]) -> list[int]:
        cuts = np.array(self.cuts, dtype=object)
        return sorted({int(np.searchsorted(cuts, t, side="left")) for t in terms})

    def _candidate_segments(self, terms: list[str], ssegs: list[int] | None = None) -> DataFrame:
        seg = self._segments_df
        cond = F.col("term").isin(terms) & F.col("pid").isin(self._pids_for_terms(terms))
        if ssegs is not None:
            cond = cond & F.col("sseg").isin([int(s) for s in ssegs])
        return seg.filter(cond)

    # --------------------------------------------------------------- scoring
    def _scored_rows(
        self,
        terms: list[str],
        idf: dict[str, float],
        ssegs: list[int] | None = None,
        theta: float | None = None,
        boost_ceiling: float = 0.0,
        rest_bounds: dict | None = None,
        avgdl_map: dict[str, float] | None = None,
    ) -> DataFrame:
        """Decode candidate blocks -> per-(doc,term) BM25 partial scores.

        ``rest_bounds[(term, sseg)]`` is the sum of the OTHER query terms'
        score upper bounds in that doc range: a block of one term can only be
        pruned against θ after adding what the other terms could still
        contribute (pruning on the single-term bound alone would wrongly drop
        docs whose score is split across terms).

        ``avgdl_map`` overrides the corpus avgdl per term — the multi-field
        path passes each posting key its FIELD's avgdl (Lucene per-field
        norms); baked block bounds stay sound because the builder bakes with
        the largest per-field avgdl (tf_norm is monotone in avgdl).
        """
        avgdl = self.avgdl
        bscale = self.bound_scale
        idf_b = self.spark.sparkContext.broadcast(dict(idf))
        rb_b = self.spark.sparkContext.broadcast(rest_bounds or {})
        adl_b = self.spark.sparkContext.broadcast(dict(avgdl_map or {}))
        th = theta

        def score_blocks(it):
            idfs = idf_b.value
            rbs = rb_b.value
            adls = adl_b.value
            for pdf in it:
                if len(pdf) == 0:
                    continue
                outs = []
                terms_col = pdf["term"].to_numpy(dtype=object)
                sseg_col = pdf["sseg"].to_numpy(dtype=np.int64)
                mtn = pdf["max_tf_norm"].to_numpy(dtype=np.float64)
                for i, buf in enumerate(pdf["postings"]):
                    t = terms_col[i]
                    w = idfs.get(t, 0.0)
                    # block-max pruning: skip blocks that cannot reach θ even
                    # with the other terms' range bounds added
                    if th is not None:
                        rest = rbs.get((t, int(sseg_col[i])), 0.0)
                        if w * (mtn[i] * bscale) + rest + boost_ceiling < th:
                            continue
                    doc_ids, tfs, dls = decode_postings(buf)
                    tf = tfs.astype(np.float64)
                    dl = dls.astype(np.float64)
                    adl = adls.get(t, avgdl)
                    score = w * tf / (tf + K1 * (1.0 - B + B * dl / adl))
                    outs.append(
                        pd.DataFrame(
                            {
                                "doc_id": doc_ids,
                                "term": t,
                                "score": score,
                                "dl": dls.astype(np.int32),
                            }
                        )
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        segs = self._candidate_segments(terms, ssegs=ssegs)
        return segs.select("term", "sseg", "max_tf_norm", "postings").mapInPandas(
            score_blocks, schema=_SCORED_SCHEMA
        )

    def _scored_docs(
        self,
        terms: list[str],
        idf: dict[str, float],
        ssegs: list[int] | None = None,
        theta: float | None = None,
        boost_ceiling: float = 0.0,
        rest_bounds: dict | None = None,
        avgdl_map: dict[str, float] | None = None,
    ) -> DataFrame:
        """Per-doc BM25: partial scores folded in ascending term order."""
        scored = self._scored_rows(
            terms, idf, ssegs=ssegs, theta=theta, boost_ceiling=boost_ceiling,
            rest_bounds=rest_bounds, avgdl_map=avgdl_map,
        )
        # deterministic ascending-term-order float summation (JVM-side fold)
        parts = F.sort_array(F.collect_list(F.struct("term", "score")))
        return (
            scored.groupBy("doc_id")
            .agg(parts.alias("parts"), F.max("dl").alias("dl"))
            .select(
                "doc_id",
                F.aggregate(
                    "parts", F.lit(0.0), lambda acc, x: acc + x["score"]
                ).alias("score"),
                F.size("parts").alias("n_terms"),
                "dl",
            )
        )

    def _apply_boosts(
        self, scored: DataFrame, constant_boost: bool, avail_boost: bool
    ) -> DataFrame:
        """Boost metadata (boosted, avail) derives from dl — no join needed.

        Mirrors reference A6 (constant-score should clause, constants.py:16)
        and A8 (post-search availability boost, search_utils.py:157-165).
        """
        s = F.col("score")
        if constant_boost:
            s = s + F.when(F.col("dl") % 37 == 0, F.lit(CONSTANT_BOOST)).otherwise(F.lit(0.0))
        if avail_boost:
            s = s + F.when(F.col("dl") % 7 > 0, F.lit(AVAIL_BOOST)).otherwise(F.lit(0.0))
        return scored.withColumn("score", s)

    # ------------------------------------------------- driver-side fast path
    # A query whose candidate posting count is tiny relative to the cluster
    # does not earn a shuffle: decode + score at the driver in one collect
    # (the same call pattern Lucene serves from a single searcher).  The
    # distributed WAND path takes over when Σ df of the matched terms exceeds
    # this; at web scale every head-term query does.
    SMALL_QUERY_POSTINGS = 2_000_000
    # mode="auto" picks WAND iff total_dc - RATIO*predicted_dc >= MIN_SAVED.
    # Both constants are FIT TO INTERLEAVED A/B MEASUREMENT (BENCH §3c:
    # sf_wand_ab/mf_wand_ab — 16 (query, scale, layout) rows at 1M/8M/24M
    # docs, single- and multi-field.  The 24M rows are the first measured
    # WAND WINS, so the rule now brackets the crossover instead of only
    # extrapolating it):
    # - RATIO: a WAND-decoded posting costs ~3 sort-pipeline postings
    #   (marginal slope from the A/B: sort 0.077-0.154 s/M rows, WAND
    #   0.18-0.20 s/M — per-range python-kernel dispatch, ub bookkeeping,
    #   two-phase union vs the sort path's straight-line
    #   decode+TakeOrdered).
    # - MIN_SAVED: the interpolated break-even between the two measured
    #   brackets at ~976 ranges (sf_wand_ab_8m/24m.json, interleaved):
    #   at saved=8.1M rows sort wins by 1.0 s ("the oil", 8M docs); at
    #   saved=24.4M WAND wins by 0.27 s, 5/5 reps ("the oil", 24M docs,
    #   range_docs grown 4x so the range COUNT — WAND's fixed term — holds
    #   at ~1000, the shape a cluster operator scales).  Linear in saved,
    #   the margin crosses zero at ~21M.  The 24M rows also show the
    #   ±5% INDIFFERENCE ZONE around the threshold: "the dairy"
    #   (saved=23.4M) won 5/5 for WAND while "the cadbury" (saved=23.2M)
    #   lost 4/5 by 9% — structurally identical plans (1 probe + ~10 alive
    #   ranges of 976) whose outcomes at the break-even are noise-level,
    #   so a near-threshold mis-pick costs <10% either way; the expensive
    #   mistake (a wrong WAND pick far below threshold measured up to
    #   2.1x) stays excluded.
    # At cluster scale the structure, not the constants, is the claim: the
    # fixed term stays ~seconds of job overhead while an unpruned head-term
    # decode at 10^12 docs is 10^10+ rows — hours of CPU — so any strongly
    # prunable query clears MIN_SAVED by orders of magnitude there.
    WAND_DECODE_COST_RATIO = 3.0
    WAND_AUTO_MIN_SAVED = 21_000_000
    # populated by the last mode="auto" dispatch: {"mode", "total_dc",
    # "predicted_dc", "theta_lb", "n_ranges"} — bench/test introspection
    last_dispatch: dict | None = None
    # populated by the last _wand_scored call that built a full plan:
    # {"theta_floor", "theta", "n_ranges", "n_phase1", "n_rest_alive"};
    # reset to None on entry so early-exit WAND paths (empty metadata,
    # clause-filtered range set) never leave a previous query's numbers
    last_wand: dict | None = None

    def _pick_wand(self, est: dict) -> bool:
        """The auto-dispatch decision: cost-ratio rule over the metadata-only
        estimate (see WAND_DECODE_COST_RATIO).  One definition for both the
        single-field and compound dispatch sites."""
        return (
            est["total_dc"] > 0
            and est["total_dc"] - self.WAND_DECODE_COST_RATIO * est["predicted_dc"]
            >= self.WAND_AUTO_MIN_SAVED
        )

    def _driver_search(
        self,
        terms: list[str],
        idf: dict[str, float],
        conjunctive: bool,
        constant_boost: bool,
        avail_boost: bool,
        k: int,
        skip: int,
        group_by: bool = False,
        min_should_match: int = 0,
    ) -> SearchResult:
        rows = (
            self._candidate_segments(terms)
            .select("term", "postings")
            .collect()
        )
        per_term: dict[str, list] = {}
        for r in rows:
            per_term.setdefault(r["term"], []).append(r["postings"])
        # global doc table across matched terms
        all_ids = []
        decoded = {}
        for t in sorted(per_term):
            bufs = per_term[t]
            parts = [decode_postings(b) for b in bufs]
            ids = np.concatenate([p[0] for p in parts])
            tf = np.concatenate([p[1] for p in parts]).astype(np.float64)
            dl = np.concatenate([p[2] for p in parts]).astype(np.float64)
            decoded[t] = (ids, tf, dl)
            all_ids.append(ids)
        if not all_ids:
            return SearchResult(total=0, page=pd.DataFrame({"doc_id": [], "score": []}))
        uniq = np.unique(np.concatenate(all_ids))
        acc = np.zeros(uniq.size, dtype=np.float64)
        nt = np.zeros(uniq.size, dtype=np.int64)
        dls = np.zeros(uniq.size, dtype=np.int64)
        # ascending term order — the same fold order as the distributed path
        for t in sorted(decoded):
            ids, tf, dl = decoded[t]
            w = idf.get(t, 0.0)
            s = w * tf / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
            pos = np.searchsorted(uniq, ids)
            acc[pos] = acc[pos] + s
            nt[pos] += 1
            np.maximum.at(dls, pos, dl.astype(np.int64))
        if conjunctive:
            keep = nt == len(decoded)
            uniq, acc, dls = uniq[keep], acc[keep], dls[keep]
        elif min_should_match:
            # Lucene minimumShouldMatch m-of-n: keep docs matching at least
            # m of the query's terms (m=1 is the plain disjunction)
            keep = nt >= min_should_match
            uniq, acc, dls = uniq[keep], acc[keep], dls[keep]
        if constant_boost:
            acc = acc + np.where(dls % 37 == 0, CONSTANT_BOOST, 0.0)
        if avail_boost:
            acc = acc + np.where(dls % 7 > 0, AVAIL_BOOST, 0.0)
        if group_by:
            # group rollup (reference /v2/search, app.py:488-520): best hit
            # per g_id, group count, groups ranked by their best hit.
            # Winner selection and group ranking order on the ROUNDED score
            # (6 decimals, doc_id tiebreak) — the same rule every oracle
            # uses — so a last-ulp float difference can't flip a winner
            # between implementations; reported scores stay raw.
            gid = (dls % GROUP_MOD).astype(np.int64)
            accr = round_half_away(acc, 6)
            order = np.lexsort((uniq, -accr))
            gs, us, sc = gid[order], uniq[order], acc[order]
            uniq_g, first_pos, counts = np.unique(gs, return_index=True, return_counts=True)
            top_doc, top_score = us[first_pos], sc[first_pos]
            sel = np.lexsort((top_doc, -round_half_away(top_score, 6)))[skip : skip + k]
            page = pd.DataFrame(
                {
                    "doc_id": top_doc[sel],
                    "score": top_score[sel],
                    "g_id": uniq_g[sel],
                    "n_docs": counts[sel],
                }
            )
            return SearchResult(total=int(uniq_g.size), page=page)
        total = int(uniq.size)
        order = np.lexsort((uniq, -acc))[skip : skip + k]
        page = pd.DataFrame({"doc_id": uniq[order], "score": acc[order]})
        return SearchResult(total=total, page=page)

    # ----------------------------------------------------- multi-field search
    def _clause_terms(self, clause, max_expansions: int | None = None) -> list[str]:
        """One compound clause -> its prefixed posting keys.

        A clause addresses a named field path (reference ``{"text": {"query":
        kw, "path": "name"}}``, search_utils.py:79-97).  ``(field, query)``
        tuples are text clauses; dicts may set ``kind``:

        - ``text``: the analyzed terms of ``query``, each prefixed — the
          clause matches a doc when ANY of them is present (Lucene text
          query = disjunction within the clause);
        - ``prefix``: Atlas ``autocomplete`` (search_utils.py:182-186) — the
          single analyzed term expands by dictionary prefix scan WITHIN the
          field (prefixed keys sort contiguously per field, so the existing
          range scan is already field-scoped);
        - ``fuzzy``: the Atlas text clause's ``fuzzy`` option over a named
          path — every analyzed term expands to its edit-distance
          neighborhood WITHIN the field's vocabulary (options ``fuzzy``
          (default 1) and ``transpositions`` (default False) on the clause
          dict).  The clause matches when ANY variant is present, exactly
          like a plain text clause over the expanded term set;
        - ``wildcard``: the Atlas ``wildcard`` operator over a named path —
          the raw query is a ``*``/``?`` pattern expanded against the
          field's vocabulary (``_expand_wildcard_in_field``), then scored
          as the usual disjunction.
        """
        if isinstance(clause, (tuple, list)):
            field, query, kind = clause[0], clause[1], "text"
        else:
            field, query = clause["field"], clause["query"]
            kind = clause.get("kind", "text")
        if not self.fields:
            raise ValueError(
                "search_fields requires a multi-field index "
                "(build with BuildConfig(field_cols=...))"
            )
        if field not in self.fields:
            raise ValueError(
                f"unknown field {field!r}; index fields: {sorted(self.fields)}"
            )
        toks = preprocess_query(query)
        sep = self.field_sep
        if kind == "text":
            return [f"{field}{sep}{t}" for t in toks]
        if kind == "prefix":
            if len(toks) != 1:
                raise ValueError(
                    f"prefix clause needs a single analyzed term, got {toks!r}"
                )
            return self.expand_prefix(f"{field}{sep}{toks[0]}", max_expansions)
        if kind == "fuzzy":
            n = int(clause.get("fuzzy", 1))
            transpositions = bool(clause.get("transpositions", False))
            out: set[str] = set()
            for tk in toks:
                out.update(self._expand_fuzzy_in_field(
                    field, tk, n, transpositions, max_expansions
                ))
            return sorted(out)
        if kind == "wildcard":
            # the raw query IS the pattern (never analyzed — metacharacters
            # would be stripped); expansion is field-scoped like every
            # other clause kind
            return self._expand_wildcard_in_field(
                field, clause["query"], max_expansions
            )
        if kind == "regex":
            # same contract as wildcard: raw pattern, field-scoped expansion
            return self._expand_regex_in_field(
                field, clause["query"], max_expansions
            )
        raise ValueError(f"unknown clause kind {kind!r}")

    def _expand_fuzzy_in_field(
        self, field: str, term: str, fuzzy: int, transpositions: bool,
        max_expansions: int | None,
    ) -> list[str]:
        """Edit-distance expansion scoped to one field's vocabulary.

        Prefixed keys sort contiguously per field ([field+sep, field+" ")
        bounds: the \\x1f separator sorts below every token codepoint), so
        the cached path slices the dictionary to the field's range, strips
        the prefix, and runs the same banded DP as the single-field
        expansion; the distributed path applies the same k=1 closed form /
        pandas_udf to the key SUFFIX over a prefix-pruned term-stats scan.
        Returns prefixed keys, ascending.
        """
        sep = self.field_sep
        prefix = f"{field}{sep}"
        key = ("ff", field, term, int(fuzzy), max_expansions, bool(transpositions))
        hit = self._fuzzy_cache.get(key)
        if hit is not None:
            return list(hit)
        if self._terms_arr is not None:
            lo = int(np.searchsorted(self._terms_arr, prefix))
            # chr(0x20) sorts just above the \x1f separator and below every
            # token codepoint, so field+" " is an exclusive field upper bound
            hi = int(np.searchsorted(self._terms_arr, field + " "))
            plen = len(prefix)
            out = [
                str(t) for t in self._terms_arr[lo:hi]
                if abs((len(t) - plen) - len(term)) <= fuzzy
                and edit_distance_leq(str(t)[plen:], term, fuzzy, transpositions)
            ]
        else:
            suffix = F.substring(F.col("term"), len(prefix) + 1, 1_000_000)
            rows = (
                self.spark.read.parquet(self.cat.term_stats)
                .select("term").distinct()
                .filter(
                    F.col("term").startswith(prefix)
                    & _fuzzy_term_cond(suffix, term, fuzzy, transpositions)
                )
                .collect()
            )
            out = sorted(r["term"] for r in rows)
        out = out[:max_expansions] if max_expansions else out
        if len(self._fuzzy_cache) > 10_000:
            self._fuzzy_cache.clear()
        self._fuzzy_cache[key] = out
        return list(out)

    def _dv_eligible_fraction(self, clauses) -> float | None:
        """Estimated fraction of docs an equals/exists clause set keeps,
        from the build-time value histograms — None when any clause is not
        estimable (range clauses, unhistogrammed or non-string paths).
        Multi-clause sets multiply per-clause fractions (independence
        assumption — fine for the >0.5 plan heuristic this feeds)."""
        frac = 1.0
        n = max(1, self.n_docs)
        for c in clauses:
            if "equals" in c:
                h = self.docvalues_stats.get(c["equals"].get("path"))
                v = c["equals"].get("value")
                if h is None or not isinstance(v, str):
                    return None
                frac *= h["values"].get(v, 0) / n
            elif "exists" in c:
                h = self.docvalues_stats.get(c["exists"].get("path"))
                if h is None:
                    return None
                frac *= 1.0 - h["n_null"] / n
            else:
                return None
        return frac

    def _dv_plan(self, clauses):
        """(pred, anti_pred_or_None): the filter predicate plus, when the
        histograms say the predicate keeps MOST docs (> 0.5), the null-safe
        complement ``~coalesce(pred, False)`` — membership sites then
        anti-join against the small ineligible minority instead of
        semi-joining against the corpus-sized eligible majority.  The
        complement is mechanical and exact for ANY predicate: a doc has
        exactly one doc_stats row, eligible == pred true, and coalesce
        folds SQL null (attribute missing) into the ineligible side —
        identical results, measured cheaper (BENCH §9b-2/-3)."""
        pred = self._dv_predicate(clauses)
        frac = self._dv_eligible_fraction(clauses)
        anti = (
            ~F.coalesce(pred, F.lit(False))
            if frac is not None and frac > 0.5
            else None
        )
        self.last_dv_plan = {"fraction": frac, "anti": anti is not None}
        return pred, anti

    def _sort_spec(self, sort) -> tuple:
        """Validate an Atlas ``sort`` option against the baked doc-values
        columns -> (path, descending)."""
        bad = set(sort) - {"path", "order"}
        if bad:
            raise ValueError(f"sort takes path+order; unknown keys {sorted(bad)}")
        path = sort.get("path")
        if path not in self.docvalues_cols:
            raise ValueError(
                f"sort path {path!r} is not a doc-values column of "
                f"this index (baked: {sorted(self.docvalues_cols)}); "
                "build with BuildConfig(docvalues_cols=(...,))"
            )
        order = sort.get("order", "desc")
        if order not in ("asc", "desc"):
            raise ValueError(f"sort order must be 'asc' or 'desc'; got {order!r}")
        return path, order == "desc"

    @staticmethod
    def _split_dv_clauses(filter_list):
        """Partition a filter list into (text clauses, doc-values operator
        objects) — dv operators are dicts keyed range/equals/exists."""
        ops = ("range", "equals", "exists")
        dv = [c for c in filter_list
              if isinstance(c, dict) and any(o in c for o in ops)]
        text = [c for c in filter_list
                if not (isinstance(c, dict) and any(o in c for o in ops))]
        return text, dv

    def _dv_predicate(self, clauses):
        """Atlas ``range`` / ``equals`` filter clauses -> one Spark predicate
        over the doc-values sidecar (doc_stats columns baked by
        ``BuildConfig(docvalues_cols=...)``).

        Clause shapes (Atlas ``compound.filter`` operator objects beyond
        text):

        - ``{"range":  {"path": col, "gte"/"gt"/"lte"/"lt": value, ...}}``
        - ``{"equals": {"path": col, "value": v}}``
        - ``{"exists": {"path": col}}`` — the attribute is non-null

        SQL three-valued logic gives range/equals Atlas semantics for free:
        a null attribute compares to null, which the filter drops — exists
        is the explicit form.

        Doc values are per-doc attributes, not postings: the predicate is
        evaluated as a column-pruned, predicate-pushed parquet scan of
        doc_stats intersected with the term-driven candidate set — Lucene
        FILTER semantics (required, scores nothing), Lucene DocValues
        storage (column-stride, never inverted).
        """
        cond = F.lit(True)
        for c in clauses:
            op = next(o for o in ("range", "equals", "exists") if o in c)
            spec = dict(c[op])
            path = spec.pop("path", None)
            if path not in self.docvalues_cols:
                raise ValueError(
                    f"{op} clause path {path!r} is not a doc-values column of "
                    f"this index (baked: {sorted(self.docvalues_cols)}); "
                    "build with BuildConfig(docvalues_cols=(...,))"
                )
            col = F.col(path)
            if op == "exists":
                if spec:
                    raise ValueError(
                        f"exists clause takes only path; got {sorted(c[op])}"
                    )
                cond = cond & col.isNotNull()
                continue
            if op == "equals":
                if set(spec) != {"value"}:
                    raise ValueError(
                        f"equals clause takes exactly path+value; got {sorted(c[op])}"
                    )
                cond = cond & (col == F.lit(spec["value"]))
                continue
            if not spec:
                raise ValueError("range clause needs at least one of gt/gte/lt/lte")
            ops = {"gt": col.__gt__, "gte": col.__ge__,
                   "lt": col.__lt__, "lte": col.__le__}
            for bop, v in sorted(spec.items()):
                if bop not in ops:
                    raise ValueError(f"unknown range bound {bop!r} (gt/gte/lt/lte)")
                cond = cond & ops[bop](F.lit(v))
        return cond

    def search_fields(
        self,
        must: list = (),
        should: list = (),
        k: int = 10,
        skip: int = 0,
        minimum_should_match: int = 1,
        max_expansions: int | None = None,
        with_url: bool = False,
        force_distributed: bool = False,
        mode: str = "sort",
        must_not: list = (),
        filter: list = (),
        sort: dict | None = None,
    ) -> SearchResult:
        """Compound multi-field search (reference ``$search.compound`` over
        named paths: should over name+barcode for single-term queries,
        must over store_id/wh_id + name otherwise, minimumShouldMatch=1 —
        search_utils.py:79-97,181-203, app.py:472-486).

        Semantics (Lucene BooleanQuery): a doc matches when EVERY must
        clause matches, at least ``minimum_should_match`` should clauses
        match (with no must/filter clauses, at least 1 should clause must
        match regardless), EVERY ``filter`` clause matches (Lucene FILTER /
        Atlas ``compound.filter`` — required like must, scoring nothing:
        a must clause whose keys carry weight 0; together with
        must/should/must_not that is all four BooleanQuery occur types),
        and NO ``must_not`` clause matches (Lucene MUST_NOT /
        Atlas ``compound.mustNot`` — a pure filter that scores nothing).
        Every present positive query term contributes ``boost *
        idf_field(term) * tf_norm(tf, dl_field, avgdl_field)`` — idf from
        the FIELD's doc_count/df, the norm from the FIELD's length stats,
        boost the clause's optional multiplier (Atlas ``score: {boost:
        {value}}``; a key named by several clauses scores once with the
        largest boost) — summed per doc in ascending posting-key order
        (field, then term): the same deterministic fold as the single-field
        engine.  Boosts fold into the per-key idf, so every physical path
        (driver, sort, WAND — whose block bounds scale by the same idf) is
        bit-identical without special cases.

        The ``filter`` list additionally accepts Atlas ``range`` / ``equals``
        operator objects (``{"range": {"path": col, "gte"/"gt"/"lte"/"lt":
        v}}``, ``{"equals": {"path": col, "value": v}}``) over doc-values
        columns baked by ``BuildConfig(docvalues_cols=...)`` — required,
        scoring nothing, evaluated as a predicate-pushed doc_stats scan
        semi-joined with the term-driven candidates (see
        :meth:`_dv_predicate`).  They require at least one term-bearing
        clause: a match set defined by doc values alone is a relational
        scan, which the relational operators already express.

        ``sort`` (the Atlas ``$search.sort`` option / Lucene SortField)
        orders the matched docs by a doc-values column instead of score:
        ``{"path": col, "order": "asc"|"desc"}`` (default desc).  Nulls
        sort LAST under either order (the attribute is missing, not
        small), ties break doc_id asc, the page gains the sort column,
        and the BM25 score is still computed and returned (Atlas does the
        same).  Score-bound pruning is meaningless under a field sort, so
        WAND mode rejects it like every non-pure-should shape.
        """
        if mode not in ("sort", "wand", "auto"):
            raise ValueError(f"mode must be 'sort', 'wand', or 'auto'; got {mode!r}")
        # doc-values operators (range/equals/exists) ride the filter list as
        # Atlas operator objects; term clauses (tuples / kind-dicts) stay text
        filter, dv_clauses = self._split_dv_clauses(filter)
        dv_pred = self._dv_predicate(dv_clauses) if dv_clauses else None
        if dv_pred is not None and not (must or should or filter):
            # candidate generation is postings-driven: a match set defined by
            # doc values alone is a relational scan, not a search (use the
            # relational operators for that)
            raise ValueError(
                "range/equals filter clauses require at least one term-bearing "
                "must/should/filter clause"
            )
        if must_not and not (must or should or filter):
            raise ValueError(
                "must_not requires at least one must/should/filter clause"
            )
        sort_path, sort_desc = None, True
        if sort is not None:
            sort_path, sort_desc = self._sort_spec(sort)
        empty_cols: dict = {"doc_id": [], "score": []}
        if sort_path is not None:
            empty_cols[sort_path] = []
        empty = SearchResult(total=0, page=pd.DataFrame(empty_cols))
        if mode != "sort" and (must or must_not or filter or dv_clauses
                               or sort is not None
                               or int(minimum_should_match) > 1 or skip):
            # WAND's θ-pruning scope on the compound path: pure-should
            # msm<=1 key disjunctions from page 1 (must/must_not/filter/
            # msm>=2 clause filtering and deep pagination stay on the
            # full-scoring sort kernel — same restrictions as the
            # single-field dispatch)
            raise ValueError(
                "mode='wand'/'auto' on search_fields applies to pure-should "
                "minimum_should_match<=1 queries with skip=0"
            )
        prep = self._compound_prep(
            must, should, must_not, filter, minimum_should_match, max_expansions
        )
        if prep is None:
            return empty
        must_terms, should_terms = prep["must_terms"], prep["should_terms"]
        msm, dfs, present = prep["msm"], prep["dfs"], prep["present"]
        avgdl_map = prep["avgdl_map"]
        present_must = prep["present_must"]
        present_should = prep["present_should"]
        present_must_not = prep["present_must_not"]
        # per-key boost = max over the positive clauses naming the key
        weight: dict[str, float] = {}
        for c, ts in zip(list(must) + list(should), must_terms + should_terms):
            b = float(c.get("boost", 1.0)) if isinstance(c, dict) else 1.0
            if b < 0.0:
                raise ValueError(f"clause boost must be >= 0, got {b}")
            for t in ts:
                weight[t] = max(weight.get(t, 0.0), b)
        sep = self.field_sep
        idf: dict[str, float] = {}
        for t in present:
            fs = self.fields[t.split(sep, 1)[0]]
            # must_not-only keys carry weight 0.0: decoded for membership,
            # contributing exactly nothing to the fold (Lucene MUST_NOT)
            idf[t] = weight.get(t, 0.0) * _math_idf(int(fs["doc_count"]), dfs[t])

        wand_meta = None
        if mode == "auto":
            # mirror the single-field ordering: a driver-eligible query
            # (Σdf <= SMALL_QUERY_POSTINGS) can never clear the cost rule —
            # total_dc <= Σdf <= MIN_SAVED — so skip the distributed
            # metadata job it would pay just to be told "sort"
            if not force_distributed and sum(dfs.values()) <= min(
                self.SMALL_QUERY_POSTINGS, self.WAND_AUTO_MIN_SAVED
            ):
                mode = "sort"
                self.last_dispatch = {
                    "mode": "sort", "total_dc": int(sum(dfs.values())),
                    "predicted_dc": 0, "theta_lb": 0.0, "n_ranges": 0,
                }
            else:
                # the same metadata-only cost model as the single-field
                # dispatch (predict_wand_decode reads block bounds keyed by
                # posting key — prefixed keys are just keys to it)
                wand_meta = self._wand_meta(present)
                est = predict_wand_decode(
                    wand_meta, idf, k, self.bound_scale, 0.0,
                    floor_scale=self.floor_scale,
                )
                mode = "wand" if self._pick_wand(est) else "sort"
                self.last_dispatch = {"mode": mode, **est}
        if mode == "wand":
            # pure-should msm<=1 == a plain disjunction over the prefixed key
            # set; _wand_scored prunes with per-field-sound baked bounds
            # (θ floor active when the index baked per-field mtn — see
            # _wand_scored / engine.per_field_mtn) and scores with each
            # key's field avgdl, bit-identical to the sort kernel's fold
            scored = self._wand_scored(
                present, idf, conjunctive=False, constant_boost=False,
                avail_boost=False, k=k, boost_ceiling=0.0,
                min_should_match=0, avgdl_map=avgdl_map, meta=wand_meta,
            )
            ranked = scored.orderBy(F.desc("score"), F.asc("doc_id"))
            page = (
                ranked.limit(k).select("doc_id", "score").toPandas()
                .sort_values(["score", "doc_id"], ascending=[False, True])
                .reset_index(drop=True)
            )
            for df_ in getattr(scored, "_ses_persisted", ()):
                df_.unpersist()
            # exact unpruned total: doc-ids-only decode, same as single-field
            total = self._match_count(present, conjunctive=False)
            res = SearchResult(total=int(total), page=page)
        elif not force_distributed and sum(dfs.values()) <= self.SMALL_QUERY_POSTINGS:
            res = self._driver_search_fields(
                present, idf, avgdl_map, present_must, present_should, msm, k, skip,
                must_not_terms=present_must_not, dv_pred=dv_pred,
                sort_path=sort_path, sort_desc=sort_desc,
            )
        else:
            res = self._dist_search_fields(
                present, idf, avgdl_map, present_must, present_should, msm, k, skip,
                must_not_terms=present_must_not, dv_pred=dv_pred,
                sort_path=sort_path, sort_desc=sort_desc,
            )
        if with_url and len(res.page):
            ids = [int(d) for d in res.page["doc_id"]]
            urls = (
                self._doc_stats_df
                .filter(F.col("doc_id").isin(ids))
                .select("doc_id", "url")
                .toPandas()
            )
            res = SearchResult(
                total=res.total, page=res.page.merge(urls, on="doc_id", how="left")
            )
        return res

    def facet_fields(
        self,
        must: list = (),
        should: list = (),
        minimum_should_match: int = 1,
        must_not: list = (),
        filter: list = (),
        facets: dict | None = None,
        max_expansions: int | None = None,
        keyword: str | None = None,
    ) -> dict:
        """Atlas ``$searchMeta`` facet collection over doc values.

        Evaluates the same compound clause set as :meth:`search_fields`
        (all four occur types, dv filter operators) but returns bucket
        counts over the MATCHED set instead of a ranked page — scoring
        never happens, so there is no driver fast path to dispatch: facets
        are an analytic aggregation, served distributed.

        ``facets`` maps facet names to Atlas facet specs over doc-values
        columns:

        - ``{"type": "string", "path": col, "num_buckets": N}`` — one
          bucket per distinct non-null value, count desc then bucket asc,
          top ``num_buckets`` (default 10, Atlas's default);
        - ``{"type": "number", "path": col, "boundaries": [b0, b1, ...],
          "default": name}`` — half-open buckets ``[b_i, b_{i+1})`` labeled
          by their LOWER boundary (Atlas's rule); out-of-range docs land in
          the optional ``default`` bucket (ordered last) or, absent one, in
          no bucket; null attributes land in no bucket either way; empty
          buckets are omitted.

        Returns ``{"count": <matched total>, "facet": {name: pandas
        (bucket, count)}}`` — bucket is always a string, deterministic
        order as above.

        ``keyword=`` serves the single-field surface (the incremental
        crawl): the analyzed keyword's plain disjunction is the match set,
        composing with dv filter operators on the filter list — clauses
        and keyword are mutually exclusive.
        """
        if not facets:
            raise ValueError("facet_fields requires at least one facet spec")
        filter, dv_clauses = self._split_dv_clauses(filter)
        dv_pred = self._dv_predicate(dv_clauses) if dv_clauses else None
        if keyword is not None:
            # single-field surface: the analyzed keyword IS the match set
            # (plain disjunction), mirroring search()'s candidate generation
            if self.fields:
                raise ValueError(
                    "keyword= facets apply to single-field indexes; use "
                    "must/should clauses on a multi-field index"
                )
            if must or should or must_not or filter:
                raise ValueError("keyword= replaces the clause lists")
        elif not (must or should or filter):
            raise ValueError(
                "facet_fields requires at least one term-bearing "
                "must/should/filter clause (or keyword= on a single-field index)"
            )
        specs: dict = {}
        for name, spec in facets.items():
            kind = spec.get("type")
            if kind not in ("string", "number"):
                raise ValueError(
                    f"facet {name!r}: type must be 'string' or 'number'; got {kind!r}"
                )
            path = spec.get("path")
            if path not in self.docvalues_cols:
                raise ValueError(
                    f"facet {name!r}: path {path!r} is not a doc-values column "
                    f"of this index (baked: {sorted(self.docvalues_cols)})"
                )
            if kind == "number":
                bounds = list(spec.get("boundaries") or ())
                if len(bounds) < 2 or sorted(bounds) != bounds:
                    raise ValueError(
                        f"facet {name!r}: boundaries must be >= 2 ascending values"
                    )
                default = spec.get("default")
                if default is not None and not isinstance(default, str):
                    raise ValueError(
                        f"facet {name!r}: default must be a bucket-name string"
                    )
                if default is not None and default in {str(b) for b in bounds}:
                    raise ValueError(
                        f"facet {name!r}: default {default!r} collides with a "
                        "boundary label"
                    )
                specs[name] = ("number", path, (bounds, default))
            else:
                nb = int(spec.get("num_buckets", 10))
                if nb < 1:
                    raise ValueError(f"facet {name!r}: num_buckets must be >= 1")
                specs[name] = ("string", path, nb)

        def _empty():
            return {
                "count": 0,
                "facet": {
                    n: pd.DataFrame({"bucket": [], "count": []}) for n in specs
                },
            }

        if keyword is not None:
            terms = sorted(set(preprocess_query(keyword)))
            dfs = self.term_dfs(terms) if terms else {}
            present = sorted(dfs)
            if not present:
                return _empty()
            # membership only — unit idf, scores thrown away
            kept = self._scored_docs(
                present, {t: 1.0 for t in present}
            ).select("doc_id")
        else:
            prep = self._compound_prep(
                must, should, must_not, filter, minimum_should_match,
                max_expansions,
            )
            if prep is None:
                return _empty()
            present = prep["present"]
            # membership only — decode with unit idf, throw the scores away
            scored = self._scored_rows(
                present, {t: 1.0 for t in present}, avgdl_map=prep["avgdl_map"]
            )
            agg = scored.groupBy("doc_id").agg(
                F.sort_array(F.collect_set("term")).alias("ts")
            )
            kept = agg.filter(
                self._occur_cond(
                    prep["present_must"], prep["present_should"], prep["msm"],
                    prep["present_must_not"],
                )
            ).select("doc_id")
        paths = sorted({p for _, p, _ in specs.values()})
        stats_df = self._doc_stats_df
        if dv_pred is not None:
            kept = kept.join(
                stats_df.filter(dv_pred).select("doc_id"), "doc_id", "semi"
            )
        joined = kept.join(
            stats_df.select("doc_id", *paths), "doc_id", "left"
        ).persist()
        count = joined.count()
        out: dict = {"count": int(count), "facet": {}}
        for name, (kind, path, arg) in specs.items():
            col = F.col(path)
            if kind == "number":
                bounds, default = arg
                # Atlas's optional default bucket collects out-of-range
                # docs (null attributes still land in no bucket)
                lab = (
                    F.when(col.isNotNull(), F.lit(default))
                    if default is not None
                    else F.lit(None).cast("string")
                )
                for lo, hi in zip(bounds, bounds[1:]):
                    lab = F.when(
                        (col >= F.lit(lo)) & (col < F.lit(hi)),
                        F.lit(str(lo)),
                    ).otherwise(lab)
                buckets = (
                    joined.select(lab.alias("bucket"))
                    .filter(F.col("bucket").isNotNull())
                    .groupBy("bucket").count()
                    .orderBy(F.asc("bucket"))
                    .toPandas()
                )
                # deterministic order: lower-bound labels ascending, the
                # default bucket (if any) last
                order = {str(b): i for i, b in enumerate(bounds)}
                if default is not None:
                    order[default] = len(bounds)
                buckets = buckets.sort_values(
                    "bucket", key=lambda s: s.map(order)
                ).reset_index(drop=True)
            else:
                buckets = (
                    joined.filter(col.isNotNull())
                    .groupBy(col.cast("string").alias("bucket")).count()
                    .orderBy(F.desc("count"), F.asc("bucket"))
                    .limit(arg)
                    .toPandas()
                    .sort_values(
                        ["count", "bucket"], ascending=[False, True]
                    )
                    .reset_index(drop=True)
                )
            out["facet"][name] = buckets
        joined.unpersist()
        return out

    def _driver_search_fields(
        self, present, idf, avgdl_map, must_terms, should_terms, msm, k, skip,
        must_not_terms=(), dv_pred=None, sort_path=None, sort_desc=True,
    ) -> SearchResult:
        """Driver-side compound evaluation (small candidate sets)."""
        rows = self._candidate_segments(present).select("term", "postings").collect()
        per_term: dict[str, list] = {}
        for r in rows:
            per_term.setdefault(r["term"], []).append(r["postings"])
        decoded = {}
        all_ids = []
        for t in sorted(per_term):
            parts = [decode_postings(b) for b in per_term[t]]
            ids = np.concatenate([p[0] for p in parts])
            tf = np.concatenate([p[1] for p in parts]).astype(np.float64)
            dl = np.concatenate([p[2] for p in parts]).astype(np.float64)
            decoded[t] = (ids, tf, dl)
            all_ids.append(ids)
        # the empty page keeps the documented shape: sorted results carry
        # the sort attribute column even when nothing matched
        empty_cols: dict = {"doc_id": [], "score": []}
        if sort_path is not None:
            empty_cols[sort_path] = []
        empty = SearchResult(total=0, page=pd.DataFrame(empty_cols))
        if not all_ids:
            return empty
        uniq = np.unique(np.concatenate(all_ids))
        acc = np.zeros(uniq.size, dtype=np.float64)
        has = {}
        # ascending posting-key order — the same fold as the distributed path
        for t in sorted(decoded):
            ids, tf, dl = decoded[t]
            s = idf[t] * tf / (tf + K1 * (1.0 - B + B * dl / avgdl_map[t]))
            pos = np.searchsorted(uniq, ids)
            acc[pos] = acc[pos] + s
            flag = np.zeros(uniq.size, dtype=bool)
            flag[pos] = True
            has[t] = flag
        def clause_ok(ts):
            ok = np.zeros(uniq.size, dtype=bool)
            for t in ts:
                if t in has:
                    ok |= has[t]
            return ok
        keep = np.ones(uniq.size, dtype=bool)
        for ts in must_terms:
            keep &= clause_ok(ts)
        if msm:
            n_should = np.zeros(uniq.size, dtype=np.int64)
            for ts in should_terms:
                n_should += clause_ok(ts).astype(np.int64)
            keep &= n_should >= msm
        for ts in must_not_terms:  # Lucene MUST_NOT: any hit excludes the doc
            keep &= ~clause_ok(ts)
        uniq, acc = uniq[keep], acc[keep]
        attrs = None
        if (dv_pred is not None or sort_path is not None) and uniq.size:
            # ONE predicate-pushed doc_stats probe serves both the dv filter
            # (membership) and the field sort (attribute values): the scan
            # is filtered when a predicate exists, semi-join semantics come
            # from the inner join against the (small, broadcast) candidate
            # set — never a collect of the eligible universe
            cand = self.spark.createDataFrame(
                pd.DataFrame({"doc_id": uniq.astype("int64")})
            )
            probe = self._doc_stats_df
            if dv_pred is not None:
                probe = probe.filter(dv_pred)
            cols = ["doc_id"] + ([sort_path] if sort_path is not None else [])
            attrs = (
                probe.join(F.broadcast(cand), "doc_id", "inner")
                .select(*cols)
                .toPandas()
            )
            if dv_pred is not None:
                dv_keep = np.isin(uniq, attrs["doc_id"].to_numpy())
                uniq, acc = uniq[dv_keep], acc[dv_keep]
        if uniq.size == 0:
            return empty
        if sort_path is not None:
            # order (attr, doc_id asc) with nulls last in pandas
            page = (
                pd.DataFrame({"doc_id": uniq, "score": acc})
                .merge(attrs, on="doc_id", how="left")
                .sort_values(
                    [sort_path, "doc_id"], ascending=[not sort_desc, True],
                    na_position="last",
                )
                .iloc[skip : skip + k]
                .reset_index(drop=True)[["doc_id", "score", sort_path]]
            )
            return SearchResult(total=int(uniq.size), page=page)
        order = np.lexsort((uniq, -acc))[skip : skip + k]
        return SearchResult(
            total=int(uniq.size),
            page=pd.DataFrame({"doc_id": uniq[order], "score": acc[order]}),
        )

    def _compound_prep(
        self, must, should, must_not, filter, minimum_should_match,
        max_expansions,
    ) -> dict | None:
        """Shared clause preparation for :meth:`search_fields` and
        :meth:`facet_fields`: analyze every clause to its prefixed posting
        keys, normalize Lucene's minimum_should_match rule (no shoulds →
        msm 0; shoulds with no required clause → msm ≥ 1), drop absent
        keys, and return None when no document can match (msm exceeds the
        should count, every key absent, or a must/filter clause has no
        present key — required clauses with nothing to match kill the
        query).  Filter clauses merge into ``present_must``: they ARE must
        clauses whose keys carry weight 0 (scoring is governed entirely by
        the caller's weight fold)."""
        must_terms = [self._clause_terms(c, max_expansions) for c in must]
        should_terms = [self._clause_terms(c, max_expansions) for c in should]
        must_not_terms = [self._clause_terms(c, max_expansions) for c in must_not]
        filter_terms = [self._clause_terms(c, max_expansions) for c in filter]
        msm = int(minimum_should_match)
        if not should_terms:
            msm = 0
        elif not must_terms and not filter_terms:
            # Lucene: with no required clause, at least one SHOULD must match
            msm = max(msm, 1)
        if msm > len(should_terms):
            return None
        all_terms = sorted({
            t
            for ts in must_terms + should_terms + must_not_terms + filter_terms
            for t in ts
        })
        if not all_terms:
            return None
        dfs = self.term_dfs(all_terms)
        # a must/filter clause with no present term can never match
        for ts in must_terms + filter_terms:
            if not any(t in dfs for t in ts):
                return None
        present = sorted(dfs)
        if not present:
            return None
        sep = self.field_sep
        return {
            "must_terms": must_terms,
            "should_terms": should_terms,
            "must_not_terms": must_not_terms,
            "filter_terms": filter_terms,
            "msm": msm,
            "dfs": dfs,
            "present": present,
            "avgdl_map": {
                t: float(self.fields[t.split(sep, 1)[0]]["avgdl"])
                for t in present
            },
            "present_must": [
                [t for t in ts if t in dfs] for ts in must_terms + filter_terms
            ],
            "present_should": [[t for t in ts if t in dfs] for ts in should_terms],
            "present_must_not": [
                [t for t in ts if t in dfs] for ts in must_not_terms if any(
                    t in dfs for t in ts
                )
            ],
        }

    @staticmethod
    def _occur_cond(must_terms, should_terms, msm, must_not_terms):
        """All four BooleanQuery occur types as ONE JVM array predicate over
        a per-doc matched-key array column ``ts`` (must+filter required,
        >= msm shoulds, no must_not)."""
        def clause_ok(ts):
            return F.arrays_overlap(F.col("ts"), F.array(*[F.lit(t) for t in ts]))
        cond = F.lit(True)
        for ts in must_terms:
            cond = cond & clause_ok(ts)
        if msm:
            n_should = sum(
                (clause_ok(ts).cast("int") for ts in should_terms), F.lit(0)
            )
            cond = cond & (n_should >= msm)
        for ts in must_not_terms:  # Lucene MUST_NOT: any hit excludes the doc
            cond = cond & ~clause_ok(ts)
        return cond

    def _dist_search_fields(
        self, present, idf, avgdl_map, must_terms, should_terms, msm, k, skip,
        must_not_terms=(), dv_pred=None, sort_path=None, sort_desc=True,
    ) -> SearchResult:
        """Distributed compound evaluation: one decode+score pass, clause
        logic as JVM array expressions over the per-doc matched-key set."""
        scored = self._scored_rows(present, idf, avgdl_map=avgdl_map)
        parts = F.sort_array(F.collect_list(F.struct("term", "score")))
        agg = scored.groupBy("doc_id").agg(parts.alias("parts"))
        ts_col = F.transform(F.col("parts"), lambda x: x["term"])
        agg = agg.select(
            "doc_id",
            F.aggregate("parts", F.lit(0.0), lambda a, x: a + x["score"]).alias("score"),
            ts_col.alias("ts"),
        )
        kept = agg.filter(
            self._occur_cond(must_terms, should_terms, msm, must_not_terms)
        ).select("doc_id", "score")
        if dv_pred is not None and sort_path is not None:
            # ONE predicate-pushed, column-pruned doc_stats scan serves both
            # the dv filter and the field sort: the inner join IS the
            # semi-join (doc_id is unique per side) and attaches the sort
            # attribute in the same pass
            kept = kept.join(
                self._doc_stats_df
                .filter(dv_pred).select("doc_id", sort_path),
                "doc_id", "inner",
            )
        elif dv_pred is not None:
            # doc-values filter: predicate pushes into the doc_stats parquet
            # scan (only the filtered columns are read); the semi-join keys
            # on doc_id and shrinks with the predicate's selectivity — AQE
            # broadcasts the eligible side when it is small
            kept = kept.join(
                self._doc_stats_df
                .filter(dv_pred).select("doc_id"),
                "doc_id", "semi",
            )
        elif sort_path is not None:
            # field sort alone: attach the attribute (column-pruned scan);
            # left join keeps null-attribute docs, which sort last
            kept = kept.join(
                self._doc_stats_df
                .select("doc_id", sort_path),
                "doc_id", "left",
            )
        kept = kept.persist()
        if sort_path is not None:
            # field sort (Atlas $search.sort): order by the attribute, nulls
            # last, doc_id tiebreak — score-bound pruning never applies here
            ranked = kept.orderBy(
                F.desc_nulls_last(sort_path) if sort_desc
                else F.asc_nulls_last(sort_path),
                F.asc("doc_id"),
            )
        else:
            ranked = kept.orderBy(F.desc("score"), F.asc("doc_id"))
        page_df = ranked.offset(skip).limit(k) if skip else ranked.limit(k)
        page = page_df.toPandas()
        if sort_path is not None:
            page = page.sort_values(
                [sort_path, "doc_id"], ascending=[not sort_desc, True],
                na_position="last",
            ).reset_index(drop=True)[["doc_id", "score", sort_path]]
        else:
            page = page.sort_values(
                ["score", "doc_id"], ascending=[False, True]
            ).reset_index(drop=True)
        total = kept.count()
        kept.unpersist()
        return SearchResult(total=int(total), page=page)

    # ------------------------------------------------------------ highlight
    def _highlight_page(self, terms: list[str], doc_ids: list[int]) -> pd.DataFrame:
        """First-occurrence offsets of the matched terms for PAGE docs only.

        The Atlas ``$search`` highlight option re-derived for the positional
        index: highlighting runs AFTER ranking, on the k returned docs — so
        the cost is k docs' blocks, never the candidate set.  Block pruning
        is metadata-only: the page docs' ssegs plus a [first_doc, last_doc]
        range check; at web scale that is a handful of blocks per query.

        Returns a frame (doc_id, highlights) where ``highlights`` is the
        deterministic string ``"term@pos ..."`` over the doc's matched terms
        in ascending term order (absent terms omitted) — a shape every
        engine and SQL oracle can reproduce byte-for-byte.
        """
        if "positions" not in self._segments_df.columns:
            raise ValueError(
                "highlight requires a positional index "
                "(build with BuildConfig(positions=True))"
            )
        ids = np.array(sorted(set(int(d) for d in doc_ids)), dtype=np.int64)
        range_docs = int(self.stats["range_docs"])
        ssegs = sorted({int(d) // range_docs for d in ids})
        rows = (
            self._candidate_segments(sorted(terms), ssegs=ssegs)
            .filter(
                (F.col("first_doc") <= int(ids.max()))
                & (F.col("last_doc") >= int(ids.min()))
            )
            .select("term", "postings", "positions")
            .collect()
        )
        firsts: dict[int, list[str]] = {int(d): [] for d in ids}
        for r in rows:  # ≤ m terms × page ssegs blocks
            d_arr, tfs, _ = decode_postings(r["postings"])
            hit_ix = np.flatnonzero(np.isin(d_arr, ids))
            if hit_ix.size == 0:
                continue
            pos = decode_position_lists(r["positions"], tfs)
            off = np.zeros(len(d_arr) + 1, dtype=np.int64)
            np.cumsum(tfs, out=off[1:])
            for i in hit_ix:
                # positions are sorted per doc -> first occurrence = run head
                firsts[int(d_arr[i])].append(f"{r['term']}@{int(pos[off[i]])}")
        return pd.DataFrame(
            {
                "doc_id": ids,
                "highlights": [" ".join(sorted(firsts[int(d)])) for d in ids],
            }
        )

    # --------------------------------------------------------- phrase search
    def _phrase_candidate_blocks(self, uniq_terms: list[str]) -> DataFrame:
        """Candidate blocks for a phrase, sseg-eligibility-pruned.

        A doc range (sseg) can only contain the phrase if EVERY distinct
        term has a block there; ssegs missing any term are dropped by a
        semi-join on block METADATA before the postings/positions bytes are
        read — for a head+rare phrase ("the <rare>") this skips decoding
        almost all of the head term's candidate blocks.  The metadata
        aggregation touches only the (term, sseg) columns (column-pruned
        scan); its result (≤ #ssegs rows) broadcasts.
        """
        meta = self._candidate_segments(uniq_terms)
        eligible = (
            meta.groupBy("sseg")
            .agg(F.count_distinct("term").alias("nt"))
            .filter(F.col("nt") == len(uniq_terms))
            .select("sseg")
        )
        return meta.join(F.broadcast(eligible), "sseg").select(
            "term", "sseg", "postings", "positions"
        )

    def _phrase_decode_rows(self, rows) -> dict[str, tuple]:
        parts: dict[str, list] = {}
        for r in rows:
            ids, tfs, dls = decode_postings(r["postings"])
            pos = decode_position_lists(r["positions"], tfs)
            parts.setdefault(r["term"], []).append((ids, tfs, dls, pos))
        return _concat_decoded(parts)

    def _phrase_matched_dist(self, terms_seq: list[str], max_gap: int = 0) -> DataFrame:
        """Distributed phrase match -> (doc_id, tf, dl) of matching docs.

        Candidate blocks (the phrase terms' postings + positions only)
        shuffle ONCE keyed by ``sseg`` — the shared doc-id grid guarantees
        every term's blocks for a doc range land in the same task, so the
        kernel intersects complete per-doc evidence with no further
        exchange.  Work and shuffle are O(candidate blocks of the m query
        terms), never corpus-sized; composite keys stay kernel-local, so
        per-partition strides may differ.

        Eligibility pruning: a doc range (sseg) can only contain the phrase
        if EVERY distinct term has a block there, so ssegs missing any term
        are dropped by a self-semi-join on block METADATA before the
        postings/positions bytes are ever read — for a head+rare phrase
        ("the <rare>") this skips decoding almost all of the head term's
        candidate blocks.  The metadata aggregation touches only (term,
        sseg) columns; its result (≤ #ssegs rows) broadcasts.
        """
        segs = self._phrase_candidate_blocks(sorted(set(terms_seq)))
        terms_b = self.spark.sparkContext.broadcast((list(terms_seq), int(max_gap)))

        def match(it):
            pdfs = [p for p in it if len(p)]
            if not pdfs:
                return
            pdf = pd.concat(pdfs, ignore_index=True)
            parts: dict[str, list] = {}
            tcol = pdf["term"].to_numpy(dtype=object)
            post, posc = pdf["postings"], pdf["positions"]
            for i in range(len(pdf)):
                ids, tfs, dls = decode_postings(post.iat[i])
                pos = decode_position_lists(posc.iat[i], tfs)
                parts.setdefault(tcol[i], []).append((ids, tfs, dls, pos))
            tseq, g = terms_b.value
            uniq, tfs_, dls_, firsts_ = _phrase_match_arrays(
                tseq, _concat_decoded(parts), max_gap=g
            )
            if uniq.size:
                yield pd.DataFrame(
                    {"doc_id": uniq, "tf": tfs_, "dl": dls_, "first_pos": firsts_}
                )

        n = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        return segs.repartition(n, "sseg").mapInPandas(
            match, schema="doc_id long, tf long, dl long, first_pos long"
        )

    def search_field_phrase(
        self,
        field: str,
        keyword: str,
        k: int = 10,
        skip: int = 0,
        force_distributed: bool = False,
        highlight: bool = False,
        max_gap: int = 0,
        with_url: bool = False,
        dv_filter: list = (),
    ) -> SearchResult:
        """Field-scoped exact-phrase search (Atlas phrase clause with a
        ``path``): the analyzed token sequence of ``keyword`` must appear
        consecutively within ``field``; matches score as one pseudo-term with
        the FIELD's docCount/avgdl.  Requires a positional multi-field index
        (``BuildConfig(field_cols=..., positions=True)``).  ``highlight``
        adds the first phrase start as a FIELD-LOCAL token offset.
        ``dv_filter`` takes doc-values operator objects (range/equals/exists)
        — FILTER semantics: matching constrained, the phrase idf unchanged."""
        dv_pred = None
        if dv_filter:
            text_f, dv_clauses = self._split_dv_clauses(dv_filter)
            if text_f:
                raise ValueError(
                    "dv_filter takes doc-values operator objects only "
                    "(range/equals/exists dicts)"
                )
            dv_pred = self._dv_predicate(dv_clauses)
        return self._phrase_search(
            keyword, k, skip, False, False, with_url, force_distributed,
            highlight=highlight, max_gap=max_gap, field=field,
            dv_pred=dv_pred,
        )

    def _phrase_search(
        self,
        keyword: str,
        k: int,
        skip: int,
        constant_boost: bool,
        avail_boost: bool,
        with_url: bool,
        force_distributed: bool,
        highlight: bool = False,
        max_gap: int = 0,
        field: str | None = None,
        dv_pred=None,
    ) -> SearchResult:
        """Exact-phrase BM25 top-k (Atlas ``$search.phrase``, the operator the
        reference's platform exposes next to its text/autocomplete clauses).

        The phrase is the INDEX analyzer's token sequence of ``keyword`` —
        order kept, stopwords kept — because positions refer to the analyzed
        stream and query-side stopword removal would silently change
        adjacency.  A doc matches when the terms appear consecutively in
        order; the phrase then scores as ONE pseudo-term:
        ``idf(df_phrase) * tf_norm(tf_phrase, dl)`` with the engine's BM25
        constants.  ``total`` is the exact phrase df at zero extra cost (the
        match IS the count).

        ``field`` (Atlas phrase clause's ``path``, multi-field indexes only):
        the phrase must appear within THAT field — terms become prefixed
        posting keys (whose stored positions are offsets in the field's own
        token stream, so adjacency is field-local by construction) and the
        pseudo-term scores with the FIELD's docCount/avgdl (Lucene per-field
        norms).  Doc-level dl%-boosts are doc-global semantics and are
        rejected with a field (field dl is the wrong operand for them).
        """
        if field is not None:
            # field addressing errors first: they are more specific than the
            # index-layout complaint a non-positional index would raise
            if not self.fields:
                raise ValueError(
                    "field-scoped phrase requires a multi-field index "
                    "(build with BuildConfig(field_cols=...))"
                )
            if field not in self.fields:
                raise ValueError(
                    f"unknown field {field!r}; index fields: {sorted(self.fields)}"
                )
        if "positions" not in self._segments_df.columns:
            raise ValueError(
                "phrase search requires a positional index "
                "(build with BuildConfig(positions=True))"
            )
        if max_gap and highlight:
            raise ValueError(
                "highlight is not supported with max_gap > 0 (variable gaps "
                "make the phrase start unrecoverable from the match key)"
            )
        if field is not None:
            if constant_boost or avail_boost:
                raise ValueError(
                    "doc-level boosts are not supported with a field-scoped "
                    "phrase (the field dl is the wrong boost operand)"
                )
            fs = self.fields[field]
            n_docs, avgdl = int(fs["doc_count"]), float(fs["avgdl"])
            terms_seq = [f"{field}{self.field_sep}{t}" for t in tokenize(keyword)]
        else:
            n_docs, avgdl = self.n_docs, self.avgdl
            terms_seq = tokenize(keyword)
        empty = SearchResult(total=0, page=pd.DataFrame({"doc_id": [], "score": []}))
        if not terms_seq:
            return empty
        dfs = self.term_dfs(sorted(set(terms_seq)))
        if len(dfs) < len(set(terms_seq)):
            return empty  # a phrase term absent from the corpus
        if not force_distributed and sum(dfs.values()) <= self.SMALL_QUERY_POSTINGS:
            rows = (
                self._phrase_candidate_blocks(sorted(set(terms_seq)))
                .select("term", "postings", "positions")
                .collect()
            )
            uniq, tfs, dls, firsts = _phrase_match_arrays(
                terms_seq, self._phrase_decode_rows(rows), max_gap=max_gap
            )
            if uniq.size == 0:
                return empty
            # Lucene FILTER never changes scoring stats: the phrase idf uses
            # the UNfiltered phrase df; the dv mask then constrains matching
            w = _math_idf(n_docs, int(uniq.size))
            if dv_pred is not None:
                cand = self.spark.createDataFrame(
                    pd.DataFrame({"doc_id": uniq.astype("int64")})
                )
                elig = (
                    self._doc_stats_df
                    .filter(dv_pred)
                    .join(F.broadcast(cand), "doc_id", "semi")
                    .select("doc_id")
                    .toPandas()["doc_id"]
                    .to_numpy()
                )
                keep = np.isin(uniq, elig)
                uniq, tfs, dls, firsts = uniq[keep], tfs[keep], dls[keep], firsts[keep]
                if uniq.size == 0:
                    return empty
            tf = tfs.astype(np.float64)
            dl = dls.astype(np.float64)
            acc = w * tf / (tf + K1 * (1.0 - B + B * dl / avgdl))
            if constant_boost:
                acc = acc + np.where(dls % 37 == 0, CONSTANT_BOOST, 0.0)
            if avail_boost:
                acc = acc + np.where(dls % 7 > 0, AVAIL_BOOST, 0.0)
            order = np.lexsort((uniq, -acc))[skip : skip + k]
            page = pd.DataFrame({"doc_id": uniq[order], "score": acc[order]})
            if highlight:
                page["first_pos"] = firsts[order]
            res = SearchResult(total=int(uniq.size), page=page)
        else:
            matched = self._phrase_matched_dist(terms_seq, max_gap=max_gap).persist()
            df_phrase = matched.count()  # == phrase df: exact total for free
            if df_phrase == 0:
                matched.unpersist()
                return empty
            # idf from the UNfiltered phrase df (FILTER scores nothing);
            # total = the filtered match count (FILTER constrains matching)
            w = _math_idf(n_docs, int(df_phrase))
            total = df_phrase
            if dv_pred is not None:
                matched = matched.join(
                    self._doc_stats_df
                    .filter(dv_pred).select("doc_id"),
                    "doc_id", "semi",
                ).persist()
                total = matched.count()
                if total == 0:
                    matched.unpersist()
                    return empty
            tfd = F.col("tf").cast("double")
            dld = F.col("dl").cast("double")
            # operand-for-operand the driver path's numpy expression tree
            score = F.lit(w) * tfd / (
                tfd
                + F.lit(K1) * (F.lit(1.0) - F.lit(B) + F.lit(B) * dld / F.lit(avgdl))
            )
            scored = self._apply_boosts(
                matched.select(
                    "doc_id", score.alias("score"),
                    F.col("dl").cast("int").alias("dl"), "first_pos",
                ),
                constant_boost,
                avail_boost,
            )
            hl_cols = ["first_pos"] if highlight else []
            ranked = scored.orderBy(F.desc("score"), F.asc("doc_id"))
            page_df = ranked.offset(skip).limit(k) if skip else ranked.limit(k)
            page = (
                page_df.select("doc_id", "score", *hl_cols)
                .toPandas()
                .sort_values(["score", "doc_id"], ascending=[False, True])
                .reset_index(drop=True)
            )
            matched.unpersist()
            res = SearchResult(total=int(total), page=page)
        if with_url and len(res.page):
            ids = [int(d) for d in res.page["doc_id"]]
            urls = (
                self._doc_stats_df
                .filter(F.col("doc_id").isin(ids))
                .select("doc_id", "url")
                .toPandas()
            )
            res = SearchResult(
                total=res.total, page=res.page.merge(urls, on="doc_id", how="left")
            )
        return res

    # ---------------------------------------------------------------- search
    def search(self, keyword: str, **kwargs) -> SearchResult:
        res = self._search_impl(keyword, **kwargs)
        if self.log_queries:
            self._qid += 1
            top = None
            if len(res.page):
                # logged scores are rounded to 6; pick the top on the rounded
                # value with the doc_id tiebreak so the logged row is
                # reproducible across float-noise (same rule as the oracles)
                pg = res.page.assign(_rs=round_half_away(res.page["score"], 6))
                pg = pg.sort_values(["_rs", "doc_id"], ascending=[False, True])
                top = pg.iloc[0]
            self.cat.append_query_log([
                {
                    "qid": self._qid,
                    "keyword": keyword,
                    "mode": kwargs.get(
                        "mode", "phrase" if kwargs.get("phrase") else "sort"
                    ),
                    "n_terms": len(preprocess_query(keyword)),
                    "total": int(res.total),
                    "top_doc_id": int(top["doc_id"]) if top is not None else None,
                    "top_score": float(top["_rs"]) if top is not None else None,
                }
            ])
        return res

    def more_like_this(
        self,
        text: str,
        k: int = 10,
        skip: int = 0,
        max_query_terms: int = 25,
        min_term_freq: int = 1,
        min_doc_freq: int = 1,
        **kwargs,
    ) -> SearchResult:
        """Lucene MoreLikeThis (Atlas ``moreLikeThis``), Spark-first: pick
        the caller-supplied text's most characteristic terms and search them
        as the standard disjunction.

        Selection is Lucene MLT's tf·idf rule made deterministic across
        stacks: analyze ``text``, drop terms below ``min_term_freq`` (in
        the text) or ``min_doc_freq`` (in the corpus), score each candidate
        ``tf_text * idf`` (this engine's BM25 idf — one idf definition
        everywhere, a documented divergence from classic MLT's ln(N/df)),
        round to 6 decimals (the shared tie policy), and keep the top
        ``max_query_terms`` by (score desc, term asc).  The selected terms
        then ride the ordinary disjunction path (sort/driver dispatch,
        pagination, boosts via ``**kwargs``), so results stay
        rank-identical to the oracle on every physical path.  No forward
        index is needed: the caller supplies the text, term stats come
        from the dictionary — O(distinct terms) lookups, corpus-scale
        nothing.
        """
        self._require_single_field("more_like_this")
        tf: dict[str, int] = {}
        for t in tokenize(text):
            tf[t] = tf.get(t, 0) + 1
        cand0 = sorted(t for t, c in tf.items() if c >= int(min_term_freq))
        empty = SearchResult(total=0, page=pd.DataFrame({"doc_id": [], "score": []}))
        if not cand0:
            return empty
        dfs = self.term_dfs(cand0)
        cand = [t for t in cand0 if dfs.get(t, 0) >= max(int(min_doc_freq), 1)]
        if not cand:
            return empty
        sel = {
            t: float(round_half_away(tf[t] * _math_idf(self.n_docs, dfs[t]), 6))
            for t in cand
        }
        selected = sorted(cand, key=lambda t: (-sel[t], t))[: int(max_query_terms)]
        return self.search(
            " ".join(selected), k=k, skip=skip, exact_terms=selected, **kwargs
        )

    def _search_impl(
        self,
        keyword: str,
        k: int = 10,
        skip: int = 0,
        conjunctive: bool = False,
        constant_boost: bool = False,
        avail_boost: bool = False,
        mode: str = "sort",
        max_expansions: int | None = None,
        with_url: bool = False,
        force_distributed: bool = False,
        total_mode: str = "exact",
        group_by: bool = False,
        phrase: bool = False,
        highlight: bool = False,
        max_gap: int = 0,
        fuzzy: int = 0,
        fuzzy_transpositions: bool = False,
        min_should_match: int = 0,
        prefix_fuzzy: int = 0,
        phonetic: bool = False,
        wildcard: bool = False,
        regex: bool = False,
        exact_terms: list | None = None,
        dv_filter: list = (),
        sort: dict | None = None,
    ) -> SearchResult:
        """``total_mode`` governs the facet total under WAND pruning.

        WAND prunes the scored set, so the exact disjunctive total needs a
        doc-id-only decode of every matched term's postings
        (``_match_count``) — for a head-term query over 10^13 postings that
        decode dominates the query.  Shortcuts: a single matched term's
        total IS its precomputed df (always exact, zero decode);
        ``total_mode="approx"`` serves multi-term disjunctive queries the
        Σdf upper bound capped at N, and conjunctive queries min(df) — the
        tight upper bound for an intersection (Σdf can overstate it by
        orders of magnitude) — with no decode either way.  Callers that
        paginate far enough to care get ``"exact"`` (the default, and
        always exact in sort mode).
        """
        if self.fields:
            # posting keys on a multi-field index are "<field><sep><term>";
            # a bare-term lookup would silently match NOTHING — fail loud and
            # point at the clause API instead of returning an empty page
            raise ValueError(
                "this is a multi-field index (fields: "
                f"{sorted(self.fields)}); use search_fields(must=..., "
                "should=...) — plain search() has no field to address"
            )
        if fuzzy_transpositions and not fuzzy:
            raise ValueError("fuzzy_transpositions requires fuzzy >= 1")
        if phonetic and (fuzzy or prefix_fuzzy or conjunctive or phrase
                         or min_should_match or wildcard or regex):
            raise ValueError(
                "phonetic is its own expansion surface (not combinable with "
                "fuzzy/prefix_fuzzy/conjunctive/phrase/min_should_match/"
                "wildcard/regex)"
            )
        if wildcard and (fuzzy or prefix_fuzzy or conjunctive or phrase
                         or min_should_match or regex):
            raise ValueError(
                "wildcard is its own expansion surface (not combinable with "
                "fuzzy/prefix_fuzzy/conjunctive/phrase/min_should_match/regex)"
            )
        if regex and (fuzzy or prefix_fuzzy or conjunctive or phrase
                      or min_should_match):
            raise ValueError(
                "regex is its own expansion surface (not combinable with "
                "fuzzy/prefix_fuzzy/conjunctive/phrase/min_should_match)"
            )
        msm = int(min_should_match)
        if msm:
            # Lucene m-of-n over the query's term clauses; m=len(terms) is
            # exactly `conjunctive`, so requesting both is a caller bug
            if conjunctive:
                raise ValueError("min_should_match and conjunctive are exclusive")
            if fuzzy or phrase:
                raise ValueError(
                    "min_should_match applies to plain term disjunctions "
                    "(not fuzzy expansions or phrases)"
                )
        if highlight and group_by:
            raise ValueError("group_by is not supported with highlight")
        if highlight and "positions" not in self._segments_df.columns:
            raise ValueError(
                "highlight requires a positional index "
                "(build with BuildConfig(positions=True))"
            )
        dv_pred = None
        if dv_filter:
            # doc-values filter on the single-field surface (the incremental
            # crawl case: filter a plain keyword query by lang/warc_ts).  The
            # filter is one predicate-pushed doc_stats scan semi-joined with
            # the scored candidates, so it rides the distributed sort path:
            # the driver shortcut has nothing to short-cut (the scan is a
            # Spark job either way) and WAND's score bounds cannot see the
            # filter.
            text_f, dv_clauses = self._split_dv_clauses(dv_filter)
            if text_f:
                raise ValueError(
                    "dv_filter takes doc-values operator objects only "
                    "(range/equals/exists dicts); terms belong in the keyword"
                )
            dv_pred = self._dv_predicate(dv_clauses)
            if mode == "wand":
                raise ValueError(
                    "dv_filter is not supported with mode='wand' (score-bound "
                    "pruning cannot see the filter); use sort or auto"
                )
            if group_by:
                raise ValueError("dv_filter is not supported with group_by")
        sort_path, sort_desc = None, True
        if sort is not None:
            # field sort on the single-field surface (freshest-first keyword
            # queries over an incremental crawl): same plumbing as dv_filter
            # — a doc_stats attribute join in place of the score rank
            sort_path, sort_desc = self._sort_spec(sort)
            if mode == "wand":
                raise ValueError(
                    "sort is not supported with mode='wand' (score-bound "
                    "pruning is meaningless under a field sort); use sort or auto"
                )
            if group_by or phrase:
                raise ValueError("sort is not supported with group_by or phrase")
        if phrase:
            if group_by:
                raise ValueError("group_by is not supported with phrase search")
            if fuzzy:
                raise ValueError(
                    "fuzzy is not supported with phrase search (expansion of a "
                    "positional phrase is not implemented; drop one of the two)"
                )
            return self._phrase_search(
                keyword, k, skip, constant_boost, avail_boost, with_url,
                force_distributed, highlight=highlight, max_gap=max_gap,
                dv_pred=dv_pred,
            )
        if exact_terms is not None and (
            wildcard or regex or fuzzy or prefix_fuzzy or phonetic or phrase
        ):
            raise ValueError(
                "exact_terms is a pre-analyzed term list (no expansion "
                "surface applies)"
            )
        # wildcard keywords ARE the pattern: the analyzer would strip the
        # metacharacters, so the pattern bypasses preprocess_query (Lucene
        # wildcard queries are not analyzed either); exact_terms callers
        # (more_like_this) did their own analysis
        raw = wildcard or regex or exact_terms is not None
        terms = preprocess_query(keyword) if not raw else []
        if not raw and not terms:
            return SearchResult(total=0, page=pd.DataFrame({"doc_id": [], "score": []}))
        single = len(terms) == 1
        if exact_terms is not None:
            # a plain disjunction (or conjunction) over a caller-analyzed
            # term list — no length dispatch, no prefix expansion
            match_terms = sorted(set(exact_terms))
            conj = conjunctive
        elif wildcard:
            match_terms = self.expand_wildcard(keyword, max_expansions)
            conj = False
        elif regex:
            match_terms = self.expand_regex(keyword, max_expansions)
            conj = False
        elif prefix_fuzzy:
            # Atlas autocomplete + fuzzy: a single-term surface (the
            # reference only ever autocompletes 1-term keywords,
            # search_utils.py:182-186); the expansion scores as the usual
            # disjunction, each variant with its own idf
            if fuzzy or conjunctive or not single:
                raise ValueError(
                    "prefix_fuzzy applies to single-term autocomplete "
                    "(not combinable with fuzzy/conjunctive/multi-term)"
                )
            match_terms = self.expand_prefix_fuzzy(
                terms[0], prefix_fuzzy, max_expansions
            )
            conj = False
        elif phonetic:
            # phonetic expansion (A11): every analyzed term expands to the
            # dictionary terms sharing its Soundex key; the union scores as
            # one disjunction — the same blending rule as fuzzy/prefix.
            expanded_ph: set[str] = set()
            for qt in terms:
                expanded_ph.update(self.expand_phonetic(qt))
            match_terms = sorted(expanded_ph)
            conj = False
        elif fuzzy:
            # fuzzy expansion replaces the length dispatch: every analyzed
            # term expands to its edit-distance neighborhood and the union
            # scores as one disjunction (each variant with its own idf) —
            # the same blending rule as the prefix-expansion path.
            if conjunctive:
                raise ValueError("conjunctive is not supported with fuzzy")
            expanded: set[str] = set()
            for qt in terms:
                expanded.update(self.expand_fuzzy(
                    qt, fuzzy, max_expansions,
                    transpositions=fuzzy_transpositions,
                ))
            match_terms = sorted(expanded)
            conj = False
        elif single:
            match_terms = self.expand_prefix(terms[0], max_expansions)
            conj = False
        else:
            match_terms = sorted(set(terms))
            conj = conjunctive
        if not match_terms:
            return SearchResult(total=0, page=pd.DataFrame({"doc_id": [], "score": []}))

        dfs = self.term_dfs(match_terms)
        if conj and len(dfs) < len(match_terms):
            # a required term is absent from the corpus -> empty intersection
            return SearchResult(total=0, page=pd.DataFrame({"doc_id": [], "score": []}))
        present = sorted(dfs)
        if not present:
            return SearchResult(total=0, page=pd.DataFrame({"doc_id": [], "score": []}))
        idf = {t: _math_idf(self.n_docs, d) for t, d in dfs.items()}

        if (not force_distributed and dv_pred is None and sort_path is None
                and sum(dfs.values()) <= self.SMALL_QUERY_POSTINGS):
            res = self._driver_search(
                present, idf, conj, constant_boost, avail_boost, k, skip,
                group_by=group_by, min_should_match=msm,
            )
            if highlight and len(res.page):
                hl = self._highlight_page(present, [int(d) for d in res.page["doc_id"]])
                res = SearchResult(
                    total=res.total, page=res.page.merge(hl, on="doc_id", how="left")
                )
            if with_url and len(res.page):
                ids = [int(d) for d in res.page["doc_id"]]
                urls = (
                    self._doc_stats_df
                    .filter(F.col("doc_id").isin(ids))
                    .select("doc_id", "url")
                    .toPandas()
                )
                res = SearchResult(
                    total=res.total, page=res.page.merge(urls, on="doc_id", how="left")
                )
            return res

        boost_ceiling = (CONSTANT_BOOST if constant_boost else 0.0) + (
            AVAIL_BOOST if avail_boost else 0.0
        )

        # mode="auto": metadata-only cost model (predict_wand_decode) picks
        # the physical strategy.  WAND pays an extra Spark job + a two-branch
        # union AND a ~3x per-posting decode premium, so it must earn its
        # keep by pruning hard; the measured crossover (BENCH §3c + the
        # compound A/B) sits where total - 3*predicted clears the fixed cost.
        wand_meta = None
        if mode == "auto":
            if skip != 0 or group_by or dv_pred is not None or sort_path is not None:
                mode = "sort"  # WAND is unsound for these; no estimate needed
            else:
                wand_meta = self._wand_meta(present)
                est = predict_wand_decode(
                    wand_meta, idf, k, self.bound_scale, boost_ceiling,
                    floor_scale=self.floor_scale,
                )
                mode = "wand" if self._pick_wand(est) else "sort"
                self.last_dispatch = {"mode": mode, **est}

        # grouped rollup needs every doc's exact score (a group's winner can
        # sit below the doc-level top-k that WAND's θ prunes against), so it
        # rides the full-scoring sort path
        wand = mode == "wand" and skip == 0 and not group_by
        if wand:
            scored = self._wand_scored(
                present, idf, conj, constant_boost, avail_boost, k,
                boost_ceiling, min_should_match=msm, meta=wand_meta,
            )
        else:
            scored = self._scored_docs(present, idf)
            if conj:
                scored = scored.filter(F.col("n_terms") == len(present))
            elif msm:
                scored = scored.filter(F.col("n_terms") >= msm)
            scored = self._apply_boosts(scored, constant_boost, avail_boost)
            if dv_pred is not None and sort_path is not None:
                # ONE filtered, column-pruned doc_stats scan serves both:
                # the inner join IS the semi-join with the attribute attached
                scored = scored.join(
                    self._doc_stats_df
                    .filter(dv_pred).select("doc_id", sort_path),
                    "doc_id", "inner",
                )
            elif dv_pred is not None:
                scored = scored.join(
                    self._doc_stats_df
                    .filter(dv_pred).select("doc_id"),
                    "doc_id", "semi",
                )
            elif sort_path is not None:
                # left join keeps null-attribute docs; they sort last
                scored = scored.join(
                    self._doc_stats_df
                    .select("doc_id", sort_path),
                    "doc_id", "left",
                )
            if group_by:
                scored = self._group_rollup(scored)
            # one-pass count + page over a single cached plan — the Spark
            # equivalent of the reference's $facet {total, data}
            # (pipelines.py:27-42)
            scored = scored.persist()

        # grouped results rank on the rounded score (the shared oracle rule;
        # real 6-decimal ties exist between group winners); doc-level pages
        # keep the raw order that the rank-identity suite pins; field sorts
        # rank on the attribute (nulls last, doc_id tiebreak)
        if sort_path is not None:
            ranked = scored.orderBy(
                F.desc_nulls_last(sort_path) if sort_desc
                else F.asc_nulls_last(sort_path),
                F.asc("doc_id"),
            )
        else:
            score_key = F.round("score", 6) if group_by else F.col("score")
            ranked = scored.orderBy(F.desc(score_key), F.asc("doc_id"))
        page_df = ranked.offset(skip).limit(k) if skip else ranked.limit(k)
        if with_url:
            urls = self._doc_stats_df.select("doc_id", "url")
            page_df = page_df.join(urls, "doc_id", "left")
        page_cols = (
            (["g_id", "n_docs"] if group_by else [])
            + (["url"] if with_url else [])
            + ([sort_path] if sort_path is not None else [])
        )
        page = page_df.select("doc_id", "score", *page_cols).toPandas()
        if sort_path is not None:
            page = page.sort_values(
                [sort_path, "doc_id"], ascending=[not sort_desc, True],
                na_position="last",
            ).reset_index(drop=True)
        else:
            sort_col = round_half_away(page["score"], 6) if group_by else page["score"]
            page = (
                page.assign(_sk=sort_col)
                .sort_values(["_sk", "doc_id"], ascending=[False, True])
                .drop(columns="_sk")
                .reset_index(drop=True)
            )
        for df_ in getattr(scored, "_ses_persisted", ()):
            df_.unpersist()  # WAND's phase-1 cache; page is materialized now
        if highlight and len(page):
            hl = self._highlight_page(present, [int(d) for d in page["doc_id"]])
            page = page.merge(hl, on="doc_id", how="left")

        if wand:
            # WAND pruned the scored set; the exact total (the reference's
            # $facet count) needs the unpruned match count — doc_ids only,
            # no float math.  Single matched term: the count is its df,
            # already in hand.  approx mode: Σdf upper bound, no decode.
            if len(present) == 1 and not msm:
                total = int(dfs[present[0]])
            elif total_mode == "approx":
                if conj:
                    # intersection ≤ smallest term's df (tight upper bound)
                    total = int(min(dfs.values()))
                else:
                    total = min(int(sum(dfs.values())), self.n_docs)
            else:
                total = self._match_count(present, conj, min_should_match=msm)
        else:
            total = scored.count()
            scored.unpersist()
        return SearchResult(total=total, page=page)

    def _group_rollup(self, scored: DataFrame) -> DataFrame:
        """Scored docs -> one row per group: the group's best hit + count.

        Reference /v2/search semantics (app.py:488-520): sort by score,
        group by g_id, $first the winner, count members.  The window
        partitions by g_id — a keyed shuffle, never a global sort.  The
        winner is picked on the ROUNDED score with the doc_id tiebreak
        (the shared oracle rule), so float noise can't flip it.
        """
        from pyspark.sql import Window

        g = scored.withColumn("g_id", F.pmod(F.col("dl"), F.lit(GROUP_MOD)).cast("int"))
        w = Window.partitionBy("g_id").orderBy(
            F.desc(F.round("score", 6)), F.asc("doc_id")
        )
        best = g.withColumn("rn", F.row_number().over(w))
        counts = g.groupBy("g_id").agg(F.count("*").alias("n_docs"))
        return (
            best.filter(F.col("rn") == 1)
            .select("g_id", "doc_id", "score")
            .join(counts, "g_id")
        )

    def _match_count(
        self, terms: list[str], conjunctive: bool, min_should_match: int = 0
    ) -> int:
        """Total match count without decoding scores.

        Disjunctive counts need distinct doc_ids across terms, which requires
        a decode of doc_ids only (cheap: no float math); conjunctive likewise.
        Done as a distributed aggregate, not a collect.
        """

        def docs_only(it):
            for pdf in it:
                if len(pdf) == 0:
                    continue
                outs = []
                for t, buf in zip(pdf["term"], pdf["postings"]):
                    doc_ids, _, _ = decode_postings(buf)
                    outs.append(pd.DataFrame({"doc_id": doc_ids, "term": t}))
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        segs = self._candidate_segments(terms).select("term", "postings")
        docs = segs.mapInPandas(docs_only, schema="doc_id long, term string")
        if conjunctive:
            agg = docs.groupBy("doc_id").agg(F.count("*").alias("nt"))
            return agg.filter(F.col("nt") == len(terms)).count()
        if min_should_match:
            agg = docs.groupBy("doc_id").agg(F.count("*").alias("nt"))
            return agg.filter(F.col("nt") >= min_should_match).count()
        return docs.select("doc_id").distinct().count()

    # ------------------------------------------------------------------ WAND
    def _wand_meta(self, terms: list[str]) -> pd.DataFrame:
        """Per-(term, doc-range) block metadata: max tf_norm + posting count.

        A cheap columnar read (term, sseg, max_tf_norm, doc_count — never the
        postings bytes); both the WAND plan and the auto-dispatch cost model
        run off this one frame."""
        return (
            self._candidate_segments(terms)
            .select("term", "sseg", "max_tf_norm", "doc_count")
            .groupBy("term", "sseg")
            .agg(F.max("max_tf_norm").alias("mtn"), F.sum("doc_count").alias("dc"))
            .toPandas()
        )

    def _wand_scored(
        self,
        terms: list[str],
        idf: dict[str, float],
        conjunctive: bool,
        constant_boost: bool,
        avail_boost: bool,
        k: int,
        boost_ceiling: float,
        min_should_match: int = 0,
        meta: pd.DataFrame | None = None,
        avgdl_map: dict[str, float] | None = None,
    ) -> DataFrame:
        """Distributed block-max WAND over the global doc-id grid.

        Block metadata (term, sseg, max_tf_norm, doc_count — NOT postings) is
        a cheap columnar read.  Range upper bound = Σ_t idf_t · max block
        tf_norm in that range (+ boost ceiling).  Phase 1 scores the top
        ranges exactly to establish θ = kth best score; phase 2 scores only
        ranges whose bound ≥ θ, with per-block pruning inside.
        """
        self.last_wand = None
        if meta is None:
            meta = self._wand_meta(terms)
        if meta.empty:
            return self._scored_docs(terms, idf, avgdl_map=avgdl_map)
        meta["ub"] = meta["term"].map(idf).fillna(0.0) * (meta["mtn"] * self.bound_scale)
        by_range = meta.groupby("sseg").agg(
            ub=("ub", "sum"), dc=("dc", "sum"), nterms=("term", "nunique")
        )
        if conjunctive:
            by_range = by_range[by_range["nterms"] == len(terms)]
        elif min_should_match > 1:
            # a doc matching >= m terms needs >= m terms present in its range
            by_range = by_range[by_range["nterms"] >= min_should_match]
        if by_range.empty:
            # no range can satisfy the clause requirement -> empty result
            return self.spark.createDataFrame(
                [], "doc_id long, score double, n_terms int, dl int"
            )
        # per-range ACHIEVABLE floor: idf·mtn is attained by the doc
        # realizing the block max, and distinct ranges hold distinct docs, so
        # the k-th largest per-range achievable is a sound lower bound on the
        # true θ — usable for pruning BEFORE any scoring.  (Measured at 8M
        # docs: phase-1's own θ over the 2 top-ub ranges was 2.89 while the
        # floor was 3.44 — without the floor, 942/976 ranges survived and
        # phase 2 decoded 7.7M rows for nothing.)
        # NOTE the floor uses the baked mtn times floor_scale, NEVER
        # bound_scale: bound_scale inflates bounds to stay a sound UPPER
        # bound on generational indexes whose avgdl grew after baking, but
        # an inflated value is not attained by any doc — a floor built on
        # it could exceed the true θ and prune a top-k range.  floor_scale
        # is 1.0 on batch indexes (mtn is exactly today's block-max score)
        # and min_g(avgdl_now/avgdl_g, 1) on incremental ones: when the
        # cumulative avgdl SHRANK below a generation's build-time avgdl the
        # baked mtn itself is unattained, and mtn·(avgdl_now/avgdl_g) is
        # the attained correction (tf_norm(a1) >= tf_norm(a0)·a1/a0 for
        # a1 < a0); 0.0 (stats predating the key) disables the floor.
        best_per_range = meta.assign(
            ach=meta["term"].map(idf).fillna(0.0) * meta["mtn"]
        ).groupby("sseg")["ach"].max()
        theta_floor = None
        if (
            not conjunctive and min_should_match <= 1
            # per-field norms: sound only when the index baked each
            # posting's mtn at its OWN field avgdl (per_field_mtn — idf·mtn
            # is then attained by the block-max doc).  A pre-r5 multi-field
            # index baked at the LARGEST field avgdl, so idf·mtn
            # OVER-estimates what a smaller-avgdl field's doc can actually
            # score — still a sound UPPER bound (pruning stays exact) but
            # not an achievable FLOOR; those rely on phase-1's exact θ.
            and (avgdl_map is None or self.per_field_mtn)
            and len(best_per_range) >= k
            and self.floor_scale > 0.0
        ):
            theta_floor = float(
                np.sort(best_per_range.to_numpy())[-k] * self.floor_scale
            )
        by_range = by_range.join(best_per_range.rename("best"))
        # phase 1 targets the ranges CONTAINING the globally best docs (top
        # achievable), not the fattest total bounds — its θ then approaches
        # the true top-k threshold instead of the best dense range's
        by_range = by_range.sort_values("best", ascending=False)
        by_range["ub_total"] = by_range["ub"] + boost_ceiling

        # per-(term, range) residual bound: what the OTHER terms could add in
        # that range — needed for sound per-block pruning inside _scored_docs
        range_ub = by_range["ub"].to_dict()
        rest_bounds = {
            (r["term"], int(s)): float(range_ub.get(s, 0.0) - r["ub"])
            for s, r in zip(meta["sseg"], meta.to_dict("records"))
        }

        # phase 1: enough ranges to (likely) fill k
        cum = by_range["dc"].cumsum()
        n1 = int(np.searchsorted(cum.to_numpy(), k) + 1)
        phase1 = by_range.index[:n1].tolist()

        def exact(ssegs, theta=None):
            s = self._scored_docs(
                terms, idf, ssegs=ssegs, theta=theta,
                boost_ceiling=boost_ceiling, rest_bounds=rest_bounds,
                avgdl_map=avgdl_map,
            )
            if conjunctive:
                s = s.filter(F.col("n_terms") == len(terms))
            elif min_should_match:
                s = s.filter(F.col("n_terms") >= min_should_match)
            return self._apply_boosts(s, constant_boost, avail_boost)

        # phase 1 is both the θ probe AND one branch of the final union —
        # persist it so the final plan reuses the computed scores instead of
        # re-decoding phase 1's blocks (measured: the re-execution was a
        # whole extra Spark job, half of WAND's fixed overhead at 10^6 docs).
        # The caller unpersists via the frame's _ses_persisted attribute
        # after materializing the page.
        p1 = exact(phase1).persist()
        top1 = (
            p1.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .toPandas()
        )
        if len(top1) < k:
            # phase 1 alone can't establish θ; the achievable floor (when
            # sound — plain disjunctions only) still can
            theta = theta_floor
        else:
            theta = float(top1["score"].iloc[-1])
            if theta_floor is not None and theta_floor > theta:
                theta = theta_floor

        rest = by_range.index[n1:]
        if theta is not None:
            rest = [s for s in rest if by_range.loc[s, "ub_total"] >= theta]
        # bench/test introspection (mirrors last_dispatch): which θ pruned
        # and how much of the range set survived it
        self.last_wand = {
            "theta_floor": theta_floor,
            "theta": theta,
            "n_ranges": int(len(by_range)),
            "n_phase1": int(n1),
            "n_rest_alive": int(len(rest)),
        }
        if len(rest) == 0:
            out = p1
        else:
            # score surviving ranges with block-level pruning, union phase 1
            out = p1.unionByName(exact(list(rest), theta=theta))
        out._ses_persisted = [p1]  # noqa: SLF001 — local cleanup protocol
        return out
