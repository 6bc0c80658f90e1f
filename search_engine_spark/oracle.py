"""Pure-Python reference model (the rank-identity oracle).

The reference repo delegates its entire search core to MongoDB Atlas Search
(Lucene) and cannot be executed (unresolved merge conflicts + a live-cluster
dependency — SURVEY.md §0).  This oracle is the deterministic re-derivation of
those delegated semantics, pinned in FIXTURES.md §3:

- analyzer: ``analysis.tokenize`` (NFC -> lower -> explicit codepoint split)
- BM25 (Lucene defaults): k1=1.2, b=0.75,
  idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
  score(t,d) = idf * tf / (tf + k1*(1 - b + b*dl/avgdl))
- doc score = sum of matched-term scores **in ascending term order** (float
  determinism); tiebreak (score desc, doc_id asc)
- dispatch (reference search_utils.py:75-76, app.py:470-471): 1 analyzed term
  -> autocomplete (prefix disjunction, compound.should minimumShouldMatch=1);
  >=2 terms -> text clause (disjunction of terms inside one must clause)
- boosts: constant +5.0 for flagged docs (reference constants.py:16,
  search_utils.py:168-171); availability +10.0 when the doc's availability
  counter > 0 (search_utils.py:157-165)
- pagination: skip/limit over the (score desc, doc_id asc) order, plus the
  total match count (the reference's $facet count, pipelines.py:27-42)

Doc metadata rules (shared with the Spark engine; derived from the corpus so
both sides compute them identically): ``boosted = (dl % 37 == 0)``,
``avail = dl % 7`` where dl = analyzed token count.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .analysis import edit_distance_leq, preprocess_query, tokenize

K1 = 1.2
B = 0.75
CONSTANT_BOOST = 5.0  # reference constants.py:16 PRODUCT_BOOST_CONSTANT_VAL
AVAIL_BOOST = 10.0  # reference search_utils.py:157 default boost
GROUP_MOD = 53  # derived g_id rule shared with the Spark engine (dl % 53)


def bm25(tf: int, df: int, dl: int, n_docs: int, avgdl: float) -> float:
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf / (tf + K1 * (1.0 - B + B * dl / avgdl))


@dataclass
class QueryResult:
    total: int
    hits: list[tuple[int, float]] = field(default_factory=list)  # (doc_id, score)


class OracleIndex:
    """Dict-based inverted index over (url, text) rows."""

    def __init__(self, rows: list[tuple[str, str]]):
        # doc_id = zero-based dense rank of url in lexicographic order
        urls = sorted(u for u, _ in rows)
        self.url_to_doc = {u: i for i, u in enumerate(urls)}
        n = len(rows)
        self.n_docs = n
        self.doc_len = [0] * n
        self.postings: dict[str, dict[int, int]] = {}
        # positional postings (Lucene .pos analog): term -> doc -> sorted
        # occurrence offsets in the analyzed token stream; phrase matching
        # intersects these with per-slot shifts
        self.positions: dict[str, dict[int, list[int]]] = {}
        for url, text in rows:
            d = self.url_to_doc[url]
            toks = tokenize(text)
            self.doc_len[d] = len(toks)
            for p, t in enumerate(toks):
                pl = self.postings.setdefault(t, {})
                pl[d] = pl.get(d, 0) + 1
                self.positions.setdefault(t, {}).setdefault(d, []).append(p)
        self.avgdl = sum(self.doc_len) / n if n else 0.0
        self.terms_sorted = sorted(self.postings)

    # -- metadata rules shared with the Spark engine ------------------------
    def boosted(self, d: int) -> bool:
        return self.doc_len[d] % 37 == 0

    def avail(self, d: int) -> int:
        return self.doc_len[d] % 7

    # -- shared postlude -----------------------------------------------------
    def _rank_page(
        self,
        scores: dict[int, float],
        k: int,
        skip: int,
        constant_boost: bool,
        avail_boost: bool,
        total: int | None = None,
    ) -> QueryResult:
        """THE boost/rank/paginate rule, in one place: +5 for flagged docs,
        +10 for available docs, order (score desc, doc_id asc), skip/k."""
        if constant_boost:
            scores = {d: s + (CONSTANT_BOOST if self.boosted(d) else 0.0) for d, s in scores.items()}
        if avail_boost:
            scores = {d: s + (AVAIL_BOOST if self.avail(d) > 0 else 0.0) for d, s in scores.items()}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return QueryResult(
            total=len(ranked) if total is None else total,
            hits=ranked[skip : skip + k],
        )

    # -- scoring -------------------------------------------------------------
    def _score_terms(self, terms: list[str], conjunctive: bool) -> dict[int, float]:
        terms = sorted(set(terms))  # ascending term order (float determinism)
        scores: dict[int, float] = {}
        seen_count: dict[int, int] = {}
        n_present = 0
        for t in terms:
            pl = self.postings.get(t)
            if not pl:
                continue
            n_present += 1
            df = len(pl)
            for d, tf in pl.items():
                scores[d] = scores.get(d, 0.0) + bm25(tf, df, self.doc_len[d], self.n_docs, self.avgdl)
                seen_count[d] = seen_count.get(d, 0) + 1
        if conjunctive:
            # every *queried* term must match (a query term absent from the
            # corpus entirely -> no results), matching posting intersection
            need = len(terms)
            scores = {d: s for d, s in scores.items() if seen_count.get(d, 0) == need and n_present == need}
        return scores

    def expand_prefix(self, prefix: str) -> list[str]:
        """Term-dictionary range scan: terms t with t.startswith(prefix)."""
        import bisect

        lo = bisect.bisect_left(self.terms_sorted, prefix)
        out = []
        for i in range(lo, len(self.terms_sorted)):
            t = self.terms_sorted[i]
            if not t.startswith(prefix):
                break
            out.append(t)
        return out

    def search(
        self,
        keyword: str,
        k: int = 10,
        skip: int = 0,
        conjunctive: bool = False,
        constant_boost: bool = False,
        avail_boost: bool = False,
    ) -> QueryResult:
        """Full reference semantics: preprocess -> dispatch -> score -> page."""
        terms = preprocess_query(keyword)
        if not terms:
            return QueryResult(total=0)
        if len(terms) == 1:
            match_terms = self.expand_prefix(terms[0])
            scores = self._score_terms(match_terms, conjunctive=False)
        else:
            scores = self._score_terms(terms, conjunctive=conjunctive)
        return self._rank_page(scores, k, skip, constant_boost, avail_boost)

    def expand_fuzzy(
        self, term: str, fuzzy: int, transpositions: bool = False
    ) -> list[str]:
        """Dictionary terms within edit distance ``fuzzy`` (ascending).
        ``transpositions`` counts an adjacent swap as one edit (Lucene
        ``fuzzy.transpositions``, the Atlas default)."""
        return [
            t for t in self.terms_sorted
            if abs(len(t) - len(term)) <= fuzzy
            and edit_distance_leq(t, term, fuzzy, transpositions)
        ]

    def expand_phonetic(self, term: str) -> list[str]:
        """Dictionary terms sharing ``term``'s pinned Soundex key (A11)."""
        from .analysis.text import soundex_key

        want = soundex_key(term)
        return [t for t in self.terms_sorted if soundex_key(t) == want]

    def expand_wildcard(self, pattern: str) -> list[str]:
        """Dictionary terms matching a ``*``/``?`` wildcard pattern
        (ascending) — the shared compiled form from wildcard_pattern_parts."""
        import re

        from .analysis.text import wildcard_pattern_parts

        _, regex = wildcard_pattern_parts(pattern)
        rx = re.compile(regex)
        return [t for t in self.terms_sorted if rx.match(t)]

    def expand_regex(self, pattern: str) -> list[str]:
        """Dictionary terms fully matching a safe-subset regex (ascending)."""
        import re

        from .analysis.text import regex_pattern_parts

        _, rx_src = regex_pattern_parts(pattern)
        rx = re.compile(rx_src)
        return [t for t in self.terms_sorted if rx.fullmatch(t)]

    def search_regex(
        self, pattern: str, k: int = 10, skip: int = 0,
        constant_boost: bool = False, avail_boost: bool = False,
    ) -> QueryResult:
        """Atlas/Lucene ``regex`` operator: safe-subset full-match expansion
        scored as one disjunction — the wildcard operator's general form."""
        expanded = self.expand_regex(pattern)
        if not expanded:
            return QueryResult(total=0)
        scores = self._score_terms(expanded, conjunctive=False)
        return self._rank_page(scores, k, skip, constant_boost, avail_boost)

    def more_like_this(
        self, text: str, k: int = 10, skip: int = 0,
        max_query_terms: int = 25, min_term_freq: int = 1,
        min_doc_freq: int = 1,
        constant_boost: bool = False, avail_boost: bool = False,
    ) -> QueryResult:
        """Lucene MoreLikeThis twin: tf·idf term selection (rounded to 6,
        term-asc tiebreak, top max_query_terms) then the plain disjunction."""
        from .numerics import round_half_away

        tf: dict[str, int] = {}
        for t in tokenize(text):
            tf[t] = tf.get(t, 0) + 1
        sel: dict[str, float] = {}
        for t, c in tf.items():
            pl = self.postings.get(t)
            if c < int(min_term_freq) or not pl or len(pl) < max(int(min_doc_freq), 1):
                continue
            df = len(pl)
            idf = math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
            sel[t] = float(round_half_away(c * idf, 6))
        if not sel:
            return QueryResult(total=0)
        selected = sorted(sel, key=lambda t: (-sel[t], t))[: int(max_query_terms)]
        scores = self._score_terms(selected, conjunctive=False)
        return self._rank_page(scores, k, skip, constant_boost, avail_boost)

    def search_wildcard(
        self, pattern: str, k: int = 10, skip: int = 0,
        constant_boost: bool = False, avail_boost: bool = False,
    ) -> QueryResult:
        """Atlas/Lucene ``wildcard`` operator: the (unanalyzed) pattern
        expands against the dictionary and the expansion scores as one
        disjunction, each variant with its own idf — the same blending rule
        as the fuzzy/prefix/phonetic surfaces."""
        expanded = self.expand_wildcard(pattern)
        if not expanded:
            return QueryResult(total=0)
        scores = self._score_terms(expanded, conjunctive=False)
        return self._rank_page(scores, k, skip, constant_boost, avail_boost)

    def search_phonetic(
        self, keyword: str, k: int = 10, skip: int = 0,
        constant_boost: bool = False, avail_boost: bool = False,
    ) -> QueryResult:
        """Phonetic matching: every analyzed term expands to its key-equal
        dictionary neighborhood; the union scores as one disjunction."""
        terms = preprocess_query(keyword)
        if not terms:
            return QueryResult(total=0)
        expanded: set[str] = set()
        for qt in terms:
            expanded.update(self.expand_phonetic(qt))
        if not expanded:
            return QueryResult(total=0)
        scores = self._score_terms(sorted(expanded), conjunctive=False)
        return self._rank_page(scores, k, skip, constant_boost, avail_boost)

    def expand_prefix_fuzzy(self, term: str, fuzzy: int) -> list[str]:
        """Fuzzy autocomplete: terms with a PREFIX within distance ``fuzzy``."""
        from .analysis.text import prefix_edit_distance_leq

        return [
            t for t in self.terms_sorted
            if len(t) >= len(term) - fuzzy and prefix_edit_distance_leq(term, t, fuzzy)
        ]

    def search_prefix_fuzzy(
        self, keyword: str, k: int = 10, skip: int = 0, fuzzy: int = 1,
        constant_boost: bool = False, avail_boost: bool = False,
    ) -> QueryResult:
        """Atlas autocomplete with fuzzy: the single analyzed term expands to
        its prefix-edit neighborhood; the union scores as one disjunction."""
        terms = preprocess_query(keyword)
        if len(terms) != 1:
            raise ValueError("prefix_fuzzy is a single-term surface")
        expanded = self.expand_prefix_fuzzy(terms[0], fuzzy)
        if not expanded:
            return QueryResult(total=0)
        scores = self._score_terms(expanded, conjunctive=False)
        return self._rank_page(scores, k, skip, constant_boost, avail_boost)

    def suggest(
        self, term: str, fuzzy: int = 1, transpositions: bool = False
    ) -> str | None:
        """"Did you mean": most frequent in-range dictionary term."""
        cands = self.expand_fuzzy(term, fuzzy, transpositions)
        if not cands:
            return None
        return min(cands, key=lambda t: (-len(self.postings[t]), t))

    def search_fuzzy(
        self,
        keyword: str,
        k: int = 10,
        skip: int = 0,
        fuzzy: int = 1,
        constant_boost: bool = False,
        avail_boost: bool = False,
        transpositions: bool = False,
    ) -> QueryResult:
        """Fuzzy matching: every analyzed term expands to its edit-distance
        neighborhood; the union scores as one disjunction, each variant with
        its own idf — the blending rule shared with the prefix path."""
        terms = preprocess_query(keyword)
        if not terms:
            return QueryResult(total=0)
        expanded: set[str] = set()
        for qt in terms:
            expanded.update(self.expand_fuzzy(qt, fuzzy, transpositions))
        if not expanded:
            return QueryResult(total=0)
        scores = self._score_terms(sorted(expanded), conjunctive=False)
        return self._rank_page(scores, k, skip, constant_boost, avail_boost)

    def search_grouped(
        self,
        keyword: str,
        k: int = 10,
        skip: int = 0,
        conjunctive: bool = False,
        constant_boost: bool = False,
        avail_boost: bool = False,
    ) -> tuple[int, list[tuple[int, int, float, int]]]:
        """Grouped rollup (reference /v2/search, app.py:488-520): score ->
        group by g_id = dl % GROUP_MOD -> keep each group's best hit (score
        desc, doc_id asc) + member count -> rank groups by their best hit.

        Returns (total_groups, [(g_id, top_doc, score, n_docs), ...]).
        """
        base = self.search(keyword, k=self.n_docs, skip=0, conjunctive=conjunctive,
                           constant_boost=constant_boost, avail_boost=avail_boost)
        # winner selection and group ranking on the ROUNDED score with the
        # doc_id tiebreak — the rule shared with the engine and SQL oracles
        hits = sorted(base.hits, key=lambda kv: (-round(kv[1], 6), kv[0]))
        groups: dict[int, list] = {}
        for d, s in hits:
            g = self.doc_len[d] % GROUP_MOD
            if g in groups:
                groups[g][2] += 1
            else:
                groups[g] = [d, s, 1]
        rows = sorted(
            ((g, d, s, n) for g, (d, s, n) in groups.items()),
            key=lambda r: (-round(r[2], 6), r[1]),
        )
        return len(rows), rows[skip : skip + k]

    def search_min_should_match(
        self,
        keyword: str,
        m: int,
        k: int = 10,
        skip: int = 0,
        constant_boost: bool = False,
        avail_boost: bool = False,
    ) -> QueryResult:
        """Lucene minimumShouldMatch m-of-n over the analyzed terms: keep
        docs matching at least ``m`` distinct query terms (m=1 is the plain
        disjunction, m=n is `conjunctive`)."""
        terms = sorted(set(preprocess_query(keyword)))
        if not terms:
            return QueryResult(total=0)
        scores: dict[int, float] = {}
        seen: dict[int, int] = {}
        for t in terms:
            pl = self.postings.get(t)
            if not pl:
                continue
            df = len(pl)
            for d, tf in pl.items():
                scores[d] = scores.get(d, 0.0) + bm25(
                    tf, df, self.doc_len[d], self.n_docs, self.avgdl
                )
                seen[d] = seen.get(d, 0) + 1
        scores = {d: s for d, s in scores.items() if seen.get(d, 0) >= m}
        return self._rank_page(scores, k, skip, constant_boost, avail_boost)

    def search_phrase(
        self,
        keyword: str,
        k: int = 10,
        skip: int = 0,
        constant_boost: bool = False,
        avail_boost: bool = False,
        max_gap: int = 0,
    ) -> QueryResult:
        """Exact-phrase match + BM25 (Atlas ``$search.phrase`` semantics).

        The phrase is the INDEX analyzer's token sequence of ``keyword``
        (order kept, stopwords kept — positions refer to the analyzed
        stream, so query-side stopword removal would silently change
        adjacency).  A doc matches when the terms appear consecutively in
        order; tf = occurrence count of the whole phrase, df = matching-doc
        count, and the phrase scores as one pseudo-term:
        ``bm25(tf_phrase, df_phrase, dl)``.
        """
        terms = tokenize(keyword)
        if not terms or any(t not in self.positions for t in terms):
            return QueryResult(total=0)
        docs = set(self.positions[terms[0]])
        for t in terms[1:]:
            docs &= set(self.positions[t])
        tfs: dict[int, int] = {}
        for d in docs:
            # chain of END positions: term i's occurrences reachable from a
            # term i-1 end with gap in [1, max_gap+1] (ordered proximity;
            # max_gap=0 collapses to exact adjacency)
            ends = set(self.positions[terms[0]][d])
            for t in terms[1:]:
                ends = {
                    p for p in self.positions[t][d]
                    if any(p - q >= 1 and p - q <= max_gap + 1 for q in ends)
                }
                if not ends:
                    break
            if ends:
                tfs[d] = len(ends)
        df = len(tfs)
        if df == 0:
            return QueryResult(total=0)
        scores = {
            d: bm25(tf, df, self.doc_len[d], self.n_docs, self.avgdl)
            for d, tf in tfs.items()
        }
        return self._rank_page(scores, k, skip, constant_boost, avail_boost, total=df)


class OracleMultiFieldIndex:
    """Multi-field rank-identity oracle (Lucene named fields).

    Rows are ``(url, {field: text})``.  Each field keeps its own postings,
    document count (docs where the field has >= 1 token — Lucene docCount),
    and average field length (Lucene per-field norms), exactly the statistics
    the Spark engine's ``field_cols`` build commits to corpus stats.  Compound
    evaluation mirrors the reference's ``$search.compound`` shapes
    (search_utils.py:79-97,181-203): every must clause must match, at least
    ``minimum_should_match`` should clauses must match, and every present
    query key contributes its field-local BM25, summed in ascending
    (field, term) order — the same deterministic fold as the engine's
    ascending posting-key order (the \\x1f separator sorts below every token
    codepoint, so tuple order == prefixed-key order).
    """

    def __init__(self, rows: list[tuple[str, dict]]):
        urls = sorted(u for u, _ in rows)
        self.url_to_doc = {u: i for i, u in enumerate(urls)}
        self.n_docs = len(rows)
        self.field_len: dict[str, dict[int, int]] = {}
        self.postings: dict[tuple[str, str], dict[int, int]] = {}
        self.positions: dict[tuple[str, str], dict[int, list[int]]] = {}
        for url, fields in rows:
            d = self.url_to_doc[url]
            for f_name, text in fields.items():
                toks = tokenize(text or "")
                if not toks:
                    continue
                self.field_len.setdefault(f_name, {})[d] = len(toks)
                for p, t in enumerate(toks):
                    pl = self.postings.setdefault((f_name, t), {})
                    pl[d] = pl.get(d, 0) + 1
                    self.positions.setdefault((f_name, t), {}).setdefault(
                        d, []
                    ).append(p)
        self.fields = {
            f: (len(lens), sum(lens.values()) / len(lens))
            for f, lens in self.field_len.items()
        }

    def search_compound(
        self,
        must: list = (),
        should: list = (),
        k: int = 10,
        skip: int = 0,
        minimum_should_match: int = 1,
        must_not: list = (),
        filter: list = (),
    ) -> QueryResult:
        """Lucene BooleanQuery semantics over named fields.

        ``must_not`` clauses are pure filters (Lucene MUST_NOT scores
        nothing): a doc is dropped when ANY of a must_not clause's keys is
        present, and the clause contributes zero to the score.  ``filter``
        clauses are Lucene FILTER / Atlas ``compound.filter``: required like
        must, scoring nothing — together with must/should/must_not that is
        all four BooleanQuery occur types.  Positive clause dicts may carry
        ``boost`` (Atlas ``score: {boost: {value}}``): the clause's keys
        score with ``boost * idf * tf_norm``.  A key named by several
        positive clauses scores ONCE with the largest boost (the engine
        dedups keys across clauses; documented dedup rule).
        """
        def clause_keys(c):
            if isinstance(c, dict):
                f, q, kind = c["field"], c["query"], c.get("kind", "text")
            else:
                (f, q), kind = c, "text"
            toks = preprocess_query(q)
            if kind == "text":
                return [(f, t) for t in toks]
            if kind == "fuzzy":
                n = int(c.get("fuzzy", 1))
                tr = bool(c.get("transpositions", False))
                vocab = sorted(t for (ff, t) in self.postings if ff == f)
                out = set()
                for qt in toks:
                    out.update(
                        t for t in vocab
                        if abs(len(t) - len(qt)) <= n
                        and edit_distance_leq(t, qt, n, tr)
                    )
                return [(f, t) for t in sorted(out)]
            if kind == "wildcard":
                import re

                from .analysis.text import wildcard_pattern_parts

                _, regex = wildcard_pattern_parts(c["query"])
                rx = re.compile(regex)
                vocab = sorted(t for (ff, t) in self.postings if ff == f)
                return [(f, t) for t in vocab if rx.match(t)]
            if kind == "regex":
                import re

                from .analysis.text import regex_pattern_parts

                _, rx_src = regex_pattern_parts(c["query"])
                rx = re.compile(rx_src)
                vocab = sorted(t for (ff, t) in self.postings if ff == f)
                return [(f, t) for t in vocab if rx.fullmatch(t)]
            raise ValueError(f"unknown clause kind {kind!r}")

        if must_not and not (must or should or filter):
            raise ValueError(
                "must_not requires at least one must/should/filter clause"
            )
        mt = [clause_keys(c) for c in must]
        st = [clause_keys(c) for c in should]
        nt = [clause_keys(c) for c in must_not]
        ft_ = [clause_keys(c) for c in filter]
        msm = int(minimum_should_match) if st else 0
        if st and not mt and not ft_:
            msm = max(msm, 1)
        if st and msm > len(st):
            return QueryResult(total=0)
        weight: dict[tuple, float] = {}
        for c, ts in zip(list(must) + list(should), mt + st):
            b = float(c.get("boost", 1.0)) if isinstance(c, dict) else 1.0
            for ft in ts:
                weight[ft] = max(weight.get(ft, 0.0), b)
        all_keys = sorted({ft for ts in mt + st + nt + ft_ for ft in ts})
        scores: dict[int, float] = {}
        has: dict[int, set] = {}
        for f, t in all_keys:  # ascending (field, term) == engine fold order
            pl = self.postings.get((f, t))
            if not pl:
                continue
            dc, avgdl = self.fields[f]
            df = len(pl)
            # must_not-only keys score nothing but still gate membership
            w = weight.get((f, t), 0.0)
            idf = w * math.log(1.0 + (dc - df + 0.5) / (df + 0.5))
            for d, tf in pl.items():
                dl = self.field_len[f][d]
                scores[d] = scores.get(d, 0.0) + idf * tf / (
                    tf + K1 * (1.0 - B + B * dl / avgdl)
                )
                has.setdefault(d, set()).add((f, t))

        def ok(d, ts):
            hd = has.get(d, ())
            return any(ft in hd for ft in ts)

        kept = {
            d: s
            for d, s in scores.items()
            if all(ok(d, ts) for ts in mt)
            and all(ok(d, ts) for ts in ft_)
            and (not msm or sum(ok(d, ts) for ts in st) >= msm)
            and not any(ok(d, ts) for ts in nt)
        }
        ranked = sorted(kept.items(), key=lambda kv: (-kv[1], kv[0]))
        return QueryResult(total=len(ranked), hits=ranked[skip : skip + k])

    def search_phrase_field(
        self, field: str, keyword: str, k: int = 10, skip: int = 0,
        max_gap: int = 0,
    ) -> QueryResult:
        """Field-scoped exact phrase (Atlas phrase clause with a path): the
        analyzed token sequence must appear consecutively within ``field``;
        the match scores as one pseudo-term with the FIELD's docCount/avgdl
        — the per-field-norm twin of OracleIndex.search_phrase."""
        terms = tokenize(keyword)
        keys = [(field, t) for t in terms]
        if not terms or any(kk not in self.positions for kk in keys):
            return QueryResult(total=0)
        docs = set(self.positions[keys[0]])
        for kk in keys[1:]:
            docs &= set(self.positions[kk])
        tfs: dict[int, int] = {}
        for d in docs:
            ends = set(self.positions[keys[0]][d])
            for kk in keys[1:]:
                ends = {
                    p for p in self.positions[kk][d]
                    if any(1 <= p - q <= max_gap + 1 for q in ends)
                }
                if not ends:
                    break
            if ends:
                tfs[d] = len(ends)
        df = len(tfs)
        if df == 0:
            return QueryResult(total=0)
        dc, avgdl = self.fields[field]
        scores = {
            d: bm25(tf, df, self.field_len[field][d], dc, avgdl)
            for d, tf in tfs.items()
        }
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return QueryResult(total=df, hits=ranked[skip : skip + k])
