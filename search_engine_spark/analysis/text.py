"""Pinned text analysis: HTML extraction, tokenization, query preprocessing.

The analyzer contract (FIXTURES.md §3) re-derives what the reference delegated
to the Atlas Search ``lucene.standard`` analyzer (reference:
``search_utils.py:79-97`` builds ``$search`` stages over analyzed ``name`` /
``barcode`` paths).  Pinned, locale-free rules so token streams are
byte-identical across numpy/pandas/Arrow versions:

- NFC normalize -> ``str.lower()`` -> split on any codepoint outside the
  explicit class ``[0-9A-Za-zÀ-￿]`` -> drop empties.
- No stemming, no index-time stopwords.

Query preprocessing mirrors the reference exactly
(``search_utils.py:62-71``, ``constants.py:15``): on multi-term keywords,
drop a leading two chars when the 2nd char is a space, and remove the
currency/measurement stopwords {rs, Rs, RS, rS, gm, ml, kg} (case-exact).

HTML extraction contract: the corpus (FIXTURES.md §1) wraps each document's
text in a fixed skeleton ``<html><head><title>..</title></head><body><p>TEXT
</p></body></html>``; ``extract_text`` returns the concatenated contents of
``<p>`` elements — byte-identical to the ``text`` column for every url (the
per-row invariant in BASELINE.json).
"""

from __future__ import annotations

import re
import unicodedata

# Explicit codepoint class — never locale/ICU-dependent.
_TOKEN_CHARS = "0-9A-Za-zÀ-￿"
_TOKEN_RE = re.compile(f"[{_TOKEN_CHARS}]+")
_P_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)

# reference constants.py:15 — case-exact list, applied only to multi-term queries
QUERY_STOPWORDS = frozenset({"rs", "Rs", "RS", "rS", "gm", "ml", "kg"})


def extract_text(html: bytes) -> str:
    """Concatenated contents of ``<p>`` elements, utf-8 decoded.

    Byte-identical to the source ``text`` for the pinned corpus skeleton.
    """
    return b"".join(_P_RE.findall(html)).decode("utf-8")


def tokenize(text: str) -> list[str]:
    """Pinned analyzer: NFC -> lower -> split on non-token codepoints."""
    return _TOKEN_RE.findall(unicodedata.normalize("NFC", text).lower())


def preprocess_query(keyword: str) -> list[str]:
    """Reference query preprocessing (search_utils.py:62-71) -> analyzed terms.

    Returns the final analyzed term list fed to the planner.  Single-term
    keywords skip stopword removal (the reference only filters multi-term
    queries, search_utils.py:75-76).
    """
    words = keyword.split(" ")
    if len(words) > 1:
        if len(keyword) >= 2 and keyword[1] == " ":
            keyword = keyword[2:]
        words = [w for w in keyword.split(" ") if w not in QUERY_STOPWORDS]
        keyword = " ".join(words)
    return tokenize(keyword)


# ---------------------------------------------------------------------------
# Vectorized (pandas) variants — the forms used inside Arrow UDFs.
# ---------------------------------------------------------------------------

def extract_text_series(html):  # pd.Series[bytes] -> pd.Series[str]
    return html.map(extract_text)


def tokenize_series(text):  # pd.Series[str] -> pd.Series[list[str]]
    lowered = text.str.normalize("NFC").str.lower()
    return lowered.str.findall(_TOKEN_RE)


# Phonetic key (SURVEY §2 A11 — the reference's commented-out "sounds_like"
# pipeline, reference metaphone.py:37-47, computed doublemetaphone keys per
# name word and stored them for phonetic $search).  Pinned here as classic
# American Soundex with h/w treated as vowels (code 0) — deliberately chosen
# because the whole key is expressible as the SAME translate -> adjacent-dedup
# -> drop-first-code -> drop-zeros -> pad chain in python (this function),
# Spark SQL (F.translate/F.regexp_replace), and DuckDB SQL, so the engine,
# the declarative twin, and the oracle share one definition three ways.
_SOUNDEX_MAP = "01230120022455012623010202"  # a..z -> code ('0' = vowel/h/w)
_ALPHA_RE = re.compile(r"[a-z]+")
_DEDUP_RE = re.compile(r"(.)\1+")


def soundex_key(t: str) -> str:
    """Pinned phonetic key: 'milk'/'melk'/'mlik' -> M420, 'pfister' -> P236.

    Non-[a-z]+ terms (digits, non-ASCII letters) key to themselves — the
    identity key makes the function total without inventing phonetics for
    scripts Soundex was never defined on.
    """
    if not _ALPHA_RE.fullmatch(t):
        return t
    codes = "".join(_SOUNDEX_MAP[ord(c) - 97] for c in t)
    deduped = _DEDUP_RE.sub(r"\1", codes)
    rest = deduped[1:].replace("0", "")  # first code ALWAYS drops (it is the
    # kept letter's own code, merged with any same-code run behind it)
    return t[0].upper() + (rest + "000")[:3]


def edit_distance_leq(
    a: str, b: str, k: int, transpositions: bool = False
) -> bool:
    """Edit distance(a, b) <= k, banded DP with early exit.

    ``transpositions=False`` (default): classic Levenshtein
    (insert/delete/substitute) — the definition every twin must share:
    Spark's ``F.levenshtein`` and DuckDB's ``levenshtein`` both implement
    plain Levenshtein, so the engine's cached-dictionary fuzzy expansion
    (this function), its distributed expansion (``F.levenshtein``), the
    pure-Python oracle, and the SQL oracles all agree term-for-term.

    ``transpositions=True``: an adjacent transposition counts as ONE edit —
    Lucene's ``fuzzy.transpositions`` (the Atlas default the reference's
    ``$search`` fuzzy option inherits).  Implemented as OSA (optimal string
    alignment: each character pair transposes at most once).  At ``k == 1``
    OSA, unrestricted Damerau-Levenshtein, and DuckDB's
    ``damerau_levenshtein`` agree exactly (a single edit is a single edit
    under all three); at ``k >= 2`` OSA can exceed unrestricted Damerau
    (e.g. 'ca'->'abc': OSA 3, Damerau 2), so SQL-oracle-gated surfaces pin
    ``k = 1`` and the general-k path is property-tested against brute force.
    """
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    if k == 0:
        return a == b
    if lb == 0:
        return la <= k  # abs-diff check above already decided, but be direct
    BIG = k + 1  # sentinel: any value > k behaves as +inf under min()
    return _banded_dp_leq(a, b, k, BIG, prefix=False, transpositions=transpositions)


def swap_variants(q: str) -> list[str]:
    """All distinct strings one adjacent transposition away from ``q``.

    The closed form behind the distributed ``transpositions`` expansion at
    ``fuzzy = 1``: damerau(t, q) <= 1  <=>  levenshtein(t, q) <= 1  OR
    t IN swap_variants(q) — a single edit is either one of the three
    Levenshtein primitives or exactly one adjacent swap.  Equal adjacent
    characters swap to the same string (distance 0 via identity), so they
    are skipped; results are sorted and deduplicated for determinism.
    """
    return sorted(
        {q[:i] + q[i + 1] + q[i] + q[i + 2:] for i in range(len(q) - 1)
         if q[i] != q[i + 1]}
    )


def prefix_edit_distance_leq(q: str, t: str, k: int) -> bool:
    """distance(q, some PREFIX of t) <= k — Lucene-style fuzzy autocomplete.

    Equivalent closed form both SQL engines can compute:
    ``min over L in [len(q)-k, len(q)+k] of levenshtein(t[:L], q) <= k``
    (a matching prefix's length must be within k of len(q), since every
    length unit of difference costs at least one edit).
    """
    lq = len(q)
    if lq <= k:
        return True  # the empty prefix is already within k
    if k == 0:
        return t.startswith(q)
    if len(t) < lq - k:
        return False  # even the whole of t is too short
    return _banded_dp_leq(q, t, k, k + 1, prefix=True)


def _banded_dp_leq(
    a: str, b: str, k: int, BIG: int, prefix: bool,
    transpositions: bool = False,
) -> bool:
    """Banded Levenshtein DP: distance(a, b) <= k, or — with ``prefix`` —
    distance(a, some prefix of b) <= k (min over the final row's band;
    cells on any <=k-cost path satisfy |i-j| <= k, so the band is exact
    for both questions).  ``transpositions`` adds the OSA recurrence
    (prev2[j-2] + 1 when the trailing character pairs are swapped); a
    transposition also moves one off the diagonal by at most one per unit
    cost, so the same band stays exact."""
    la, lb = len(a), len(b)
    prev2: list[int] | None = None
    prev = [j if j <= k else BIG for j in range(lb + 1)]
    for i in range(1, la + 1):
        # only |i - j| <= k cells can end <= k (each off-diagonal step costs
        # >= 1), so compute just the band row [lo, hi]
        lo, hi = max(1, i - k), min(lb, i + k)
        cur = [BIG] * (lb + 1)
        best = BIG
        if lo == 1 and i <= k:
            cur[0] = best = i
        for j in range(lo, hi + 1):
            c = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
            if (
                transpositions and i >= 2 and j >= 2
                and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]
                and prev2 is not None
            ):
                c = min(c, prev2[j - 2] + 1)
            cur[j] = c if c <= k else BIG
            if cur[j] < best:
                best = cur[j]
        if best > k:
            return False
        prev2, prev = prev, cur
    if prefix:
        return min(prev) <= k  # best prefix of b, any length in the band
    return prev[lb] <= k


_WILDCARD_CHARS_RE = re.compile(r"^[0-9a-z*?]+$")


def wildcard_pattern_parts(pattern: str) -> tuple[str, str]:
    """Validate a Lucene/Atlas wildcard pattern and compile it once for all
    stacks: returns ``(fixed_prefix, anchored_regex)``.

    ``*`` matches any (possibly empty) run, ``?`` exactly one character —
    the Lucene wildcard operator's two metacharacters (no ``[...]``
    classes).  Patterns are restricted to the analyzer's lowercase
    alphanumeric token alphabet plus the two wildcards, so the python
    ``re`` form, Spark's Java ``rlike`` form, and DuckDB's ``LIKE`` mapping
    (``*``->``%``, ``?``->``_``) are character-for-character equivalent —
    one definition in three stacks, like soundex_key.  The fixed prefix
    (chars before the first wildcard) bounds the dictionary range scan;
    an all-wildcard pattern has an empty prefix and scans the whole
    dictionary (cap with max_expansions).
    """
    p = pattern.strip().lower()
    if not p or not _WILDCARD_CHARS_RE.match(p):
        raise ValueError(
            "wildcard pattern must be non-empty [0-9a-z*?]+ "
            f"(the analyzed-term alphabet), got {pattern!r}"
        )
    fixed = re.match(r"[0-9a-z]*", p).group(0)
    regex = "^" + "".join(
        ".*" if c == "*" else "." if c == "?" else c for c in p
    ) + "$"
    return fixed, regex


_REGEX_CHARS_RE = re.compile(r"^[0-9a-z.*+?()\[\]|-]+$")


def regex_pattern_parts(pattern: str) -> tuple[str, str]:
    """Validate an Atlas/Lucene ``regex``-operator pattern against the
    dialect-safe subset and return ``(fixed_prefix, pattern)``.

    Accepted: lowercase-alnum literals, ``.``, quantifiers ``* + ?``,
    character classes ``[abc]`` / ``[a-z]``, grouping ``( )``, and top-level
    alternation ``|``.  Rejected: backslash escapes, ``^ $ { }``, special
    groups ``(?...)``, uppercase, and anything python ``re`` won't compile —
    exactly the territory where python re, Java ``rlike``, and DuckDB's RE2
    agree character-for-character on the pinned [0-9a-z] term alphabet
    (no backreferences or lookarounds are expressible, so RE2's omissions
    cannot bite).  Full-match anchoring is each stack's job
    (``fullmatch`` / ``^...$`` / ``regexp_full_match``).  The fixed literal
    prefix (empty as soon as a metacharacter or top-level ``|`` is possible)
    bounds the dictionary range scan like the wildcard operator's.
    """
    p = pattern.strip()
    if not p or not _REGEX_CHARS_RE.match(p):
        raise ValueError(
            "regex pattern must be non-empty over [0-9a-z.*+?()[]|-] "
            f"(the dialect-safe subset), got {pattern!r}"
        )
    if "(?" in p:
        raise ValueError(f"special groups '(?' are outside the safe subset: {pattern!r}")
    try:
        re.compile(p)
    except re.error as e:
        raise ValueError(f"invalid regex {pattern!r}: {e}") from None
    fixed = ""
    if "|" not in p:
        fixed = re.match(r"[0-9a-z]*", p).group(0)
        # a quantifier on the last literal makes it optional/repeating —
        # it is not a fixed prefix char then
        if fixed and len(fixed) < len(p) and p[len(fixed)] in "*?+":
            fixed = fixed[:-1]
    return fixed, p
