"""Deterministic Common-Crawl-style webtext corpus (FIXTURES.md §1).

Schema matches BASELINE.json's input_hint exactly:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Generation is counter-based (splitmix64 over ``(seed, row, position)``), so it
is deterministic, prefix-stable across corpus sizes, and fully vectorized in
numpy — a 1M-row bench corpus generates in seconds with no Spark involved.

Token distribution is Zipfian (s=1.07, V=50,000) so head-term skew is real:
the top handful of terms each cover >5% of all postings, which is what forces
the index builder's salted repartition + head-term splitting to actually do
something.  The reference repo's own query keywords (``rice``, ``cadbury``,
``dairy``, ``milk``, ``belt``, ``oil`` — reference test_cases/test_app.py:336,
355,374, utils.py:79, metaphone.py:8) are planted at fixed vocabulary ranks so
every reference query has a known, controlled number of matches at any scale.
"""

from __future__ import annotations

import numpy as np

SEED = 42
VOCAB_SIZE = 50_000
ZIPF_S = 1.07
MIN_TOKENS, MAX_TOKENS = 20, 200

# Reference query terms planted at controlled Zipf ranks (lower rank = more
# frequent).  "oi"/"bel" autocomplete prefixes are covered by oil/belt plus
# the generated neighbors below.
QUERY_TERM_RANKS = {
    "milk": 120,
    "oil": 150,
    "rice": 300,
    "belt": 500,
    "dairy": 900,
    "cadbury": 1200,
    # prefix-family neighbors so autocomplete range scans hit >1 term
    "oiler": 2400,
    "oily": 3100,
    "belted": 2800,
    "milky": 3500,
    "ricefield": 4200,
}

_COMMON_HEAD = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]

_SYL = [
    "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du", "fa", "fe",
    "fi", "fo", "fu", "ga", "ge", "gi", "go", "gu", "ka", "ke", "ki", "ko",
    "ku", "la", "le", "li", "lo", "lu", "ma", "me", "mi", "mo", "mu", "na",
    "ne", "ni", "no", "nu", "pa", "pe", "pi", "po", "pu", "ra", "re", "ri",
    "ro", "ru", "sa", "se", "si", "so", "su", "ta", "te", "ti", "to", "tu",
    "va", "ve", "vi", "vo", "vu", "za", "ze", "zi", "zo", "zu",
]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def _hash2(a: np.ndarray, b: np.ndarray, salt: int) -> np.ndarray:
    h = _splitmix64(a.astype(np.uint64) ^ np.uint64(salt * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
    return _splitmix64(h ^ b.astype(np.uint64))


_vocab_cache: list[str] | None = None
_cdf_cache: np.ndarray | None = None


def vocabulary() -> list[str]:
    """Deterministic V=50,000 wordlist. Rank order = Zipf frequency order."""
    global _vocab_cache
    if _vocab_cache is not None:
        return _vocab_cache
    words: list[str] = list(_COMMON_HEAD)
    planted = {rank: term for term, rank in QUERY_TERM_RANKS.items()}
    rng = np.random.Generator(np.random.Philox(key=SEED))
    seen = set(words) | set(planted.values())
    n_syl = len(_SYL)
    while len(words) < VOCAB_SIZE:
        rank = len(words)
        if rank in planted:
            words.append(planted[rank])
            continue
        # deterministic pseudo-word from the rank itself (no RNG state drift)
        r = rank
        parts = []
        for _ in range(2 + (r % 3)):
            parts.append(_SYL[r % n_syl])
            r //= n_syl
        w = "".join(parts)
        while w in seen:
            w += _SYL[(rank * 31 + len(w)) % n_syl]
        seen.add(w)
        words.append(w)
    del rng
    _vocab_cache = words
    return words


def _zipf_cdf() -> np.ndarray:
    global _cdf_cache
    if _cdf_cache is None:
        ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
        p = ranks ** -ZIPF_S
        p /= p.sum()
        _cdf_cache = np.cumsum(p)
    return _cdf_cache


def generate_rows(start: int, n: int) -> dict[str, np.ndarray | list]:
    """Generate rows [start, start+n) as columnar arrays."""
    i = np.arange(start, start + n, dtype=np.int64)
    ui = i.astype(np.uint64)

    lengths = MIN_TOKENS + (_hash2(ui, np.zeros(n, np.uint64), 1) % np.uint64(MAX_TOKENS - MIN_TOKENS + 1)).astype(np.int64)
    total = int(lengths.sum())
    row_of_tok = np.repeat(i, lengths)
    pos_in_row = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lengths) - lengths, lengths)

    u = _hash2(row_of_tok.astype(np.uint64), pos_in_row.astype(np.uint64), 2).astype(np.float64) / 2.0**64
    vocab_idx = np.searchsorted(_zipf_cdf(), u, side="left")

    vocab = np.asarray(vocabulary(), dtype=object)
    toks = vocab[vocab_idx]
    # join per row
    boundaries = np.cumsum(lengths)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(toks, boundaries)]

    urls = [f"https://site{int(k) % 997}.example/p/{int(k)}" for k in i]
    warc_ts = (np.datetime64("2025-01-01T00:00:00") + i.astype("timedelta64[s]")).astype("datetime64[us]")

    htmls = []
    for t in texts:
        t0 = t.split(" ", 1)[0]
        htmls.append(
            b"<html><head><title>" + t0.encode() + b"</title></head><body><p>" + t.encode() + b"</p></body></html>"
        )

    lang = np.where(
        i % 20 == 7,
        np.where((i // 20) % 2 == 0, "hi", "es"),
        "en",
    ).astype(object)

    return {"url": urls, "warc_ts": warc_ts, "html": htmls, "text": texts, "lang": list(lang)}


def generate_webtext(n_rows: int, batch: int = 200_000):
    """Yield pyarrow RecordBatches for rows [0, n_rows)."""
    import pyarrow as pa

    schema = pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("warc_ts", pa.timestamp("us")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )
    for start in range(0, n_rows, batch):
        cols = generate_rows(start, min(batch, n_rows - start))
        yield pa.record_batch(
            [
                pa.array(cols["url"], pa.string()),
                pa.array(cols["warc_ts"], pa.timestamp("us")),
                pa.array(cols["html"], pa.binary()),
                pa.array(cols["text"], pa.string()),
                pa.array(cols["lang"], pa.string()),
            ],
            schema=schema,
        )


def write_webtext_parquet(path: str, n_rows: int, row_group_size: int = 20_000) -> str:
    """Write the corpus as (possibly multi-file) parquet under ``path``."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    gen = generate_webtext(n_rows)
    first = next(gen)
    writer = pq.ParquetWriter(os.path.join(path, "part-00000.parquet"), first.schema)
    writer.write_batch(first, row_group_size=row_group_size)
    nfile = 0
    count = first.num_rows
    for rb in gen:
        # roll files every ~500k rows so Spark gets multiple splits
        if count >= 500_000:
            writer.close()
            nfile += 1
            writer = pq.ParquetWriter(os.path.join(path, f"part-{nfile:05d}.parquet"), rb.schema)
            count = 0
        writer.write_batch(rb, row_group_size=row_group_size)
        count += rb.num_rows
    writer.close()
    return path


class _ParallelPart:
    """Picklable per-process corpus writer (generation is counter-based, so
    disjoint row ranges are independent and deterministic)."""

    def __init__(self, path: str, per: int, row_group_size: int, n_rows: int):
        self.path, self.per, self.rgs, self.n_rows = path, per, row_group_size, n_rows

    def __call__(self, i: int):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pa.schema(
            [
                pa.field("url", pa.string()),
                pa.field("warc_ts", pa.timestamp("us")),
                pa.field("html", pa.binary()),
                pa.field("text", pa.string()),
                pa.field("lang", pa.string()),
            ]
        )
        start = i * self.per
        end = min(start + self.per, self.n_rows)
        w = pq.ParquetWriter(os.path.join(self.path, f"part-{i:05d}.parquet"), schema)
        for s in range(start, end, 100_000):
            cols = generate_rows(s, min(100_000, end - s))
            rb = pa.record_batch(
                [
                    pa.array(cols["url"], pa.string()),
                    pa.array(cols["warc_ts"], pa.timestamp("us")),
                    pa.array(cols["html"], pa.binary()),
                    pa.array(cols["text"], pa.string()),
                    pa.array(cols["lang"], pa.string()),
                ],
                schema=schema,
            )
            w.write_batch(rb, row_group_size=self.rgs)
        w.close()


def write_webtext_parquet_parallel(
    path: str, n_rows: int, procs: int = 16, row_group_size: int = 20_000
) -> str:
    """Multi-process corpus writer — same rows as the serial writer, one file
    per process over disjoint row ranges (~10x faster on many cores)."""
    import multiprocessing as mp
    import os

    os.makedirs(path, exist_ok=True)
    per = -(-n_rows // procs)
    parts = [i for i in range(procs) if i * per < n_rows]
    with mp.Pool(len(parts)) as pool:
        pool.map(_ParallelPart(path, per, row_group_size, n_rows), parts)
    return path
