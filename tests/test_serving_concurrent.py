"""Concurrent serving correctness: N threads over ONE SparkSession must
return exactly what sequential execution returns, across every query
surface the serving mix uses (driver fast path, distributed auto-dispatch,
autocomplete, fuzzy, conjunctive, pagination)."""

from concurrent.futures import ThreadPoolExecutor

import pytest


@pytest.fixture(scope="module")
def eng(spark, index_tiny):
    from search_engine_spark.query.engine import SearchEngine

    return SearchEngine(spark, index_tiny)


def _key(out):
    if out is None or isinstance(out, str):
        return out
    return (
        out.total,
        [(int(d), round(float(s), 6)) for d, s in zip(out.page["doc_id"], out.page["score"])],
    )


def test_concurrent_equals_sequential(eng):
    workload = [
        lambda: eng.search("cadbury dairy milk", k=10),
        lambda: eng.search("oi", k=10, max_expansions=50),
        lambda: eng.search("ricee", k=10, fuzzy=1),
        lambda: eng.search("milk oil", k=10, conjunctive=True),
        lambda: eng.search("the oil", k=10, mode="auto", force_distributed=True,
                           total_mode="approx"),
        lambda: eng.search("milk", k=10, skip=5),
        lambda: eng.suggest("oill"),
        lambda: eng.search("belt rice", k=10, min_should_match=2),
    ] * 4
    sequential = [_key(fn()) for fn in workload]
    with ThreadPoolExecutor(max_workers=8) as ex:
        concurrent = list(ex.map(lambda fn: _key(fn()), workload))
    assert concurrent == sequential
