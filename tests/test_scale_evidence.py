"""Pins the committed 1M-row scale-evidence artifact (BENCH/scale_r4_1m.json,
produced by scripts/scale_ladder_bench.py) so the ladder's scale claims are
asserted by the suite, not just narrated in BENCH/BASELINE.md.

Skips if the artifact is absent (fresh checkout before a scale run)."""

import json
import os

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH", "scale_r4_1m.json")


@pytest.fixture(scope="module")
def evidence():
    if not os.path.exists(ART):
        pytest.skip("no committed scale artifact; run scripts/scale_ladder_bench.py")
    with open(ART) as f:
        return json.load(f)


def test_candidate_count_stays_bucket_bounded(evidence):
    """No quadratic blowup: LSH candidate pairs at 10^6 docs stay within the
    O(N · bands · cap) enumeration bound — and in practice orders of
    magnitude under it (all-pairs would be ~5×10^11)."""
    from search_engine_spark.operators.dedup import _BANDS, _BUCKET_CAP

    st = evidence["stages"]["dd_lsh_candidate_pairs"]
    n = evidence["n_docs"]
    assert n >= 1_000_000
    assert st["rows"] <= n * _BANDS * _BUCKET_CAP
    assert st["rows"] < n * (n - 1) / 1000  # nowhere near quadratic


def test_planted_pairs_survive_ladder(evidence):
    """The 5% planted clone pairs (jaccard ≈0.9) survive candidate
    generation AND exact verification at ≥90% — the 1M-scale twin of
    test_minhash_ladder_recall_floor."""
    planted = evidence["n_docs"] // 20
    assert evidence["stages"]["dd_verified_pairs"]["rows"] >= 0.9 * planted


def test_rows_identical_across_parallelism(evidence):
    """local[8] and local[32] over the same 1M input produce identical row
    counts at every ladder stage — partitioning never changes results."""
    c8 = ART.replace(".json", "_c8.json")
    if not os.path.exists(c8):
        pytest.skip("no committed local[8] leg")
    with open(c8) as f:
        other = json.load(f)
    for name, st in evidence["stages"].items():
        if "rows" in st and name in other["stages"]:
            assert other["stages"][name]["rows"] == st["rows"], name


def test_component_tier_and_observability_recorded(evidence):
    st = evidence["stages"]
    assert st["dd_verified_pairs"]["component_tier"] in (
        "driver_union_find", "distributed_fixpoint"
    )
    emb = st["dd_embedding_neardup_lsh_kernel"]
    assert "dropped_buckets" in emb and "nplanes_per_band" in emb
    # plane count scaled with the corpus: ceil(log2 1e6) - 4 = 16
    assert emb["nplanes_per_band"] == 16


# ---------------------------------------------------------------------------
# incremental ingest + compaction at 1M docs (BENCH/scale_r4_ingest_1m.json,
# produced by scripts/ingest_scale_bench.py)
# ---------------------------------------------------------------------------

ING_ART = os.path.join(os.path.dirname(ART), "scale_r4_ingest_1m.json")


@pytest.fixture(scope="module")
def ingest_evidence():
    if not os.path.exists(ING_ART):
        pytest.skip("no committed ingest-scale artifact; run scripts/ingest_scale_bench.py")
    with open(ING_ART) as f:
        return json.load(f)


def test_generation_cost_is_o_batch_not_o_corpus(ingest_evidence):
    """The load-bearing incremental claim: appending generation g to a
    (g-1)/G-full index costs the same as generation 1's append to an empty
    one.  A rebuild-per-batch design would show the last generation ~G x
    the first."""
    walls = ingest_evidence["gen_walls_s"]
    assert ingest_evidence["n_docs"] >= 1_000_000 and len(walls) >= 4
    assert ingest_evidence["last_gen_vs_first_ratio"] < 1.5


def test_rank_identity_and_compaction_at_1m(ingest_evidence):
    assert ingest_evidence["rank_identity_mismatches"] == 0
    assert ingest_evidence["bound_scale_compacted"] == 1.0
    files = ingest_evidence["segment_files"]
    assert files["compacted"] * 2 <= files["grown"]
    # compaction (no tokenize) costs well under the full rebuild
    assert ingest_evidence["compact_s"] < ingest_evidence["batch_build_s"]


# ---------------------------------------------------------------------------
# round-5 artifacts: ingest throughput after the token-staging fix, the
# serving coordinator scale-out, and the WAND crossover with auto-dispatch
# ---------------------------------------------------------------------------

ING5_ART = os.path.join(os.path.dirname(ART), "scale_r5_ingest_1m.json")


def _load(path):
    if not os.path.exists(path):
        pytest.skip(f"no committed artifact {os.path.basename(path)}")
    with open(path) as f:
        return json.load(f)


def test_r5_ingest_throughput_at_least_half_of_batch():
    """250k-doc generations must run at >= 50% of the batch build's docs/sec
    (the round-4 ratio was 36% — GC-bound token cache, since staged as
    parquet like the batch builder)."""
    d = _load(ING5_ART)
    assert d["n_docs"] >= 1_000_000
    assert d["ingest_vs_batch_ratio"] <= 2.0  # throughput >= 50% of batch
    assert d["last_gen_vs_first_ratio"] < 1.5  # still O(batch), not O(corpus)
    assert d["rank_identity_mismatches"] == 0


def test_r5_serving_coordinator_scaleout():
    """4 shared-nothing coordinators over the same index must reach >= 0.8
    scaling efficiency vs one coordinator at a quarter of the cores."""
    one = _load(os.path.join(os.path.dirname(ART), "serving_r5_1m_c8.json"))
    four = _load(os.path.join(os.path.dirname(ART), "serving_r5_1m_p4.json"))
    assert one["sequential_sample_mismatches"] == 0
    eff = four["queries_per_sec"] / (4 * one["queries_per_sec"])
    assert eff >= 0.8


def test_r5_expansion_surfaces_at_1m():
    """Damerau/phonetic at the 1M index: expansion is dictionary-time, the
    serve is ordinary disjunction cost.  'teh' finds NOTHING under plain
    Levenshtein and exactly the head term under transpositions — the
    round-4 honest note, closed and measured."""
    d = _load(os.path.join(os.path.dirname(ART), "expansion_r5_1m.json"))
    s = d["surfaces"]
    assert d["n_docs"] >= 1_000_000 and d["n_dict_terms"] >= 10_000
    assert s["fuzzy_teh"]["expansions"]["teh"] == 0
    assert s["fuzzy_teh"]["total"] == 0
    assert s["damerau_teh"]["expansions"]["teh"] == 1
    assert s["damerau_teh"]["total"] > 0.5 * d["n_docs"]  # a real head term
    assert s["damerau_teh"]["expand_s_cold"] < 1.0  # dictionary DP, not postings
    assert s["phonetic_teh"]["expansions"]["teh"] >= 1
    # memoized steady state: the key array is built once per engine
    assert s["phonetic_tail"]["expand_s_cold"] <= s["phonetic_teh"]["expand_s_cold"]


def test_r5_multifield_at_1m():
    """The field machinery at 10^6 docs: per-field norms commit correctly
    and every compound surface serves at ordinary key-set cost."""
    d = _load(os.path.join(os.path.dirname(ART), "multifield_r5_1m.json"))
    assert d["n_docs"] >= 1_000_000
    f = d["fields"]
    assert f["title"]["avgdl"] <= 8.0 < f["body"]["avgdl"]  # genuinely distinct norms
    q = d["queries"]
    assert q["mf_should_head"]["total"] > 0.5 * d["n_docs"]
    assert q["mf_fuzzy_clause"]["total"] > 0.5 * d["n_docs"]  # teh -> the, field-scoped
    assert 0 < q["mf_must_should"]["total"] < q["mf_should_head"]["total"]
    assert q["mf_field_phrase"]["total"] > 0  # head bigram, field-local adjacency


def test_r5_wand_ab_sort_wins_measured_regime():
    """The throttle-immune interleaved A/B on the single-field 8M index
    (BENCH/sf_wand_ab_8m.json): WAND loses EVERY rep on every §3c query up
    to 21.5M candidate postings, pages identical.  This supersedes the
    sequential wand_crossover_r5_* artifacts, whose 8M WAND 'wins' were
    host-drift (refuted by re-running both that era's code and HEAD
    interleaved on the same index — BENCH §3c).  The 1M sequential
    artifact's conclusion (sort wins everywhere) still stands."""
    m1 = _load(os.path.join(os.path.dirname(ART), "wand_crossover_r5_1m.json"))
    for q in m1["queries"].values():
        assert q["pages_identical"]
        assert q["wand_over_sort_ratio"] > 1.0, q["keyword"]
    ab = _load(os.path.join(os.path.dirname(ART), "sf_wand_ab_8m.json"))
    for q in ab["queries"].values():
        assert q["pages_identical"], q["keyword"]
        assert q["per_rep_wand_wins"] == 0, q["keyword"]
        assert q["wand_over_sort_ratio"] > 1.0, q["keyword"]


def test_r5_compound_wand_ab_and_dispatch():
    """The interleaved compound A/B (per-field-baked 1M and 8M indexes):
    WAND loses every rep on every compound shape — head-heavy clause sets
    prune too little to cover the ~3x decode premium — and the recalibrated
    cost model keeps every row on sort with pages identical and the
    per-field θ floor engaged (attained bounds, not the pre-r5 disabled
    state)."""
    for leg in ("mf_wand_ab_1m.json", "mf_wand_ab_8m.json"):
        d = _load(os.path.join(os.path.dirname(ART), leg))
        for name, q in d["shapes"].items():
            assert q["pages_identical"], (leg, name)
            assert q["per_rep_wand_wins"] == 0, (leg, name)
            assert q["wand_over_sort_ratio"] > 1.0, (leg, name)
            assert q["auto_mode"] == "sort", (leg, name)
            assert q["last_wand"]["theta_floor"] is not None, (leg, name)
            assert q["last_wand"]["theta"] >= q["last_wand"]["theta_floor"]


def test_r5_build_scaling_efficiency():
    """The north rule's N->4N criterion on final round-5 code: 1M-doc build
    at taskset-pinned 1 vs 4 cores, 3 runs/leg, efficiency >= 0.8 on both
    the best-leg and mean statistics."""
    d = _load(os.path.join(os.path.dirname(ART), "scaling_r5_1to4.json"))
    assert d["docs"] >= 1_000_000 and d["runs_per_leg"] >= 3
    assert d["4n_cores"] == 4 * d["n_cores"]
    assert d["efficiency_best"] >= 0.8
    assert d["efficiency_mean"] >= 0.8


def test_r5_wand_crossover_measured_at_24m():
    """The measured crossover (BENCH/sf_wand_ab_24m.json + _run1.json,
    BENCH §3c-2): at 24M docs with the range count held at ~976 (range_docs
    grown 4x — the variable a cluster operator scales), block-max WAND
    beats the unpruned sort baseline on the two dense disjunctions in BOTH
    interleaved runs, pages identical everywhere, and the refit dispatch
    picks the measured winner on every row of the final run."""
    final = _load(os.path.join(os.path.dirname(ART), "sf_wand_ab_24m.json"))
    run1 = _load(os.path.join(os.path.dirname(ART), "sf_wand_ab_24m_run1.json"))
    for d in (final, run1):
        assert d["range_docs"] == 24_576
        for q in d["queries"].values():
            assert q["pages_identical"], q["keyword"]
            assert q["dispatch"]["n_ranges"] == 976
        # WAND wins the dense disjunctions in both runs (9/10 reps each
        # across the two runs)
        for name in ("dense_dense", "mid_rare"):
            assert d["queries"][name]["wand_over_sort_ratio"] < 1.0, name
        # poor pruning (saved negative at the 3x premium) never flips
        assert d["queries"]["multi_stop_rare"]["wand_over_sort_ratio"] > 1.0
    # the refit dispatch chose the measured winner on every final-run row
    for q in final["queries"].values():
        assert q["auto_picked_winner"], q["keyword"]


def test_r5_wand_16m_midpoint_is_parity():
    """The 16M midpoint (BENCH/sf_wand_ab_16m.json, BENCH §3c-3): saved
    sits at 15.6-16.1M — just below the fitted 21M break-even — and the
    measured outcome is parity on all three pair queries (|ratio-1| <= 4%),
    while the unprunable multi-stop row stays a decisive sort win.  This
    probes the interpolated break-even BETWEEN the 8M/24M brackets."""
    d = _load(os.path.join(os.path.dirname(ART), "sf_wand_ab_16m.json"))
    assert d["range_docs"] == 16_384
    for name in ("dense_dense", "mid_rare", "rare_dominated"):
        q = d["queries"][name]
        assert q["pages_identical"], name
        assert abs(q["wand_over_sort_ratio"] - 1.0) <= 0.04, name
        saved = q["dispatch"]["total_dc"] - 3 * q["dispatch"]["predicted_dc"]
        assert 10_000_000 < saved < 21_000_000, name  # below the break-even
        assert q["dispatch"]["mode"] == "sort", name
    ms = d["queries"]["multi_stop_rare"]
    assert ms["wand_over_sort_ratio"] > 1.5
    assert ms["dispatch"]["mode"] == "sort"


def test_r5_spark_submit_run_path():
    """The north rule's run-path clause, evidenced (BENCH/spark_submit_smoke.json):
    the same pipeline ran via `spark-submit --py-files` with the package served
    ONLY from the zip (script + cwd outside the repo), the submit-time master
    respected (get_spark skips .master() when PYSPARK_GATEWAY_PORT/MASTER is
    set), a re-run resuming every completed segment from the manifest, and a
    BM25 query returning a ranked page off the submitted build."""
    d = _load(os.path.join(os.path.dirname(ART), "spark_submit_smoke.json"))
    assert "--py-files" in d["invocation"]["build"]
    cold, res = d["cold_build"], d["resume"]
    assert cold["n_docs"] == res["n_docs"] == 20_000
    assert cold["partitions_built"] == 16 and cold["partitions_skipped"] == 0
    assert res["partitions_built"] == 0 and res["partitions_skipped"] == 16
    assert res["total_bytes"] == cold["total_bytes"]  # resume rebuilt nothing
    q = d["query"]
    scores = [h["score"] for h in q["top"]]
    assert scores == sorted(scores, reverse=True) and len(q["top"]) == 5
    assert q["total"] > 0


def test_r5late_surfaces_at_1m():
    """The late-round surfaces at 10^6 docs (BENCH/r5late_1m.json, BENCH §9):
    wildcard's worst-case dictionary walk is milliseconds (the serve is the
    only real cost), MLT costs what its disjunction costs, the occur types
    add nothing over the must+should baseline, and the three compound totals
    satisfy the exact partition identity filter = must_should + mustnot."""
    d = _load(os.path.join(os.path.dirname(ART), "r5late_1m.json"))
    assert d["n_docs"] == 1_000_000
    q = d["queries"]
    # dictionary work is never the cost: whole-dict regex walk in < 0.25 s
    assert q["wildcard_all_capped"]["expand_s_cold"] < 0.25
    assert q["wildcard_all_capped"]["expansions"] == 50  # cap honored
    assert q["wildcard_tail"]["expansions"] == 29
    assert q["wildcard_head"]["expansions"] == 1  # 'th*' -> exactly 'the'
    # every surface serves interactively at 1M docs
    for name, row in q.items():
        assert min(row["walls_s"]) < 10.0, name
    # occur types sit at/under the baseline (loose 2x band for host noise)
    base = min(q["mf_must_should"]["walls_s"])
    for name in ("mf_mustnot", "mf_filter", "mf_boost"):
        assert min(q[name]["walls_s"]) <= 2.0 * base + 0.5, name
    # the exact partition identity across three independent 1M-doc queries
    assert (
        q["mf_filter"]["total"]
        == q["mf_must_should"]["total"] + q["mf_mustnot"]["total"]
    )


def test_r5late_surfaces_at_8m():
    """The same late-round surfaces re-measured at 8x the docs
    (BENCH/r5late_8m.json, BENCH §9a): the dictionary side of the split is
    SCALE-INVARIANT — the worst-case whole-dictionary regex walk costs the
    same milliseconds over the same 50k-term dict at 8M docs as at 1M —
    while the serve side grows sublinearly in postings (every warm wall
    grows < 8x across the 8x doc step)."""
    d1 = _load(os.path.join(os.path.dirname(ART), "r5late_1m.json"))
    d8 = _load(os.path.join(os.path.dirname(ART), "r5late_8m.json"))
    assert d8["n_docs"] == 8_000_000
    q1, q8 = d1["queries"], d8["queries"]
    # dictionary work unchanged: same dict size, same ~ms expansion cost
    assert d8["n_dict_terms"] == d1["n_dict_terms"] == 50_000
    assert q8["wildcard_all_capped"]["expand_s_cold"] < 0.25
    # identical expansions (same synthetic dictionary at both scales)
    for name in ("wildcard_tail", "wildcard_head", "wildcard_all_capped"):
        assert q8[name]["expansions"] == q1[name]["expansions"], name
    # serve walls grow sublinearly across the 8x doc step
    for name in (
        "wildcard_tail", "wildcard_head", "wildcard_all_capped",
        "mlt_seed_doc", "mlt_short_text",
    ):
        w1, w8 = min(q1[name]["walls_s"]), min(q8[name]["walls_s"])
        assert w8 < 8.0 * w1, (name, w1, w8)
        assert w8 < 10.0, name  # still interactive at 8M docs
    # candidate totals scale with the corpus: ~8x more matched docs
    for name in ("wildcard_head", "mlt_short_text"):
        assert q8[name]["total"] > 6 * q1[name]["total"], name


def test_dv_filter_at_1m():
    """Doc-values filters at 10^6 docs (BENCH/dv_r5_1m.json, BENCH §9b): the
    filter costs a selectivity-INDEPENDENT constant (one predicate-pushed
    doc_stats scan + semi-join) on top of the unfiltered baseline — posting
    traffic is identical — and the lang partitions tile the baseline."""
    d = _load(os.path.join(os.path.dirname(ART), "dv_r5_1m.json"))
    assert d["n_docs"] == 1_000_000
    q = d["queries"]
    base_w = min(q["mf_must_should"]["walls_s"])
    for name in ("dv_equals_rare", "dv_equals_head", "dv_range_band"):
        w = min(q[name]["walls_s"])
        # constant overhead: bounded absolutely, NOT proportional to matches
        assert w <= base_w + 1.0, (name, w, base_w)
        assert w < 5.0, name
    # 2.5%-selective 'es' vs 95%-selective 'en' cost within noise of each
    # other despite a 37x match-count gap
    assert abs(min(q["dv_equals_rare"]["walls_s"])
               - min(q["dv_equals_head"]["walls_s"])) < 0.5
    # exact tiling: es + en + hi = baseline (hi is the 2.5% remainder)
    base, es, en = (q["mf_must_should"]["total"],
                    q["dv_equals_rare"]["total"], q["dv_equals_head"]["total"])
    assert 0 < base - (es + en) < 0.05 * base
    # the (300, 500) n_chars band intersected with 'es' nests inside 'es'
    assert 0 < q["dv_range_band"]["total"] < es
    # the doc-values sidecar does not regress the build
    assert d["index_docs_per_sec"] > 4000


def test_dv_sort_at_1m():
    """Field sort at 10^6 docs (BENCH/dv_r5_1m.json): ordering the FULL 36.5k
    match set by a doc-values attribute costs ~the score rank (the attr join
    replaces the score orderBy; both are one distributed top-k), and the
    filter+sort composition still totals the filtered count."""
    d = _load(os.path.join(os.path.dirname(ART), "dv_r5_1m.json"))
    q = d["queries"]
    assert q["dv_sort_desc"]["total"] == q["mf_must_should"]["total"]
    assert q["dv_filter_plus_sort"]["total"] == q["dv_equals_rare"]["total"]
    base_w = min(q["mf_must_should"]["walls_s"])
    assert min(q["dv_sort_desc"]["walls_s"]) <= base_w + 1.0
    assert min(q["dv_filter_plus_sort"]["walls_s"]) <= base_w + 1.0


def test_dv_facets_at_1m():
    """Facets at 10^6 docs (BENCH/dv_r5_1m.json): the string facet's buckets
    REPRODUCE the independent filter queries' totals bucket-for-bucket
    (langs.en == dv_equals_head.total, langs.es == dv_equals_rare.total),
    the buckets tile the matched count exactly, and the aggregation serves
    in seconds (an analytic groupBy over the matched set, not a page)."""
    d = _load(os.path.join(os.path.dirname(ART), "dv_r5_1m.json"))
    q = d["queries"]
    f = q["dv_facets"]
    assert f["total"] == q["mf_must_should"]["total"]
    langs = f["buckets"]["langs"]
    assert langs["en"] == q["dv_equals_head"]["total"]
    assert langs["es"] == q["dv_equals_rare"]["total"]
    assert sum(langs.values()) == f["total"]  # en+es+hi tile exactly
    # the [0,1600) boundary set covers every doc -> sizes tile too
    assert sum(f["buckets"]["sizes"].values()) == f["total"]
    assert min(f["walls_s"]) < 10.0


def test_dv_serving_queue_vs_multiplex():
    """dv serving at 1M (BENCH/dv_serving_1m_*.json, BENCH §9c): the
    sequential queue beats 8-way multiplexing on cluster-saturating
    compound/dv/facet shapes — the documented mirror of §3b's
    driver-path multiplexing win — and both runs replay-verify."""
    seq = _load(os.path.join(os.path.dirname(ART), "dv_serving_1m_seq.json"))
    con = _load(os.path.join(os.path.dirname(ART), "dv_serving_1m_c32.json"))
    assert seq["sequential_sample_mismatches"] == 0
    assert con["sequential_sample_mismatches"] == 0
    assert seq["threads"] == 1 and con["threads"] == 8
    assert seq["queries_per_sec"] > con["queries_per_sec"]


def test_dv_plane_at_8m():
    """The dv plane across the 1M->8M step (BENCH/dv_r5_8m.json, BENCH
    §9b-2): selective filters stay at the baseline wall, the exactness
    identities (lang partition tiling; facet buckets == filter totals)
    hold at 8M, and the documented asymmetries point the right way
    (unselective filter > selective; sort-alone > filter+sort)."""
    d = _load(os.path.join(os.path.dirname(ART), "dv_r5_8m.json"))
    assert d["n_docs"] == 8_000_000
    q = d["queries"]
    base = q["mf_must_should"]["total"]
    es, en = q["dv_equals_rare"]["total"], q["dv_equals_head"]["total"]
    assert 0 < base - (es + en) < 0.05 * base  # hi remainder ~2.5%
    f = q["dv_facets"]
    assert f["buckets"]["langs"]["es"] == es
    assert f["buckets"]["langs"]["en"] == en
    assert sum(f["buckets"]["langs"].values()) == base
    assert sum(f["buckets"]["sizes"].values()) == base  # [0,1600) covers all
    # selective filter within ~1.5s of baseline; the asymmetries point right
    base_w = min(q["mf_must_should"]["walls_s"])
    assert min(q["dv_equals_rare"]["walls_s"]) <= base_w + 1.5
    assert min(q["dv_equals_rare"]["walls_s"]) < min(q["dv_equals_head"]["walls_s"])
    assert min(q["dv_filter_plus_sort"]["walls_s"]) < min(q["dv_sort_desc"]["walls_s"])
    assert d["index_docs_per_sec"] > 3000
