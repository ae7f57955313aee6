"""Range facets (Solr facet.range) and stats facets (Solr
StatsComponent) over the boolean match set — plans/boolean.facet_range
/ facet_stats.

Ground truth for every test is set algebra over the corpus: the match
set recomputed with boolean_topk (exhaustive k), bucketed/aggregated
declaratively. The reference outsourced its facet surface to Solr
(SURVEY S12); these are the numeric halves of that panel, Spark-native.

Scale contract under test: the stats kernel route moves ONE moment
partial per shard (rows_counter-asserted), never match-set- or
distinct-value-sized rows; range buckets ride the same (value, count)
partial route as facet_counts.
"""

import math

import pytest
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.plans.boolean import (
    boolean_topk,
    facet_range,
    facet_stats,
)
from tangent_spark.plans.indexer import build_index

CFG = IndexConfig(
    n_shards=4, block_size=16, meta_cols=("lang", "n_words", "warc_ts")
)
N = 150
QUERIES = ["matrix convergence theorem", "matrix +theorem", "series -matrix"]


@pytest.fixture(scope="module")
def pages(spark):
    p = pages_with_doc_ids(generate_pages(spark, N, partitions=4))
    # numeric metadata with some NULLs (every 11th doc) so missing
    # semantics are exercised end to end
    return p.withColumn(
        "n_words",
        F.when(
            F.col("doc_id") % 11 == 3, F.lit(None)
        ).otherwise(F.size(F.split(F.col("text"), r"\s+"))),
    ).persist()


@pytest.fixture(scope="module")
def store(spark, pages, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("frange"))
    return build_index(spark, pages, f"{base}/idx", CFG, url_col="url")


def _match_meta(spark, store, pages, query, where=None):
    # k=N is exhaustive on this corpus (the same convention as
    # test_filtered's oracles)
    m = boolean_topk(spark, store, query, N).select("doc_id")
    j = m.join(pages.select("doc_id", "lang", "n_words"), "doc_id")
    return j.filter(where) if where else j


START, END, GAP = 0.0, 200.0, 25.0


def _range_oracle(spark, store, pages, query, where=None):
    j = _match_meta(spark, store, pages, query, where)
    got = {
        r["bucket"]: r["n"]
        for r in j.filter(
            F.col("n_words").isNotNull()
            & (F.col("n_words") >= START)
            & (F.col("n_words") < END)
        )
        .withColumn(
            "bucket", (F.floor(F.col("n_words") / GAP) * GAP).cast("double")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_buckets = int(math.ceil((END - START) / GAP))
    return [
        (START + i * GAP, got.get(START + i * GAP, 0))
        for i in range(n_buckets)
    ]


def _stats_oracle(spark, store, pages, query, where=None):
    j = _match_meta(spark, store, pages, query, where)
    r = j.agg(
        F.count(F.col("n_words")).alias("n_count"),
        F.sum(F.when(F.col("n_words").isNull(), 1).otherwise(0)).alias(
            "n_missing"
        ),
        F.min("n_words").alias("v_min"),
        F.max("n_words").alias("v_max"),
        F.sum("n_words").alias("v_sum"),
        F.avg("n_words").alias("v_mean"),
    ).collect()[0]
    return (
        int(r["n_count"]),
        int(r["n_missing"] or 0),
        None if r["v_min"] is None else float(r["v_min"]),
        None if r["v_max"] is None else float(r["v_max"]),
        0.0 if r["v_sum"] is None else float(r["v_sum"]),
        None if r["v_mean"] is None else round(float(r["v_mean"]), 9),
    )


def _stats_row(df):
    r = df.collect()[0]
    return (
        int(r["n_count"]),
        int(r["n_missing"]),
        r["v_min"],
        r["v_max"],
        float(r["v_sum"]),
        None if r["v_mean"] is None else round(float(r["v_mean"]), 9),
    )


def test_facet_range_matches_set_algebra(spark, store, pages):
    for q in QUERIES:
        got = [
            (r["bucket"], r["n_docs"])
            for r in facet_range(
                spark, store, q, "n_words", START, END, GAP
            ).collect()
        ]
        assert got == _range_oracle(spark, store, pages, q), q
        # contract shape: every bucket present, in order, zero-filled
        assert [b for b, _ in got] == [
            START + i * GAP for i in range(int((END - START) / GAP))
        ]


def test_facet_stats_matches_set_algebra(spark, store, pages):
    missing_seen = 0
    for q in QUERIES:
        got = _stats_row(facet_stats(spark, store, q, "n_words"))
        assert got == _stats_oracle(spark, store, pages, q), q
        missing_seen += got[1]
    assert missing_seen > 0, "fixture should exercise missing values"


def test_range_and_stats_compose_with_where(spark, store, pages):
    q, where = QUERIES[0], "lang = 'en'"
    got = [
        (r["bucket"], r["n_docs"])
        for r in facet_range(
            spark, store, q, "n_words", START, END, GAP, where=where
        ).collect()
    ]
    assert got == _range_oracle(spark, store, pages, q, where)
    gs = _stats_row(facet_stats(spark, store, q, "n_words", where=where))
    assert gs == _stats_oracle(spark, store, pages, q, where)


def test_kernel_and_fallback_routes_identical(spark, store, pages):
    """max_driver_docs=1 forces the match-set fallback; both routes
    must produce identical contracts."""
    q = QUERIES[1]
    kern = [
        (r["bucket"], r["n_docs"])
        for r in facet_range(
            spark, store, q, "n_words", START, END, GAP
        ).collect()
    ]
    fall = [
        (r["bucket"], r["n_docs"])
        for r in facet_range(
            spark, store, q, "n_words", START, END, GAP, max_driver_docs=1
        ).collect()
    ]
    assert kern == fall
    ks = _stats_row(facet_stats(spark, store, q, "n_words"))
    fs = _stats_row(
        facet_stats(spark, store, q, "n_words", max_driver_docs=1)
    )
    assert ks == fs


def test_stats_partials_bounded_by_shards(spark, store):
    """The moment-partial contract: rows leaving the stats kernel are
    bounded by the shard count even though n_words has many distinct
    values — the 100 TB argument, accumulator-measured."""
    acc = spark.sparkContext.accumulator(0)
    facet_stats(spark, store, QUERIES[0], "n_words", rows_counter=acc).collect()
    assert 0 < acc.value <= CFG.n_shards


def test_empty_match_set_shapes(spark, store):
    got = [
        (r["bucket"], r["n_docs"])
        for r in facet_range(
            spark, store, QUERIES[0], "n_words", START, END, GAP,
            where="lang = 'zz'",
        ).collect()
    ]
    assert got == [
        (START + i * GAP, 0) for i in range(int((END - START) / GAP))
    ]
    gs = _stats_row(
        facet_stats(spark, store, QUERIES[0], "n_words", where="lang = 'zz'")
    )
    assert gs == (0, 0, None, None, 0.0, None)


def test_facet_range_validates_arguments(spark, store):
    with pytest.raises(ValueError):
        facet_range(spark, store, QUERIES[0], "n_words", 0, 100, 0)
    with pytest.raises(ValueError):
        facet_range(spark, store, QUERIES[0], "n_words", 100, 0, 10)


# --- pivot facets -------------------------------------------------------------

def _pivot_oracle(spark, store, pages, query, where=None):
    j = _match_meta(spark, store, pages, query, where)
    return [
        (r["lang"], r["n_words"], r["n"])
        for r in j.filter(
            F.col("lang").isNotNull() & F.col("n_words").isNotNull()
        )
        .groupBy("lang", "n_words")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("lang"), F.asc("n_words"))
        .collect()
    ]


def test_facet_pivot_matches_set_algebra(spark, store, pages):
    from tangent_spark.plans.boolean import facet_pivot

    for q in QUERIES:
        got = [
            (r["lang"], r["n_words"], r["n_docs"])
            for r in facet_pivot(
                spark, store, q, ("lang", "n_words")
            ).collect()
        ]
        assert got == _pivot_oracle(spark, store, pages, q), q
    # typed columns survive the composite-encoding round trip
    df = facet_pivot(spark, store, QUERIES[0], ("lang", "n_words"))
    kinds = dict(df.dtypes)
    assert kinds["lang"] == "string" and kinds["n_words"] in ("int", "bigint")


def test_facet_pivot_where_and_fallback(spark, store, pages):
    from tangent_spark.plans.boolean import facet_pivot

    q, where = QUERIES[1], "lang = 'en'"
    kern = [
        (r["lang"], r["n_words"], r["n_docs"])
        for r in facet_pivot(
            spark, store, q, ("lang", "n_words"), where=where
        ).collect()
    ]
    assert kern == _pivot_oracle(spark, store, pages, q, where)
    fall = [
        (r["lang"], r["n_words"], r["n_docs"])
        for r in facet_pivot(
            spark, store, q, ("lang", "n_words"), where=where,
            max_driver_docs=1,
        ).collect()
    ]
    assert kern == fall
    # empty match set keeps the typed empty shape
    empty = facet_pivot(
        spark, store, q, ("lang", "n_words"), where="lang = 'zz'"
    )
    assert empty.count() == 0 and empty.columns == ["lang", "n_words", "n_docs"]


# --- warm Searcher variants ---------------------------------------------------

def test_warm_facet_variants_match_cold(spark, store, pages):
    from tangent_spark.plans.boolean import facet_pivot
    from tangent_spark.plans.search import Searcher

    q, where = QUERIES[0], "lang = 'en'"
    s = Searcher(spark, store)
    try:
        for w in (None, where):
            cold_r = [
                (r["bucket"], r["n_docs"])
                for r in facet_range(
                    spark, store, q, "n_words", START, END, GAP, where=w
                ).collect()
            ]
            warm_r = [
                (r["bucket"], r["n_docs"])
                for r in s.facet_range(
                    q, "n_words", START, END, GAP, where=w
                ).collect()
            ]
            assert warm_r == cold_r, ("range", w)
            assert _stats_row(s.facet_stats(q, "n_words", where=w)) == \
                _stats_row(facet_stats(spark, store, q, "n_words", where=w)), \
                ("stats", w)
            cold_p = [
                (r["lang"], r["n_words"], r["n_docs"])
                for r in facet_pivot(
                    spark, store, q, ("lang", "n_words"), where=w
                ).collect()
            ]
            warm_p = [
                (r["lang"], r["n_words"], r["n_docs"])
                for r in s.facet_pivot(q, ("lang", "n_words"), where=w).collect()
            ]
            assert warm_p == cold_p, ("pivot", w)
        # repeated warm facet serves its value map from the cache —
        # distinct keys per surface, so no cross-surface collisions
        keys = set(s._facet_maps)
        s.facet_range(q, "n_words", START, END, GAP).collect()
        s.facet_stats(q, "n_words").collect()
        assert set(s._facet_maps) == keys
        # empty-match warm shapes
        assert s.facet_range(
            q, "n_words", START, END, GAP, where="lang = 'zz'"
        ).count() == int((END - START) / GAP)
        assert _stats_row(
            s.facet_stats(q, "n_words", where="lang = 'zz'")
        ) == (0, 0, None, None, 0.0, None)
        assert s.facet_pivot(
            q, ("lang", "n_words"), where="lang = 'zz'"
        ).count() == 0
    finally:
        s.close()


# --- percentiles + cardinality (ES percentiles / cardinality aggs) ---------


def _pct_oracle(spark, store, pages, query, fractions, where=None):
    import numpy as np

    vals = [
        float(r["n_words"])
        for r in _match_meta(spark, store, pages, query, where).collect()
        if r["n_words"] is not None
    ]
    if not vals:
        return []
    return [
        (float(p), float(np.percentile(np.asarray(vals), 100 * p)))
        for p in fractions
    ]


@pytest.mark.parametrize("query", QUERIES)
def test_facet_percentiles_exact_matches_numpy(spark, store, pages, query):
    from tangent_spark.plans.boolean import facet_percentiles

    fr = (0.0, 0.25, 0.5, 0.75, 0.95, 1.0)
    got = [
        (r["pct"], r["val"])
        for r in facet_percentiles(spark, store, query, "n_words", fr).collect()
    ]
    exp = _pct_oracle(spark, store, pages, query, fr)
    assert len(got) == len(exp)
    for (gp, gv), (ep, ev) in zip(got, exp):
        assert gp == ep and gv == pytest.approx(ev, abs=1e-9), (gp, gv, ev)


def test_facet_percentiles_with_where(spark, store, pages):
    from tangent_spark.plans.boolean import facet_percentiles

    fr = (0.5, 0.9)
    got = [
        (r["pct"], r["val"])
        for r in facet_percentiles(
            spark, store, QUERIES[0], "n_words", fr, where="lang = 'en'"
        ).collect()
    ]
    exp = _pct_oracle(spark, store, pages, QUERIES[0], fr, where="lang = 'en'")
    assert got == [(p, pytest.approx(v, abs=1e-9)) for p, v in exp]


def test_percentiles_from_hist_matches_spark_builtin(spark):
    """The declarative percentile_cont finisher == Spark's exact
    `percentile` aggregate over the expanded multiset, including
    duplicated values and skewed counts."""
    import numpy as np

    from tangent_spark.plans.boolean import percentiles_from_hist

    rng = np.random.default_rng(5)
    hist = [
        (float(v), int(c))
        for v, c in zip(rng.normal(50, 20, 40).round(1), rng.integers(1, 9, 40))
    ]
    # duplicate values must be pre-aggregated like the facet contract
    agg = {}
    for v, c in hist:
        agg[v] = agg.get(v, 0) + c
    hdf = spark.createDataFrame(
        sorted(agg.items()), "val double, n_docs long"
    )
    fr = (0.0, 0.1, 0.5, 0.77, 0.99, 1.0)
    got = {
        r["pct"]: r["val"] for r in percentiles_from_hist(hdf, fr).collect()
    }
    expanded = spark.createDataFrame(
        [(v,) for v, c in agg.items() for _ in range(c)], "x double"
    )
    exp = expanded.agg(
        F.percentile("x", F.array(*[F.lit(p) for p in fr])).alias("ps")
    ).collect()[0]["ps"]
    for p, e in zip(fr, exp):
        assert got[p] == pytest.approx(e, abs=1e-9), p


def test_facet_percentiles_approx_close_to_exact(spark, store, pages):
    from tangent_spark.plans.boolean import facet_percentiles

    fr = (0.25, 0.5, 0.75)
    exact = {
        r["pct"]: r["val"]
        for r in facet_percentiles(
            spark, store, QUERIES[0], "n_words", fr, exact=True
        ).collect()
    }
    approx = {
        r["pct"]: r["val"]
        for r in facet_percentiles(
            spark, store, QUERIES[0], "n_words", fr, exact=False,
            accuracy=10_000,
        ).collect()
    }
    # at accuracy >> n the GK sketch is exact up to neighbor values
    vals = sorted(
        float(r["n_words"])
        for r in _match_meta(spark, store, pages, QUERIES[0]).collect()
        if r["n_words"] is not None
    )
    span = vals[-1] - vals[0]
    for p in fr:
        assert abs(approx[p] - exact[p]) <= 0.05 * span + 1.0, p


def test_facet_percentiles_empty_and_validation(spark, store):
    from tangent_spark.plans.boolean import facet_percentiles

    assert (
        facet_percentiles(spark, store, "zzzunseen", "n_words").count() == 0
    )
    with pytest.raises(ValueError):
        facet_percentiles(spark, store, QUERIES[0], "n_words", (1.5,)).count()


def test_facet_cardinality_exact_and_approx(spark, store, pages):
    from tangent_spark.plans.boolean import facet_cardinality

    for query in QUERIES[:2]:
        exp = (
            _match_meta(spark, store, pages, query)
            .filter(F.col("n_words").isNotNull())
            .select("n_words")
            .distinct()
            .count()
        )
        got = facet_cardinality(spark, store, query, "n_words").collect()
        assert [int(r["n_distinct"]) for r in got] == [exp]
        approx = int(
            facet_cardinality(spark, store, query, "n_words", exact=False)
            .collect()[0]["n_distinct"]
        )
        assert abs(approx - exp) <= max(3, 0.15 * exp)
    # string column + where
    exp_lang = (
        _match_meta(spark, store, pages, QUERIES[0], where="n_words > 50")
        .select("lang").distinct().count()
    )
    got_lang = facet_cardinality(
        spark, store, QUERIES[0], "lang", where="n_words > 50"
    ).collect()
    assert [int(r["n_distinct"]) for r in got_lang] == [exp_lang]


def test_warm_percentiles_and_cardinality_match_cold(spark, store):
    from tangent_spark.plans.boolean import facet_cardinality, facet_percentiles
    from tangent_spark.plans.search import Searcher

    s = Searcher(spark, store)
    try:
        fr = (0.25, 0.5, 0.9)
        cold = [
            (r["pct"], r["val"])
            for r in facet_percentiles(
                spark, store, QUERIES[1], "n_words", fr
            ).collect()
        ]
        warm = [
            (r["pct"], r["val"])
            for r in s.facet_percentiles(QUERIES[1], "n_words", fr).collect()
        ]
        assert warm == cold
        # repeated warm call serves from the cached facet map
        warm2 = [
            (r["pct"], r["val"])
            for r in s.facet_percentiles(QUERIES[1], "n_words", fr).collect()
        ]
        assert warm2 == cold
        cc = facet_cardinality(spark, store, QUERIES[1], "lang").collect()
        wc = s.facet_cardinality(QUERIES[1], "lang").collect()
        assert [r["n_distinct"] for r in wc] == [r["n_distinct"] for r in cc]
    finally:
        s.close()


# ---- date histogram (ES date_histogram / Solr date facet.range) --------

DH_START = "2020-01-01T00:00:00"
DH_INTERVAL = 90 * 86400.0  # 90-day fixed interval


def _dh_end(pages):
    import datetime as dt

    mx = pages.agg(F.max("warc_ts")).collect()[0][0]
    # one full interval past the max so the last bucket is interior
    return (mx + dt.timedelta(seconds=DH_INTERVAL)).isoformat()


def _dh_oracle(spark, store, pages, query, end, where=None):
    import datetime as dt

    from tangent_spark.plans.boolean import _epoch_seconds

    s, e = _epoch_seconds(DH_START), _epoch_seconds(end)
    j = _match_meta_ts(spark, store, pages, query, where)
    got = {}
    for r in j.collect():
        ts = r["warc_ts"]
        if ts is None:
            continue
        v = ts.replace(tzinfo=dt.timezone.utc).timestamp()
        if not (s <= v < e):
            continue
        b = s + (v - s) // DH_INTERVAL * DH_INTERVAL
        got[b] = got.get(b, 0) + 1
    n_buckets = int(math.ceil((e - s) / DH_INTERVAL))
    return [
        (
            dt.datetime.fromtimestamp(s + i * DH_INTERVAL, dt.timezone.utc),
            got.get(s + i * DH_INTERVAL, 0),
        )
        for i in range(n_buckets)
    ]


def _match_meta_ts(spark, store, pages, query, where=None):
    m = boolean_topk(spark, store, query, N).select("doc_id")
    j = m.join(pages.select("doc_id", "lang", "warc_ts"), "doc_id")
    return j.filter(where) if where else j


def _dh_rows(df):
    import datetime as dt

    return [
        (r["bucket"].replace(tzinfo=dt.timezone.utc), r["n_docs"])
        for r in df.collect()
    ]


def test_date_histogram_matches_set_algebra(spark, store, pages):
    from tangent_spark.plans.boolean import facet_date_histogram

    end = _dh_end(pages)
    for q in QUERIES:
        got = _dh_rows(
            facet_date_histogram(
                spark, store, q, "warc_ts", DH_START, end, DH_INTERVAL
            )
        )
        assert got == _dh_oracle(spark, store, pages, q, end), q
        assert sum(n for _, n in got) > 0, "fixture must hit buckets"


def test_date_histogram_where_and_warm(spark, store, pages):
    from tangent_spark.plans.boolean import facet_date_histogram
    from tangent_spark.plans.search import Searcher

    q, where = QUERIES[0], "lang = 'en'"
    end = _dh_end(pages)
    cold = _dh_rows(
        facet_date_histogram(
            spark, store, q, "warc_ts", DH_START, end, DH_INTERVAL, where=where
        )
    )
    assert cold == _dh_oracle(spark, store, pages, q, end, where)
    s = Searcher(spark, store)
    try:
        warm = _dh_rows(
            s.facet_date_histogram(
                q, "warc_ts", DH_START, end, DH_INTERVAL, where=where
            )
        )
        assert warm == cold
        # repeat serves from the cached (column, range) bucket map
        assert _dh_rows(
            s.facet_date_histogram(
                q, "warc_ts", DH_START, end, DH_INTERVAL, where=where
            )
        ) == cold
    finally:
        s.close()


def test_epoch_seconds_inputs(spark):
    import datetime as dt

    from tangent_spark.plans.boolean import _epoch_seconds

    want = dt.datetime(2020, 1, 2, tzinfo=dt.timezone.utc).timestamp()
    assert _epoch_seconds("2020-01-02T00:00:00") == want
    assert _epoch_seconds(dt.datetime(2020, 1, 2)) == want
    assert _epoch_seconds(want) == want
    with pytest.raises(TypeError):
        _epoch_seconds(object())
