import pandas as pd

from tangent_spark.corpus import generate_pages, make_page, pages_with_doc_ids
from tangent_spark.sources.extract import extract_math, extract_text


def test_make_page_deterministic():
    a = make_page(7, seed=42)
    b = make_page(7, seed=42)
    assert a == b
    c = make_page(7, seed=43)
    assert a["html"] != c["html"]


def test_page_text_invariant_local():
    for i in range(50):
        p = make_page(i)
        assert extract_text(p["html"]) == p["text"]
        assert p["url"] == f"https://example.org/{i:08d}"


def test_some_pages_have_math():
    n_math = sum(1 for i in range(100) if extract_math(make_page(i)["html"]))
    assert 10 < n_math < 60


def test_generate_pages_partition_independent(spark):
    a = generate_pages(spark, 40, partitions=1).orderBy("url").toPandas()
    b = generate_pages(spark, 40, partitions=7).orderBy("url").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_spark_extraction_matches_stored_text(spark):
    """The per-url byte-identity invariant, end to end through Arrow."""
    from pyspark.sql import functions as F

    from tangent_spark.sources.extract import extract_text_udf

    pages = generate_pages(spark, 60, partitions=5)
    bad = (
        pages.withColumn("ext", extract_text_udf("html"))
        .filter(F.col("ext") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_doc_ids_dense_and_stable(spark):
    pages = generate_pages(spark, 35, partitions=4)
    with_ids = pages_with_doc_ids(pages, partitions=3)
    rows = with_ids.select("url", "doc_id").orderBy("url").collect()
    assert [r["doc_id"] for r in rows] == list(range(35))
    # different partitioning, same ids
    with_ids2 = pages_with_doc_ids(generate_pages(spark, 35, partitions=2), partitions=6)
    rows2 = with_ids2.select("url", "doc_id").orderBy("url").collect()
    assert [(r["url"], r["doc_id"]) for r in rows] == [
        (r["url"], r["doc_id"]) for r in rows2
    ]
