"""Result grouping / field collapse (plans/group.py): top-k groups by
best hit, per-group doc lists and hit counts — checked against a
pure-Python oracle that recomputes full BM25 scores and the whole
grouping contract from the raw corpus."""

import pytest
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.oracle import bm25_rank
from tangent_spark.plans.group import grouped_topk
from tangent_spark.plans.indexer import build_index

N = 150
Q = "matrix convergence theorem"
CFG = IndexConfig(n_shards=8, block_size=16, meta_cols=("lang",))


@pytest.fixture(scope="module")
def pages(spark):
    return pages_with_doc_ids(generate_pages(spark, N, partitions=4)).persist()


@pytest.fixture(scope="module")
def gstore(spark, pages, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("grp") / "index")
    return build_index(spark, pages, out, CFG, url_col="url")


@pytest.fixture(scope="module")
def local(pages):
    rows = pages.select("doc_id", "text", "lang").collect()
    return (
        [(int(r["doc_id"]), r["text"]) for r in rows],
        {int(r["doc_id"]): r["lang"] for r in rows},
    )


def grouped_oracle(local, query, k, group_limit):
    docs, langs = local
    scored = bm25_rank(docs, query, k=len(docs))
    groups: dict[str, list[tuple[int, float]]] = {}
    for doc_id, score in scored:  # already (score desc, id asc)
        groups.setdefault(langs[doc_id], []).append((doc_id, score))
    ordered = sorted(
        groups.items(), key=lambda kv: (-kv[1][0][1], kv[1][0][0])
    )[:k]
    out = []
    for grp, members in ordered:
        for rank, (doc_id, score) in enumerate(members[:group_limit], 1):
            out.append((grp, len(members), rank, doc_id, score))
    return out


@pytest.mark.parametrize("group_limit", [1, 3])
def test_grouped_matches_oracle(spark, gstore, local, group_limit):
    got = [
        (r["grp"], int(r["group_hits"]), int(r["rank_in_group"]),
         int(r["doc_id"]), float(r["score"]))
        for r in grouped_topk(
            spark, gstore, Q, "lang", k=4, group_limit=group_limit
        ).collect()
    ]
    want = grouped_oracle(local, Q, 4, group_limit)
    assert [g[:4] for g in got] == [w[:4] for w in want]
    for g, w in zip(got, want):
        assert abs(g[4] - w[4]) < 1e-9


def test_collapse_is_one_doc_per_group(spark, gstore):
    rows = grouped_topk(spark, gstore, Q, "lang", k=10, group_limit=1).collect()
    grps = [r["grp"] for r in rows]
    assert len(grps) == len(set(grps))
    assert all(r["rank_in_group"] == 1 for r in rows)


def test_group_hits_count_full_match_set(spark, gstore, local):
    """group_hits must count EVERY match in the group, not just the
    returned group_limit docs."""
    docs, langs = local
    scored = bm25_rank(docs, Q, k=len(docs))
    per_lang: dict[str, int] = {}
    for doc_id, _ in scored:
        per_lang[langs[doc_id]] = per_lang.get(langs[doc_id], 0) + 1
    for r in grouped_topk(spark, gstore, Q, "lang", k=10, group_limit=2).collect():
        assert int(r["group_hits"]) == per_lang[r["grp"]]


def test_oov_and_empty_query(spark, gstore):
    assert grouped_topk(spark, gstore, "zzqqxxyy", "lang", k=5).count() == 0
    assert grouped_topk(spark, gstore, "", "lang", k=5).count() == 0


def test_unknown_group_field_rejected(spark, gstore):
    with pytest.raises(ValueError, match="not in the index's meta_cols"):
        grouped_topk(spark, gstore, Q, "source", k=5)


def test_driver_cap_refused_not_silent(spark, gstore):
    with pytest.raises(ValueError, match="max_driver_docs"):
        grouped_topk(spark, gstore, Q, "lang", k=5, max_driver_docs=10)


def test_grouping_respects_deletes(spark, pages, local, tmp_path_factory):
    """Tombstoned docs must vanish from both doc rows and group_hits."""
    from tangent_spark.streaming.incremental import delete_docs

    out = str(tmp_path_factory.mktemp("grpdel") / "index")
    store = build_index(spark, pages, out, CFG, url_col="url")
    docs, langs = local
    scored = bm25_rank(docs, Q, k=len(docs))
    victims = [doc_id for doc_id, _ in scored[:3]]
    delete_docs(spark, store, victims, batch_id="grp-del-1")
    got = grouped_topk(spark, store, Q, "lang", k=10, group_limit=2).collect()
    got_ids = {int(r["doc_id"]) for r in got}
    assert not (got_ids & set(victims))
    survivors = [(d, s) for d, s in scored if d not in victims]
    per_lang: dict[str, int] = {}
    for doc_id, _ in survivors:
        per_lang[langs[doc_id]] = per_lang.get(langs[doc_id], 0) + 1
    for r in got:
        assert int(r["group_hits"]) == per_lang[r["grp"]]
