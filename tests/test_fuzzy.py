"""Record linkage: blocked fuzzy name matching + CC entity resolution
(operators/dedup.py::fuzzy_name_pairs / fuzzy_entities). The oracle
twin pins the pair set and the entity map on the fixtures; these pin
the blocking contract, match transitivity, and the plan shape on
hand-built records."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.operators.dedup import (
    fuzzy_entities,
    fuzzy_name_pairs,
)


@pytest.fixture(scope="module")
def catalog(spark):
    # blocks: "plate" {red(1), hot(6), golden(9)}, "rod" {red(3)},
    # exact-dup names share min-id nodes; ids deliberately unsorted
    rows = [
        (5, "red plate"),
        (1, "red plate"),  # exact dup -> node 1
        (6, "hot plate"),  # lev(red,hot)=3 -> pairs with red plate
        (9, "golden plate"),  # lev(red,golden)=6; lev(old,golden)=3
        (3, "red rod"),  # same adjective, different block -> no pair
        (7, "old plate"),  # lev(red,old)=2, lev(hot,old)=3
    ]
    return spark.createDataFrame(rows, "p_partkey long, p_name string")


def test_pairs_respect_blocking_and_threshold(spark, catalog):
    pairs = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in fuzzy_name_pairs(catalog, max_dist=3).collect()
    }
    # within-block matches at <= 3, keyed node_a < node_b
    assert pairs == {
        ("red plate", "hot plate"): 3,
        ("red plate", "old plate"): 2,
        ("hot plate", "old plate"): 3,
        ("old plate", "golden plate"): 3,
    }


def test_cross_block_near_names_never_pair(spark, catalog):
    """'red plate' vs 'red rod' is lev 4 but would pass a loose
    threshold — blocking on the head noun must exclude it regardless."""
    got = fuzzy_name_pairs(catalog, max_dist=10).collect()
    assert all(
        {r["name_a"], r["name_b"]} != {"red plate", "red rod"}
        for r in got
    )
    # and golden plate joins the plate clique at dist<=6
    assert any(r["name_b"] == "golden plate" for r in got)


def test_entities_are_transitive_and_total(spark, catalog):
    ents = {
        r["rec_id"]: r["entity_id"]
        for r in fuzzy_entities(catalog, max_dist=3).collect()
    }
    # every record assigned
    assert set(ents) == {1, 3, 5, 6, 7, 9}
    # the whole plate block collapses through the closure — golden
    # plate reaches red plate only via old plate (lev(red,golden)=6,
    # lev(old,golden)=3): transitivity is what's being asserted.
    # Exact dup 5 rides its name's node (min id 1); entity = min node
    assert ents[1] == ents[5] == ents[6] == ents[7] == ents[9] == 1
    # red rod: right adjective, wrong block -> its own entity
    assert ents[3] == 3


def test_entity_map_back_is_broadcast(spark, catalog):
    """The record-table map-back must be a broadcast of the
    vocabulary-sized name->entity map, never a shuffle of records."""
    plan = (
        fuzzy_entities(catalog)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # no cartesian anywhere (the compare join is an equi-join on block)
    assert "CartesianProduct" not in plan


def test_distinct_name_reduction(spark):
    """Matching cost depends on the vocabulary, not the record count:
    1,000 records over 3 names produce the same pair set as 3
    records."""
    big = spark.createDataFrame(
        [(i, ["red plate", "hot plate", "red rod"][i % 3])
         for i in range(1000)],
        "p_partkey long, p_name string",
    )
    pairs = fuzzy_name_pairs(big, max_dist=3).collect()
    assert len(pairs) == 1  # red plate ~ hot plate only
    assert pairs[0]["node_a"] == 0 and pairs[0]["node_b"] == 1
