"""Golden tests for the TPC-H-shape queries and the newest extension
operators, on handcrafted fixtures where the expected answer is
derivable by hand (SURVEY.md §5.3 style)."""

import datetime

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

_TS = datetime.datetime


def _write(df, path):
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_q21_decorrelation_matches_hand_answer(spark, tmp_path):
    """The single-pass per-order aggregation must reproduce the
    correlated EXISTS / NOT-EXISTS semantics on a fixture covering
    every branch: sole-supplier order (no EXISTS), one-late-supplier
    order (counted, per late line), two-late-supplier order (NOT
    EXISTS fails), non-finalized order (status filter)."""
    d = str(tmp_path)
    base = _TS(1995, 1, 1)
    late = _TS(1997, 1, 1)   # > 365 days after base
    ontime = _TS(1995, 3, 1)
    orders = spark.createDataFrame(
        [(1, 1, "F", 0.0, base, "x"),    # two supps, only supp 10 late
         (2, 1, "F", 0.0, base, "x"),    # sole supplier → EXISTS fails
         (3, 1, "F", 0.0, base, "x"),    # both supps late → NOT EXISTS fails
         (4, 1, "O", 0.0, base, "x")],   # not finalized
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    li = spark.createDataFrame(
        [(1, 10, late), (1, 10, late), (1, 20, ontime),   # 2 late lines
         (2, 10, late),
         (3, 10, late), (3, 20, late),
         (4, 10, late), (4, 20, ontime)],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp")
    supp = spark.createDataFrame(
        [(10, "SUPP_10", 0, 0.0), (20, "SUPP_20", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, "
        "s_acctbal double")
    _write(orders, f"{d}/orders.parquet")
    _write(li, f"{d}/lineitem.parquet")
    _write(supp, f"{d}/supplier.parquet")

    from stock_data_warehouse_spark.plans.tpch_shapes import (
        q21_waiting_supplier,
    )
    rows = {r["s_name"]: r["numwait"]
            for r in q21_waiting_supplier(spark, d).collect()}
    assert rows == {"SUPP_10": 2}


def test_q15_returns_all_tied_maxima(spark, tmp_path):
    """Two suppliers with bit-identical max revenue must both appear —
    the integer-exact revenue makes the tie well-defined."""
    d = str(tmp_path)
    ship = _TS(1997, 2, 1)
    li = spark.createDataFrame(
        [(1, 1, 10, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", ship),
         (2, 1, 20, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", ship),
         (3, 1, 20, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", ship),
         (4, 1, 30, 1, 1.0, 99.0, 0.0, 0.0, "N", "O", ship)],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    supp = spark.createDataFrame(
        [(10, "SUPP_10", 0, 0.0), (20, "SUPP_20", 0, 0.0),
         (30, "SUPP_30", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, "
        "s_acctbal double")
    _write(li, f"{d}/lineitem.parquet")
    _write(supp, f"{d}/supplier.parquet")

    from stock_data_warehouse_spark.plans.tpch_shapes import (
        q15_top_supplier,
    )
    rows = q15_top_supplier(spark, d).collect()
    assert {r["s_name"] for r in rows} == {"SUPP_10", "SUPP_20"}
    assert all(r["total_revenue"] == 100.0 for r in rows)


def test_repetition_signals_flag_boilerplate(spark, tmp_path):
    """A one-token spam doc fails every diversity bar; a 40-distinct-
    token doc passes; a too-short doc fails the length bar."""
    d = str(tmp_path)
    diverse = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, "spam " * 10, "en", "s", 50),
         (2, diverse, "en", "s", len(diverse)),
         (3, "a b", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    _write(docs, f"{d}/documents.parquet")

    from stock_data_warehouse_spark.plans.extensions import (
        x4_repetition_signals,
    )
    rows = {r["doc_id"]: r for r in
            x4_repetition_signals(spark, d).collect()}
    assert rows[1]["distinct_frac"] == 0.1
    assert rows[1]["top_token_frac"] == 1.0
    assert rows[1]["top_bigram_frac"] == 1.0
    assert not rows[1]["keep"]
    assert rows[2]["distinct_frac"] == 1.0
    assert rows[2]["keep"]
    assert rows[3]["n_tok"] == 2 and not rows[3]["keep"]


def test_semdedup_marks_planted_duplicate(spark, tmp_path):
    """A vector colinear with a lower-id cellmate is a duplicate; an
    orthogonal one is not. With only 3 vectors the fixed-K hash-rank
    sample (K_COARSE=32) selects ALL of them as medoids: the colinear
    pair ties at cos=1 for cells 0 and 1 and the cid tiebreak lands
    both in cell 0; the orthogonal vector anchors its own cell 2."""
    d = str(tmp_path)
    dim = 64
    e0 = [1.0] + [0.0] * (dim - 1)
    e1 = [2.0] + [0.0] * (dim - 1)          # cos(e0, e1) = 1
    e2 = [0.0, 3.0] + [0.0] * (dim - 2)     # cos(e0, e2) = 0
    vecs = spark.createDataFrame(
        [(0, e0, 0), (1, e1, 0), (2, e2, 1)],
        "vec_id long, embedding array<float>, label int")
    _write(vecs, f"{d}/embeddings.parquet")

    from stock_data_warehouse_spark.plans.extensions import x2_semdedup
    rows = {r["vec_id"]: r for r in x2_semdedup(spark, d).collect()}
    assert len(rows) == 3
    assert rows[0]["cid"] == 0 and rows[1]["cid"] == 0
    assert rows[2]["cid"] == 2
    assert not rows[0]["is_dup"]
    assert rows[1]["is_dup"]
    assert not rows[2]["is_dup"]


def test_bpe_merge_pairs_counts_adjacent_pairs(spark, tmp_path):
    """'the cat' twice + 'the dog' once → top pair is (the, ␣cat)×2."""
    d = str(tmp_path)
    docs = spark.createDataFrame(
        [(1, "the cat", "en", "s", 7), (2, "the cat", "en", "s", 7),
         (3, "the dog", "en", "s", 7)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    _write(docs, f"{d}/documents.parquet")

    from stock_data_warehouse_spark.plans.extensions import (
        x4_bpe_merge_pairs,
    )
    rows = x4_bpe_merge_pairs(spark, d).collect()
    assert rows[0]["pair"] == "the| cat" and rows[0]["pair_count"] == 2
    assert {r["pair"] for r in rows} == {"the| cat", "the| dog"}


def test_q3_topk_is_deterministic_under_partitioning(spark):
    """The top-10 set must not depend on shuffle partitioning — exact
    long revenue + orderkey tiebreak pin it."""
    from stock_data_warehouse_spark.plans.tpch_shapes import (
        q3_shipping_priority,
    )
    a = q3_shipping_priority(spark, SF).collect()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = q3_shipping_priority(spark, SF).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
