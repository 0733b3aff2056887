"""Planted-scenario tests for the TPC-H suite's semantic edges.

The driver gate compares every TPC-H query against DuckDB on the real
testdata, which proves value parity but cannot prove the EDGES the
adapted predicates turn on (threshold ties, multi-R-supplier orders,
zero-order customers, out-of-region minima). These tests plant minimal
tables where each edge is the whole story and pin the expected rows.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F  # noqa: F401

from kse.catalog import SCHEMAS


def _plant(spark, tmp_path, name: str, tables: dict[str, list[tuple]]) -> str:
    sf_dir = tmp_path / name
    sf_dir.mkdir()
    for tbl, rows in tables.items():
        spark.createDataFrame(rows, SCHEMAS[tbl]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(sf_dir / f"{tbl}.parquet"))
    return str(sf_dir)


def _d(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _li(ok, pk, sk, qty, price, flag, ship):
    # (orderkey, partkey, suppkey, linenumber, qty, extprice, disc, tax,
    #  returnflag, linestatus, shipdate)
    return (ok, pk, sk, 1, float(qty), float(price), 0.0, 0.0, flag, "O", _d(ship))


def _order(ok, ck, status, prio="3-MEDIUM", date="1996-01-01"):
    return (ok, ck, status, 100.0, _d(date), prio)


SUPPLIERS = [
    (1, "Supp#1", 0, 10.0),
    (2, "Supp#2", 0, 20.0),
    (3, "Supp#3", 0, 30.0),
    (4, "Supp#4", 1, 40.0),  # nation 1 = outside EUROPE
    (5, "Supp#5", 1, 50.0),
    (6, "Supp#6", 0, 60.0),
]
NATIONS = [(0, "EUR_NATION", 0), (1, "FAR_NATION", 1)]
REGIONS = [(0, "EUROPE"), (1, "ASIA")]


def test_q21_counts_only_sole_r_supplier_multiline(spark, tmp_path):
    """Order 1: supplier 1 has TWO returned lines, supplier 2 none ->
    supplier 1 waits with numwait 2. Order 2: two different R suppliers
    -> nobody counts (the NOT EXISTS). Order 3: single-supplier order ->
    excluded (the EXISTS). Order 4: non-finalized status -> excluded.
    Order 5: no R lines at all -> excluded."""
    from kse.queries.tpch import q_tpch_q21

    sf = _plant(
        spark,
        tmp_path,
        "q21",
        {
            "supplier": SUPPLIERS,
            "orders": [
                _order(1, 1, "F"),
                _order(2, 1, "F"),
                _order(3, 1, "F"),
                _order(4, 1, "O"),
                _order(5, 1, "F"),
            ],
            "lineitem": [
                _li(1, 10, 1, 1, 10.0, "R", "1996-01-01"),
                _li(1, 11, 1, 1, 10.0, "R", "1996-01-02"),
                _li(1, 12, 2, 1, 10.0, "N", "1996-01-03"),
                _li(2, 10, 1, 1, 10.0, "R", "1996-01-01"),
                _li(2, 11, 2, 1, 10.0, "R", "1996-01-02"),
                _li(3, 10, 1, 1, 10.0, "R", "1996-01-01"),
                _li(4, 10, 2, 1, 10.0, "R", "1996-01-01"),
                _li(4, 11, 3, 1, 10.0, "N", "1996-01-02"),
                _li(5, 10, 3, 1, 10.0, "N", "1996-01-01"),
                _li(5, 11, 2, 1, 10.0, "N", "1996-01-02"),
            ],
        },
    )
    rows = {tuple(r) for r in q_tpch_q21(spark, sf).collect()}
    assert rows == {("Supp#1", 2)}


def test_q13_zero_count_customers_survive_the_left_join(spark, tmp_path):
    """Customer 1 keeps 1 of 2 orders (one is 1-URGENT-excluded),
    customer 2 loses its only order to the exclusion, customer 3 never
    ordered — both of the latter must appear in the c_count=0 bucket,
    which is exactly what an inner join would silently drop."""
    from kse.queries.tpch import q_tpch_q13

    sf = _plant(
        spark,
        tmp_path,
        "q13",
        {
            "customer": [
                (1, "Cust#1", 0, 0.0, "BUILDING"),
                (2, "Cust#2", 0, 0.0, "BUILDING"),
                (3, "Cust#3", 0, 0.0, "BUILDING"),
            ],
            "orders": [
                _order(1, 1, "F", prio="2-HIGH"),
                _order(2, 1, "F", prio="1-URGENT"),
                _order(3, 2, "F", prio="1-URGENT"),
            ],
        },
    )
    rows = {tuple(r) for r in q_tpch_q13(spark, sf).collect()}
    assert rows == {(1, 1), (0, 2)}


def test_q20_stock_threshold_edges(spark, tmp_path):
    """Supplier 1: pre-97 stock 10 vs 97 demand 19 -> 20 > 19 qualifies.
    Supplier 2: demand 20 -> the 2*avail > qty97 comparison is strict,
    the tie must NOT qualify. Supplier 3: stock but no 97 demand ->
    excluded (inner-join semantics). Supplier 4: would qualify but sits
    outside EUROPE. Supplier 6: qualifies on quantities but only on a
    part that fails the name filter."""
    from kse.queries.tpch import q_tpch_q20

    parts = [
        (10, "small bolt", "Brand#1", "LARGE", 20, 1.0),
        (11, "red widget", "Brand#1", "LARGE", 20, 1.0),
    ]
    li = [
        # s1 on part 10: avail 10 (pre-97), qty97 19
        _li(1, 10, 1, 10, 10.0, "N", "1996-06-01"),
        _li(2, 10, 1, 19, 19.0, "N", "1997-06-01"),
        # s2 on part 10: avail 10, qty97 20 (tie -> excluded)
        _li(3, 10, 2, 10, 10.0, "N", "1996-06-01"),
        _li(4, 10, 2, 20, 20.0, "N", "1997-06-01"),
        # s3 on part 10: stock only, no 97 demand
        _li(5, 10, 3, 10, 10.0, "N", "1996-06-01"),
        # s4 (non-EUROPE) on part 10: qualifying quantities
        _li(6, 10, 4, 10, 10.0, "N", "1996-06-01"),
        _li(7, 10, 4, 5, 5.0, "N", "1997-06-01"),
        # s6 on part 11 (name-filtered): qualifying quantities
        _li(8, 11, 6, 10, 10.0, "N", "1996-06-01"),
        _li(9, 11, 6, 5, 5.0, "N", "1997-06-01"),
    ]
    sf = _plant(
        spark,
        tmp_path,
        "q20",
        {
            "supplier": SUPPLIERS,
            "nation": NATIONS,
            "region": REGIONS,
            "part": parts,
            "lineitem": li,
        },
    )
    rows = {tuple(r) for r in q_tpch_q20(spark, sf).collect()}
    assert rows == {(1, "Supp#1", "EUR_NATION")}


def test_q2_regional_min_cost_keeps_ties_and_ignores_other_regions(
    spark, tmp_path
):
    """Part 10: EUROPE suppliers 1 and 2 tie at unit cost 5.0 (both rows
    must survive, per spec), supplier 3 at 7.0 loses, and the GLOBAL
    minimum (supplier 4 at 1.0, outside EUROPE) must not suppress the
    regional winners. Parts 11/12 fall to the size/type filters."""
    from kse.queries.tpch import q_tpch_q2

    parts = [
        (10, "small bolt", "Brand#1", "LARGE", 20, 1.0),
        (11, "big bolt", "Brand#1", "LARGE", 50, 1.0),   # size out of range
        (12, "odd bolt", "Brand#1", "SMALL", 20, 1.0),   # wrong type
    ]
    li = [
        _li(1, 10, 1, 2, 10.0, "N", "1996-01-01"),  # s1 unit cost 5.0
        _li(2, 10, 2, 4, 20.0, "N", "1996-01-01"),  # s2 unit cost 5.0 (tie)
        _li(3, 10, 3, 2, 14.0, "N", "1996-01-01"),  # s3 unit cost 7.0
        _li(4, 10, 4, 2, 2.0, "N", "1996-01-01"),   # s4 cost 1.0, non-EUROPE
        _li(5, 11, 1, 2, 10.0, "N", "1996-01-01"),
        _li(6, 12, 1, 2, 10.0, "N", "1996-01-01"),
    ]
    sf = _plant(
        spark,
        tmp_path,
        "q2",
        {
            "supplier": SUPPLIERS,
            "nation": NATIONS,
            "region": REGIONS,
            "part": parts,
            "lineitem": li,
        },
    )
    rows = {
        (r["s_name"], r["p_partkey"], r["ps_supplycost"])
        for r in q_tpch_q2(spark, sf).collect()
    }
    assert rows == {("Supp#1", 10, 5_000_000), ("Supp#2", 10, 5_000_000)}


def test_q11_mean_relative_threshold(spark, tmp_path):
    """Four EUROPE parts with inventory values 1:1:1:10 (micro units) —
    threshold is 2x the per-part mean ((2*13e6) DIV 4 = 6.5e6), so only
    the 10e6 part qualifies. The non-EUROPE supplier's huge value on
    part 40 must not count toward the total or the result."""
    from kse.queries.tpch import q_tpch_q11

    li = [
        _li(1, 10, 1, 1, 1.0, "N", "1996-01-01"),   # value 1e6
        _li(2, 20, 1, 1, 1.0, "N", "1996-01-01"),   # value 1e6
        _li(3, 30, 2, 1, 1.0, "N", "1996-01-01"),   # value 1e6
        _li(4, 40, 2, 10, 10.0, "N", "1996-01-01"),  # value 10e6
        _li(5, 40, 4, 100, 100.0, "N", "1996-01-01"),  # non-EUROPE, ignored
    ]
    sf = _plant(
        spark,
        tmp_path,
        "q11",
        {
            "supplier": SUPPLIERS,
            "nation": NATIONS,
            "region": REGIONS,
            "lineitem": li,
        },
    )
    rows = {tuple(r) for r in q_tpch_q11(spark, sf).collect()}
    assert rows == {(40, 10_000_000)}
