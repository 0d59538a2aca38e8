"""TPC-H breadth queries (workloads/tpch.py): registration, plan shapes,
and value spot-checks at sf0.001. Full value parity vs DuckDB is covered
by the oracle gate (tools/check_correctness.py / the driver)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

TPCH_NEW = [
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_type_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_late_shipments",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q19_discounted_revenue",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
]


@pytest.fixture(scope="module")
def registry():
    from delta_sharing_spark.workloads import ORACLES, QUERIES, load_all

    load_all()
    return QUERIES, ORACLES


class TestTpchBreadth:
    def test_all_registered_with_oracles(self, registry):
        queries, oracles = registry
        for name in TPCH_NEW:
            assert name in queries, name
            assert name in oracles, name

    def test_plans_have_no_cartesian_product(self, spark, registry):
        """Every join is an equi-join (broadcast or shuffled); the only
        nested-loop joins allowed are against broadcast 1-row scalar
        aggregates (q11 total, q15 max, q22 avg)."""
        queries, _ = registry
        scalar_sub = {"q11_important_parts", "q15_top_supplier",
                      "q22_dormant_customers"}
        for name in TPCH_NEW:
            df = queries[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "CartesianProduct" not in plan, name
            if name not in scalar_sub:
                assert "BroadcastNestedLoopJoin" not in plan, name

    def test_q13_includes_zero_order_customers(self, spark, registry):
        queries, _ = registry
        rows = {r["c_count"]: r["custdist"]
                for r in queries["q13_customer_distribution"](spark, SF_DIR)
                .collect()}
        # histogram covers all customers exactly once
        from delta_sharing_spark.io import read_table

        n_cust = read_table(spark, SF_DIR, "customer").count()
        assert sum(rows.values()) == n_cust

    def test_q15_returns_the_max_revenue_suppliers(self, spark, registry):
        queries, _ = registry
        rows = queries["q15_top_supplier"](spark, SF_DIR).collect()
        assert len(rows) >= 1
        revs = {round(r["total_revenue"], 2) for r in rows}
        assert len(revs) == 1  # all tied at the max

    def test_q10_topk_is_sorted_and_bounded(self, spark, registry):
        queries, _ = registry
        rows = queries["q10_returned_items"](spark, SF_DIR).collect()
        assert len(rows) <= 20
        revs = [r["revenue"] for r in rows]
        assert revs == sorted(revs, reverse=True)

    def test_q14_share_is_a_percentage(self, spark, registry):
        queries, _ = registry
        [row] = queries["q14_promo_revenue"](spark, SF_DIR).collect()
        assert 0.0 <= row["promo_revenue"] <= 100.0
