"""Round-16 second-session optimizations: bucketed cogrouped-map and
related per-call-amortization rewrites. Each test pins the rewritten
operator's semantics against a straightforward reference, including
the edge cases the vectorized form must reproduce (customers with no
orders, empty buckets)."""

from __future__ import annotations

import pandas as pd

from clj_kinesis_to_firehose_spark import registry
from clj_kinesis_to_firehose_spark.operators import udfs
from tests.conftest import SF_DIR

QUERIES = registry.queries()


def test_cogrouped_map_matches_join_agg_reference(spark):
    """The bucketed cogroup computes exactly the per-customer stats of
    the reference LEFT JOIN + GROUP BY, including 0/0.0 rows for
    customers with no orders."""
    got = (
        QUERIES["udf_cogrouped_map"](spark, SF_DIR)
        .toPandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")[
        ["c_custkey", "c_acctbal"]
    ]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")[
        ["o_custkey", "o_totalprice"]
    ]
    agg = orders.groupby("o_custkey")["o_totalprice"].agg(
        n_orders="size", total_spent="sum", max_order="max"
    )
    ref = cust.merge(agg, left_on="c_custkey", right_index=True, how="left")
    ref["n_orders"] = ref["n_orders"].fillna(0).astype("int64")
    ref["total_spent"] = ref["total_spent"].fillna(0.0).round(2)
    ref["max_order"] = ref["max_order"].fillna(0.0).round(2)
    ref = ref.sort_values("c_custkey").reset_index(drop=True)
    assert len(got) == len(ref) == len(cust)
    pd.testing.assert_frame_equal(got[ref.columns.tolist()], ref)
    # (every fixture customer has orders; the no-orders edge is pinned
    # by test_cogrouped_map_stats_fn_handles_empty_sides below)


def test_cogrouped_map_stats_fn_handles_empty_sides():
    """The per-bucket kernel's edge cases: an all-orders bucket (no
    customers) emits nothing; a no-orders bucket emits zero rows."""
    cols_c = pd.DataFrame({"c_custkey": [7], "c_acctbal": [1.5]})
    cols_o = pd.DataFrame({"o_custkey": [7, 7], "o_totalprice": [2.0, 3.0]})
    empty_c = cols_c.iloc[0:0]
    empty_o = cols_o.iloc[0:0]
    assert udfs._customer_order_stats((0,), empty_c, cols_o).empty
    no_orders = udfs._customer_order_stats((0,), cols_c, empty_o)
    assert no_orders.iloc[0].tolist() == [7, 1.5, 0, 0.0, 0.0]
    both = udfs._customer_order_stats((0,), cols_c, cols_o)
    assert both.iloc[0].tolist() == [7, 1.5, 2, 5.0, 3.0]


def test_cogroup_bucket_count_scales_with_input(spark):
    """Bucket derivation: floored at the session parallelism on the
    tiny fixture, and growing once input bytes exceed the per-bucket
    budget (scale-adaptive, not a local-core constant)."""
    from clj_kinesis_to_firehose_spark.sources import load_table

    cust = load_table(spark, SF_DIR, "customer")
    nb = udfs._cogroup_buckets(spark, cust)
    assert nb >= spark.sparkContext.defaultParallelism
    orig = udfs._COGROUP_BUCKET_BYTES
    udfs._COGROUP_BUCKET_BYTES = 1  # 1 byte per bucket -> bytes buckets
    try:
        assert udfs._cogroup_buckets(spark, cust) > nb
    finally:
        udfs._COGROUP_BUCKET_BYTES = orig
