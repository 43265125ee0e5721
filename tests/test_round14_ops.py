"""Round-14 changes: the shared bucket-size gate routed through every
probe-style candidate join (r13 ADVICE medium), the quality-filter fit
loop single-sourced, the driver-side BT scaled fit, and the
fixed-point exactness upgrades."""

from __future__ import annotations

import pytest

from clj_kinesis_to_firehose_spark import registry
from clj_kinesis_to_firehose_spark.operators.llm_dedup import (
    BAND_BUCKET_CAP,
    gate_oversized,
)
from tests.conftest import SF_DIR

QUERIES = registry.queries()


def _synthetic_banded(spark, flood_n: int, organic: list[int]):
    rows = [(i, 0, "flood") for i in range(flood_n)]
    nxt = flood_n
    for k, n in enumerate(organic):
        rows += [(nxt + i, 0, f"org{k}") for i in range(n)]
        nxt += n
    return spark.createDataFrame(rows, "doc_id long, band int, bucket string")


def test_gate_oversized_drops_flood_keeps_organic(spark):
    banded = _synthetic_banded(spark, BAND_BUCKET_CAP + 50, [3, 2])
    kept = gate_oversized(banded).collect()
    assert len(kept) == 5
    assert all(r.bucket != "flood" for r in kept)


def test_gate_oversized_passes_extra_columns_through(spark):
    """The incremental-minhash consumer gates a tagged relation (an
    is_delta flag) in one pass — extra columns must survive the gate
    and the helper column must not leak into the output."""
    import pyspark.sql.functions as F

    banded = _synthetic_banded(spark, BAND_BUCKET_CAP + 50, [4]).withColumn(
        "is_delta", (F.col("doc_id") % 2).cast("int")
    )
    out = gate_oversized(banded)
    assert set(out.columns) == {"doc_id", "band", "bucket", "is_delta"}
    assert out.count() == 4


def test_gate_oversized_none_disables(spark):
    banded = _synthetic_banded(spark, BAND_BUCKET_CAP + 10, [])
    assert gate_oversized(banded, None) is banded


@pytest.mark.parametrize(
    "name",
    [
        "multimodal_phash_multiprobe_pairs",
        "dedup_incremental_phash",
        "dedup_incremental_minhash",
    ],
)
def test_probe_joins_carry_the_bucket_gate(spark, name):
    """The r14 guarantee itself: each formerly-ungated probe-style
    candidate join now carries the windowed bucket-size filter — the
    (band, bucket) count window followed by the <= cap predicate — in
    its OPTIMIZED plan, so a template flood is excluded from pair
    generation before the join multiplies it."""
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert f"<= {BAND_BUCKET_CAP}" in plan, (name, plan[:4000])
    assert "windowspecdefinition(band" in plan.replace(
        "#", ""
    ) or "windowspecdefinition" in plan, (name,)


def test_green_tail_orders_stalest_record_first():
    """r13 verdict #5: with every query driver-green, the window must
    become a freshness rotation — the live first-50 window contains
    >= 20 ops whose latest record predates round 5 (the r2/r3
    agg/window/scalar core re-proves under the current driver)."""
    latest = registry._latest_records()
    seen = registry._adjudicated_names()
    window = list(registry.queries())[:50]
    # a window slot is well-spent iff it needs adjudication (no
    # conclusive record — including revalidations and new ops) or its
    # green record is from the stalest cohort
    needs = [n for n in window if n not in seen]
    stale = [n for n in window if n in seen and latest[n][0] < 5]
    assert len(stale) + len(needs) >= 20, window


def test_tail_sort_is_stable_by_registration_within_round(tmp_path):
    """Two greens from the same round keep registration order; an
    older green fronts a newer one regardless of registration order."""
    import json

    green = {"rows_match": True, "schema_match": True,
             "hash_match": True, "err": None}
    with open(tmp_path / "CORRECTNESS_r02.json", "w") as fh:
        json.dump({"op_new": green}, fh)
    with open(tmp_path / "CORRECTNESS_r01.json", "w") as fh:
        json.dump({"op_old_a": green, "op_old_b": green}, fh)
    latest = registry._latest_records(root=str(tmp_path))
    assert latest["op_new"][0] == 2
    assert latest["op_old_a"][0] == 1


def test_bt_driver_loop_bit_equals_distributed(spark):
    """The r14 fit/apply rewrite's contract: at equal iteration count
    the driver-side MM loop and the distributed (checkpointed) loop
    produce IDENTICAL rows — same integer strengths, same ranks —
    because every quantity is an exact integer sum or the identical
    IEEE-double FLOOR(1e12·x/y)."""
    from clj_kinesis_to_firehose_spark.operators.posttrain import _bt_fit
    from tests.conftest import SF_DIR as _SF

    dist = sorted(
        map(tuple, _bt_fit(spark, _SF, 6, checkpoint_every=2).collect())
    )
    drv = sorted(map(tuple, _bt_fit(spark, _SF, 6, driver_loop=True).collect()))
    assert dist == drv
