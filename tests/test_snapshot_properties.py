"""Model-based property test for the snapshot table layer: a random
sequence of merges / deletes / compactions / rollbacks must keep
``read()`` equal to a trivial in-memory dict model, and every
historical version must keep matching the model's recorded history.
This is the test that catches cross-operation interactions
(merge-after-rollback, delete-after-compact, carry-through stats) that
single-op tests can't."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.storage import SnapshotTable

N0 = 40  # initial rows; small keeps each Spark round-trip fast

op_strategy = st.one_of(
    st.tuples(
        st.just("merge"),
        st.lists(
            st.tuples(
                st.integers(0, 60),
                # explicit NULL updates are part of the MERGE contract
                # (UPDATE … SET val = NULL must land, not be coalesced
                # away) — the model stores None like any other value
                st.one_of(
                    st.floats(-5, 5, allow_nan=False), st.none()
                ),
            ),
            min_size=1,
            max_size=4,
            unique_by=lambda kv: kv[0],
        ),
    ),
    st.tuples(st.just("delete"), st.integers(0, 60)),
    # merge-on-read deletes interleaved with every COW op: a point
    # vector delete and a range vector delete, plus the maintenance
    # fold — the cross-op interactions (vector → rewrite materializes,
    # vector → rollback carries, vector → compact folds) are exactly
    # what this model test exists to catch
    st.tuples(st.just("delete_mor"), st.integers(0, 60)),
    st.tuples(st.just("delete_mor_range"), st.integers(0, 60)),
    st.tuples(st.just("materialize"), st.none()),
    # full-row MoR upsert: same model update as a COW merge (the model
    # stores complete rows), entirely different physical commit
    st.tuples(
        st.just("merge_mor"),
        st.lists(
            st.tuples(
                st.integers(0, 60),
                st.one_of(st.floats(-5, 5, allow_nan=False), st.none()),
            ),
            min_size=1,
            max_size=4,
            unique_by=lambda kv: kv[0],
        ),
    ),
    st.tuples(st.just("compact"), st.integers(1, 3)),
    st.tuples(st.just("rollback"), st.none()),
    # partition-spec evolution interleaved with everything else:
    # evolve is metadata-only (model unchanged), append lands fresh
    # keys under whatever spec is current — before an evolve they
    # write plain, after it they write hive-partitioned on grp, and
    # reads must stay model-equal across the mixed layout
    st.tuples(st.just("evolve"), st.none()),
    st.tuples(st.just("append"), st.integers(1, 3)),
    # three-arm CDC merge: (key, value, tombstone) — tombstoned keys
    # delete, the rest upsert, all in one commit
    st.tuples(
        st.just("cdc"),
        st.lists(
            st.tuples(
                st.integers(0, 60),
                st.floats(-5, 5, allow_nan=False),
                st.booleans(),
            ),
            min_size=1,
            max_size=4,
            unique_by=lambda kvd: kvd[0],
        ),
    ),
)


@pytest.fixture(scope="module")
def table_root(tmp_path_factory):
    return tmp_path_factory.mktemp("snap_props")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op_strategy, min_size=1, max_size=5), seq=st.integers(0, 10**9))
def test_random_op_sequences_match_dict_model(spark, table_root, ops, seq):
    t = SnapshotTable(spark, str(table_root / f"t{seq}_{len(ops)}"), key="id")
    if t.latest_version():  # hypothesis reused a seq collision — skip
        return
    t.create(
        spark.range(N0).select(
            "id",
            (F.col("id") * 2.0).alias("val"),
            # 3-value string column for partition-spec evolution
            F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("grp"),
        ),
        n_files=3,
    )
    model: dict[int, float] = {i: float(2 * i) for i in range(N0)}
    model_history: list[dict[int, float]] = [dict(model)]
    next_append_id = 100  # fresh keys only: append never upserts

    for op, arg in ops:
        if op == "merge":
            rows = [
                (int(k), None if v is None else float(v)) for k, v in arg
            ]
            t.merge_upsert(
                spark.createDataFrame(rows, "id long, val double")
            )
            model.update(dict(rows))
        elif op == "delete":
            t.delete_where(f"id >= {arg}")
            model = {k: v for k, v in model.items() if k < arg}
        elif op == "merge_mor":
            rows = [(int(k), None if v is None else float(v)) for k, v in arg]
            t.merge_upsert_mor(
                spark.createDataFrame(rows, "id long, val double")
            )
            model.update(dict(rows))
        elif op == "delete_mor":
            t.delete_where_mor(f"id = {arg}")
            model.pop(arg, None)
        elif op == "delete_mor_range":
            t.delete_where_mor(f"id >= {arg}")
            model = {k: v for k, v in model.items() if k < arg}
        elif op == "materialize":
            t.materialize_deletes()  # may be a true no-op (no commit)
        elif op == "evolve":
            # metadata-only: repeated evolves just append specs
            t.evolve_partition_spec(["grp"])
        elif op == "append":
            rows = [
                (next_append_id + i, -1.0 * (next_append_id + i), f"g{i}")
                for i in range(arg)
            ]
            next_append_id += arg
            t.append(
                spark.createDataFrame(rows, "id long, val double, grp string"),
                n_files=2,
            )
            model.update({k: v for k, v, _ in rows})
        elif op == "compact":
            t.compact(n_files=arg)
        elif op == "rollback":
            v = max(1, t.latest_version() - 1)
            t.rollback(v)
            model = dict(model_history[v - 1])
        elif op == "cdc":
            rows = [
                (int(k), float(v), bool(d)) for k, v, d in arg
            ]
            t.merge_upsert(
                spark.createDataFrame(
                    rows, "id long, val double, _del boolean"
                ),
                tombstone_col="_del",
            )
            for k, v, d in rows:
                if d:
                    model.pop(k, None)
                else:
                    model[k] = v
        # record history only when the op actually committed a version
        # (materialize_deletes with no active vector is a true no-op)
        if t.latest_version() == len(model_history) + 1:
            model_history.append(dict(model))

        got = {r["id"]: r["val"] for r in t.read().collect()}
        assert got == model, f"after {op}({arg}): table diverged from model"

    # every historical version still matches what the model was then
    for v, snapshot in enumerate(model_history, start=1):
        got = {r["id"]: r["val"] for r in t.read(version=v).collect()}
        assert got == snapshot, f"time travel to v{v} diverged"
