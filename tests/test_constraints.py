"""CHECK constraints (r14 — Delta parity): add validates existing
data, every later write gates its NEW files before publish, SQL-
standard tri-state (only FALSE violates), carried across commits,
restored/cloned with the snapshot, enforced through the Spark write
face and the SQL dispatcher."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calorista_spark.sources.commitlog import (
    CommitLogStore,
    ConstraintViolationError,
)
from calorista_spark.sources.store_sql import store_sql


def _store(spark, tmp_path):
    store = CommitLogStore(str(tmp_path / "s"))
    df = spark.createDataFrame(
        [(f"d{i % 2}", i, i * 10) for i in range(20)],
        "d string, k long, amt long",
    )
    store.commit(
        df, expect_version=None, partition_by="d", keys=["d", "k"]
    )
    return store


def test_add_validates_existing_and_rejects_bad_writes(spark, tmp_path):
    store = _store(spark, tmp_path)
    with pytest.raises(ConstraintViolationError, match="existing rows"):
        store.add_constraint(spark, "amt_big", "amt > 50")
    v = store.add_constraint(spark, "amt_nonneg", "amt >= 0")
    assert store.constraints() == {"amt_nonneg": "amt >= 0"}
    assert store.manifest_meta(v)["op"] == "add_constraint"
    # a violating append aborts BEFORE publish; the store is unchanged
    bad = spark.createDataFrame(
        [("d0", 100, -5)], "d string, k long, amt long"
    )
    with pytest.raises(ConstraintViolationError, match="amt_nonneg"):
        store.commit(bad, op="append")
    assert store.latest_version() == v
    assert store.read(spark).count() == 20
    # a clean append still lands
    ok = spark.createDataFrame(
        [("d0", 100, 5)], "d string, k long, amt long"
    )
    store.commit(ok, op="append")
    assert store.read(spark).count() == 21


def test_merge_and_update_enforce(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.add_constraint(spark, "amt_nonneg", "amt >= 0")
    bad = spark.createDataFrame(
        [("d1", 1, -1)], "d string, k long, amt long"
    )
    with pytest.raises(ConstraintViolationError):
        store.merge(spark, bad, ["d", "k"])
    with pytest.raises(ConstraintViolationError):
        store.update_where(
            spark, [("k", "==", 3)], {"amt": F.lit(-7)}
        )
    # aborted DML left no trace
    assert {r.amt for r in store.read(spark).filter("k = 3").collect()} == {
        30
    }
    # valid update passes; deletes never re-validate survivors
    store.update_where(spark, [("k", "==", 3)], {"amt": F.lit(7)})
    store.delete_where(spark, [("k", "==", 4)])
    assert store.read(spark).count() == 19


def test_null_passes_sql_tristate(spark, tmp_path):
    store = CommitLogStore(str(tmp_path / "s2"))
    df = spark.createDataFrame(
        [(1, 10), (2, None)], "k long, amt long"
    )
    store.commit(df, expect_version=None, keys=["k"])
    # NULL amt is UNKNOWN, not FALSE: constraint accepted and later
    # null writes pass too
    store.add_constraint(spark, "amt_pos", "amt > 0")
    store.commit(
        spark.createDataFrame([(3, None)], "k long, amt long"),
        op="append",
    )
    assert store.read(spark).count() == 3
    # IS NOT NULL expresses NOT NULL and rejects them
    with pytest.raises(ConstraintViolationError, match="existing rows"):
        store.add_constraint(spark, "amt_nn", "amt IS NOT NULL")


def test_constraints_carry_restore_and_clone(spark, tmp_path):
    store = _store(spark, tmp_path)
    v_pre = store.latest_version()
    store.add_constraint(spark, "amt_nonneg", "amt >= 0")
    store.merge(
        spark,
        spark.createDataFrame(
            [("d0", 0, 1)], "d string, k long, amt long"
        ),
        ["d", "k"],
    )
    assert store.constraints() == {"amt_nonneg": "amt >= 0"}  # carried
    clone = store.clone(str(tmp_path / "c"))
    assert clone.constraints() == {"amt_nonneg": "amt >= 0"}
    # RESTORE to the pre-constraint version drops it (metadata
    # restores with the data)
    store.restore(v_pre)
    assert store.constraints() == {}
    store.commit(
        spark.createDataFrame(
            [("d0", 200, -1)], "d string, k long, amt long"
        ),
        op="append",
    )  # no constraint anymore: the negative row is accepted


def test_sql_face_and_drop(spark, tmp_path):
    store = _store(spark, tmp_path)
    t = f"commitlog.`{store.path}`"
    store_sql(
        spark, f"ALTER TABLE {t} ADD CONSTRAINT amt_nonneg CHECK (amt >= 0)"
    )
    assert store.constraints() == {"amt_nonneg": "amt >= 0"}
    with pytest.raises(ValueError, match="already exists"):
        store_sql(
            spark,
            f"ALTER TABLE {t} ADD CONSTRAINT amt_nonneg CHECK (amt > 1)",
        )
    with pytest.raises(ConstraintViolationError):
        store_sql(spark, f"UPDATE {t} SET amt = -1 WHERE k = 2")
    store_sql(spark, f"ALTER TABLE {t} DROP CONSTRAINT amt_nonneg")
    assert store.constraints() == {}
    with pytest.raises(ValueError, match="unknown constraint"):
        store.drop_constraint("amt_nonneg")
    # dropped: the once-forbidden update now lands
    store_sql(spark, f"UPDATE {t} SET amt = -1 WHERE k = 2")
    assert {
        r.amt for r in store.read(spark).filter("k = 2").collect()
    } == {-1}


def test_spark_write_face_enforces(spark, tmp_path):
    from calorista_spark.sources.commitlog_batch import (
        register_batch_source,
    )

    store = _store(spark, tmp_path)
    store.add_constraint(spark, "amt_nonneg", "amt >= 0")
    register_batch_source(spark)
    bad = spark.createDataFrame(
        [("d0", 300, -1)], "d string, k long, amt long"
    )
    with pytest.raises(Exception, match="amt_nonneg"):
        bad.write.format("commitlog").option("path", store.path).mode(
            "append"
        ).save()
    assert store.read(spark).count() == 20
