"""SQL-text DML dispatcher + store catalog naming
(sources/store_sql.py — VERDICT r13 #3/#8): grammar parsing, parity
with the library faces, replay ledger through OPTIONS(batch_id),
named-table resolution, and loud failures outside the documented
subset."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from calorista_spark.sources.commitlog import CommitLogStore
from calorista_spark.sources.store_sql import (
    parse_predicates,
    register_store,
    register_store_views,
    registered_stores,
    store_sql,
    unregister_store,
)


def test_parse_predicates_grammar():
    assert parse_predicates("user_id = 7") == [("user_id", "==", 7)]
    assert parse_predicates("a == 1 AND b <= 2.5") == [
        ("a", "==", 1),
        ("b", "<=", 2.5),
    ]
    assert parse_predicates("d = DATE '2024-03-01'") == [
        ("d", "==", dt.date(2024, 3, 1))
    ]
    assert parse_predicates("name = 'o''brien'") == [
        ("name", "==", "o'brien")
    ]
    assert parse_predicates("k IN (1, 2, 3) AND `q` > 0") == [
        ("k", "in", [1, 2, 3]),
        ("q", ">", 0),
    ]
    assert parse_predicates("v BETWEEN 3 AND 9") == [
        ("v", "between", (3, 9))
    ]


def test_parse_predicates_rejects_unsupported():
    with pytest.raises(ValueError, match="prunable"):
        parse_predicates("a != 1")
    with pytest.raises(ValueError, match="AND-conjunction"):
        parse_predicates("a = 1 OR b = 2")
    with pytest.raises(ValueError, match="NULL"):
        parse_predicates("a = NULL")


@pytest.fixture()
def store(spark, tmp_path):
    p = str(tmp_path / "s")
    st = CommitLogStore(p)
    st.commit(
        spark.range(100).selectExpr(
            "id AS k",
            "CAST(id % 4 AS STRING) AS g",
            "id * 10 AS amt",
        ),
        expect_version=None,
        keys=["k"],
        partition_by="g",
    )
    return st


def test_store_sql_delete_matches_library_face(spark, store, tmp_path):
    p2 = str(tmp_path / "twin")
    twin = CommitLogStore(p2)
    twin.commit(store.read(spark), expect_version=None, keys=["k"],
                partition_by="g")
    store_sql(spark, f"DELETE FROM commitlog.`{store.path}` WHERE k >= 90")
    twin.delete_where(spark, [("k", ">=", 90)])
    assert sorted(
        (r.k, r.amt) for r in store.read(spark).collect()
    ) == sorted((r.k, r.amt) for r in twin.read(spark).collect())


def test_store_sql_update_with_expression(spark, store):
    store_sql(
        spark,
        f"UPDATE commitlog.`{store.path}` "
        "SET amt = amt * 2 + CAST(k AS BIGINT) WHERE k IN (1, 2)",
    )
    got = {
        r.k: r.amt
        for r in store.read(spark).filter("k <= 3").collect()
    }
    assert got == {0: 0, 1: 21, 2: 42, 3: 30}


def test_store_sql_merge_upsert_with_subquery(spark, store):
    spark.range(5).selectExpr(
        "id + 98 AS k", "CAST((id + 98) % 4 AS STRING) AS g",
        "CAST(-1 AS BIGINT) AS amt"
    ).createOrReplaceTempView("__src")
    v = store_sql(
        spark,
        f"MERGE INTO commitlog.`{store.path}` AS t "
        "USING (SELECT * FROM __src) AS s "
        "ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    assert v == store.latest_version()
    rows = {r.k: r.amt for r in store.read(spark).collect()}
    assert len(rows) == 103  # 100 base, 98/99 updated, 100-102 inserted
    assert rows[98] == -1 and rows[102] == -1 and rows[97] == 970


def test_store_sql_batch_id_exactly_once(spark, store):
    stmt = (
        f"DELETE FROM commitlog.`{store.path}` WHERE k = 5 "
        "OPTIONS (batch_id = 4)"
    )
    v = store_sql(spark, stmt)
    assert store_sql(spark, stmt) == v  # replay skipped
    assert store.latest_version() == v
    assert store.read(spark).filter("k = 5").count() == 0


def test_named_store_resolution_and_views(spark, store):
    register_store("sqltest_store", store.path)
    try:
        assert registered_stores()["sqltest_store"] == store.path
        store_sql(
            spark, "DELETE FROM commitlog.sqltest_store WHERE k = 0"
        )
        assert store.read(spark).filter("k = 0").count() == 0
        register_store_views(spark, ["sqltest_store"])
        n = spark.sql(
            "SELECT COUNT(*) AS n FROM sqltest_store"
        ).first().n
        assert n == store.read(spark).count()
    finally:
        unregister_store("sqltest_store")
    with pytest.raises(KeyError, match="no store registered"):
        store_sql(
            spark, "DELETE FROM commitlog.sqltest_store WHERE k = 1"
        )


def test_store_sql_rejects_conditional_merge_and_garbage(spark, store):
    with pytest.raises(ValueError, match="unrecognized store DML"):
        store_sql(
            spark,
            f"MERGE INTO commitlog.`{store.path}` t USING v s "
            "ON t.k = s.k WHEN MATCHED AND s.amt > 0 THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
        )
    with pytest.raises(ValueError, match="unrecognized store DML"):
        store_sql(spark, "TRUNCATE TABLE commitlog.x")
    with pytest.raises(ValueError, match="share the column name"):
        store_sql(
            spark,
            f"MERGE INTO commitlog.`{store.path}` t USING v s "
            "ON t.k = s.kk WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
        )

def test_store_sql_insert_appends_exactly_once(spark, store):
    n0 = store.read(spark).count()
    stmt = (
        f"INSERT INTO commitlog.`{store.path}` "
        "(SELECT id + 500 AS k, CAST((id + 500) % 4 AS STRING) AS g, "
        "CAST(0 AS BIGINT) AS amt FROM range(3)) "
        "OPTIONS (batch_id = 9)"
    )
    v = store_sql(spark, stmt)
    assert store.read(spark).count() == n0 + 3
    assert store_sql(spark, stmt) == v  # replay skipped
    assert store.read(spark).count() == n0 + 3
    # parent rows survived the append
    assert store.read(spark).filter("k = 1").count() == 1


def test_store_sql_restore_to_version(spark, store):
    v1_rows = sorted(
        (r.k, r.amt) for r in store.read(spark, 1).collect()
    )
    store_sql(
        spark, f"DELETE FROM commitlog.`{store.path}` WHERE k >= 50"
    )
    v = store_sql(
        spark,
        f"RESTORE TABLE commitlog.`{store.path}` TO VERSION AS OF 1",
    )
    assert v == 3
    assert sorted(
        (r.k, r.amt) for r in store.read(spark).collect()
    ) == v1_rows
    assert store.manifest_meta(3)["op"] == "restore"


def test_store_sql_restore_to_timestamp(spark, store):
    t1 = store.manifest_meta(1)["committed_at"]
    store_sql(
        spark, f"DELETE FROM commitlog.`{store.path}` WHERE k >= 50"
    )
    # resolve strictly between the two commits' REAL timestamps — a
    # fixed t1+0.5 offset flakes when a warm session lands the DELETE
    # in under half a second
    t2 = store.manifest_meta(2)["committed_at"]
    iso = dt.datetime.fromtimestamp(
        (t1 + t2) / 2, tz=dt.timezone.utc
    ).isoformat()
    store_sql(
        spark,
        f"RESTORE TABLE commitlog.`{store.path}` "
        f"TO TIMESTAMP AS OF '{iso}'",
    )
    assert store.manifest_meta(3)["restore_of"] == 1
    assert store.read(spark).count() == 100


def test_store_sql_optimize_and_vacuum(spark, store):
    # fragment one partition with appends, then OPTIMIZE + VACUUM
    for i in range(3):
        store.commit(
            spark.range(2).selectExpr(
                f"id + 200 + {i * 2} AS k",
                "CAST(0 AS STRING) AS g",
                "CAST(0 AS BIGINT) AS amt",
            ),
            op="append",
        )
    before = store.read(spark).count()
    n_files_before = len(store.manifest(store.latest_version())["files"])
    v = store_sql(
        spark,
        f"OPTIMIZE commitlog.`{store.path}` ZORDER BY (k, amt)",
    )
    assert store.read(spark).count() == before
    assert len(store.manifest(v)["files"]) < n_files_before
    v2 = store_sql(
        spark,
        f"VACUUM commitlog.`{store.path}` RETAIN 1 VERSIONS",
    )
    assert v2 == v
    assert store.versions() == [v]
    assert store.read(spark).count() == before


def test_store_sql_query_time_travel_diff_join(spark, store):
    from calorista_spark.sources.store_sql import store_sql_query

    store_sql(
        spark, f"DELETE FROM commitlog.`{store.path}` WHERE k >= 60"
    )
    register_store("ttdemo", store.path)
    df = store_sql_query(
        spark,
        """
        SELECT a.g,
               CAST(a.n AS BIGINT) AS n_v1,
               CAST(b.n AS BIGINT) AS n_head
        FROM (SELECT g, COUNT(*) AS n
              FROM commitlog.ttdemo VERSION AS OF 1 GROUP BY g) a
        JOIN (SELECT g, COUNT(*) AS n
              FROM commitlog.ttdemo GROUP BY g) b
          ON a.g = b.g
        ORDER BY a.g
        """,
    )
    rows = {(r.g, r.n_v1, r.n_head) for r in df.collect()}
    assert rows == {(str(g), 25, 15) for g in range(4)}


def test_store_sql_query_timestamp_as_of(spark, store):
    import datetime as dtm

    from calorista_spark.sources.store_sql import store_sql_query

    t1 = store.manifest_meta(1)["committed_at"]
    store_sql(
        spark, f"DELETE FROM commitlog.`{store.path}` WHERE k >= 60"
    )
    iso = dtm.datetime.fromtimestamp(
        t1 + 0.25, tz=dtm.timezone.utc
    ).isoformat()
    n = store_sql_query(
        spark,
        f"SELECT COUNT(*) AS n FROM commitlog.`{store.path}` "
        f"TIMESTAMP AS OF '{iso}'",
    ).collect()[0].n
    assert n == 100
