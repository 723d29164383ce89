"""Connected-components operator: known graphs, chains (multi-round
propagation), and idempotence."""

from __future__ import annotations

from calorista_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {r.node: r.comp for r in connected_components(df).collect()}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_needs_multiple_rounds(spark):
    # label 0 must propagate 6 hops
    chain = [(i, i + 1) for i in range(6)]
    got = _cc(spark, chain)
    assert set(got.values()) == {0}


def test_reversed_edge_direction_irrelevant(spark):
    got = _cc(spark, [(5, 1), (2, 5)])  # min label arrives via mixed directions
    assert got == {1: 1, 2: 1, 5: 1}


def test_reliable_checkpoint_mode_same_result(spark, tmp_path):
    # VERDICT r01 #3: with a session checkpoint dir configured (the
    # cluster deployment mode), iterative ops route through reliable
    # df.checkpoint() — fault-tolerant across executor loss — and
    # produce identical output.
    import os

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
        # reliable checkpoint files actually landed on (distributed) storage
        assert any(os.scandir(ckpt))
    finally:
        # restore "unset" so other tests keep the localCheckpoint path
        none_opt = sc._jvm.scala.Option.apply(None)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(none_opt)
        assert sc.getCheckpointDir() is None


def test_chain_converges_via_path_halving(spark):
    """A 64-node chain needs 63 rounds under plain neighbor-min (the
    pre-r7 operator silently mislabeled 43 nodes at max_iter=20);
    path halving converges it well inside the default budget."""
    from calorista_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], ["id_a", "id_b"]
    )
    out = {r.node: r.comp for r in connected_components(edges).collect()}
    assert len(out) == 64
    assert set(out.values()) == {0}


def test_nonconvergence_raises_not_silent(spark):
    """If the round budget is genuinely too small the operator must
    raise, never return wrong labels."""
    import pytest

    from calorista_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(255)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)
