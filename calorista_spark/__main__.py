"""CLI entry points mirroring the reference's ``start-main`` /
``start-app`` (reference __main__.py:5-13):

    python -m calorista_spark sync --fixtures DIR --store PATH \
        --start 2024-03-01 --end 2024-03-31
    python -m calorista_spark dashboard --store PATH

``sync`` runs the batch ETL (fetch → normalize → dedup → merge);
``dashboard`` prints the four query sections over the store. The
fixture-dir source stands in for the OAuth HTTP transport (the seam
is ``sources/rest.py: DaySource``).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="calorista_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_sync = sub.add_parser("sync", help="batch ETL: fetch→dedup→merge")
    p_sync.add_argument("--fixtures", required=True)
    p_sync.add_argument("--store", required=True)
    p_sync.add_argument("--start", required=True)
    p_sync.add_argument("--end", required=True)

    p_dash = sub.add_parser("dashboard", help="print the query sections")
    p_dash.add_argument("--store", required=True)
    p_dash.add_argument("--range-start")
    p_dash.add_argument("--range-end")

    args = parser.parse_args(argv)

    from calorista_spark.session import build_session

    spark = build_session(app_name=f"calorista-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd == "sync":
            from calorista_spark.pipeline.food_entries import sync
            from calorista_spark.sources.rest import FileFakeSource, with_retries

            store = sync(
                spark,
                with_retries(FileFakeSource(args.fixtures)),
                args.store,
                args.start,
                args.end,
            )
            print(f"synced: store now holds {store.count()} entries")
        else:
            from calorista_spark.pipeline.food_entries import (
                daily_range_section,
                latest_day_section,
                monthly_section,
                weekly_section,
            )
            # r10: sync() writes a CommitLogStore — read its snapshot
            from calorista_spark.sources.commitlog import CommitLogStore

            entries = CommitLogStore(args.store).read(spark)
            print("== latest day ==")
            latest_day_section(entries).show(truncate=False)
            if args.range_start and args.range_end:
                print("== daily range ==")
                daily_range_section(entries, args.range_start, args.range_end).show()
            print("== weekly trends ==")
            weekly_section(entries).show()
            print("== monthly trends ==")
            monthly_section(entries).show()
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
