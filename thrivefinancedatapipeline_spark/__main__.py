"""CLI: run any registered query or the full pipeline from a shell.

    python -m thrivefinancedatapipeline_spark list
    python -m thrivefinancedatapipeline_spark run balance_asof \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m thrivefinancedatapipeline_spark pipeline --output /tmp/out

The operational surface the reference exposes through Airflow task
runs, re-expressed as a plain entry point.
"""

from __future__ import annotations

import argparse
import json
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="thrivefinancedatapipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    runp = sub.add_parser("run", help="run one query and print rows")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    runp.add_argument("--limit", type=int, default=20)

    pipep = sub.add_parser("pipeline", help="run the end-to-end pipeline")
    pipep.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    pipep.add_argument("--output", default=None)
    pipep.add_argument(
        "--staging-dir", default=None,
        help="materialize the download_data staging area (earned/spent/"
        "expired + sales + customers parquet) and read transactions "
        "back from it, like the reference DAG",
    )
    pipep.add_argument("--retries", type=int, default=0)

    cpipe = sub.add_parser(
        "corpus-pipeline",
        help="run the LLM-data curation funnel (decontaminate -> "
        "dedup -> quality gate -> chunk -> pack)",
    )
    cpipe.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    cpipe.add_argument("--output", default=None)
    cpipe.add_argument(
        "--token-budget-quota",
        action="store_true",
        help="insert the per-source token-budget quota assembly stage"
        " (sampling.quota_select) over the quality-gate survivors",
    )
    cpipe.add_argument(
        "--dedup",
        choices=("canonical", "priority"),
        default="canonical",
        help="duplicate-group survivor rule: min-id canonical or the"
        " trust-ranked dedup_keep_priority choice",
    )

    annp = sub.add_parser(
        "ann-index",
        help="persisted IVF-PQ index lifecycle: build (train + encode"
        " + persist), probe (read-only query, partition-pruned), or"
        " drop the catalog tables",
    )
    annp.add_argument("action", choices=["build", "probe", "drop"])
    annp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    annp.add_argument("--limit", type=int, default=20)
    annp.add_argument(
        "--json", action="store_true",
        help="probe: print ALL result rows as one JSON line (for"
        " cross-process parity checks) instead of show()",
    )

    args = p.parse_args(argv)

    from .registry import all_queries

    queries = all_queries()
    if args.cmd == "list":
        for name in sorted(queries):
            print(name)
        return 0

    from .session import get_spark

    spark = get_spark("cli")
    if args.cmd == "run":
        if args.query not in queries:
            print(f"unknown query {args.query!r}; try `list`", file=sys.stderr)
            return 2
        df = queries[args.query](spark, args.sf_dir)
        df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "ann-index":
        from .operators import similarity as sim

        if args.action == "build":
            sim.build_ivfpq_index(spark, args.sf_dir)
            n = spark.table(sim.IVFPQ_CODES_TABLE).count()
            print(json.dumps({
                "built": [sim.IVFPQ_CENTROIDS_TABLE,
                          sim.IVFPQ_CODEBOOKS_TABLE,
                          sim.IVFPQ_CODES_TABLE],
                "codes_rows": n,
            }))
        elif args.action == "probe":
            df = sim.probe_ivfpq_index(spark, args.sf_dir)
            if args.json:
                rows = sorted(tuple(r) for r in df.collect())
                print(json.dumps({"rows": rows}))
            else:
                df.show(args.limit, truncate=False)
        else:
            for t in (sim.IVFPQ_CENTROIDS_TABLE,
                      sim.IVFPQ_CODEBOOKS_TABLE,
                      sim.IVFPQ_CODES_TABLE):
                sim._drop_table(spark, t)
            print(json.dumps({"dropped": True}))
        return 0

    if args.cmd == "corpus-pipeline":
        from .pipeline import run_corpus_pipeline

        print(json.dumps(
            run_corpus_pipeline(
                spark,
                args.sf_dir,
                output_dir=args.output,
                token_budget_quota=args.token_budget_quota,
                dedup=args.dedup,
            ),
            default=str,
        ))
        return 0

    from .pipeline import run_pipeline

    result = run_pipeline(
        spark, args.sf_dir, output_dir=args.output,
        staging_dir=args.staging_dir, retries=args.retries,
    )
    report = {
        k: v for k, v in result.report.items()
        if k != "top_customers_by_balance"
    }
    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
