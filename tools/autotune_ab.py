"""A/B the planner-driven shuffle conf against the static default on
the heaviest headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

    python tools/autotune_ab.py

Prints, per query: planned partition count vs static, and median wall
seconds under each. At bench SF the planner floors at the core count,
so planned == static and the deltas are noise — the table also prints
the bytes-derived plan at 1e6x the input (~TB-scale for these
compressed files) to show where the two diverge (the 100 TB posture
the planner exists for)."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEAVY = [
    "knn_ivfpq",
    "dedup_clusters_star",
    "ivf_knn",
    "dedup_containment",
    "dedup_minhash_lsh",
]


def main() -> int:
    from thrivefinancedatapipeline_spark import autotune, registry
    from thrivefinancedatapipeline_spark.session import get_spark

    spark = get_spark("autotune-ab")
    qs = registry.all_queries()
    static_n = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def median_wall(fn, conf_n: int) -> float:
        walls = []
        with autotune.shuffle_conf_scope(spark, conf_n):
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.mode("overwrite").format(
                    "noop"
                ).save()
                walls.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        return statistics.median(walls)

    print(f"{'query':26} {'static':>7} {'planned':>8} "
          f"{'t_static':>9} {'t_planned':>10} {'plan@1e6x':>10}")
    for name in HEAVY:
        planned = autotune.plan_for_query(SF_DIR, name, spark=spark)
        at_1e6x = autotune.plan_for_query(
            SF_DIR, name, spark=spark, scale=1e6
        )
        coarse_1e6x = autotune.plan_for_query(
            SF_DIR, name, spark=spark, scale=1e6, target_partition_mb=1024
        )
        t_static = median_wall(qs[name], static_n)
        t_planned = median_wall(qs[name], planned)
        print(f"{name:26} {static_n:>7} {planned:>8} "
              f"{t_static:>9.2f} {t_planned:>10.2f} {at_1e6x:>10}")
        # sanity (non-tautological): a larger target partition size
        # must plan no MORE partitions on identical scaled bytes
        assert coarse_1e6x <= at_1e6x
    skew = autotune.skew_plan_for_events(spark, SF_DIR)
    print(f"\nskew plan (events.user_id): n_partitions={skew.n_partitions} "
          f"salting={'yes: ' + str(skew.salt_factors) if skew.needs_salting else 'no (uniform corpus)'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
