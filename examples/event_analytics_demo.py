"""End-to-end demo: raw event log -> behavioral analytics suite.

The warehouse-analytics workflow over the interaction-store event log,
every step a declarative Spark plan (same operators the correctness gate
verifies row-by-row):

  1. skew diagnostics on the join key (salt only if the numbers say so)
  2. sessionize -> funnel
  3. cohort retention matrix
  4. SCD2 dimension history + point-in-time usability
  5. behavioral transition matrix
  6. z-score outlier flags
  7. gap-filled weekly training spine

    python examples/event_analytics_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bharatmlstack_spark import get_spark
from bharatmlstack_spark.queries import all_queries


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("event-analytics-demo")
    qs = all_queries()

    print("== 1. join-key skew (salt only if skew_factor says so) ==")
    qs["key_skew_report"](spark, sf_dir).show(truncate=False)

    print("== 2. funnel (view -> click -> purchase) ==")
    qs["events_funnel"](spark, sf_dir).show()

    print("== 3. cohort retention ==")
    qs["cohort_retention"](spark, sf_dir).orderBy("cohort_week", "week_offset").show()

    print("== 4. SCD2 dimension history (first 5 users) ==")
    qs["scd2_dimension"](spark, sf_dir).orderBy("user_id", "valid_from").show(10)

    print("== 5. behavioral transition matrix ==")
    qs["event_transition_matrix"](spark, sf_dir).orderBy(
        "prev_type", "next_type"
    ).show()

    print("== 6. z-score outliers per event type ==")
    out = qs["value_zscore_outliers"](spark, sf_dir)
    out.groupBy("event_type", "is_outlier").count().orderBy(
        "event_type", "is_outlier"
    ).show()

    print("== 7. gap-filled weekly spine (training cadence) ==")
    qs["user_week_density"](spark, sf_dir).orderBy("user_id", "week").show(10)

    print("done.")


if __name__ == "__main__":
    main()
