"""Measure what event-time state eviction actually buys the streaming
sessionizer: state rows vs users-ever-seen on a churn-heavy stream.

Scenario (the shape that kills NoTimeout state at 100 TB): a large
population touches the stream ONCE early (drive-by users), a small core
stays active. The NoTimeout form keeps (last_ts, sess) for every user
ever seen; the evicting form (EventTimeTimeout at last_ts + gap) keeps
only users whose session the watermark hasn't closed. Both runs replay
the SAME mtime-pinned waves; state is read back from the checkpoint via
the statestore data source — measured rows, not an estimate.

Run: python tools/sessionize_state_experiment.py [n_churn] [n_active]
Writes a markdown table to stdout (the SCALE.md numbers come from the
default 20000/500 run).
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MIN = 60_000


def main() -> None:
    n_churn = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_active = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    from bharatmlstack_spark.streaming.ingest import (
        await_stream,
        stateful_sessionize,
    )

    work = tempfile.mkdtemp(prefix="bmls_sess_exp_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    B = 1_000 * MIN
    # wave 0: every churn user exactly once + the active core
    # waves 1..3: only the active core, 100' apart (gap 30' => every
    # wave opens a new session; churn users are idle from wave 1 on)
    waves = []
    waves.append(
        [(u, u, B) for u in range(n_churn)]
        + [(10_000_000 + u, 10_000_000 + u, B) for u in range(n_active)]
    )
    for w in (1, 2, 3):
        waves.append(
            [
                (10_000_000 + u, 20_000_000 + w * n_active + u, B + w * 100 * MIN)
                for u in range(n_active)
            ]
        )
    for i, rows in enumerate(waves):
        p = os.path.join(src, f"b{i}.json")
        with open(p, "w") as f:
            for u, e, ts in rows:
                f.write(
                    json.dumps({"user_id": u, "event_id": e, "ts_ms": ts})
                    + "\n"
                )
        os.utime(p, (1_600_000_000 + i * 60,) * 2)

    results = {}
    for mode, evict in (("NoTimeout", False), ("EventTimeTimeout", True)):
        ck = os.path.join(work, f"ck_{mode}")
        out = os.path.join(work, f"out_{mode}")
        stream = (
            spark.readStream.schema("user_id long, event_id long, ts_ms long")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        t0 = time.time()
        q = (
            stateful_sessionize(stream, evict_idle=evict)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, bid, _o=out: df.write.mode("append").parquet(_o)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        await_stream(q, 1800, f"sessionize ({mode})")
        wall = time.time() - t0
        state_rows = spark.read.format("statestore").load(ck).count()
        emitted = spark.read.parquet(out).count()
        results[mode] = (state_rows, emitted, wall)

    n_events = sum(len(w) for w in waves)
    print(f"\nusers ever seen: {n_churn + n_active}  (churn {n_churn}, "
          f"active core {n_active}); events: {n_events}\n")
    print("| mode | state rows after replay | emitted rows | wall s |")
    print("|---|---|---|---|")
    for mode, (state_rows, emitted, wall) in results.items():
        print(f"| {mode} | {state_rows} | {emitted} | {wall:.1f} |")
    nt, et = results["NoTimeout"][0], results["EventTimeTimeout"][0]
    print(f"\nstate reduction: {nt} -> {et} "
          f"({nt / max(et, 1):.0f}x fewer rows)")
    assert results["NoTimeout"][1] == results["EventTimeTimeout"][1], (
        "eviction must not change emission"
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
