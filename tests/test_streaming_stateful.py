"""applyInPandasWithState sessionizer: streamed closed sessions == batch
sessionization minus each user's trailing (still-open) session, with state
carried across micro-batches."""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from knowledgegraphbuilder_spark.streaming.stateful import (
    run_sessionize_available_now,
    sessionize_stream,  # noqa: F401 (public surface)
)

GAP = 1800
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events():
    """3 users with known session structure (seconds offsets from T0)."""
    spec = {
        1: [0, 60, 120, 5000, 5100, 12000],      # 3 sessions
        2: [0, 100, 200, 300],                   # 1 session
        3: [0, 4000, 8000, 12000, 16000],        # 5 sessions (every gap > 1800)
    }
    rows = []
    eid = 0
    for uid, offs in spec.items():
        for off in offs:
            rows.append((eid, T0 + dt.timedelta(seconds=off), uid, "click",
                         1.0, "{}"))
            eid += 1
    rows.sort(key=lambda r: r[1])  # global time order
    return rows, spec


def test_stateful_sessionize_matches_batch(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("sessions"))
    in_dir, out_dir, ck_dir = f"{base}/in", f"{base}/out", f"{base}/ck"
    rows, spec = _events()
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    # two time-ordered files -> two micro-batches; sessions spanning the file
    # boundary prove that state survives across batches
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], schema).coalesce(1).write.mode(
        "overwrite").parquet(f"{in_dir}/a")
    spark.createDataFrame(rows[half:], schema).coalesce(1).write.mode(
        "append").parquet(f"{in_dir}/b")

    run_sessionize_available_now(
        spark, f"{in_dir}/*", out_dir, ck_dir, gap_seconds=GAP,
        max_files_per_trigger=1,
    )
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }

    # expected CLOSED sessions: batch sessionization minus the trailing open
    # session per user
    want = set()
    for uid, offs in spec.items():
        sessions, cur = [], [offs[0]]
        for a, b in zip(offs, offs[1:]):
            if b - a > GAP:
                sessions.append(cur)
                cur = [b]
            else:
                cur.append(b)
        for s in sessions:  # trailing `cur` stays open in state
            t = lambda o: int((T0 + dt.timedelta(seconds=o)).timestamp())
            want.add((uid, t(s[0]), t(s[-1]), len(s)))
    assert got == want
    # user 2 has a single (open) session -> contributes nothing
    assert not any(u == 2 for u, *_ in got)

    # batch cross-check: closed-per-user == batch sessions-per-user - 1
    batch = (
        spark.createDataFrame(rows, schema)
        .withColumn("delta", F.unix_timestamp("ts")
                    - F.lag(F.unix_timestamp("ts")).over(
                        Window.partitionBy("user_id").orderBy("ts", "event_id")))
        .groupBy("user_id")
        .agg((1 + F.sum(F.when(F.col("delta") > GAP, 1).otherwise(0)))
             .alias("n_sessions"))
        .collect()
    )
    closed_per_user = {}
    for u, *_ in got:
        closed_per_user[u] = closed_per_user.get(u, 0) + 1
    for r in batch:
        assert closed_per_user.get(r["user_id"], 0) == r["n_sessions"] - 1
