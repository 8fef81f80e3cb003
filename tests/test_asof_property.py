"""Property tests for the AS-OF join (pure-python reference model vs the
Spark operator on randomized event streams)."""

import datetime as dt
import random

from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.asof import asof_join

SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double, props string")
T0 = dt.datetime(2024, 6, 1)


def _random_stream(seed: int, n: int = 120):
    rng = random.Random(seed)
    rows = []
    for eid in range(n):
        rows.append((
            eid,
            T0 + dt.timedelta(seconds=rng.randrange(0, 5000)),
            rng.randrange(1, 6),
            rng.choice(["view", "purchase"]),
            round(rng.uniform(0, 100), 3),
            "{}",
        ))
    return rows


def _model(rows):
    """Reference: per purchase, the view row with max (ts, event_id) <= ts."""
    out = {}
    for eid, ts, uid, etype, val, _ in rows:
        if etype != "purchase":
            continue
        cands = [
            (rts, rid, rval)
            for rid, rts, ruid, rtype, rval, _ in rows
            if ruid == uid and rtype == "view" and rts <= ts
        ]
        out[eid] = (max(cands)[1], max(cands)[2]) if cands else (None, None)
    return out


def test_asof_randomized_matches_model(spark):
    for seed in (1, 2, 3):
        rows = _random_stream(seed)
        e = spark.createDataFrame(rows, SCHEMA)
        got = {
            r["event_id"]: (r["matched_event_id"], r["matched_value"])
            for r in asof_join(
                e.filter(F.col("event_type") == "purchase"),
                e.filter(F.col("event_type") == "view"),
            ).collect()
        }
        want = _model(rows)
        assert got == want, seed


def test_asof_no_right_rows(spark):
    rows = _random_stream(9)
    e = spark.createDataFrame(rows, SCHEMA)
    out = asof_join(
        e.filter(F.col("event_type") == "purchase"),
        e.filter(F.col("event_type") == "signup"),  # empty right side
    ).collect()
    assert out and all(r["matched_event_id"] is None for r in out)
