"""As-of join (operators/temporal.py): union+window construction.
Hand-built event sets pin the match semantics (latest-at-or-before,
exact-ts matches, tolerance, duplicate-ts determinism); the entry
contract + DuckDB oracle replay the full attribution query."""

from datetime import datetime

from pyspark.sql import functions as F

from vision_parse_spark.operators.temporal import asof_join


def _ev(spark, rows):
    # rows: (event_id, second, user, value)
    return spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 0, 0, s), u, float(v))
         for i, s, u, v in rows],
        "event_id long, ts timestamp, user_id long, value double")


def test_latest_prior_match_per_key(spark):
    clicks = _ev(spark, [(0, 10, 1, 1.0), (1, 20, 1, 2.0),
                         (2, 15, 2, 9.0)])
    buys = _ev(spark, [(10, 25, 1, 5.0), (11, 12, 1, 6.0),
                       (12, 30, 2, 7.0)])
    out = {r.event_id: r for r in
           asof_join(buys, clicks, "user_id", "ts", "event_id",
                     ["value"]).collect()}
    assert out[10].asof_event_id == 1 and out[10].asof_value == 2.0
    assert out[10].asof_lag_us == 5_000_000
    assert out[11].asof_event_id == 0          # only click 0 precedes
    assert out[12].asof_event_id == 2          # per-key isolation


def test_exact_timestamp_matches_and_unmatched_nulls(spark):
    clicks = _ev(spark, [(0, 10, 1, 1.0)])
    buys = _ev(spark, [(10, 10, 1, 5.0), (11, 5, 1, 6.0)])
    out = {r.event_id: r for r in
           asof_join(buys, clicks, "user_id", "ts", "event_id",
                     ["value"]).collect()}
    assert out[10].asof_event_id == 0 and out[10].asof_lag_us == 0
    assert out[11].asof_event_id is None       # nothing at or before
    assert out[11].asof_lag_us is None


def test_duplicate_right_ts_is_deterministic(spark):
    # two clicks at the SAME instant: the higher event_id wins (the
    # documented (ts, side, id) order), on any partitioning
    clicks = _ev(spark, [(0, 10, 1, 1.0), (1, 10, 1, 2.0)])
    buys = _ev(spark, [(10, 20, 1, 5.0)])
    for parts in (1, 7):
        out = asof_join(buys.repartition(parts),
                        clicks.repartition(parts),
                        "user_id", "ts", "event_id", ["value"]).collect()
        assert out[0].asof_event_id == 1


def test_tolerance_nulls_stale_matches(spark):
    clicks = _ev(spark, [(0, 0, 1, 1.0)])
    buys = _ev(spark, [(10, 50, 1, 5.0)])
    ok = asof_join(buys, clicks, "user_id", "ts", "event_id", ["value"],
                   tolerance_us=60_000_000).collect()[0]
    assert ok.asof_event_id == 0
    stale = asof_join(buys, clicks, "user_id", "ts", "event_id",
                      ["value"], tolerance_us=10_000_000).collect()[0]
    assert stale.asof_event_id is None and stale.asof_lag_us is None


def test_matches_pandas_merge_asof_on_real_events(spark):
    import pandas as pd

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    buys = e.filter("event_type = 'purchase'") \
        .select("event_id", "ts", "user_id", "value")
    clicks = e.filter("event_type = 'click'") \
        .select("event_id", "ts", "user_id", "value")
    got = asof_join(buys, clicks, "user_id", "ts", "event_id",
                    ["value"]).toPandas() \
        .sort_values("event_id").reset_index(drop=True)

    bp = buys.toPandas().sort_values(["ts", "event_id"])
    cp = clicks.toPandas().sort_values(["ts", "event_id"])
    want = pd.merge_asof(bp, cp, on="ts", by="user_id",
                         suffixes=("", "_c"), direction="backward") \
        .sort_values("event_id").reset_index(drop=True)
    assert (got["asof_event_id"].isna().to_numpy()
            == want["event_id_c"].isna().to_numpy()).all()
    m = ~got["asof_event_id"].isna().to_numpy()
    assert (got["asof_event_id"].to_numpy()[m]
            == want["event_id_c"].to_numpy()[m]).all()
    assert (got["asof_value"].to_numpy()[m]
            == want["value_c"].to_numpy()[m]).all()


def test_null_ts_and_null_key_never_match(spark):
    from datetime import datetime as dt

    import pandas as pd

    clicks = spark.createDataFrame(pd.DataFrame({
        "event_id": [0, 1], "ts": [pd.NaT, pd.Timestamp("2024-01-01")],
        "user_id": [1.0, None], "value": [1.0, 2.0]}),
        "event_id long, ts timestamp, user_id long, value double")
    buys = spark.createDataFrame(
        [(10, dt(2024, 1, 2), 1, 5.0), (11, dt(2024, 1, 2), None, 6.0)],
        "event_id long, ts timestamp, user_id long, value double")
    out = {r.event_id: r for r in
           asof_join(buys, clicks, "user_id", "ts", "event_id",
                     ["value"]).collect()}
    # click 0 has NULL ts, click 1 has NULL user: neither may match;
    # buy 11 has NULL user: no match either
    assert out[10].asof_event_id is None
    assert out[11].asof_event_id is None


def test_skew_bucketed_equals_unchunked_on_real_events(spark):
    # the chunked (hot-key-safe) window must return EXACTLY the
    # unchunked result — exercised at bucket widths from "every row
    # its own bucket" to "one bucket holds everything", with and
    # without tolerance
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    buys = e.filter("event_type = 'purchase'") \
        .select("event_id", "ts", "user_id", "value")
    clicks = e.filter("event_type = 'click'") \
        .select("event_id", "ts", "user_id", "value")

    def rows(**kw):
        return sorted(
            tuple(r) for r in
            asof_join(buys, clicks, "user_id", "ts", "event_id",
                      ["value"], **kw).collect())

    base = rows()
    for bucket in (1, 3_600_000_000, 86_400_000_000 * 365):
        assert rows(skew_bucket_us=bucket) == base, f"bucket={bucket}"
    tol = rows(tolerance_us=3_600_000_000)
    assert rows(tolerance_us=3_600_000_000,
                skew_bucket_us=600_000_000) == tol


def test_skew_bucketed_handles_nulls_and_boundaries(spark):
    from datetime import datetime as dt

    import pandas as pd

    clicks = spark.createDataFrame(pd.DataFrame({
        "event_id": [0, 1, 2], "ts": [pd.NaT, pd.Timestamp("2024-01-01"),
                                      pd.Timestamp("2024-01-03")],
        "user_id": [1.0, 1.0, 1.0], "value": [1.0, 2.0, 3.0]}),
        "event_id long, ts timestamp, user_id long, value double")
    buys = spark.createDataFrame(
        [(10, dt(2024, 1, 2), 1, 5.0),      # bucket with NO click:
         (11, dt(2024, 1, 4), 1, 6.0),      # carry crosses empty bucket
         (12, None, 1, 7.0)],               # NULL ts: never matches
        "event_id long, ts timestamp, user_id long, value double")
    out = {r.event_id: r for r in
           asof_join(buys, clicks, "user_id", "ts", "event_id",
                     ["value"],
                     skew_bucket_us=86_400_000_000).collect()}
    assert out[10].asof_event_id == 1       # carried from prior bucket
    assert out[11].asof_event_id == 2
    assert out[12].asof_event_id is None and out[12].asof_lag_us is None


def test_skew_bucket_validation(spark):
    import pytest

    good = _ev(spark, [(0, 10, 1, 1.0)])
    with pytest.raises(ValueError, match="skew_bucket_us"):
        asof_join(good, good, "user_id", "ts", "event_id", ["value"],
                  skew_bucket_us=0)


def test_validation_rejects_bad_inputs(spark):
    import pytest

    ints = spark.createDataFrame([(0, 10, 1, 1.0)],
                                 "event_id long, ts long, user_id long,"
                                 " value double")
    good = _ev(spark, [(0, 10, 1, 1.0)])
    with pytest.raises(ValueError, match="timestamp"):
        asof_join(ints, ints, "user_id", "ts", "event_id", ["value"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(good.withColumnRenamed("value", "asof_lag_us"),
                  good, "user_id", "ts", "event_id", ["value"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(good, good, "user_id", "ts", "event_id",
                  ["event_id"])


# ---------------- dialog integrity ----------------

def test_dialog_integrity_hand_cases(spark):
    from vision_parse_spark.operators.temporal import dialog_integrity

    t = spark.createDataFrame(
        [("X", 0, "user"), ("X", 1, "assistant"), ("X", 2, "user"),
         ("Y", 0, "assistant"), ("Y", 1, "assistant"),
         ("Z", 0, "user"), ("Z", 1, "user"), ("Z", 2, "user")],
        "conv_id string, turn_idx int, role string")
    got = {r.conv_id: r for r in dialog_integrity(t).collect()}
    assert (got["X"].n_turns, got["X"].starts_ok,
            got["X"].n_violations, got["X"].alternation_ok) == (3, 1, 0, 1)
    assert (got["Y"].starts_ok, got["Y"].n_violations,
            got["Y"].alternation_ok) == (0, 1, 0)
    assert (got["Z"].starts_ok, got["Z"].n_violations) == (1, 2)


def test_dialog_integrity_order_by_turn_not_input(spark):
    from vision_parse_spark.operators.temporal import dialog_integrity

    # rows arrive shuffled; sequence semantics must follow turn_idx
    t = spark.createDataFrame(
        [("C", 2, "user"), ("C", 0, "user"), ("C", 1, "assistant")],
        "conv_id string, turn_idx int, role string").repartition(7)
    r = dialog_integrity(t).collect()[0]
    assert (r.starts_ok, r.n_violations) == (1, 0)


def test_dialog_integrity_custom_first_role(spark):
    from vision_parse_spark.operators.temporal import dialog_integrity

    t = spark.createDataFrame([("C", 0, "system")],
                              "conv_id string, turn_idx int, role string")
    r = dialog_integrity(t, first_role="system").collect()[0]
    assert r.starts_ok == 1


# ---------------- burst detection ----------------

def test_burst_detection_flags_the_spike(spark):
    from vision_parse_spark.operators.temporal import burst_detection
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    # single-spike z among K buckets caps at sqrt(K-1): K=10 gives
    # exactly 3.0 (not > threshold) — use K=20 so the spike clears it
    for h in range(20):
        n = 200 if h == 5 else 10          # hour 5 is a 20x burst
        rows += [(base + dt.timedelta(hours=h, seconds=i),)
                 for i in range(n)]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = {r.bucket_start: r for r in burst_detection(df).collect()}
    assert len(got) == 20
    bursts = [r for r in got.values() if r.is_burst]
    assert len(bursts) == 1 and bursts[0].n_events == 200
    # z of the spike: exact-int stats replayed in python
    import math
    ns = [10] * 20
    ns[5] = 200
    mean = sum(ns) / 20
    var = (sum(n * n for n in ns) - sum(ns) ** 2 / 20) / 20
    assert bursts[0].z == round((200 - mean) / math.sqrt(var), 4)


def test_burst_detection_constant_stream_and_validation(spark):
    from vision_parse_spark.operators.temporal import burst_detection
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(base + dt.timedelta(hours=h),) for h in range(4)]
        + [(None,)], "ts timestamp")
    out = burst_detection(df).collect()
    assert len(out) == 4                    # NULL ts dropped
    assert all(r.z is None and r.is_burst == 0 for r in out)
    import pytest as _pt
    with _pt.raises(ValueError, match="bucket_seconds"):
        burst_detection(df, bucket_seconds=0)
