"""PII scrubbing: planted PII must go, clean text must be untouched."""

from pyspark.sql import functions as F

from vision_parse_spark.functions.scrub import scrub_pii


def _one(spark, text):
    df = spark.createDataFrame([(text,)], ["text"])
    return scrub_pii(df).first().text


def test_email_redacted(spark):
    assert _one(spark, "contact jane.doe+spam@sub.example.co for info") \
        == "contact <EMAIL> for info"


def test_ipv4_redacted(spark):
    assert _one(spark, "served from 192.168.001.17 port 8080") \
        == "served from <IP> port 8080"


def test_phone_shaped_redacted(spark):
    assert _one(spark, "call +1 (555) 123-4567 today") == "call <NUMBER> today"
    assert _one(spark, "ref 4111 1111 1111 1111 card") == "ref <NUMBER> card"


def test_token_redacted(spark):
    assert _one(spark, "use key sk-AbC123xyzAbC123xyz456 here") \
        == "use key <TOKEN> here"


def test_clean_text_untouched(spark):
    clean = ("The quick brown fox. Version 2.1 shipped in 2026 with "
             "4 fixes and a 3.5x speedup.")
    assert _one(spark, clean) == clean


def test_plan_is_single_project(spark):
    """The rule chain fuses into a narrow Project — no Exchange, no
    Python stage."""
    import io
    from contextlib import redirect_stdout

    df = spark.createDataFrame([("x",)], ["text"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        scrub_pii(df).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_scrub_matches_duckdb_semantics(spark):
    """Cross-engine replay: the same rule chain in DuckDB's RE2
    produces the identical scrubbed strings on adversarial inputs —
    the property that makes the transform portable."""
    import duckdb

    from vision_parse_spark.functions.scrub import PII_RULES

    rows = [
        "jane.doe+spam@sub.example.co then 10.0.0.1 then +1 555-123-4567",
        "no pii here, just 3.5x and v2.1",
        "sk-AbC123xyzAbC123xyz456 and a@b.io and 255.255.255.255",
        "edge +123456 7 and 1234567 and (555) 5555555",
    ]
    df = spark.createDataFrame([(t,) for t in rows], ["text"])
    got_spark = [r.text for r in scrub_pii(df).collect()]
    con = duckdb.connect()
    got_duck = []
    for t in rows:
        expr = "?"
        params = [t]
        sql = "SELECT "
        e = "t"
        con.execute("CREATE OR REPLACE TABLE x AS SELECT ? AS t", [t])
        e = "t"
        for pattern, repl in PII_RULES:
            e = f"regexp_replace({e}, '{pattern}', '{repl}', 'g')"
        got_duck.append(con.execute(f"SELECT {e} FROM x").fetchone()[0])
    assert got_spark == got_duck
