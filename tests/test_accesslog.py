"""Transform-pack tests (SURVEY §2.2 P1–P10, §2.1 S6/S7)."""

from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.functions.accesslog import (
    parse_access_log,
    route_index,
    split_quarantine,
    to_json_doc,
)

GOOD = "192.168.0.1 |HTTP/1.1| sess-9 |[03/Feb/2026:10:20:30]| GET /api/users |200| 42 |web1.inst3-a| p=1"
POST = "10.0.0.2|HTTP/1.0|sess-1|[15/Aug/2026:23:59:59]|post /api/orders|503|7|app2.inst0-b|x"
BAD_CODE = "10.0.0.3|HTTP/1.1|s|[03/Feb/2026:00:00:00]|GET /z|XX|5|w.i-c|y"
SHORT = "only|three|fields"


def _parse(spark, lines):
    df = spark.createDataFrame([(i, l) for i, l in enumerate(lines)], "id long, raw string")
    return parse_access_log(df, "raw", keep=("id",))


def test_parse_fields(spark):
    row = _parse(spark, [GOOD]).collect()[0]
    assert row["ip"] == "192.168.0.1"
    assert row["protocol"] == "HTTP/1.1"
    assert row["session_id"] == "sess-9"
    # reference format yyyy-MM-dd'T'HH:mm:ss.SSSZ under the pinned UTC zone
    assert row["time_stamp"] == "2026-02-03T10:20:30.000+0000"
    assert row["method"] == "GET"
    assert row["url"] == "/API/USERS"
    assert row["response_code"] == 200 and row["response_time"] == 42
    assert row["server_name"] == "web1"
    assert row["instance"] == "inst3"
    assert row["server_and_instance"] == "web1_inst3"
    assert row["raw_message"] == GOOD


def test_parse_post_lowercase_method(spark):
    row = _parse(spark, [POST]).collect()[0]
    assert row["method"] == "POST" and row["response_code"] == 503


def test_quarantine_split(spark):
    parsed = _parse(spark, [GOOD, POST, BAD_CODE, SHORT])
    good, bad = split_quarantine(parsed)
    assert good.count() == 2
    bad_ids = {r["id"] for r in bad.collect()}
    assert bad_ids == {2, 3}  # unparseable int; structurally short


def test_json_doc_roundtrip(spark):
    parsed, _ = split_quarantine(_parse(spark, [GOOD]))
    doc = to_json_doc(parsed).collect()[0]["doc"]
    assert '"method":"GET"' in doc and '"response_code":200' in doc


def test_route_index(spark):
    df = spark.createDataFrame([("a", "en"), ("b", "fr")], "id string, lang string")
    out = route_index(df, F.col("lang"), prefix="docs")
    assert {r["index_name"] for r in out.collect()} == {"docs_en", "docs_fr"}


def test_binary_payload_decode_and_quarantine(spark):
    """P10: byte[] payloads are charset-decoded before parsing; an invalid
    UTF-8 sequence quarantines the row (reference decodes with a
    configurable charset and failed events go to the side log)."""
    rows = [
        (0, GOOD.encode("utf-8")),
        (1, POST.encode("utf-8")),
        (2, GOOD.encode("utf-8") + b"\xff\xfe"),  # invalid UTF-8 trailer
    ]
    df = spark.createDataFrame(rows, "id long, raw binary")
    good, bad = split_quarantine(parse_access_log(df, "raw", keep=("id",)))
    assert {r["id"] for r in good.collect()} == {0, 1}
    assert {r["id"] for r in bad.collect()} == {2}
    # a single-byte charset decodes any byte sequence (never quarantined
    # for decode reasons) — latin-1 bytes of the same line parse fine
    df2 = spark.createDataFrame([(0, GOOD.encode("latin-1"))], "id long, raw binary")
    good2, _ = split_quarantine(parse_access_log(df2, "raw", encoding="ISO-8859-1"))
    assert good2.count() == 1
