"""Access-log transform pack — the reference's ``transformMessage`` surface
re-expressed as pure Column expressions (SURVEY §2.2 P1–P10).

The reference's only per-row "query" is the access-log parse in
``messageHandlers/AccessLogMessageHandler.java:45-131``: split a raw
pipe-separated line, trim/upper tokens, branch on GET/POST, parse ints
(failures → failed-events log, reference ``MessageHandler.java:127-134``),
parse+reformat the bracketed date (``AccessLogMessageHandler.java:79-86``),
and serialize to a JSON document (``:130``). Here every piece is a
Catalyst Column expression — whole-stage codegen, no Python in the row
path — and bad rows become a quarantine DataFrame instead of a log file
(same skip-bad-rows, at-least-once semantics as the reference's
``FailedEventsLogger.java:10-25``).

Line format (documented, pinned — the reference's positional contract):

    ip|protocol|session|[dd/MMM/yyyy:HH:mm:ss]|METHOD url|code|millis|server.instance|payload
     0    1        2            3                  4        5    6         7             8
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_FIELDS = 9
DATE_IN_FMT = "dd/MMM/yyyy:HH:mm:ss"
# P6: the reference emits yyyy-MM-dd'T'HH:mm:ss.SSSZ
# (``AccessLogMessageHandler.java:19-22,86``). Two DELIBERATE deviations:
# (a) the zone offset renders against the pinned session timezone
#     (session.py sets UTC → "+0000"); the reference formats in the JVM
#     default zone (Europe/London → "+0100" during DST) — pinning keeps
#     output cluster-independent;
# (b) the reference PARSES with 12-hour ``hh`` against log timestamps
#     that carry no am/pm marker (``AccessLogMessageHandler.java:19-20``)
#     — arguably a reference bug (13:00 fails to parse there); we parse
#     24-hour ``HH`` (DATE_IN_FMT above).
DATE_OUT_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSZ"


def decode_text(c: Column, encoding: str = "UTF-8") -> Column:
    """P10 charset decode: opaque ``byte[]`` payload → string with a
    configurable encoding — the reference decodes the raw Kafka payload
    with ConsumerConfig's charset (``AccessLogMessageHandler.java:41``,
    ``ConsumerConfig.java:52-53,133``).

    Try-semantics for UTF-8: an invalid byte sequence yields NULL (the
    caller quarantines it) instead of an ANSI MALFORMED_CHARACTER_CODING
    error — the reference caught the per-row exception and routed the
    event to the failed-events log. Single-byte charsets (ISO-8859-x)
    cannot fail by construction and go through ``decode`` directly.
    """
    if encoding.replace("-", "").replace("_", "").upper() == "UTF8":
        return F.try_validate_utf8(c.cast("string"))
    return F.decode(c, encoding)


def _fld(arr: Column, i: int) -> Column:
    """P1 projection: positional field extraction, trimmed (P3).

    ``try_element_at``: a structurally short line yields NULLs (quarantined
    later) instead of ANSI out-of-bounds errors — the reference's behavior
    of catching the per-row exception and logging the failed event.
    """
    return F.trim(F.try_element_at(arr, F.lit(i + 1)))


def parse_access_log(
    df: DataFrame,
    line_col: str = "raw",
    keep: tuple[str, ...] = (),
    encoding: str = "UTF-8",
) -> DataFrame:
    """Raw line column → typed access-log document (P1–P7, P10).

    A ``BinaryType`` line column is charset-decoded first (P10,
    :func:`decode_text` with ``encoding``); a failed decode NULLs the row,
    which :func:`is_valid` routes to quarantine — the reference's
    failed-events path for undecodable payloads. Unparseable ints become
    NULL (P5: ``cast`` is null-on-failure where the reference's
    ``Integer.parseInt`` threw); callers split the quarantine with
    :func:`split_quarantine`. ``keep`` columns (e.g. a source offset, the
    reference's Kafka metadata P7) pass through unchanged.
    """
    if isinstance(df.schema[line_col].dataType, T.BinaryType):
        df = df.withColumn(line_col, decode_text(F.col(line_col), encoding))
    arr = F.split(F.col(line_col), r"\|")  # P1: split on the field separator
    method_url = F.upper(_fld(arr, 4))  # P3: trim + upper
    method = F.when(method_url.contains("GET"), F.lit("GET")).when(
        method_url.contains("POST"), F.lit("POST")
    )  # P2: dispatch predicate — neither → NULL method (reference keeps ip/protocol/raw only)
    server_and_instance = _fld(arr, 7)
    # P3 nested split: "server.instance-name" → server, instance
    server = F.try_element_at(F.split(server_and_instance, r"\."), F.lit(1))
    instance = F.try_element_at(
        F.split(F.try_element_at(F.split(server_and_instance, r"\."), F.lit(2)), "-"), F.lit(1)
    )
    # P4 regex strip of the bracket + P6 date parse & reformat
    ts_raw = F.regexp_replace(F.regexp_replace(_fld(arr, 3), r"\[", ""), r"\]", "")
    ts = F.try_to_timestamp(ts_raw, F.lit(DATE_IN_FMT))
    return df.select(
        *[F.col(c) for c in keep],
        F.col(line_col).alias("raw_message"),  # P7: carry raw message like the reference
        F.size(arr).alias("n_fields"),
        _fld(arr, 0).alias("ip"),
        _fld(arr, 1).alias("protocol"),
        _fld(arr, 2).alias("session_id"),
        ts.alias("ts"),
        F.date_format(ts, DATE_OUT_FMT).alias("time_stamp"),  # P6 reformat
        method.alias("method"),
        F.when(method.isNotNull(), F.try_element_at(F.split(method_url, " "), F.lit(-1))).alias("url"),
        _fld(arr, 5).try_cast("int").alias("response_code"),  # P5 null-on-failure cast
        _fld(arr, 6).try_cast("int").alias("response_time"),
        server.alias("server_name"),
        instance.alias("instance"),
        F.concat_ws("_", server, instance).alias("server_and_instance"),  # P3 concat
        _fld(arr, 8).alias("payload"),
    )


def is_valid(parsed: DataFrame) -> Column:
    """A row is quarantined when structurally short or when a typed field
    failed to parse — the conditions that threw in the reference handler."""
    return (
        (F.col("n_fields") >= N_FIELDS)
        & F.col("ts").isNotNull()
        & F.col("response_code").isNotNull()
        & F.col("response_time").isNotNull()
    )


def split_quarantine(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad) — the reference's skip-bad-rows path (S7): bad rows go to
    the ``_errors`` side table, the good batch proceeds and still commits."""
    ok = is_valid(parsed)
    return parsed.filter(ok).drop("n_fields"), parsed.filter(~ok).drop("n_fields")


def to_json_doc(parsed: DataFrame, cols: tuple[str, ...] = ("ip", "method", "url", "response_code")) -> DataFrame:
    """P8: row → JSON document string (the reference's Jackson serialize,
    ``AccessLogMessageHandler.java:130``) plus the inverse extract."""
    doc = F.to_json(F.struct(*[F.col(c) for c in cols]))
    return parsed.withColumn("doc", doc)


def route_index(
    df: DataFrame,
    by: Column,
    prefix: str = "idx",
    type_by: Column | None = None,
    default_type: str = "doc",
) -> DataFrame:
    """S6 index routing: data-dependent target index as a partition column
    (reference ``IndexHandler.java:22-23`` / ``BasicIndexHandler.java:29-37``
    — ``getIndexName()`` AND ``getIndexType()``: ES routed documents on the
    (index, type) pair, so ``type_by`` optionally derives the type from a
    column, defaulting to a fixed type like the reference's config default);
    write with ``.partitionBy("index_name", "type_name")`` for per-target
    files."""
    out = df.withColumn("index_name", F.concat_ws("_", F.lit(prefix), by))
    return out.withColumn(
        "type_name", type_by if type_by is not None else F.lit(default_type)
    )
