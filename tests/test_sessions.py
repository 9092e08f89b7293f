"""Inactivity-gap sessionization: session boundaries, tie-breaking, and
the per-session rollup must match a brute recompute on hand-built events
with known session structure."""

from __future__ import annotations

import datetime as dt

from kafka_elasticsearch_standalone_consumer_spark.ops.sessions import (
    session_stats,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), u) for i, s, u in rows],
        "event_id long, ts timestamp, user_id long",
    )


def test_session_boundaries_and_rollup(spark):
    # user 1: events at 0s, 100s, 4000s (gap 3900 > 3600 -> new session),
    #         4100s; user 2: one event; user 3: two events exactly gap
    #         apart (3600 is NOT > 3600 -> same session)
    rows = [
        (0, 0, 1), (1, 100, 1), (2, 4000, 1), (3, 4100, 1),
        (4, 50, 2),
        (5, 0, 3), (6, 3600, 3),
    ]
    ev = _mk(spark, rows)
    got = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in sessionize(ev, gap_s=3600).collect()
    }
    assert got == {
        (1, 0): 1, (1, 1): 1, (1, 2): 2, (1, 3): 2,
        (2, 4): 1,
        (3, 5): 1, (3, 6): 1,
    }
    stats = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_s"])
        for r in session_stats(ev, gap_s=3600).collect()
    }
    assert stats == {
        (1, 1): (2, 100), (1, 2): (2, 100),
        (2, 1): (1, 0),
        (3, 1): (2, 3600),
    }


def test_session_timestamp_ties_break_on_id(spark):
    rows = [(10, 0, 7), (3, 0, 7), (5, 5000, 7)]
    ev = _mk(spark, rows)
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(ev, gap_s=3600).collect()
    }
    # ids 3 and 10 share ts: id order makes 3 the session opener; the
    # 5000s event starts session 2 regardless
    assert got == {3: 1, 10: 1, 5: 2}


def test_session_subsecond_gap_is_integer_exact(spark):
    # 3600.000001 s is strictly over the gap; 3600.000000 is not
    ev = spark.createDataFrame(
        [
            (0, T0, 1),
            (1, T0 + dt.timedelta(seconds=3600, microseconds=1), 1),
            (2, T0, 2),
            (3, T0 + dt.timedelta(seconds=3600), 2),
        ],
        "event_id long, ts timestamp, user_id long",
    )
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(ev, gap_s=3600).collect()
    }
    assert got == {0: 1, 1: 2, 2: 1, 3: 1}


def test_turn_contexts_matches_pandas_on_transcripts(spark):
    """Context assembly over a real transcript corpus == a sequential
    pandas reference: per conv, each turn's context is the '\\n'-join of
    the previous 2 turn texts plus its own, in turn order."""
    from kafka_elasticsearch_standalone_consumer_spark.corpus import (
        generate_transcripts,
    )
    from kafka_elasticsearch_standalone_consumer_spark.ops.sessions import (
        turn_contexts,
    )

    tr = generate_transcripts(spark, n_convs=6, seed=9, partitions=2)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["n_ctx"], r["context"])
        for r in turn_contexts(tr, k_prev=2, sep="\n").collect()
    }
    pdf = tr.select("conv_id", "turn_idx", "text").toPandas()
    want = {}
    for conv, g in pdf.groupby("conv_id"):
        texts = g.sort_values("turn_idx")
        rows = list(zip(texts["turn_idx"], texts["text"]))
        for i, (ti, _t) in enumerate(rows):
            frame = [t for _, t in rows[max(0, i - 2) : i + 1]]
            want[(conv, ti)] = (len(frame), "\n".join(frame))
    assert got == want


def test_turn_contexts_frame_is_bounded_by_k_prev(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.sessions import (
        turn_contexts,
    )

    df = spark.createDataFrame(
        [("c", i, f"t{i}") for i in range(5)],
        "conv_id string, turn_idx int, text string",
    )
    out = {r["turn_idx"]: r for r in turn_contexts(df, k_prev=3).collect()}
    assert out[0]["context"] == "t0" and out[0]["n_ctx"] == 1
    assert out[4]["context"] == "t1\nt2\nt3\nt4" and out[4]["n_ctx"] == 4
