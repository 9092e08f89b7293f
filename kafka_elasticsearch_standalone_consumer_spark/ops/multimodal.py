"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Real pipelines carry image/audio/video as binary columns and run decode /
feature-extract / resize / frame-sample in Arrow-batched Python kernels.
The media libraries are not in this container, so the *decode* step is a
seam: ``decoder="stub"`` raises NotImplementedError (plug Pillow/ffmpeg in
production), ``decoder="fake"`` is a deterministic pure-NumPy fake used by
tests and benchmarks. Everything around the seam — schema, Arrow batch
shape, partition sizing, UDF signatures — is real Spark plumbing and is
what actually matters at 100 TB: media rows are huge, so the kernels are
``mapInPandas`` (streaming batches, no grouping shuffle) and batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, byte_hist array<int>"


def synth_media(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (counter-hashed bytes) for tests."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(int(i) + 12345)
                kind = ["image", "audio", "video"][int(i) % 3]
                size = 256 + int(i) % 1024
                rows.append(
                    (
                        int(i),
                        kind,
                        rng.integers(0, 256, size, dtype=np.uint8).tobytes(),
                        64 if kind == "image" else None,
                        48 if kind == "image" else None,
                        1000 + int(i) if kind != "image" else None,
                        {"image": "png", "audio": "pcm", "video": "h264"}[kind],
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
            )

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: bytes → uint8 'pixels'."""
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """payload → per-item features (byte histogram as the stand-in for an
    embedding). ``decoder='stub'`` marks where Pillow/torchaudio/ffmpeg
    plug in; the Spark-side batching/schema is identical either way."""

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            feats = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if decoder == "stub":
                    raise NotImplementedError(
                        "media decode requires Pillow/ffmpeg — not in this container; "
                        "use decoder='fake' for the deterministic test path"
                    )
                px = _fake_decode(bytes(payload))
                hist = np.bincount(px >> 4, minlength=16).astype(np.int32)
                feats.append((int(mid), str(kind), int(px.size), hist.tolist()))
            yield pd.DataFrame(feats, columns=["media_id", "kind", "n_bytes", "byte_hist"])

    return df.mapInPandas(kernel, schema="media_id long, kind string, n_bytes int, byte_hist array<int>")


def resize_images(df: DataFrame, out_w: int = 16, decoder: str = "fake") -> DataFrame:
    """Image 'resize': the fake path block-averages the byte stream to a
    fixed width — exercising the real concern (binary in, binary out,
    bounded batch memory) without a codec library."""

    def kernel(batches):
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if not len(pdf):
                continue
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if decoder == "stub":
                    raise NotImplementedError("real resize needs Pillow; use decoder='fake'")
                px = _fake_decode(bytes(payload)).astype(np.float64)
                n = (px.size // out_w) * out_w
                small = px[:n].reshape(out_w, -1).mean(axis=1).astype(np.uint8)
                out.append((int(mid), small.tobytes()))
            yield pd.DataFrame(out, columns=["media_id", "thumb"])

    return df.mapInPandas(kernel, schema="media_id long, thumb binary")


def sample_frames(df: DataFrame, every_ms: int = 250, decoder: str = "fake") -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    (posexplode shape), frame payload = deterministic slice of the stream."""

    def kernel(batches):
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            if not len(pdf):
                continue
            rows = []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                if decoder == "stub":
                    raise NotImplementedError("real frame sampling needs ffmpeg; use decoder='fake'")
                buf = bytes(payload)
                n_frames = max(int(dur) // every_ms, 1)
                step = max(len(buf) // n_frames, 1)
                for fi in range(n_frames):
                    rows.append((int(mid), fi, fi * every_ms, buf[fi * step : fi * step + 16]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "t_ms", "frame"])

    return df.mapInPandas(kernel, schema="media_id long, frame_idx int, t_ms int, frame binary")
