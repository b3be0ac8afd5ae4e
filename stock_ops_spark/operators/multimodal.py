"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (100 TB posture): media bytes ride in a ``BinaryType`` column next
to a metadata struct (modality, mime, width/height/duration, …).  Parquet
stores binary chunks row-grouped with the metadata, so predicate pushdown
on metadata prunes row groups WITHOUT touching the bytes, and column
pruning means metadata-only queries never read the blobs at all.

Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` — the
schema, batch shape and partitioning are real; the codec call itself is
STUBBED (no image/audio libs in this container): ``decode_stub`` derives
deterministic fake features from the bytes, and raises NotImplementedError
when ``strict=True`` to mark where a real codec (PIL/torchaudio/ffmpeg)
plugs in.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.MapType(T.StringType(), T.StringType()),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def media_from_text(df: DataFrame, id_col: str, text_col: str, modality: str) -> DataFrame:
    """Build a MEDIA_SCHEMA frame from a text corpus (test fixture path:
    deterministic 'fake media' bytes = utf-8 payload)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit(f"application/x-fake-{modality}").alias("mime"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("origin"), F.lit("text-fixture"),
            F.lit("codec"), F.lit("none"),
        ).alias("meta"),
    )


def _decoder(dim: int):
    """Build the decode function as a NESTED closure so cloudpickle ships
    it by value: the mapInPandas workers then need no import of this repo
    (a driver process running from an arbitrary cwd would otherwise hit
    ModuleNotFoundError in the Python worker)."""

    def decode(payload: bytes) -> list[float] | None:
        if payload is None:
            return None
        acc = [0] * dim
        for i, b in enumerate(payload):
            acc[i % dim] = (acc[i % dim] * 31 + b) % 65521
        return [v / 65521.0 for v in acc]

    return decode


def decode_stub(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature vector from raw bytes.

    STUB for the real codec step — replace with PIL/librosa/ffmpeg frame
    sampling in a real deployment.  Keeps a stable contract: fixed dim,
    reproducible values.
    """
    return _decoder(dim)(payload)


def extract_features(
    media: DataFrame, dim: int = 8, batch_size: int = 1024, strict: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over the media frame.

    ``mapInPandas`` streams record batches through Python — the blobs never
    collect on the driver, and partitioning is preserved (scale by
    repartitioning upstream on media_id).
    """
    decode = _decoder(dim)  # by-value closure: workers need no repo import

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decoding requires codec libraries "
                    "(PIL/torchaudio/ffmpeg) not present in this environment"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "feature": pdf["payload"].map(decode),
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_ms", T.LongType(), True),
        T.StructField("frame_bytes", T.BinaryType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    dim: int = 8,
    strict: bool = False,
) -> DataFrame:
    """Frame sampling: 1 video row → N frame rows via ``mapInPandas``.

    The output-cardinality-change shape is what matters at scale: the
    iterator contract lets one input batch yield any number of output
    batches of any size.  Frames are emitted one pandas frame per INPUT
    batch (cheap); for GB-sized payloads a decoder would flush every few
    rows instead so the expansion never materializes at once — the same
    contract, different flush granularity.

    The decoder is the declared stub (no ffmpeg in this container):
    "frames" are deterministic byte slices of the payload at
    ``every_ms`` spacing, each with a decode_stub feature — the schema,
    timing metadata, and expansion plumbing are the real contract a
    ffmpeg-backed decoder drops into.
    """
    decode = _decoder(dim)  # by-value closure: workers need no repo import

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real frame decoding requires ffmpeg/pyav, absent here"
                )
            # accumulate the whole input batch into ONE output frame —
            # orders of magnitude cheaper than a pandas frame per row.
            # (For truly huge payloads — GB videos — flush every few rows
            # instead; the iterator contract supports either.)
            ids, idxs, mss, fbs, feats = [], [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                # fake "duration": 1 ms per payload byte
                n = min(max_frames, max(1, len(payload) // every_ms))
                step = max(1, len(payload) // n)
                for i in range(n):
                    fb = payload[i * step : (i + 1) * step]
                    ids.append(media_id)
                    idxs.append(i)
                    mss.append(i * step)
                    fbs.append(fb)
                    feats.append(decode(fb))
            if ids:
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "frame_idx": idxs,
                        "frame_ms": mss,
                        "frame_bytes": fbs,
                        "feature": feats,
                    }
                )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def metadata_only_stats(media: DataFrame) -> DataFrame:
    """Blob-size accounting per modality.  (Reads payload lengths; a pure
    metadata query — count/meta only — would prune the binary column out of
    the parquet scan entirely.)"""
    return media.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
    )
