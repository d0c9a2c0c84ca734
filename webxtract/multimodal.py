"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schemas, magic-byte sniffing, Arrow batch
shape, mapInPandas signatures, partitioning by media kind) is real and
tested; the actual decode/feature kernels are STUBBED behind
deterministic fakes because the codec libraries (Pillow/ffmpeg/...)
are not in this container — mirroring the reference's own
``is_available()`` capability probes (image_ocr.py:82-88).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

# magic-byte signatures (operator S2's sniffing, ocr.py:250-273,
# generalized beyond images)
MAGIC = {
    "png": b"\x89PNG\r\n\x1a\n",
    "jpeg": b"\xff\xd8\xff",
    "gif": b"GIF8",
    "bmp": b"BM",
    "webp_riff": b"RIFF",
    "tiff_le": b"II*\x00",
    "tiff_be": b"MM\x00*",
    "pdf": b"%PDF-",
    "wav_riff": b"RIFF",
    "mp3": b"ID3",
    "mp4_ftyp": b"ftyp",  # at offset 4
}

MEDIA_META_TYPE = StructType(
    [
        StructField("media_kind", StringType(), True),   # image|audio|video|unknown
        StructField("format", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),       # stub: -1
        StructField("height", IntegerType(), True),      # stub: -1
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("media_kind", StringType(), True),
        StructField("feature", BinaryType(), True),      # stub: digest bytes
        StructField("n_bytes", LongType(), True),
    ]
)


def sniff_media_expr(payload_col: str = "payload"):
    """Pure-expression magic-byte format sniff (no Python)."""
    c = F.col(payload_col)
    head = F.substring(c, 1, 8)

    def starts(sig: bytes):
        return F.substring(c, 1, len(sig)) == F.lit(sig)

    fmt = (
        F.when(starts(MAGIC["png"]), "png")
        .when(starts(MAGIC["jpeg"]), "jpeg")
        .when(starts(MAGIC["gif"]), "gif")
        .when(starts(MAGIC["tiff_le"]) | starts(MAGIC["tiff_be"]), "tiff")
        .when(starts(MAGIC["pdf"]), "pdf")
        .when(starts(MAGIC["mp3"]), "mp3")
        .when(
            starts(MAGIC["wav_riff"]) & (F.substring(c, 9, 4) == F.lit(b"WAVE")),
            "wav",
        )
        .when(
            starts(MAGIC["wav_riff"]) & (F.substring(c, 9, 4) == F.lit(b"WEBP")),
            "webp",
        )
        .when(F.substring(c, 5, 4) == F.lit(b"ftyp"), "mp4")
        .when(starts(MAGIC["bmp"]), "bmp")
        .otherwise("unknown")
    )
    kind = (
        F.when(fmt.isin("png", "jpeg", "gif", "tiff", "webp", "bmp"), "image")
        .when(fmt.isin("wav", "mp3"), "audio")
        .when(fmt == "mp4", "video")
        .when(fmt == "pdf", "document")
        .otherwise("unknown")
    )
    return F.struct(
        kind.alias("media_kind"),
        fmt.alias("format"),
        F.coalesce(F.length(c).cast("long"), F.lit(0)).alias("n_bytes"),
        F.lit(-1).alias("width"),
        F.lit(-1).alias("height"),
    )


def _decode_stub(payload: bytes) -> bytes:
    """STUB decode/feature-extract kernel. A real deployment drops in
    Pillow/torchvision/ffmpeg here; the sandbox uses a deterministic
    digest so the batch shape, schema and partitioning are exercised
    end-to-end. Raises for genuinely undecodable (empty) payloads the
    way a real decoder would."""
    if not payload:
        raise ValueError("empty media payload")
    import hashlib

    return hashlib.sha256(payload).digest()[:16]


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary media -> fixed-size feature rows via mapInPandas (Arrow
    batches; one in-flight batch per task, iterator init pattern)."""
    meta = sniff_media_expr(payload_col)
    src = df.select("url", F.col(payload_col).alias("payload"), meta.alias("meta"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            feats = []
            for payload in b["payload"]:
                try:
                    feats.append(_decode_stub(bytes(payload) if payload is not None else b""))
                except ValueError:
                    feats.append(None)
            yield pd.DataFrame(
                {
                    "url": b["url"],
                    "media_kind": [m["media_kind"] for m in b["meta"]],
                    "feature": feats,
                    "n_bytes": [m["n_bytes"] for m in b["meta"]],
                }
            )

    return src.mapInPandas(batches, schema=FEATURE_SCHEMA)
