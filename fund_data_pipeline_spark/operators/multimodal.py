"""Multimodal column plumbing: binary payloads + typed metadata at scale.

Media (image / audio / video) rides through the engine as an opaque
``binary`` column plus a typed metadata struct — the payload is never
interpreted by Spark itself, so scans stay columnar and partition pruning /
column projection work exactly as for any other table. Decode and
feature-extraction run as Arrow-batched ``mapInPandas`` stages: one Python
worker per partition, one pandas batch per Arrow chunk, payload bytes never
touch the driver.

The actual codecs (Pillow / torchaudio / ffmpeg) are NOT in this container,
so the decode kernels are stubbed: if the real library imports, it is used;
otherwise a deterministic fake derived from the payload bytes keeps the
whole distributed path (schema, batch shape, partitioning, output contract)
real and testable. Swap ``_decode_image_stub`` for a real decoder and
nothing else changes.

Scale design (100 TB of media):
- payloads live in their own column => Parquet stores them as independent
  chunks; metadata-only queries never read the bytes (column pruning).
- ``repartition_for_decode`` bounds the bytes per task so a decode stage
  never OOMs an executor regardless of file-size skew.
- every kernel is ``Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]``:
  streaming per-batch, constant memory, no per-row Python overhead.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Resolve optional codec availability ONCE per interpreter: the decode
# stubs run per payload inside the Arrow kernels, and Python does NOT
# cache failed imports — probing PIL/soundfile per row made the import
# machinery (finder lookups + ImportError construction) the dominant
# kernel cost in library-absent environments (review r11).
try:  # pragma: no cover - depends on the environment
    from PIL import Image as _PIL_IMAGE  # type: ignore
except ImportError:
    _PIL_IMAGE = None
try:  # pragma: no cover - depends on the environment
    import soundfile as _SOUNDFILE  # type: ignore
except ImportError:
    _SOUNDFILE = None

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: canonical media-table schema: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("phash", T.StringType(), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)

#: soft cap on decoded bytes per task (tune to executor memory / core)
TARGET_BYTES_PER_TASK = 256 * 1024 * 1024


def attach_payload_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata: byte length + content hash, no Python.

    These two columns power exact-dup elimination and size-based routing
    without ever decoding — always compute them at ingest.
    """
    p = F.col(payload_col)
    return df.withColumn("n_bytes", F.octet_length(p).cast("long")).withColumn(
        "content_md5", F.md5(p)
    )


def repartition_for_decode(
    df: DataFrame,
    total_bytes: int | None = None,
    payload_col: str = "payload",
    target_bytes_per_task: int = TARGET_BYTES_PER_TASK,
) -> DataFrame:
    """Size the decode stage: ~``target_bytes_per_task`` of payload per task.

    ``total_bytes`` can be passed from table stats to avoid the extra
    aggregate job. Hash-distributing on media_id breaks up any file-size
    clustering in the source layout.
    """
    if total_bytes is None:
        total_bytes = (
            df.select(F.sum(F.octet_length(F.col(payload_col))).alias("b")).first()["b"] or 0
        )
    n = max(1, int(total_bytes / target_bytes_per_task) + 1)
    return df.repartition(n, "media_id")


def _decode_image_stub(payload: bytes) -> tuple[int, int, float, str]:
    """Deterministic fake decode: (width, height, mean_luma, phash).

    Derived purely from the payload bytes so results are stable across
    runs/engines. Replace with a Pillow decode when the library exists.
    """
    if _PIL_IMAGE is None:
        # library absent (this container): deterministic fake
        digest = hashlib.md5(payload or b"").digest()
        w = 64 + digest[0] * 4  # plausible 64..1084 px
        h = 64 + digest[1] * 4
        luma = digest[2] / 255.0 * 100.0
        return w, h, luma, digest.hex()[:16]
    # library present: decode failures RAISE — a corrupt payload must not
    # silently become plausible fake stats that pass downstream gates
    import io  # pragma: no cover - library absent in this container

    img = _PIL_IMAGE.open(io.BytesIO(payload))
    w, h = img.size
    luma = sum(img.convert("L").getdata()) / (w * h)
    return w, h, float(luma), hashlib.md5(img.tobytes()).hexdigest()[:16]


def extract_image_features(
    df: DataFrame, payload_col: str = "payload", decoder=None
) -> DataFrame:
    """Decode/feature-extract stage: Arrow-batched ``mapInPandas``.

    Output contract is :data:`IMAGE_FEATURES_SCHEMA`; the input needs only
    (media_id, payload) — select them before calling so Arrow ships the
    minimum.

    ``decoder``: the codec seam — a picklable callable
    ``bytes -> (width, height, mean_luma, phash)`` that ships to the
    executors in the kernel closure (e.g. a module-level function wrapping
    Pillow). Default ``None`` uses :func:`_decode_image_stub` (real codec
    when importable, deterministic fake otherwise), so the Spark plumbing
    — schema, Arrow batching, partition sizing — is codec-agnostic and the
    registered oracle is unchanged.
    """
    cols = ["media_id", payload_col]
    decode = decoder if decoder is not None else _decode_image_stub

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats = [decode(p if p is not None else b"") for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf[payload_col]],
                    "mean_luma": [f[2] for f in feats],
                    "phash": [f[3] for f in feats],
                }
            )

    return df.select(*cols).mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_nth: int = 30, max_frames: int = 8) -> DataFrame:
    """Frame-sample stage for video payloads: 1 row in, N frame rows out.

    The stub slices the payload into ``max_frames`` deterministic chunks
    (a real implementation would demux with ffmpeg/av at the same spots).
    ``mapInPandas`` lets one input row yield many output rows without an
    explode of pre-materialized frames.
    """

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids: list[str] = []
            idxs: list[int] = []
            payloads: list[bytes] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = payload if payload is not None else b""
                n = min(max_frames, max(1, len(data) // max(every_nth, 1)))
                step = max(1, len(data) // max(n, 1))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(data[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_payload": payloads}
            )

    return df.select("media_id", "payload").mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, resizer=None) -> DataFrame:
    """Resize stage: payload -> resized payload, same row count.

    Stub re-hashes the payload to a deterministic pseudo-bitmap of the
    requested size; the contract (binary in, binary out, metadata updated)
    is the part that matters for the pipeline.

    ``resizer``: codec seam — a picklable callable
    ``(bytes, width, height) -> bytes`` (e.g. Pillow resize + re-encode);
    default ``None`` keeps the deterministic stub.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )
    n_bytes = max(1, min(width * height, 4096))  # stub bitmap, bounded

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            resized = []
            for payload in pdf["payload"]:
                if resizer is not None:
                    resized.append(resizer(payload or b"", width, height))
                    continue
                seed = hashlib.md5((payload or b"") + f"{width}x{height}".encode()).digest()
                resized.append((seed * (n_bytes // len(seed) + 1))[:n_bytes])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return df.select("media_id", "payload").mapInPandas(kernel, out_schema)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("clip_frac", T.DoubleType(), True),
    ]
)


def _decode_audio_stub(payload: bytes) -> tuple[int, int, float, float]:
    """Deterministic fake decode: (sample_rate, duration_ms, rms, clip_frac).

    Real implementation decodes with soundfile/torchaudio and computes the
    same summary stats over PCM samples; the stub derives stable values
    from the payload bytes so the distributed path is testable without a
    codec. rms/clip_frac are the standard speech-corpus quality gates
    (silence and clipping filters).
    """
    if _SOUNDFILE is None:
        # library absent (this container): deterministic fake
        digest = hashlib.md5(payload or b"").digest()
        rate = (8000, 16000, 22050, 44100)[digest[0] % 4]
        duration_ms = 200 + int.from_bytes(digest[1:3], "big") % 60_000
        rms = digest[3] / 255.0
        clip = (digest[4] % 32) / 255.0
        return rate, duration_ms, rms, clip
    # library present: decode failures RAISE — a corrupt payload must not
    # silently become plausible fake stats that pass the quality gates
    import io  # pragma: no cover - library absent in this container

    data, rate = _SOUNDFILE.read(io.BytesIO(payload))
    n = len(data)
    rms = float((data**2).mean() ** 0.5) if n else 0.0
    clip = float((abs(data) >= 0.999).mean()) if n else 0.0
    return int(rate), int(n * 1000 / rate) if rate else 0, rms, clip


def extract_audio_features(
    df: DataFrame, payload_col: str = "payload", decoder=None
) -> DataFrame:
    """Audio decode/feature stage, same contract as the image kernel:
    Arrow-batched ``mapInPandas``, (media_id, payload) in,
    :data:`AUDIO_FEATURES_SCHEMA` out. Feeds the silence/clipping quality
    gates of a speech-training pipeline.

    ``decoder``: the codec seam — a picklable callable
    ``bytes -> (sample_rate, duration_ms, rms, clip_frac)``; default
    ``None`` uses :func:`_decode_audio_stub` (see
    :func:`extract_image_features` for the seam contract)."""
    cols = ["media_id", payload_col]
    decode = decoder if decoder is not None else _decode_audio_stub

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats = [decode(p if p is not None else b"") for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "sample_rate": [f[0] for f in feats],
                    "duration_ms": [f[1] for f in feats],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf[payload_col]],
                    "rms": [f[2] for f in feats],
                    "clip_frac": [f[3] for f in feats],
                }
            )

    return df.select(*cols).mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)
