"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video ride through the engine as `binary` columns plus
typed metadata columns; decode / feature-extract / resize / frame-sample
run as Arrow-batched Python over mapInPandas. This container has no
image/audio libraries, so the decode kernels are STUBS (clearly marked
NotImplementedError or deterministic fakes) — but the Spark-side
plumbing is real and tested: schema contracts, Arrow batch iteration,
partition-preserving mapInPandas, and deterministic metadata extraction
(byte length, md5) that IS fully implemented.

Scale notes: mapInPandas streams Arrow record batches through one Python
worker per core — no driver collect, no per-row pickling. Binary-heavy
tables should set spark.sql.files.maxPartitionBytes low enough that a
batch of payloads fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema contract for the metadata extractor.
BINARY_META_SCHEMA = "doc_id bigint, n_bytes bigint, content_md5 string"


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (UTF-8 payload stand-in)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_binary_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    Real work (length + md5) is implemented; this is the template every
    decode kernel follows: iterate Arrow batches, vectorize per batch,
    yield frames matching the declared schema.
    """

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "content_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(meta_batches, BINARY_META_SCHEMA)


IMAGE_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, n_channels int, feature array<float>"
)


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """STUB — image decode requires PIL/opencv, absent in this container.

    The production kernel decodes each payload to HxWxC uint8 and
    computes a feature vector; the Spark-side contract (schema,
    batching, partitioning) is what the engine defines and tests.
    """
    raise NotImplementedError(
        "image decode requires an image library (PIL/opencv) not present "
        "in this environment; see extract_binary_meta for the implemented "
        "Arrow-batched template"
    )


def extract_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas plumbing for the stubbed image kernel (schema-typed)."""

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_image_batch(pdf["payload"]).assign(doc_id=pdf[id_col])

    return df.select(id_col, "payload").mapInPandas(feature_batches, IMAGE_FEATURE_SCHEMA)


FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx bigint, frame_md5 string"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    frame_chars: int = 64,
    stride: int = 2,
) -> DataFrame:
    """Frame sampling: one row in -> many frames out, via mapInPandas.

    The video-pipeline template: a payload is split into fixed-size
    frames and every ``stride``-th frame is emitted with a content
    digest. Payloads here are text (no codecs in this container), so the
    kernel is fully implemented and byte-for-byte reproducible in ANSI
    SQL (frames are CHARACTER slices, md5 of UTF-8 bytes) — a real
    multirow Arrow kernel with a full value oracle. A production video
    kernel swaps the slicing for container demux + frame decode and
    keeps schema, batching, and stride logic unchanged.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                n_frames = -(-len(text) // frame_chars)  # ceil
                for i in range(0, n_frames, stride):
                    frame = text[i * frame_chars : (i + 1) * frame_chars]
                    ids.append(doc_id)
                    idxs.append(i)
                    digests.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": digests}
            ).astype({"doc_id": "int64", "frame_idx": "int64"})

    return df.select(id_col, text_col).mapInPandas(frame_batches, FRAME_SAMPLE_SCHEMA)


def fake_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic-fake decode + feature extraction (no image libs).

    Derives (width, height, channels) from the payload digest and a
    16-bin byte histogram as the feature vector — every step is
    deterministic, so the full pipeline runs and is testable end-to-end
    while the real decoder is absent. Swapping in PIL/opencv changes
    only the body of this kernel, not the Spark plumbing.
    """

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                digest = hashlib.md5(b).digest()
                hist = np.bincount(
                    np.frombuffer(b, dtype=np.uint8) >> 4, minlength=16
                ).astype("float32")
                total = float(hist.sum()) or 1.0
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": 16 + digest[0],
                        "height": 16 + digest[1],
                        "n_channels": 3,
                        "feature": (hist / total).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, "payload").mapInPandas(
        feature_batches, IMAGE_FEATURE_SCHEMA
    )


AUDIO_CHUNK_SCHEMA = (
    "doc_id bigint, chunk_idx bigint, start_char bigint, n_chars bigint, "
    "chunk_md5 string"
)


def chunk_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    hop: int = 32,
) -> DataFrame:
    """Overlapping-window chunking: the audio feature-frame template
    (window length + hop stride, hop < window => 50% overlap here).

    One row in -> ``ceil(max(L-window,0)/hop)+1`` chunks out, each with
    its offset, length, and content digest. Payloads are text (no audio
    codecs in this container), so the kernel is fully implemented and
    reproducible in ANSI SQL; a production kernel swaps the char slice
    for PCM frame extraction + MFCC/filterbank math and keeps the
    schema, the window/hop arithmetic, and the Arrow batching unchanged.
    """

    def chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, starts, lens, digests = [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                n_chunks = (max(len(text) - window, 0) + hop - 1) // hop + 1
                for i in range(n_chunks):
                    chunk = text[i * hop : i * hop + window]
                    ids.append(doc_id)
                    idxs.append(i)
                    starts.append(i * hop)
                    lens.append(len(chunk))
                    digests.append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "chunk_idx": idxs,
                    "start_char": starts,
                    "n_chars": lens,
                    "chunk_md5": digests,
                }
            ).astype(
                {
                    "doc_id": "int64",
                    "chunk_idx": "int64",
                    "start_char": "int64",
                    "n_chars": "int64",
                }
            )

    return df.select(id_col, text_col).mapInPandas(chunk_batches, AUDIO_CHUNK_SCHEMA)
