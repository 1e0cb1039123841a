"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque `binary` columns with typed
metadata — the pattern a 100 TB training-data pipeline needs:

    raw bytes (binary) + {mime_type, width, height, duration_ms, ...}

The Spark-side plumbing here is real and tested: schemas, Arrow-batched
`mapInPandas` transforms, partition sizing. The actual codec calls are
STUBBED behind `_decode_image_bytes` (this container has no image/audio
libraries): the stub is deterministic so tests are stable, and the
NotImplementedError marks exactly where Pillow/ffmpeg/torchvision plug in.

Scale notes:
- decode/resize is a per-row CPU transform with no shuffle: mapInPandas
  keeps it embarrassingly parallel, one Arrow batch at a time;
- `spark.sql.execution.arrow.maxRecordsPerBatch` bounds decoder memory
  (large media => small batches);
- metadata-only queries never touch the binary column (column pruning),
  so filtering by mime/size before decode is free.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, mime_type string, width int, height int, "
    "sha256 string"
)

FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_bytes binary, frame_sha256 string"
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a binary payload column (test stand-in for real media bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _decode_image_bytes(payload: bytes) -> tuple[int, int]:
    """STUB decoder. Real implementation:

        from PIL import Image; import io
        img = Image.open(io.BytesIO(payload)); return img.size

    The stub derives deterministic fake dimensions from the content hash so
    the distributed plumbing (batching, schema, partitioning) is testable
    without codec libraries.
    """
    h = hashlib.sha256(payload).digest()
    width = 160 + h[0] % 8 * 80   # 160..720
    height = 90 + h[1] % 8 * 45   # 90..405
    return width, height


def decode_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas decode: (doc_id, payload) -> typed media metadata."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            dims = [_decode_image_bytes(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "mime_type": [
                        ("image/png", "audio/wav", "video/mp4")[len(bytes(p)) % 3]
                        for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "sha256": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in payloads
                    ],
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(decode, DECODED_SCHEMA)


def sample_frames(
    df: DataFrame, payload_col: str = "payload", every_n_bytes: int = 64
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled "frame".

    STUB: slices the payload every `every_n_bytes` (a real implementation
    seeks keyframes via ffmpeg). Demonstrates the 1->N mapInPandas shape
    (row explosion inside Arrow batches, no JVM round trip).
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload)
                for idx, off in enumerate(range(0, len(b), every_n_bytes)):
                    frame = b[off : off + every_n_bytes]
                    out.append(
                        (
                            doc_id,
                            idx,
                            frame,
                            hashlib.sha256(frame).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "frame_bytes", "frame_sha256"]
            )

    return df.select("doc_id", payload_col).mapInPandas(sample, FRAME_SCHEMA)


AUDIO_WINDOW_SCHEMA = (
    "doc_id bigint, win_idx int, n_win_bytes bigint, energy bigint"
)


def audio_energy_windows(
    df: DataFrame, payload_col: str = "payload", window_bytes: int = 256
) -> DataFrame:
    """Audio feature-extraction plumbing: fixed-size PCM window
    segmentation with per-window energy, through ONE Arrow-batched
    mapInPandas pass (the audio sibling of `sample_frames`' video shape).

    The windowing and the energy are REAL computation — energy is the
    exact sum of the window's byte values (the integer stand-in for RMS
    over PCM samples; a production decoder would first turn the container
    format into PCM via ffmpeg — THAT step is the stub, the segmentation
    and reduction are the actual distributed work). One np.add.reduceat
    pass per payload: every window's sum comes from a single vectorized
    sweep over the whole byte array — no per-window Python iteration
    (ADVICE r5), so the pandas stage scales with payload bytes, not
    window count.
    """
    import numpy as np

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in ("doc_id", "win_idx", "n_win_bytes", "energy")}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                n_win = (len(b) + window_bytes - 1) // window_bytes
                if n_win == 0:
                    continue
                offs = np.arange(n_win, dtype=np.int64) * window_bytes
                cols["doc_id"].append(np.full(n_win, doc_id, dtype=np.int64))
                cols["win_idx"].append(np.arange(n_win, dtype=np.int32))
                cols["n_win_bytes"].append(
                    np.minimum(window_bytes, len(b) - offs)
                )
                cols["energy"].append(
                    np.add.reduceat(b.astype(np.int64), offs)
                )
            if cols["doc_id"]:
                yield pd.DataFrame(
                    {k: np.concatenate(v) for k, v in cols.items()}
                )
            else:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "win_idx": pd.Series([], dtype="int32"),
                        "n_win_bytes": pd.Series([], dtype="int64"),
                        "energy": pd.Series([], dtype="int64"),
                    }
                )

    return df.select("doc_id", payload_col).mapInPandas(
        windows, AUDIO_WINDOW_SCHEMA
    )


BYTE_PROFILE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, distinct_bytes bigint,"
    " top_byte bigint, top_byte_ct bigint, repeat_pairs bigint"
)


def byte_profile(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-payload byte-distribution profile through ONE Arrow-batched
    mapInPandas pass — the compression/binary-content screen: compressed
    or encrypted payloads show near-uniform byte histograms (high
    distinct count, low top-byte share, few adjacent repeats), while
    text shows a separator-dominant, repetitive profile. A curation
    pipeline quarantines the former before any text operator runs.

    All REAL computation, numpy-vectorized per payload (np.unique with
    counts; one shifted comparison for adjacent repeats — no per-byte
    Python loop). Ties on the modal byte break to the SMALLEST byte
    value so the profile is deterministic.
    """
    import numpy as np

    def profile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(b) == 0:
                    out.append((doc_id, 0, 0, -1, 0, 0))
                    continue
                vals, cts = np.unique(b, return_counts=True)
                # np.unique returns vals ascending -> argmax picks the
                # smallest byte among tied maxima
                top = int(np.argmax(cts))
                out.append(
                    (
                        doc_id,
                        int(len(b)),
                        int(len(vals)),
                        int(vals[top]),
                        int(cts[top]),
                        int(np.sum(b[1:] == b[:-1])),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "distinct_bytes",
                    "top_byte",
                    "top_byte_ct",
                    "repeat_pairs",
                ],
            )

    return df.select("doc_id", payload_col).mapInPandas(
        profile, BYTE_PROFILE_SCHEMA
    )

RESIZED_SCHEMA = (
    "doc_id long, src_w int, src_h int, out_w int, out_h int, "
    "pix_sum long, resized_sha256 string"
)


def resize_nearest(
    df: DataFrame,
    payload_col: str = "payload",
    out_w: int = 16,
    out_h: int = 16,
) -> DataFrame:
    """Nearest-neighbor thumbnail resize through ONE Arrow-batched
    mapInPandas pass — the preprocessing step between decode and
    feature-extract in an image curation pipeline.

    STUB geometry over REAL plumbing: the "image" is the payload byte
    grid of the stub decoder's (width, height) — pixel(x, y) = payload
    byte at (y*width + x) mod n_bytes (a real implementation indexes the
    decoded RGB array from Pillow/torchvision; the sampling arithmetic,
    Arrow batching, and output schema are exactly what that plug-in
    keeps). Index math is numpy-vectorized (one gather per payload, no
    per-pixel Python loop); source coordinates use floor division
    (src_x = x*W // out_w), the standard nearest-neighbor convention,
    mirrored exactly by the SQL oracle.
    """
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs = np.arange(out_w)
        ys = np.arange(out_h)
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(b) == 0:
                    out.append((doc_id, 0, 0, out_w, out_h, 0, ""))
                    continue
                w, h = _decode_image_bytes(bytes(payload))
                src_x = xs * w // out_w
                src_y = ys * h // out_h
                idx = (src_y[:, None] * w + src_x[None, :]).ravel() % len(b)
                sampled = b[idx]
                out.append(
                    (
                        doc_id,
                        w,
                        h,
                        out_w,
                        out_h,
                        int(sampled.sum()),
                        hashlib.sha256(sampled.tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "src_w",
                    "src_h",
                    "out_w",
                    "out_h",
                    "pix_sum",
                    "resized_sha256",
                ],
            )

    return df.select("doc_id", payload_col).mapInPandas(
        resize, RESIZED_SCHEMA
    )


PHASH_GRID = 8  # 8x8 sample grid -> 8 rows x 7 row-gradient bits = 56 bits


def dhash_bits(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Difference-hash (dHash) perceptual fingerprint through ONE
    Arrow-batched mapInPandas pass — the standard image near-dup
    signature (Krawetz's dHash: resize to a tiny grid, hash the
    horizontal gradient signs). 56 bits (8 rows x 7 adjacent-column
    comparisons) so the value stays clear of BIGINT's sign bit on both
    engines.

    STUB geometry over REAL plumbing, same contract as ``resize_nearest``:
    pixel(x, y) is the payload byte at the nearest-neighbor sample index
    (a real implementation hashes the decoded grayscale plane from
    Pillow; the gradient/banding arithmetic and the Arrow batch shape are
    exactly what that plug-in keeps). Zero-length payloads emit no row —
    an image that failed to decode has no fingerprint.
    """
    import numpy as np

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs = np.arange(PHASH_GRID)
        ys = np.arange(PHASH_GRID)
        weights = 1 << np.arange(
            PHASH_GRID * (PHASH_GRID - 1), dtype=np.int64
        )
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(b) == 0:
                    continue
                w, h = _decode_image_bytes(bytes(payload))
                src_x = xs * w // PHASH_GRID
                src_y = ys * h // PHASH_GRID
                idx = (src_y[:, None] * w + src_x[None, :]).ravel() % len(b)
                g = b[idx].reshape(PHASH_GRID, PHASH_GRID).astype(np.int64)
                bits = (g[:, :-1] > g[:, 1:]).ravel().astype(np.int64)
                ids.append(int(doc_id))
                hashes.append(int((bits * weights).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(
        hash_batch, "doc_id bigint, dhash bigint"
    )
