"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, with decode/featurize as Arrow-batched Pandas UDFs.

The container has no image/audio codecs, so the *decode* step is a
clearly marked stub (:func:`decode_media` raises NotImplementedError;
:func:`fake_decode_features` is the deterministic stand-in used by
tests). Everything Spark-side — the schema shape, the mapInPandas batch
contract, partitioning behavior — is real and tested; swapping the stub
for PIL/ffmpeg is a one-function change inside the UDF body.

Scale notes: binary payloads ride in Parquet as ordinary byte arrays;
keep ``spark.sql.files.maxPartitionBytes`` at the default 128 MB so a
partition of multi-MB blobs still fits executor memory, and never
collect payloads to the driver. Feature extraction is map-side only —
zero shuffles — so it scales with the scan like any other projection.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Metadata carried alongside every payload. At 100 TB the metadata
#: columns (not the blobs) are what filters/joins touch, so they must be
#: plain columns Parquet can index, not fields buried in the payload.
MEDIA_META_SCHEMA = "kind STRING, n_bytes BIGINT, checksum STRING"


def pack_media(payload: Column, kind: Column | str) -> Column:
    """Wrap raw bytes into (payload, metadata-struct). Checksum is md5
    hex — cross-engine checkable, good enough for dedup/integrity.

    .. note:: API change (round 2): a str ``kind`` names a COLUMN (the
       package-wide Column|str convention) — it was previously treated
       as a literal constant. Callers passing a constant string must
       now pass ``F.lit("image")``; a bare string that names no column
       fails at analysis time with Spark's UNRESOLVED_COLUMN error
       rather than silently packing the wrong value."""
    kind_col = F.col(kind) if isinstance(kind, str) else kind
    return F.struct(
        payload.alias("payload"),
        F.struct(
            kind_col.alias("kind"),
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame, payload_col: str, kind: str) -> DataFrame:
    """Real decoder entry point — NOT implemented in this container
    (no PIL/opencv/ffmpeg). Kept as the documented seam where decoding
    plugs in; use :func:`fake_decode_features` for plumbing tests."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use fake_decode_features() for the Spark-side plumbing"
    )


def frame_sample(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    frame_bytes: int = 64,
    stride: int = 128,
) -> DataFrame:
    """Frame sampling over opaque payloads — the video access pattern:
    slice a window of ``frame_bytes`` every ``stride`` bytes and emit
    (frame index, length, checksum) per frame. A real video pipeline
    swaps the byte slice for a keyframe decode; the Spark-side shape
    (mapInPandas fan-out, one row per frame, map-side only) is
    identical. The final frame may be short (slice clamps at EOF).
    The id column keeps its name and type (derived from the input
    schema, like similarity.pandas_cosine_topk)."""
    import pandas as pd
    import hashlib

    id_type = df.schema[id_col].dataType.simpleString()

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(blob)
                n_frames = (len(data) - 1) // stride + 1 if data else 0
                for i in range(n_frames):
                    frame = data[i * stride : i * stride + frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(frame))
                    sums.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_len": lens, "checksum": sums}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        sample,
        schema=f"{id_col} {id_type}, frame_idx long, frame_len int, checksum string",
    )


def fake_decode_features(df: DataFrame, id_col: str, payload_col: str, kind_col: str) -> DataFrame:
    """Deterministic stand-in for decode+featurize: a 16-bin byte
    histogram (L1-normalized) per payload, via mapInPandas. The batch
    contract, schema, and distribution behavior are exactly what a real
    image/audio featurizer would use — only the math inside differs.
    The id column keeps its input name and type."""
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = []
            for blob in pdf[payload_col]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "kind": pdf[kind_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "feat": feats,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col), F.col(kind_col)).mapInPandas(
        extract,
        schema=f"{id_col} {id_type}, kind string, n_bytes bigint, feat array<double>",
    )


def fake_resize(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    kind_col: str,
    box: int = 256,
) -> DataFrame:
    """Deterministic stand-in for image/video resize via mapInPandas:
    aspect-preserving fit into a ``box`` x ``box`` target. Source
    dimensions derive from the payload length (no codecs in this
    container — a real decoder reads them from the header; the geometry
    math, batch contract, and map-side-only distribution are the real
    thing). The "resized payload" is replaced by a checksum of its
    deterministic description so outputs stay narrow and hashable.

    All arithmetic is single IEEE double ops on exact integers
    (division, min, multiply, floor) — bit-reproducible in SQL."""
    import math

    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            n = pdf[payload_col].map(len).astype("int64")
            w0 = 640 + (n % 97)
            h0 = 360 + (n % 53)
            rows = []
            for wi, hi in zip(w0, h0):
                scale = min(box / wi, box / hi)
                rows.append((int(math.floor(wi * scale)), int(math.floor(hi * scale))))
            out = pd.DataFrame(rows, columns=["width_out", "height_out"])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "kind": pdf[kind_col],
                    "width_in": w0,
                    "height_in": h0,
                    "width_out": out["width_out"].astype("int64"),
                    "height_out": out["height_out"].astype("int64"),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col), F.col(kind_col)).mapInPandas(
        resize,
        schema=(
            f"{id_col} {id_type}, kind string, width_in bigint, height_in bigint,"
            " width_out bigint, height_out bigint"
        ),
    )
