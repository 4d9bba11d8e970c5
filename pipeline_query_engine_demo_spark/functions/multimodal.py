"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, with decode/featurize as Arrow-batched Pandas UDFs.

The container has no codec LIBRARIES (PIL/opencv/ffmpeg), so
:func:`decode_media` ships pure-numpy decoders for the public
uncompressed raster formats those libraries would otherwise cover:
BMP (BITMAPINFOHEADER and later, BI_RGB 24/32-bit, bottom-up and
top-down row order, 4-byte row padding) and binary netpbm (P6 PPM /
P5 PGM, maxval ≤ 255, comment-tolerant headers). Compressed codecs
(JPEG/PNG/H.264) remain out of scope — a real deployment swaps the
per-payload ``_decode_one`` dispatch for the library call; the
Spark-side shape (mapInPandas batches, map-side only, per-row error
capture instead of task failure) is identical either way.
:func:`fake_decode_features` stays as the codec-free featurizer used
where only the batch contract is under test.

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


#: Prime modulus for the order-sensitive decoded-pixel checksum: small
#: enough that the running sum stays exact in int64 per modular step,
#: large enough that row-order / channel-swap decode bugs can't collide.
_WEIGHTED_MOD = 2147483647


def encode_bmp(
    width: int, height: int, rgb: bytes, top_down: bool = False, alpha: bool = False
) -> bytes:
    """Minimal valid BMP writer (BITMAPINFOHEADER, BI_RGB): interleaved
    top-down RGB in → 24-bit (or 32-bit BGRA when ``alpha``) BMP bytes
    out, bottom-up unless ``top_down``. Exercised both as the test
    fixture generator for :func:`decode_media` and as the synthetic
    image source in the multimodal_decode_stats query. Pure stdlib —
    the format is public (Windows BMP / OS2 DIB)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    nch = 4 if alpha else 3
    stride = ((width * nch + 3) // 4) * 4
    rows = []
    order = range(height) if top_down else range(height - 1, -1, -1)
    for y in order:
        row = bytearray()
        base = y * width * 3
        for x in range(width):
            r, g, b = rgb[base + 3 * x : base + 3 * x + 3]
            row += bytes((b, g, r, 255)) if alpha else bytes((b, g, r))
        row += bytes(stride - len(row))
        rows.append(bytes(row))
    data = b"".join(rows)
    h_field = height if not top_down else -height
    info = (
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + h_field.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (nch * 8).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    off = 14 + len(info)
    hdr = (
        b"BM"
        + (off + len(data)).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + off.to_bytes(4, "little")
    )
    return hdr + info + data


def encode_pnm(width: int, height: int, pixels: bytes, gray: bool = False) -> bytes:
    """Binary netpbm writer: P5 PGM (``gray``) or P6 PPM, maxval 255.
    ``pixels`` is top-down row-major — interleaved RGB for P6, one byte
    per pixel for P5."""
    nch = 1 if gray else 3
    if len(pixels) != width * height * nch:
        raise ValueError("pixel length mismatch")
    magic = b"P5" if gray else b"P6"
    return magic + f"\n{width} {height}\n255\n".encode() + pixels


def _read_pnm_header(data: bytes) -> tuple[bytes, int, int, int, int]:
    """Tokenize a netpbm header (whitespace-separated, ``#`` comments to
    end-of-line) → (magic, width, height, maxval, pixel_offset)."""
    magic = data[:2]
    pos = 2
    vals: list[int] = []
    n = len(data)
    while len(vals) < 3:
        while pos < n and data[pos : pos + 1].isspace():
            pos += 1
        if pos < n and data[pos] == 0x23:  # '#' comment
            while pos < n and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < n and not data[pos : pos + 1].isspace():
            pos += 1
        tok = data[start:pos]
        if not tok.isdigit():
            raise ValueError("bad netpbm header token")
        vals.append(int(tok))
    # exactly one whitespace byte separates maxval from pixel data
    if pos >= n or not data[pos : pos + 1].isspace():
        raise ValueError("truncated netpbm header")
    return magic, vals[0], vals[1], vals[2], pos + 1


def _decode_one(data: bytes) -> tuple[str, int, int, int, bytes]:
    """Dispatch one payload → (format, width, height, channels, pixels)
    with pixels canonicalized to top-down row-major interleaved RGB
    (3 channels) or grayscale (1). Raises ValueError on anything it
    cannot decode — the mapInPandas wrapper turns that into a NULL row
    with an ``err`` string rather than failing the task."""
    import numpy as np

    if data[:2] == b"BM":
        if len(data) < 54:
            raise ValueError("truncated BMP header")
        pixel_off = int.from_bytes(data[10:14], "little")
        hdr_size = int.from_bytes(data[14:18], "little")
        if hdr_size < 40:
            raise ValueError("unsupported BMP core header")
        width = int.from_bytes(data[18:22], "little", signed=True)
        height = int.from_bytes(data[22:26], "little", signed=True)
        bpp = int.from_bytes(data[28:30], "little")
        compression = int.from_bytes(data[30:34], "little")
        if compression != 0:
            raise ValueError("only BI_RGB (uncompressed) BMP supported")
        if bpp not in (24, 32):
            raise ValueError(f"unsupported BMP bit depth {bpp}")
        top_down = height < 0
        h = abs(height)
        nch = bpp // 8
        if width <= 0 or h <= 0:
            raise ValueError("degenerate BMP dimensions")
        stride = ((width * nch + 3) // 4) * 4
        if len(data) < pixel_off + stride * h:
            raise ValueError("truncated BMP pixel array")
        arr = np.frombuffer(
            data, np.uint8, count=stride * h, offset=pixel_off
        ).reshape(h, stride)
        rows = arr[:, : width * nch].reshape(h, width, nch)
        if not top_down:
            rows = rows[::-1]
        rgb = rows[:, :, [2, 1, 0]]  # BGR(A) -> RGB, alpha dropped
        return "bmp", width, h, 3, rgb.tobytes()
    if data[:2] in (b"P5", b"P6"):
        magic, width, height, maxval, off = _read_pnm_header(data)
        if width <= 0 or height <= 0:
            raise ValueError("degenerate netpbm dimensions")
        if maxval <= 0 or maxval > 255:
            raise ValueError("only 8-bit netpbm supported")
        nch = 1 if magic == b"P5" else 3
        need = width * height * nch
        if len(data) < off + need:
            raise ValueError("truncated netpbm pixel data")
        fmt = "pgm" if magic == b"P5" else "ppm"
        return fmt, width, height, nch, data[off : off + need]
    raise ValueError("unrecognized media payload")


def decode_media(
    df: DataFrame, id_col: str, payload_col: str, with_stats: bool = False
) -> DataFrame:
    """Decode binary raster payloads (BMP / P6 PPM / P5 PGM — see the
    module docstring for exact coverage) via mapInPandas. Output per
    row: ``format``, ``width``, ``height``, ``channels``,
    ``n_pixel_bytes``, ``pixels`` (canonical top-down row-major
    interleaved RGB or grayscale bytes) and ``err`` — undecodable
    payloads yield NULL media fields plus the error message instead of
    failing the task, the only sane contract when one corrupt blob in
    100 TB must not kill a stage. With ``with_stats`` two exact-integer
    reductions are computed in the same pass (no second scan of the
    blobs): ``pixel_sum`` = Σ v_i and ``weighted_sum`` =
    (Σ (i+1)·v_i) mod 2147483647 — the latter is ORDER-SENSITIVE, so a
    bottom-up/top-down or BGR/RGB decode bug changes it even though
    plain means would not.

    Scale: map-side only (zero shuffles); payloads never leave the
    executor — downstream stats/filters ride on the narrow columns.
    Reference parity: the reference engine has no multimodal surface;
    this family comes from the north star's LLM-pipeline mandate."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {
                id_col: [],
                "format": [],
                "width": [],
                "height": [],
                "channels": [],
                "n_pixel_bytes": [],
                "pixels": [],
                "err": [],
            }
            if with_stats:
                out["pixel_sum"] = []
                out["weighted_sum"] = []
            # row-loop-ok: decode is per-payload by nature (variable
            # length, per-blob format dispatch, per-row error capture);
            # the pixel math inside is numpy over the whole blob.
            for doc_id, blob in zip(pdf[id_col], pdf[payload_col]):
                out[id_col].append(doc_id)
                try:
                    if blob is None or (
                        not isinstance(blob, (bytes, bytearray, memoryview))
                        and pd.isna(blob)
                    ):
                        raise ValueError("null media payload")
                    fmt, w, h, nch, px = _decode_one(bytes(blob))
                except (ValueError, IndexError, TypeError) as exc:
                    out["format"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["channels"].append(None)
                    out["n_pixel_bytes"].append(None)
                    out["pixels"].append(None)
                    out["err"].append(str(exc))
                    if with_stats:
                        out["pixel_sum"].append(None)
                        out["weighted_sum"].append(None)
                    continue
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(nch)
                out["n_pixel_bytes"].append(len(px))
                out["pixels"].append(px)
                out["err"].append(None)
                if with_stats:
                    import numpy as np

                    v = np.frombuffer(px, np.uint8).astype(np.int64)
                    out["pixel_sum"].append(int(v.sum()))
                    idx = np.arange(1, len(v) + 1, dtype=np.int64)
                    # chunked modular accumulation keeps every partial
                    # exact in int64 even for giga-pixel payloads
                    acc = 0
                    for lo in range(0, len(v), 1 << 20):
                        acc = (
                            acc + int((idx[lo : lo + (1 << 20)]
                                       * v[lo : lo + (1 << 20)]).sum())
                        ) % _WEIGHTED_MOD
                    out["weighted_sum"].append(acc)
            yield pd.DataFrame(out)

    stats = ", pixel_sum bigint, weighted_sum bigint" if with_stats else ""
    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run,
        schema=(
            f"{id_col} {id_type}, format string, width int, height int,"
            f" channels int, n_pixel_bytes bigint, pixels binary,"
            f" err string{stats}"
        ),
    )


def encode_wav(sample_rate: int, channels: int, samples: bytes, junk_chunk: bool = False) -> bytes:
    """Minimal valid RIFF/WAVE writer for 16-bit PCM: interleaved
    little-endian int16 ``samples`` in → canonical WAV bytes out
    (RIFF header, ``fmt `` chunk with block-align/byte-rate, ``data``
    chunk). With ``junk_chunk`` a 6-byte ``LIST`` chunk (odd payload →
    pad byte, per the RIFF spec) is inserted between ``fmt `` and
    ``data`` so decoders must actually WALK chunks rather than assume
    the fixed 44-byte layout. Pure stdlib — the format is public
    (Microsoft/IBM RIFF WAVE). The audio twin of :func:`encode_bmp`."""
    if len(samples) % (2 * channels):
        raise ValueError("samples must be whole interleaved 16-bit frames")
    block_align = 2 * channels
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    junk = (
        (b"LIST" + (5).to_bytes(4, "little") + b"INFO\x00" + b"\x00")
        if junk_chunk
        else b""
    )
    data = b"data" + len(samples).to_bytes(4, "little") + samples
    body = b"WAVE" + fmt + junk + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _decode_wav_one(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse one RIFF/WAVE payload → (sample_rate, channels, n_frames,
    sample_bytes). Walks chunks (skipping unknown ones, honoring the
    RIFF odd-size pad byte); only uncompressed 16-bit PCM is accepted —
    compressed codecs are out of scope exactly like JPEG for images
    (module docstring). Raises ValueError on anything else."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(data)
    fmt = None
    samples = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            audio_format = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_format != 1:
                raise ValueError(f"only PCM supported, got format {audio_format}")
            if bits != 16:
                raise ValueError(f"only 16-bit PCM supported, got {bits}")
            if channels < 1 or rate < 1:
                raise ValueError("degenerate WAV header")
            fmt = (rate, channels)
        elif cid == b"data":
            samples = body
        pos += 8 + size + (size % 2)  # odd chunk sizes carry a pad byte
    if fmt is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    rate, channels = fmt
    if len(samples) % (2 * channels):
        raise ValueError("data chunk is not whole frames")
    return rate, channels, len(samples) // (2 * channels), samples


def decode_audio(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Decode binary WAV payloads (16-bit PCM — see :func:`_decode_wav_one`)
    via mapInPandas and reduce each to exact-integer audio stats in the
    same pass: ``n_frames``, ``duration_us`` (frames·10⁶ div rate, exact
    integer division), ``peak`` = max |sample|, ``sum_sq`` = Σ sample²
    (exact int64 — ≤ 2³⁰ per sample², far under overflow for any real
    clip length), and the ORDER-SENSITIVE ``ch0_sum`` = Σ of channel-0
    samples (every ``channels``-th interleaved value), which changes if
    a decoder mis-strides the interleave even when symmetric stats
    would not. Undecodable payloads yield NULL stats plus ``err``
    instead of failing the task — one corrupt blob in 100 TB must not
    kill a stage. The audio member of the multimodal column family
    (images: :func:`decode_media`; video access pattern:
    :func:`frame_sample`).

    Scale: map-side only, zero shuffles; payloads never leave the
    executor — only the narrow stat columns survive."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {
                id_col: [],
                "sample_rate": [],
                "channels": [],
                "n_frames": [],
                "duration_us": [],
                "peak": [],
                "sum_sq": [],
                "ch0_sum": [],
                "err": [],
            }
            # row-loop-ok: decode is per-payload by nature (variable
            # length, chunk walking, per-row error capture); the sample
            # math inside is numpy over the whole clip.
            for doc_id, blob in zip(pdf[id_col], pdf[payload_col]):
                out[id_col].append(doc_id)
                try:
                    if blob is None or (
                        not isinstance(blob, (bytes, bytearray, memoryview))
                        and pd.isna(blob)
                    ):
                        raise ValueError("null audio payload")
                    rate, ch, frames, raw = _decode_wav_one(bytes(blob))
                except (ValueError, IndexError, TypeError) as exc:
                    for c in (
                        "sample_rate",
                        "channels",
                        "n_frames",
                        "duration_us",
                        "peak",
                        "sum_sq",
                        "ch0_sum",
                    ):
                        out[c].append(None)
                    out["err"].append(str(exc))
                    continue
                v = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                out["sample_rate"].append(rate)
                out["channels"].append(ch)
                out["n_frames"].append(frames)
                out["duration_us"].append(frames * 1_000_000 // rate)
                out["peak"].append(int(np.abs(v).max()) if len(v) else None)
                out["sum_sq"].append(int((v * v).sum()) if len(v) else None)
                out["ch0_sum"].append(int(v[0::ch].sum()) if len(v) else None)
                out["err"].append(None)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run,
        schema=(
            f"{id_col} {id_type}, sample_rate int, channels int,"
            " n_frames bigint, duration_us bigint, peak bigint,"
            " sum_sq bigint, ch0_sum bigint, err string"
        ),
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
            # row-loop-ok: frame fan-out is per-payload (variable blob
            # length => variable frame count) and each frame needs its
            # own checksum; a real decoder would be per-row here too.
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
            # row-loop-ok: payloads are variable-length binary, so the
            # histogram can't batch across rows without a concat +
            # reduceat contortion; the interior (frombuffer + bincount)
            # is already numpy-vectorized over every byte of the blob.
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
