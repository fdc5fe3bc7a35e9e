"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The Spark-side plumbing — schemas, batch
iteration, partitioning, binary hygiene — is real and tested. The codec
step is import-gated: with PIL present, ``decode_media`` is a REAL
image decode (header-only sizing) and the feature stage reports ``ok``
/ ``decode_error`` per row; without it (this environment),
``decode_media`` raises ``NotImplementedError`` and
``fake_decode_meta`` provides the deterministic stand-in, labeled
``stubbed``, that the tests and rows-only driver checks run against.

Binary hygiene at scale (survey §4.2): the ``content`` column is dropped
immediately after the consuming stage — an explicit select keeps 100 TB
of payload bytes out of every downstream shuffle by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, content binary"
FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum long, "
    "width int, height int, n_frames int, decode_status string"
)

try:  # real decoder gate — not present in this environment
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False


def synth_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media: documents' text bytes as the binary
    payload (stands in for spark.read.format('binaryFile') output)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("content"),
    )


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def synth_png_media(docs: DataFrame, malformed_every: int = 7) -> DataFrame:
    """Deterministic REAL-format media: a PNG header payload per doc —
    magic + IHDR with doc-derived geometry (width 16 + id % 320,
    height 16 + 7·id % 200) — built entirely JVM-side (binary concat +
    hex/unhex big-endian packing, no UDF). Every ``malformed_every``-th
    doc instead gets a payload whose PNG magic matches but whose IHDR
    is truncated, so the decode stage's ``decode_error`` arm (with its
    deterministic fake-geometry fallback) is exercised in-pipeline, in
    every environment — both arms of the real decode path are
    therefore driver-checkable with an exact oracle (t12)."""

    def be32(c):
        return F.unhex(F.lpad(F.hex(c.cast("bigint")), 8, "0"))

    w = (F.lit(16) + F.col("doc_id") % 320).cast("bigint")
    h = (F.lit(16) + (F.col("doc_id") * 7) % 200).cast("bigint")
    valid = F.concat(
        F.lit(_PNG_MAGIC + b"\x00\x00\x00\x0dIHDR"),
        be32(w),
        be32(h),
        F.lit(b"\x08\x02\x00\x00\x00" + b"\x00\x00\x00\x00"),
    )
    malformed = F.lit(_PNG_MAGIC + b"TRUNC")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.when(F.col("doc_id") % malformed_every == 0, malformed)
        .otherwise(valid)
        .alias("content"),
    )


def sniff_format(content: bytes) -> str | None:
    """Container sniff by magic bytes: 'png' / 'gif' when the payload
    claims to be one, None for everything else (which then routes to
    PIL if present). A recognized magic commits the payload to the
    stdlib parser — a corrupt PNG is a ``decode_error``, never silently
    re-tried elsewhere."""
    if content[:8] == _PNG_MAGIC:
        return "png"
    if content[:6] in _GIF_MAGICS:
        return "gif"
    return None


def _stdlib_header_size(content: bytes, fmt: str) -> tuple[int, int]:
    """Header-only (width, height) from stdlib struct parsing — no
    imaging library needed. PNG: the IHDR chunk is REQUIRED to be
    first (PNG spec §11.2.2), so width/height are the two big-endian
    u32s at bytes 16..24. GIF: the logical screen descriptor's two
    little-endian u16s at bytes 6..10. Raises ``ValueError`` on a
    payload whose magic matched but whose header is truncated or
    zero-sized — the caller maps that to ``decode_error``."""
    import struct

    if fmt == "png":
        if len(content) >= 24 and content[12:16] == b"IHDR":
            w, h = struct.unpack(">II", content[16:24])
            # PNG spec caps dimensions at 2^31-1; an unsigned read
            # above that is corrupt/adversarial and would overflow the
            # int32 feature columns downstream — decode_error, not 'ok'
            if 0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF:
                return w, h
        raise ValueError("malformed PNG: bad or truncated IHDR")
    if fmt == "gif":
        if len(content) >= 10:
            w, h = struct.unpack("<HH", content[6:10])
            if w > 0 and h > 0:
                return w, h
        raise ValueError("malformed GIF: truncated screen descriptor")
    raise ValueError(f"unsupported format {fmt!r}")


def decode_media(content: bytes) -> tuple[int, int]:
    """Real image decode: (width, height). PNG and GIF are sized by
    header struct parse with the stdlib alone — the real path runs in
    THIS environment, not just on a cluster image with pillow. Other
    formats go through PIL when it is importable (header-only
    ``Image.open`` sizing, no pixel materialization); with neither a
    recognized magic nor PIL, raises ``NotImplementedError`` — use
    :func:`fake_decode_meta` for plumbing tests there."""
    fmt = sniff_format(content)
    if fmt is not None:
        return _stdlib_header_size(content, fmt)
    if not _HAS_PIL:
        raise NotImplementedError(
            "media decode beyond PNG/GIF requires an image/audio library "
            "not present in this environment; use fake_decode_meta for "
            "plumbing tests"
        )
    import io

    with Image.open(io.BytesIO(content)) as im:
        return im.width, im.height


def _decode_meta(content: bytes) -> tuple[int, int, int, str]:
    """Per-row decode dispatch for the mapInPandas stage. PNG/GIF
    payloads take the stdlib real path in EVERY environment
    (``ok``, or ``decode_error`` with the deterministic fake geometry
    when the header is corrupt — never a poisoned batch); other
    payloads take the PIL real path iff PIL imports, else the fake
    path labeled ``stubbed``."""
    if sniff_format(content) is not None or _HAS_PIL:
        try:
            w, h = decode_media(content)
            return w, h, 1, "ok"
        except NotImplementedError:  # pragma: no cover - gate above
            raise
        except Exception:
            w, h, f = fake_decode_meta(content)
            return w, h, f, "decode_error"
    w, h, f = fake_decode_meta(content)
    return w, h, f, "stubbed"


def fake_decode_meta(content: bytes) -> tuple[int, int, int]:
    """Deterministic decode stand-in: pseudo width/height/frames from the
    payload bytes (pure arithmetic — oracle-reproducible)."""
    n = len(content)
    checksum = sum(content[:64]) if n else 0
    width = 64 + (n % 1024)
    height = 64 + (checksum % 512)
    n_frames = 1 + (n % 16)
    return width, height, n_frames


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """The mapInPandas feature-extract stage: Arrow batches in, feature
    rows out, binary column dropped on output (hygiene)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_meta(bytes(c)) for c in pdf["content"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(c)) for c in pdf["content"]],
                    "checksum": [sum(bytes(c)[:64]) if len(bytes(c)) else 0 for c in pdf["content"]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "n_frames": [m[2] for m in metas],
                    "decode_status": [m[3] for m in metas],
                }
            )
            yield out

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling stage shape: one output row per sampled frame,
    exploded from the (stubbed) frame count — shows the 1→N mapInPandas
    fan-out pattern with the binary dropped before the fan-out."""
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "kind",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("n_frames") - 1) / every_n, F.lit(0)).cast("int"))
        ).alias("sample_idx"),
        (F.col("width") * F.col("height")).alias("pixels"),
    )


def resize_plan(media: DataFrame, target: int = 224) -> DataFrame:
    """Resize stage plumbing: computes target geometry from (stubbed)
    decode metadata; the pixel work would live in the same mapInPandas
    stage as decode on a real image."""
    feats = extract_features(media)
    scale = F.least(target / F.col("width"), target / F.col("height"))
    return feats.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("out_w"),
        F.round(F.col("height") * scale).cast("int").alias("out_h"),
    )


# ---------------------------------------------------------------------------
# raw-raster region cropping (S5) — no codec required
# ---------------------------------------------------------------------------

RAW_PAGE_SCHEMA = (
    "doc string, page_num int, page_w double, page_h double, "
    "px_w int, px_h int, channels int, pixels binary"
)

CROP_SCHEMA = (
    "doc string, page_num int, region_id int, kind string, "
    "px_w int, px_h int, channels int, pixels binary"
)


def crop_regions(raw_pages: DataFrame, regions: DataFrame) -> DataFrame:
    """S5 region crop, real computation: slice each detected region out
    of its page's RAW raster (height×width×channels bytes, the form a
    renderer's pixmap arrives in — PyMuPDF ``samples``, or any decoded
    frame) with pure numpy indexing. No image codec is involved:
    encode/decode of compressed formats remains the import-guarded seam
    (``decode_media``), but cropping itself never needed one.

    Page coordinates (points) scale to pixel coordinates by the raster's
    own px/point ratio, so any render DPI works. One ``mapInPandas``
    over the regions⋈pages join; page payload bytes are dropped from the
    output rows' lineage immediately (each crop carries only its own
    pixels — binary hygiene as everywhere else in this module).
    """
    import numpy as np

    joined = regions.join(raw_pages, ["doc", "page_num"])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for r in pdf.itertuples(index=False):
                img = np.frombuffer(bytes(r.pixels), dtype=np.uint8).reshape(
                    r.px_h, r.px_w, r.channels
                )
                sx, sy = r.px_w / r.page_w, r.px_h / r.page_h
                # clamp BOTH ends into [0, px] and force x1>=x0: a box
                # outside the raster (bad detector output, mismatched
                # coordinate basis) degrades to an empty 0-wide crop
                # instead of emitting negative px_w/px_h rows that crash
                # any reshape-ing consumer
                cx0 = min(max(0, int(np.floor(r.x0 * sx))), r.px_w)
                cy0 = min(max(0, int(np.floor(r.y0 * sy))), r.px_h)
                cx1 = max(cx0, min(r.px_w, int(np.ceil(r.x1 * sx))))
                cy1 = max(cy0, min(r.px_h, int(np.ceil(r.y1 * sy))))
                crop = np.ascontiguousarray(img[cy0:cy1, cx0:cx1])
                out.append(
                    (
                        r.doc, int(r.page_num), int(r.region_id), r.kind,
                        int(cx1 - cx0), int(cy1 - cy0), int(r.channels),
                        crop.tobytes(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc", "page_num", "region_id", "kind",
                    "px_w", "px_h", "channels", "pixels",
                ],
            )

    return joined.mapInPandas(op, schema=CROP_SCHEMA)
