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


def decode_media(content: bytes) -> tuple[int, int]:
    """Real image decode: (width, height) via PIL when it is importable
    (a cluster image with pillow gets the real path with no code
    change); raises ``NotImplementedError`` when no imaging library is
    present — use :func:`fake_decode_meta` for plumbing tests there.
    ``Image.open`` reads only the header to size the image, so this
    never materializes pixel data for metadata extraction."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "media decode requires an image/audio library not present in "
            "this environment; use fake_decode_meta for plumbing tests"
        )
    import io

    with Image.open(io.BytesIO(content)) as im:
        return im.width, im.height


def _decode_meta(content: bytes) -> tuple[int, int, int, str]:
    """Per-row decode dispatch for the mapInPandas stage: the REAL
    decoder iff PIL imports (undecodable payloads fall back to the
    deterministic fake geometry with an explicit ``decode_error``
    status, never a poisoned batch); the fake path, labeled
    ``stubbed``, otherwise."""
    if _HAS_PIL:
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
