"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference moves binary payloads (LAZ point clouds, GeoTIFF rasters)
OUTSIDE the table as files (src/pacasam/extractors/laz.py:8-17); a 100 TB
training-data engine instead carries them as ``binary`` columns with typed
metadata and runs decode / feature-extract / resize / frame-sample as
actor-pool ``map_batches`` stages.

Real codecs (PIL/libav/soundfile) are NOT in this environment, so the
decode step is STUBBED: ``RealImageDecoder.decode`` raises
NotImplementedError, and the default ``fake=True`` path runs a
deterministic fake decoder (payload bytes → pixel grid) so the Ray-side
plumbing — schema, batch sizing, actor signatures, output layout — is real
and tested end-to-end.

Batch-size note: payload columns are wide; stages here should run with a
small ``batch_size`` (rows × payload bytes × concurrency must fit worker
heaps) — callers pass batch_size explicitly, see queries.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

try:  # real codec when the environment ships one (not in this container)
    from PIL import Image as _PIL_Image
except ImportError:  # pragma: no cover - sandbox default
    _PIL_Image = None

KINDS = ["image", "audio", "video"]
FRAME_BYTES = 32  # fake video: one "frame" per 32 payload bytes
SAMPLE_RATE = 16_000


def media_from_pages(pages, payload_col: str = "html"):
    """pages → media table: (doc_id, url, kind, payload, n_bytes).

    kind is a deterministic function of doc_id (so SQL oracles can
    reproduce it); payload is the page's binary column reinterpreted as an
    opaque media blob.
    """

    def _to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kind = pa.array([KINDS[i % len(KINDS)] for i in ids.tolist()])
        payload = pc.cast(t[payload_col], pa.binary())
        n_bytes = pc.cast(pc.binary_length(payload), pa.int64())
        return pa.table({
            "doc_id": pa.array(ids), "url": t["url"], "kind": kind,
            "payload": payload, "n_bytes": n_bytes,
        })

    return pages.map_batches(_to_media, batch_format="pyarrow", zero_copy_batch=True)


def media_meta(media):
    """Typed metadata per kind, all derived deterministically from n_bytes
    (SQL-oracle-checkable): images get a pixel grid, audio a duration,
    video a frame count."""

    def _meta(t: pa.Table) -> pa.Table:
        n = t["n_bytes"].to_numpy(zero_copy_only=False).astype(np.int64)
        kind = t["kind"].to_pylist()
        is_img = np.array([k == "image" for k in kind])
        is_vid = np.array([k == "video" for k in kind])
        width = np.where(is_img, 16, 0).astype(np.int64)
        height = np.where(is_img, (n + 15) // 16, 0).astype(np.int64)
        n_frames = np.where(is_vid, (n + FRAME_BYTES - 1) // FRAME_BYTES, 0).astype(np.int64)
        dur_us = np.where(
            np.array([k == "audio" for k in kind]),
            n * 1_000_000 // (SAMPLE_RATE * 2), 0
        ).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"], "kind": t["kind"], "n_bytes": t["n_bytes"],
            "width": pa.array(width), "height": pa.array(height),
            "n_frames": pa.array(n_frames), "duration_us": pa.array(dur_us),
        })

    return media.map_batches(_meta, batch_format="pyarrow", zero_copy_batch=True)


def media_meta_sql(table: str = "documents") -> str:
    """Oracle over the documents view: n_bytes = html wrapper + text bytes
    (pages wrap text in a fixed 50+18-byte html frame, sources/pages.py)."""
    from ..sources.pages import HTML_PREFIX, HTML_SUFFIX

    wrap = len(HTML_PREFIX) + len(HTML_SUFFIX)
    kinds = ", ".join(f"'{k}'" for k in KINDS)
    return f"""
WITH m AS (
  SELECT doc_id, [{kinds}][(doc_id % {len(KINDS)}) + 1] AS kind,
         OCTET_LENGTH(ENCODE(text)) + {wrap} AS n_bytes
  FROM {table}
)
SELECT doc_id, kind, n_bytes,
  CAST(CASE WHEN kind = 'image' THEN 16 ELSE 0 END AS BIGINT) AS width,
  CASE WHEN kind = 'image' THEN (n_bytes + 15) // 16 ELSE 0 END AS height,
  CASE WHEN kind = 'video' THEN (n_bytes + {FRAME_BYTES - 1}) // {FRAME_BYTES} ELSE 0 END AS n_frames,
  CASE WHEN kind = 'audio' THEN n_bytes * 1000000 // {SAMPLE_RATE * 2} ELSE 0 END AS duration_us
FROM m
"""


class ImageDecoder:
    """Actor-pool decode + feature-extract stage (T1/E3 analog: heavy state
    — a real codec context — built once per actor in ``__init__``).

    ``fake=False`` is the production signature: it decodes through PIL
    (probed at import) when the environment ships it, grayscale-converting
    to the same (h, w) uint8 layout; in this container PIL is absent and
    the call raises NotImplementedError. ``fake=True`` (sandbox default)
    decodes payload bytes into a deterministic (h, 16) uint8 pixel grid and
    emits real vectorized features + a resized thumbnail, exercising the
    full Ray plumbing.
    """

    def __init__(self, fake: bool = True, thumb: int = 8,
                 payload_col: str = "payload"):
        self.fake, self.thumb, self.payload_col = fake, thumb, payload_col

    def decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            if _PIL_Image is None:
                raise NotImplementedError(
                    "real image decode requires PIL (not in this container)"
                )
            import io  # pragma: no cover - exercised only where PIL exists

            with _PIL_Image.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("L"), dtype=np.uint8)
        px = np.frombuffer(payload, dtype=np.uint8)
        h = (len(px) + 15) // 16
        grid = np.zeros(h * 16, dtype=np.uint8)
        grid[: len(px)] = px
        return grid.reshape(h, 16)

    def resize(self, img: np.ndarray) -> np.ndarray:
        """Nearest-neighbour resample to (thumb, thumb) — index striding,
        no Python pixel loop."""
        h, w = img.shape
        yi = (np.arange(self.thumb) * h // self.thumb).clip(0, h - 1)
        xi = (np.arange(self.thumb) * w // self.thumb).clip(0, w - 1)
        return img[np.ix_(yi, xi)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        means, stds, thumbs = [], [], []
        for p in payloads:
            img = self.decode(p)
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            thumbs.append(self.resize(img).tobytes())
        return pa.table({
            "doc_id": batch["doc_id"],
            "mean_px": pa.array(means, pa.float64()),
            "std_px": pa.array(stds, pa.float64()),
            "thumb": pa.array(thumbs, pa.binary()),
        })


def decode_images(media, concurrency: int | tuple = (1, 4),
                  batch_size: int = 256, **kw):
    """Decode stage wiring: small batches (payloads are wide), actor pool."""
    imgs = media.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return imgs.map_batches(
        ImageDecoder, batch_format="pyarrow", fn_constructor_kwargs=kw,
        concurrency=concurrency, batch_size=batch_size,
    )


def frame_sample(media, stride: int = 4, concurrency: int | tuple = (1, 4),
                 batch_size: int = 256):
    """Video frame-sampling: flat_map each video payload into every
    ``stride``-th FRAME_BYTES-chunk — one output row per kept frame."""

    def _frames(t: pa.Table) -> pa.Table:
        vids = t.filter(pc.equal(t["kind"], "video"))
        out_id, out_idx, out_frame = [], [], []
        for did, p in zip(vids["doc_id"].to_pylist(), vids["payload"].to_pylist()):
            n_frames = (len(p) + FRAME_BYTES - 1) // FRAME_BYTES
            for fi in range(0, n_frames, stride):
                out_id.append(did)
                out_idx.append(fi)
                out_frame.append(p[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES])
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_idx, pa.int64()),
            "frame": pa.array(out_frame, pa.binary()),
        })

    return media.map_batches(
        _frames, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


def frame_sample_sql(table: str = "documents", stride: int = 4) -> str:
    """Oracle for the frame-sample row layout (ids + indices; frame bytes
    are checked per-row by pytest, not the hash oracle — BLOB columns)."""
    from ..sources.pages import HTML_PREFIX, HTML_SUFFIX

    wrap = len(HTML_PREFIX) + len(HTML_SUFFIX)
    return f"""
WITH v AS (
  SELECT doc_id, (OCTET_LENGTH(ENCODE(text)) + {wrap} + {FRAME_BYTES - 1}) // {FRAME_BYTES} AS n_frames
  FROM {table} WHERE doc_id % 3 = 2
)
SELECT doc_id, (i - 1) * {stride} AS frame_idx
FROM v, UNNEST(generate_series(1, (n_frames + {stride - 1}) // {stride})) AS t(i)
"""
