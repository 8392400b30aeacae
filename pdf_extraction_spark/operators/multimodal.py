"""Multimodal (binary) column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
extracted by Arrow-batched ``mapInPandas`` stages (the Spark-side plumbing —
schema, batching, partitioning — is real; the actual codec decode is STUBBED
deterministically because no image/audio libraries exist in this container).

The deterministic fake "decode" derives width/height from the payload's md5
so the DuckDB oracle can verify the full pipeline end-to-end:
``width = 64 + ascii(md5[0]) % 64``, ``height = 64 + ascii(md5[1]) % 64``.
Replace :func:`_decode_stub` with a real decoder (PIL/ffmpeg) in production;
the Spark plan does not change.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import tbl

META_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, fmt string"
)


def _decode_stub(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake decoder. A real implementation would parse the
    container header (PNG IHDR / JPEG SOF / WAV fmt chunk) here.

    Raises NotImplementedError for payloads claiming a real codec — the
    synthetic corpus never produces them, and the error path is exercised in
    tests.
    """
    if payload.startswith((b"\x89PNG", b"\xff\xd8\xff", b"RIFF")):
        raise NotImplementedError("real codec decode not available in this container")
    digest = hashlib.md5(payload).hexdigest()
    width = 64 + ord(digest[0]) % 64
    height = 64 + ord(digest[1]) % 64
    return width, height, "synthetic"


def _meta_batches(batches):
    for pdf in batches:
        out = {"doc_id": [], "n_bytes": [], "width": [], "height": [], "fmt": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            try:
                w, h, fmt = _decode_stub(payload)
            except NotImplementedError:
                w, h, fmt = -1, -1, "unsupported"
            out["doc_id"].append(int(doc_id))
            out["n_bytes"].append(len(payload))
            out["width"].append(w)
            out["height"].append(h)
            out["fmt"].append(fmt)
        yield pd.DataFrame(out)


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction: documents.text encoded as a fake
    binary payload → mapInPandas batch decode → typed metadata."""
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return docs.mapInPandas(_meta_batches, schema=META_SCHEMA)


SQL_MULTIMODAL_META = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       64 + ascii(substr(md5(text), 1, 1)) % 64 AS width,
       64 + ascii(substr(md5(text), 2, 1)) % 64 AS height,
       'synthetic' AS fmt
FROM documents
"""


# -- frame sampling ---------------------------------------------------------------

FRAME_STRIDE = 1000  # characters per synthetic "frame"
MAX_FRAMES = 4

FRAMES_SCHEMA = (
    "doc_id long, frame_idx int, frame_off long, frame_sig string"
)


def _frame_batches(batches):
    """Frame-sampling plumbing: one input document → N frame rows (video
    frame-sampling shape). The 'frame' is a character-stride slice and its
    signature an md5 prefix over the slice's UTF-8 bytes — character-based
    so the DuckDB oracle's substr/md5 reproduces it exactly for non-ASCII
    text too (ADVICE r1). A real decoder would emit decoded frame tensors
    here; the Spark-side fan-out schema, batching, and ordering are exactly
    what that decoder would need."""
    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame_sig": []}
        for doc_id, text in zip(pdf["doc_id"], pdf["payload"]):
            text = str(text)
            n_frames = min(max(len(text) // FRAME_STRIDE, 1), MAX_FRAMES)
            for i in range(n_frames):
                off = i * FRAME_STRIDE
                sig = hashlib.md5(
                    text[off : off + FRAME_STRIDE].encode("utf-8")
                ).hexdigest()[:8]
                out["doc_id"].append(int(doc_id))
                out["frame_idx"].append(i)
                out["frame_off"].append(off)
                out["frame_sig"].append(sig)
        yield pd.DataFrame(out)


def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over document payloads: mapInPandas fan-out (1 → N
    rows) with deterministic per-frame signatures the oracle reproduces with
    substring+md5 arithmetic (both sides character-based)."""
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("payload")
    )
    return docs.mapInPandas(_frame_batches, schema=FRAMES_SCHEMA)


SQL_MULTIMODAL_FRAMESAMPLE = f"""
WITH d AS (
  SELECT doc_id, text,
         least(greatest(length(text) // {FRAME_STRIDE}, 1), {MAX_FRAMES}) AS n_frames
  FROM documents
)
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       CAST(i * {FRAME_STRIDE} AS BIGINT) AS frame_off,
       substr(md5(substr(text, i * {FRAME_STRIDE} + 1, {FRAME_STRIDE})), 1, 8) AS frame_sig
FROM d, LATERAL (SELECT unnest(generate_series(0, n_frames - 1)) AS i)
"""
