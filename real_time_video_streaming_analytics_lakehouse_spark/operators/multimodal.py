"""Multimodal (image/audio/video) column plumbing.

Part of the training-pipeline surface (BASELINE.json north star): treat
media as opaque ``binary`` columns with typed metadata, and run decode /
feature-extraction as Arrow-batched ``mapInPandas`` — the one place in
this engine where Python legitimately enters the data path, because no
built-in expression can decode media.

The decode itself is STUBBED: the real implementation needs PIL /
ffmpeg / torchaudio, none of which exist in this container. The Spark
plumbing — binary column handling, output schema, batch iteration,
partition-preserving execution — is real and tested. ``fake=True``
(default) derives deterministic pseudo-features from the first bytes of
the payload so the pipeline is end-to-end verifiable (and, because the
test payloads are ``unhex(md5(text))``, reproducible in the DuckDB
oracle via hex arithmetic); ``fake=False`` raises ``NotImplementedError``
at the decode site, clearly marking where a real decoder plugs in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id BIGINT, media_format STRING, payload_bytes INT, "
    "width INT, height INT, n_frames INT"
)


def attach_fake_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize an opaque media column + metadata from text content.

    ``payload = unhex(md5(text))`` — a deterministic stand-in for real
    image bytes, with the same schema shape a real pipeline would use:
    (id, payload binary, media_format string, payload_len int).
    """
    payload = F.unhex(F.md5(F.col(text_col)))
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.when(F.col(id_col) % 3 == 0, "png")
        .when(F.col(id_col) % 3 == 1, "jpeg")
        .otherwise("mp4")
        .alias("media_format"),
        F.length(payload).alias("payload_len"),
    )


def decode_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode media payloads into features via Arrow-batched mapInPandas.

    Real decoders (PIL/ffmpeg) are NOT available here — ``fake=False``
    raises ``NotImplementedError`` inside the UDF to mark the plug-in
    point. The fake path derives (width, height, n_frames) from the
    first three payload bytes, exercising the exact batch shapes,
    schema contract, and binary transfer a real decoder would use.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # Plug-in point for a real decoder:
                #   from PIL import Image; Image.open(io.BytesIO(b)) ...
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg, not present "
                    "in this environment"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_format": pdf["media_format"],
                    "payload_bytes": payloads.map(len).astype("int32"),
                    "width": payloads.map(lambda b: b[0] % 128 + 1).astype("int32"),
                    "height": payloads.map(lambda b: b[1] % 128 + 1).astype("int32"),
                    "n_frames": payloads.map(lambda b: b[2] % 120 + 1).astype(
                        "int32"
                    ),
                }
            )

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


def sample_frames(
    media: DataFrame, max_frames: int = 4, fake: bool = True
) -> DataFrame:
    """Uniform-stride frame sampling: one output row per sampled frame
    (1→N mapInPandas explode with per-frame fingerprints).

    A real implementation reads the container's frame count and decodes
    the selected frames (ffmpeg seek); the fake derives ``n_frames``
    from payload byte 2 (same rule as :func:`decode_media_features`)
    and fingerprints each sampled frame as
    ``md5(hex(payload) + ':' + idx)`` — reproducible in the DuckDB
    oracle via string md5. Stride = ceil(n/max_frames), so sampling is
    uniform and at most ``max_frames`` frames emit per doc.

    Partition-preserving: no shuffle; output size is bounded by
    ``max_frames`` × input rows regardless of media length.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg, not present in "
                    "this environment"
                )
            ids, idxs, fps = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = payload[2] % 120 + 1
                stride = math.ceil(n / max_frames)
                for i in range(0, n, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    fps.append(
                        hashlib.md5(
                            f"{payload.hex()}:{i}".encode()
                        ).hexdigest()
                    )
            import numpy as np

            yield pd.DataFrame(
                {
                    "doc_id": np.array(ids, dtype="int64"),
                    "frame_idx": np.array(idxs, dtype="int32"),
                    "frame_fp": fps,
                }
            )

    return media.mapInPandas(
        sample, schema="doc_id BIGINT, frame_idx INT, frame_fp STRING"
    )


def resize_images(
    media: DataFrame, max_w: int = 64, max_h: int = 64, fake: bool = True
) -> DataFrame:
    """Aspect-preserving fit-to-box resize (integer arithmetic only, so
    the DuckDB oracle reproduces the dimensions exactly).

    ``new_h = min(h, max_h)`` when height is the binding constraint
    (``w*max_h <= h*max_w``), else ``new_w = min(w, max_w)``; the other
    side scales by integer floor division. The resized payload is
    fingerprinted (``md5(hex(payload) + ':WxH')``) — a real
    implementation returns the re-encoded bytes from PIL.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real resize requires PIL, not present in this "
                    "environment"
                )
            rows = {k: [] for k in
                    ("doc_id", "media_format", "width", "height",
                     "new_width", "new_height", "resized_fp")}
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["media_format"], pdf["payload"]
            ):
                w = payload[0] % 128 + 1
                h = payload[1] % 128 + 1
                if w <= max_w and h <= max_h:
                    nw, nh = w, h
                elif w * max_h <= h * max_w:  # height binds
                    nh = max_h
                    nw = max(1, (w * max_h) // h)
                else:
                    nw = max_w
                    nh = max(1, (h * max_w) // w)
                rows["doc_id"].append(doc_id)
                rows["media_format"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["new_width"].append(nw)
                rows["new_height"].append(nh)
                rows["resized_fp"].append(
                    hashlib.md5(
                        f"{payload.hex()}:{nw}x{nh}".encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(rows).astype(
                {
                    "doc_id": "int64",
                    "width": "int32",
                    "height": "int32",
                    "new_width": "int32",
                    "new_height": "int32",
                }
            )

    return media.mapInPandas(
        resize,
        schema=(
            "doc_id BIGINT, media_format STRING, width INT, height INT, "
            "new_width INT, new_height INT, resized_fp STRING"
        ),
    )


def media_embeddings(
    media: DataFrame, dim: int = 8, fake: bool = True
) -> DataFrame:
    """Feature-extraction stub: payload → ``array<double>`` embedding.

    The fake embeds the first ``dim`` payload bytes scaled to [0, 1]
    (byte/255 — identical IEEE division in any engine); a real
    implementation runs a vision/audio encoder per Arrow batch. Output
    feeds the similarity family (:mod:`.similarity`) directly, which is
    the point: multimodal dedup = decode → embed → cosine near-dup.
    """

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real feature extraction requires a media encoder, "
                    "not present in this environment"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "embedding": [
                        [b / 255.0 for b in payload[:dim]]
                        for payload in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(
        embed, schema="doc_id BIGINT, embedding ARRAY<DOUBLE>"
    )
