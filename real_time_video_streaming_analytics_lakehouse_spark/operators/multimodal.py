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
