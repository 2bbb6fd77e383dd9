"""2.J multimodal plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via mapInPandas.

The container has no image/audio libraries, so the decode step is a
clearly-marked deterministic STUB (per the build brief): the Spark
side — binary column handling, Arrow batch shapes, UDF signatures,
schema contracts — is real and tested; swap `_fake_features` for a
real decoder (PIL/librosa/ffmpeg) in production.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import functions as F

from ..registry import register, table

DECODERS_AVAILABLE = False  # no PIL/librosa in this container


def _fake_features(payload: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in for a real decode→feature-extract step.

    Raise NotImplementedError here if strict behavior is preferred;
    the fake keeps the pipeline testable end to end.
    """
    h = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)
    ]


@register("multimodal_decode_stub")  # rows-only: stub features are impl-defined
def multimodal_decode_stub(spark, sf_dir):
    """Binary-column pipeline: payload (binary) + typed metadata struct
    → mapInPandas decode → fixed-dim feature vector.

    documents.text stands in for the media bytes; with real media the
    only change is the decoder body.
    """
    d = table(spark, sf_dir, "documents")
    assets = d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length("text").cast("long").alias("n_bytes"),
            F.lit("stub-v1").alias("decoder"),
        ).alias("meta"),
    )

    def decode(batches):
        if not DECODERS_AVAILABLE:
            # STUB: deterministic fake features (see module docstring)
            extract = _fake_features
        else:  # pragma: no cover
            raise NotImplementedError("real decoders not present in this container")
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "features": [extract(p) for p in pdf["payload"]],
                }
            )

    return assets.mapInPandas(
        decode, "doc_id long, mime string, n_bytes long, features array<double>"
    )
