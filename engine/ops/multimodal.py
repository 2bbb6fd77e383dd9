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
                    # scalar cells only at the driver boundary: features
                    # serialize as e6-scaled ints joined with ','.
                    "features": [
                        ",".join(str(int(round(v * 1e6))) for v in extract(p))
                        for p in pdf["payload"]
                    ],
                }
            )

    return assets.mapInPandas(
        decode, "doc_id long, mime string, n_bytes long, features string"
    )


FRAME_BYTES = 64
FRAME_STRIDE = 4  # keep every 4th frame


@register("multimodal_frame_sample")  # rows-only: stub frames are impl-defined
def multimodal_frame_sample(spark, sf_dir):
    """One-to-many media fan-out: payload → sampled frame rows
    (frame_idx, frame_bytes, fingerprint) via mapInPandas, the shape a
    real video frame-sampler has (decode is the stub; the fan-out,
    batch iteration, and schema contract are real). Each document
    yields ceil(n_bytes/64)/4 frames."""
    import hashlib

    d = table(spark, sf_dir, "documents")
    assets = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def sample(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "n_frame_bytes": [], "fingerprint": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                frames = [b[i : i + FRAME_BYTES] for i in range(0, len(b), FRAME_BYTES)]
                for idx in range(0, len(frames), FRAME_STRIDE):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["n_frame_bytes"].append(len(frames[idx]))
                    out["fingerprint"].append(
                        int.from_bytes(
                            hashlib.sha256(frames[idx]).digest()[:8], "big", signed=True
                        )
                    )
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        sample, "doc_id long, frame_idx long, n_frame_bytes long, fingerprint long"
    )


RESIZE_TARGET = 32  # target "resolution" in stub bytes


@register("multimodal_resize_stub")  # rows-only: stub resample is impl-defined
def multimodal_resize_stub(spark, sf_dir):
    """Binary→binary media transform (the resize/resample step):
    payload bytes are deterministically downsampled to RESIZE_TARGET
    bytes (stride sampling — the stub twin of bilinear resize), with
    typed before/after metadata. With real media only the resampler
    body changes; the binary-in/binary-out mapInPandas plumbing,
    Arrow transfer of bytearray columns, and metadata contract are
    what this op pins. Output fingerprint columns are scalars so the
    driver's canonicalizer can hash rows."""
    import hashlib

    d = table(spark, sf_dir, "documents")
    assets = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def resize(batches):
        if not DECODERS_AVAILABLE:
            pass  # STUB resampler below; real path would NotImplementedError
        for pdf in batches:
            out = {"doc_id": [], "n_bytes_in": [], "n_bytes_out": [], "out_sha_prefix": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                stride = max(1, len(b) // RESIZE_TARGET)
                resized = b[::stride][:RESIZE_TARGET]
                out["doc_id"].append(doc_id)
                out["n_bytes_in"].append(len(b))
                out["n_bytes_out"].append(len(resized))
                out["out_sha_prefix"].append(
                    int.from_bytes(
                        hashlib.sha256(resized).digest()[:8], "big", signed=True
                    )
                )
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        resize, "doc_id long, n_bytes_in long, n_bytes_out long, out_sha_prefix long"
    )
