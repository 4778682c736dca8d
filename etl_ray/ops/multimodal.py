"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as opaque ``binary`` columns with
metadata columns alongside; decode / feature-extract stages are actor-pool
``map_batches`` with SMALL batch sizes (large payloads × batch_size ×
concurrency must fit the worker heap — guide §"Memory-aware").

The actual codec is NOT available in this environment, so ``RealDecoder``
raises ``NotImplementedError`` and the pipeline runs with
``DeterministicFakeDecoder`` — the Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested; swap the decoder class
to go live.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .common import read

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


class RealDecoder:
    """The production decode stage. Requires an image/audio codec library
    that is not installed in this container."""

    def __init__(self):
        raise NotImplementedError(
            "no codec libs in this environment — use DeterministicFakeDecoder; "
            "swap this class in map_batches(...) on a real cluster"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError


class DeterministicFakeDecoder:
    """Stands in for decode+feature-extract: emits deterministic features
    (payload length, sha-derived checksum, fake width/height) so the
    pipeline shape and output schema are fully exercised."""

    def __init__(self):
        self.sha = hashlib.sha256

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        digest = [self.sha(p).digest() for p in payloads]
        width = [int.from_bytes(d[:2], "big") % 1920 + 1 for d in digest]
        height = [int.from_bytes(d[2:4], "big") % 1080 + 1 for d in digest]
        checksum = [int.from_bytes(d[4:12], "big") % (1 << 62) for d in digest]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "n_bytes": batch["n_bytes"],
                "width": pa.array(width, pa.int64()),
                "height": pa.array(height, pa.int64()),
                "checksum": pa.array(checksum, pa.int64()),
            }
        )


def media_table(sf_dir: str):
    """Build the opaque-binary media table from ``documents`` (text bytes
    stand in for encoded payloads; metadata columns are real)."""
    ds = read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def to_media(t: pa.Table) -> pa.Table:
        payload = t["text"].cast(pa.binary())
        return pa.table(
            {
                "media_id": t["doc_id"],
                "media_type": t["source"],
                "payload": payload,
                "n_bytes": pa.compute.binary_length(payload).cast(pa.int64()),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)


def media_features(sf_dir: str, decoder=DeterministicFakeDecoder) -> pd.DataFrame:
    """Decode/feature pipeline: binary column → actor-pool decode with small
    batches → feature table."""
    ds = media_table(sf_dir)
    feats = ds.map_batches(
        decoder,
        batch_format="pyarrow",
        batch_size=256,  # payload-heavy stage: small batches
        concurrency=(1, 4),
        num_cpus=1,
    )
    return feats.to_pandas().sort_values("media_id").reset_index(drop=True)
