"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The container has no image/audio codecs, so the *decode* step is STUBBED:
``DecodeStub(real=True)`` raises NotImplementedError with the exact library
it would use; ``real=False`` (default in tests) produces a deterministic
fake decode derived from the payload hash.  Everything around the stub — the
schema, the actor-pool signature, batch sizing for large binary rows, and
the output layout — is real and tested, so swapping in a codec is a one-line
change inside ``_decode_one``.

Schema convention:
    media(id:int64, payload:binary, media_type:string, meta:string(json))
Decoded output:
    (id, height, width, channels, features:list<float>)

Batch sizing: binary payloads dominate block size — callers should use a
small ``batch_size`` (default 64) so batch × concurrency fits worker heaps
(the Ray Data guide's memory-aware rule for wide binary rows).
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa
import ray.data


def synth_media(num_items: int, *, kind: str = "image", payload_bytes: int = 1024) -> ray.data.Dataset:
    """Deterministic fake media table (payload = seeded bytes per id)."""

    def gen(batch: dict) -> pa.Table:
        ids = batch["id"]
        payloads = [
            hashlib.blake2b(f"{kind}:{i}".encode(), digest_size=32).digest()
            * (payload_bytes // 32 + 1)
            for i in ids
        ]
        payloads = [p[:payload_bytes] for p in payloads]
        meta = [json.dumps({"kind": kind, "idx": int(i)}) for i in ids]
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array([kind] * len(ids), pa.string()),
                "meta": pa.array(meta, pa.string()),
            }
        )

    return ray.data.range(num_items).map_batches(gen, batch_format="numpy")


class DecodeStub:
    """Actor-pool decode stage.  real=True raises (no codecs in container);
    real=False emits a deterministic fake decode so downstream plumbing
    (schema, feature extraction, resize) is exercised end-to-end."""

    def __init__(self, real: bool = False, feature_dim: int = 8):
        self.real = real
        self.feature_dim = feature_dim

    def _decode_one(self, payload: bytes, media_type: str) -> tuple[int, int, int, np.ndarray]:
        if self.real:
            raise NotImplementedError(
                "image/audio decode requires Pillow/torchaudio/ffmpeg, which are "
                "not in this container; run with real=False for the deterministic "
                "fake, or install a codec and implement here."
            )
        h = hashlib.blake2b(payload, digest_size=16).digest()
        height = 16 + h[0] % 16
        width = 16 + h[1] % 16
        channels = 3
        rng = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
        feats = np.resize(rng / 255.0, self.feature_dim)
        return height, width, channels, feats

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        kinds = t["media_type"].to_pylist()
        hs, ws, cs, fs = [], [], [], []
        for p, k in zip(payloads, kinds):
            h, w, c, f = self._decode_one(p, k)
            hs.append(h)
            ws.append(w)
            cs.append(c)
            fs.append(f)
        return pa.table(
            {
                "id": t["id"],
                "height": pa.array(hs, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "channels": pa.array(cs, pa.int64()),
                "features": pa.array([list(f) for f in fs], pa.list_(pa.float64())),
            }
        )


def decode_media(
    media: ray.data.Dataset,
    *,
    real: bool = False,
    concurrency=(1, 4),
    batch_size: int = 64,
) -> ray.data.Dataset:
    return media.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"real": real},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeStub:
    """Fake resize: deterministically rescales the stub dimensions; the real
    implementation would operate on the decoded pixel buffer."""

    def __init__(self, target: int = 16):
        self.target = target

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        return (
            t.drop_columns(["height", "width"])
            .append_column("height", pa.array([self.target] * n, pa.int64()))
            .append_column("width", pa.array([self.target] * n, pa.int64()))
        )


def frame_sample(media: ray.data.Dataset, *, every: int = 2) -> ray.data.Dataset:
    """Deterministic frame-sampling stand-in: keep ids ≡ 0 (mod every)."""
    return media.map_batches(
        lambda t: t.filter(
            pa.compute.equal(pa.compute.mod(t["id"], every), 0)
            if hasattr(pa.compute, "mod")
            else pa.array((t["id"].to_numpy(zero_copy_only=False) % every) == 0)
        ),
        batch_format="pyarrow",
    )
