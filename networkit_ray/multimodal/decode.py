"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Round 2: the decode step is REAL for every format that needs no external
codec — binary PPM/PGM (P6/P5), uncompressed 24-bit BMP, and PCM WAV
(stdlib ``wave``) — parsed with struct/numpy inside the actor pool.
Compressed formats (JPEG/PNG/MP4...) still raise NotImplementedError
naming the library they'd need (no codec libs in this container); the
dispatcher sniffs magic bytes, so a corpus can mix formats and fail
loudly only on the unsupported ones.  ``real=False`` keeps the
deterministic payload-hash fake for opaque test payloads.

Schema convention:
    media(id:int64, payload:binary, media_type:string, meta:string(json))
Decoded output:
    (id, height, width, channels, features:list<float>)
    (audio: height=num_frames, width=sample_rate, channels=channels)

Features are real content statistics: images → per-channel means +
downsampled luma grid; audio → RMS / zero-crossing rate / spectral
centroid + band energies.  ``resize_to`` applies a real nearest-neighbor
resize to the decoded pixels before feature extraction.

Batch sizing: binary payloads dominate block size — callers should use a
small ``batch_size`` (default 64) so batch × concurrency fits worker heaps
(the Ray Data guide's memory-aware rule for wide binary rows).
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
import wave

import numpy as np
import pyarrow as pa
import ray.data


# ---------------------------------------------------------------- encoders
# (used by synth_media so the REAL decode path is exercised end-to-end)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary P6 PPM."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples → PCM WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def synth_media(
    num_items: int, *, kind: str = "image", payload_bytes: int = 1024,
    noise_gen: str = "pcg",
) -> ray.data.Dataset:
    """Deterministic media table with REAL payloads: P6 PPM images with
    seeded gradient+noise pixels, or PCM WAV tones; ``kind='opaque'``
    produces the old hash-byte payloads (for the fake-decode path).

    ``noise_gen`` picks the image noise channel's source: ``"pcg"``
    (default) draws PCG64 bytes; ``"hash"`` derives byte (y, x) of image i
    from splitmix64((i+1)·FNV + y·w + x) — same uniform byte noise, but a
    pure counter function a SQL oracle can replay through the real
    encode→decode→feature pipeline."""
    if noise_gen not in ("pcg", "hash"):
        raise ValueError(f"unknown noise_gen {noise_gen!r} (want 'pcg' or 'hash')")

    def gen(batch: dict) -> pa.Table:
        ids = batch["id"]
        payloads, metas = [], []
        for i in ids:
            rng = np.random.default_rng(int(i) + 1)
            if kind == "image":
                h, w = 16 + int(i) % 16, 16 + (int(i) * 7) % 16
                yy, xx = np.mgrid[0:h, 0:w]
                base = ((yy * 255 // max(h - 1, 1))[..., None]).astype(np.uint8)
                if noise_gen == "hash":
                    from networkit_ray.sources.synth import _splitmix64

                    idx = np.arange(h * w, dtype=np.uint64)
                    noise = (
                        _splitmix64(
                            np.uint64(int(i) + 1) * np.uint64(0x100000001B3) + idx
                        )
                        & np.uint64(0xFF)
                    ).astype(np.uint8).reshape(h, w, 1)
                else:
                    noise = rng.integers(0, 256, (h, w, 1), dtype=np.uint8)
                px = np.concatenate(
                    [
                        base,
                        ((xx * 255 // max(w - 1, 1))[..., None]).astype(np.uint8),
                        noise,
                    ],
                    axis=2,
                )
                payloads.append(encode_ppm(px))
                metas.append(json.dumps({"kind": "image", "fmt": "ppm", "idx": int(i)}))
            elif kind == "audio":
                n = 2000 + (int(i) % 10) * 100
                t = np.arange(n)
                freq = 100 + (int(i) % 20) * 25
                s = (
                    8000 * np.sin(2 * np.pi * freq * t / 8000)
                    + rng.normal(0, 500, n)
                ).astype(np.int16)
                payloads.append(encode_wav(s))
                metas.append(json.dumps({"kind": "audio", "fmt": "wav", "idx": int(i)}))
            else:
                p = hashlib.blake2b(f"{kind}:{i}".encode(), digest_size=32).digest()
                payloads.append((p * (payload_bytes // 32 + 1))[:payload_bytes])
                metas.append(json.dumps({"kind": kind, "idx": int(i)}))
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array([kind] * len(ids), pa.string()),
                "meta": pa.array(metas, pa.string()),
            }
        )

    return ray.data.range(num_items).map_batches(gen, batch_format="numpy")


# ---------------------------------------------------------------- decoders


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 (RGB) / P5 (gray) → (H, W, C) uint8."""
    fields: list[bytes] = []
    pos = 0
    # header = magic, width, height, maxval — whitespace/comment separated
    while len(fields) < 4:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(payload[start:pos])
    pos += 1  # single whitespace after maxval
    magic, w, h = fields[0], int(fields[1]), int(fields[2])
    c = 3 if magic == b"P6" else 1
    px = np.frombuffer(payload, dtype=np.uint8, count=h * w * c, offset=pos)
    return px.reshape(h, w, c)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (H, W, 3) uint8 (top-down output)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP is supported")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=stride * abs(h), offset=off)
    rows = rows.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    bgr = rows[::-1] if h > 0 else rows  # bottom-up storage when h > 0
    return bgr[..., ::-1].copy()  # BGR → RGB


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (frames × channels int16 array, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        n, ch, rate = f.getnframes(), f.getnchannels(), f.getframerate()
        raw = f.readframes(n)
    samples = np.frombuffer(raw, dtype="<i2").reshape(-1, ch)
    return samples, rate


def _image_features(px: np.ndarray, dim: int) -> np.ndarray:
    """Per-channel means + a 2×2 luma grid, padded/truncated to ``dim``."""
    f = [px[..., c].mean() / 255.0 for c in range(px.shape[2])]
    luma = px.mean(axis=2)
    h, w = luma.shape
    for i in range(2):
        for j in range(2):
            f.append(
                luma[i * h // 2 : (i + 1) * h // 2, j * w // 2 : (j + 1) * w // 2].mean()
                / 255.0
            )
    return np.resize(np.asarray(f, np.float64), dim)


def _audio_features(samples: np.ndarray, rate: int, dim: int) -> np.ndarray:
    x = samples[:, 0].astype(np.float64) / 32768.0
    rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
    zcr = float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), 1.0 / rate)
    centroid = float((spec * freqs).sum() / spec.sum() / (rate / 2)) if spec.sum() else 0.0
    bands = np.array_split(spec, max(dim - 3, 1))
    be = [float(np.sqrt((b * b).mean())) for b in bands]
    return np.resize(np.asarray([rms, zcr, centroid] + be, np.float64), dim)


def _resize_nn(px: np.ndarray, target: int) -> np.ndarray:
    """Real nearest-neighbor resize to (target, target)."""
    h, w = px.shape[:2]
    yi = (np.arange(target) * h // target).clip(0, h - 1)
    xi = (np.arange(target) * w // target).clip(0, w - 1)
    return px[yi][:, xi]


class DecodeStub:
    """Actor-pool decode stage.

    real=True decodes PPM/PGM/BMP/WAV genuinely (magic-byte sniffing) and
    raises NotImplementedError for compressed formats; real=False emits the
    deterministic payload-hash fake for opaque payloads."""

    def __init__(self, real: bool = False, feature_dim: int = 8, resize_to: int | None = None):
        self.real = real
        self.feature_dim = feature_dim
        self.resize_to = resize_to

    def _decode_one(self, payload: bytes, media_type: str) -> tuple[int, int, int, np.ndarray]:
        if not self.real:
            h = hashlib.blake2b(payload, digest_size=16).digest()
            height = 16 + h[0] % 16
            width = 16 + h[1] % 16
            rng = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
            return height, width, 3, np.resize(rng / 255.0, self.feature_dim)
        if payload[:2] in (b"P6", b"P5"):
            px = decode_ppm(payload)
        elif payload[:2] == b"BM":
            px = decode_bmp(payload)
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            samples, rate = decode_wav(payload)
            return (
                samples.shape[0],
                rate,
                samples.shape[1],
                _audio_features(samples, rate, self.feature_dim),
            )
        else:
            raise NotImplementedError(
                "compressed media (JPEG/PNG/MP4/...) needs Pillow/ffmpeg, not in "
                "this container; PPM/PGM/BMP/WAV decode natively"
            )
        if self.resize_to:
            px = _resize_nn(px, self.resize_to)
        return (
            px.shape[0],
            px.shape[1],
            px.shape[2],
            _image_features(px, self.feature_dim),
        )

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
    resize_to: int | None = None,
    concurrency=(1, 4),
    batch_size: int = 64,
) -> ray.data.Dataset:
    return media.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"real": real, "resize_to": resize_to},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeStub:
    """Kept for API compatibility: metadata-only resize.  The REAL resize
    path is ``decode_media(..., resize_to=N)`` (nearest-neighbor on the
    decoded pixels before feature extraction)."""

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
            pa.array((t["id"].to_numpy(zero_copy_only=False) % every) == 0)
        ),
        batch_format="pyarrow",
    )
