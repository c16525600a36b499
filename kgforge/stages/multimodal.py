"""Multimodal column stages: image/audio/video as opaque ``binary``
columns with typed metadata.

The Ray-side plumbing (schemas, actor-pool signatures, batch sizing,
output layout) is real and tested; the actual codec decode is STUBBED
because no image/audio libraries exist in this container:

- ``DecodeImage`` tries ``PIL`` at actor init; absent, it falls back to
  a deterministic fake decoder that parses the 16-byte FKIM header
  written by :func:`fake_image_bytes` (and raises
  ``NotImplementedError`` for real codecs).
- ``ByteHistogramFeatures`` is a real feature-extraction stage (numpy
  byte-value histogram → fixed-dim float vector) standing in for a
  model-embedding stage: same actor-pool shape, same output layout.

Large binary payloads: run these with a SMALL ``batch_size`` (32-128)
and ``batch_format="pyarrow"`` so a batch × concurrency fits in worker
heap; blocks carrying multi-MB blobs should be read with a reduced
``target_max_block_size``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"FKIM"


def fake_image_bytes(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic stand-in payload: 16-byte header + seeded pixels."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return MAGIC + struct.pack("<iii", width, height, seed) + pixels.tobytes()


class DecodeImage:
    """Actor-pool stage: ``content: binary`` → width/height/ok columns.

    Real decoders load once per actor in ``__init__`` (the PIL
    import-try); per-batch work touches only buffers.
    """

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401 — not present in container
            self._pil = Image
        except ImportError:
            self._pil = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, ok = [], [], []
        for v in batch.column("content"):
            raw = v.as_py()
            if raw is None:
                widths.append(None); heights.append(None); ok.append(False)
                continue
            if raw[:4] == MAGIC:
                w, h, _seed = struct.unpack("<iii", raw[4:16])
                widths.append(w); heights.append(h); ok.append(True)
            elif self._pil is not None:
                import io
                with self._pil.open(io.BytesIO(raw)) as im:
                    widths.append(im.width); heights.append(im.height)
                    ok.append(True)
            else:
                raise NotImplementedError(
                    "real image codecs unavailable in this container; "
                    "payload is not FKIM fake format")
        batch = batch.append_column("width", pa.array(widths, pa.int32()))
        batch = batch.append_column("height", pa.array(heights, pa.int32()))
        return batch.append_column("decode_ok", pa.array(ok, pa.bool_()))


class ByteHistogramFeatures:
    """Feature extraction over binary payloads: ``n_bins``-dim normalized
    byte-value histogram (real numpy compute; the slot where a model
    embedding stage plugs in)."""

    def __init__(self, n_bins: int = 16):
        self.n_bins = n_bins
        self.edges = np.linspace(0, 256, n_bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for v in batch.column("content"):
            raw = v.as_py()
            if not raw:
                feats.append([0.0] * self.n_bins)
                continue
            arr = np.frombuffer(raw, dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=self.edges)
            feats.append((hist / max(1, len(arr))).astype(np.float64).tolist())
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float64())))


def frame_sample_stub(batch: pa.Table, every_n: int = 10) -> pa.Table:
    """Video frame-sampling plumbing stub: emits (content, frame_idx)
    rows for frames 0, n, 2n… of a fake fixed-length clip — the output
    layout a real decoder stage would produce."""
    id_o, frame_o = [], []
    ids = batch.column("item_id").to_pylist()
    for i in ids:
        for f in range(0, 30, every_n):
            id_o.append(i)
            frame_o.append(f)
    return pa.Table.from_arrays(
        [pa.array(id_o, pa.int64()), pa.array(frame_o, pa.int32())],
        names=["item_id", "frame_idx"])


VIDEO_MAGIC = b"FKVD"


def fake_video_bytes(item_id: int, n_frames: int | None = None,
                     width: int = 16, height: int = 12) -> bytes:
    """Deterministic video stand-in payload: 24-byte header + n_frames
    planes of formulaic uint8 pixels ``p(f, i) = (item_id*13 + f*17 +
    i*5) % 256``.  The formula (not an RNG) is deliberate, the FKAU
    trick: a SQL oracle re-derives every pixel, so the decode →
    frame-sample → feature pipeline gates hash-exactly."""
    n = n_frames if n_frames is not None else 24 + (item_id % 7)
    f = np.arange(n, dtype=np.int64)[:, None]
    i = np.arange(width * height, dtype=np.int64)[None, :]
    px = ((item_id * 13 + f * 17 + i * 5) % 256).astype(np.uint8)
    return (VIDEO_MAGIC + struct.pack("<iiiq", n, width, height,
                                      item_id) + px.tobytes())


class SampleFrames:
    """Actor-pool stage: ``content: binary`` video → one OUTPUT ROW PER
    SAMPLED FRAME (``frame_idx`` = 0, every_n, 2·every_n, …) with
    integer-exact per-frame features (``frame_sum`` = pixel sum,
    ``frame_max``) — the decode + frame-sample layout a training
    pipeline feeds to a vision encoder.  A real codec (av / decord)
    would load once per actor in ``__init__``; the FKVD fake format
    exercises the identical buffer path (struct header + zero-copy
    ``np.frombuffer`` + strided frame gather), and real payloads raise
    until a codec exists.  Large payloads: run with a small
    ``batch_size`` — each input row fans out to multiple output rows."""

    def __init__(self, every_n: int = 5):
        if every_n < 1:
            raise ValueError("every_n must be >= 1")
        self.every_n = every_n
        try:
            import av  # noqa: F401 — not present in container
            self._av = av
        except ImportError:
            self._av = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_o, fidx, fsum, fmax, npx = [], [], [], [], []
        ids = batch.column("item_id").to_pylist()
        for item, v in zip(ids, batch.column("content")):
            raw = v.as_py()
            if raw is None:
                continue
            if raw[:4] != VIDEO_MAGIC:
                if self._av is None:
                    raise NotImplementedError(
                        "real video codecs unavailable in this "
                        "container; payload is not FKVD fake format")
                raise NotImplementedError(
                    "real-codec frame sampling not wired yet")
            n, w, h, _item = struct.unpack("<iiiq", raw[4:24])
            plane = w * h
            frames = np.frombuffer(
                raw[24:24 + n * plane], dtype=np.uint8).reshape(n, plane)
            take = np.arange(0, n, self.every_n)
            sampled = frames[take].astype(np.int64)
            ids_o.extend([item] * len(take))
            fidx.extend(take.tolist())
            fsum.extend(sampled.sum(axis=1).tolist())
            fmax.extend(sampled.max(axis=1).tolist())
            npx.extend([plane] * len(take))
        return pa.table({
            "item_id": pa.array(ids_o, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "n_pixels": pa.array(npx, pa.int64()),
            "frame_sum": pa.array(fsum, pa.int64()),
            "frame_max": pa.array(fmax, pa.int64())})


AUDIO_MAGIC = b"FKAU"


def fake_audio_bytes(item_id: int, n_samples: int | None = None) -> bytes:
    """Deterministic PCM stand-in payload: 16-byte header + int16
    samples ``s(i) = (item_id*31 + i*7) % 65536 - 32768``.  The formula
    (not a seeded RNG) is deliberate: a SQL oracle can re-derive every
    sample, so the decode→feature pipeline is hash-exactly gated."""
    n = n_samples if n_samples is not None else 1000 + (item_id % 7) * 100
    i = np.arange(n, dtype=np.int64)
    samples = ((item_id * 31 + i * 7) % 65536 - 32768).astype(np.int16)
    return (AUDIO_MAGIC + struct.pack("<iq", n, item_id)
            + samples.tobytes())


class DecodeAudio:
    """Actor-pool stage: ``content: binary`` → int16 sample buffers with
    integer-exact summary features (``n_samples``, ``energy`` = sum of
    squared samples, ``peak`` = max |sample|).  Real codecs would load
    once per actor (the soundfile import-try); the FKAU fake format
    exercises the identical buffer path (struct header + zero-copy
    ``np.frombuffer``), and real payloads raise until a codec exists."""

    def __init__(self):
        try:
            import soundfile  # noqa: F401 — not present in container
            self._sf = soundfile
        except ImportError:
            self._sf = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, energy, peak, ok = [], [], [], []
        for v in batch.column("content"):
            raw = v.as_py()
            if raw is None:
                ns.append(0); energy.append(0); peak.append(0)
                ok.append(False)
                continue
            if raw[:4] == AUDIO_MAGIC:
                n, _item = struct.unpack("<iq", raw[4:16])
                samples = np.frombuffer(raw[16:16 + 2 * n],
                                        dtype=np.int16).astype(np.int64)
            elif self._sf is not None:
                import io
                data, _sr = self._sf.read(io.BytesIO(raw), dtype="int16")
                samples = np.asarray(data, dtype=np.int64).ravel()
                n = len(samples)
            else:
                raise NotImplementedError(
                    "real audio codecs unavailable in this container; "
                    "payload is not FKAU fake format")
            ns.append(int(n))
            energy.append(int(np.sum(samples * samples)))
            peak.append(int(np.max(np.abs(samples))) if n else 0)
            ok.append(True)
        batch = batch.append_column("n_samples", pa.array(ns, pa.int64()))
        batch = batch.append_column("energy", pa.array(energy, pa.int64()))
        batch = batch.append_column("peak", pa.array(peak, pa.int64()))
        return batch.append_column("decode_ok", pa.array(ok, pa.bool_()))


class ResizeImage:
    """Actor-pool stage: nearest-neighbor resize of FKIM payloads to a
    fixed (out_w, out_h) — real numpy gather work on the decoded pixel
    buffer, emitting the resized payload plus an integer checksum
    (pytest-golden; the RNG pixels aren't SQL-derivable)."""

    def __init__(self, out_w: int = 8, out_h: int = 6):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, checksums = [], []
        for v in batch.column("content"):
            raw = v.as_py()
            if raw is None or raw[:4] != MAGIC:
                payloads.append(None); checksums.append(None)
                continue
            w, h, seed = struct.unpack("<iii", raw[4:16])
            px = np.frombuffer(raw[16:16 + w * h],
                               dtype=np.uint8).reshape(h, w)
            ys = (np.arange(self.out_h) * h) // self.out_h
            xs = (np.arange(self.out_w) * w) // self.out_w
            out = px[np.ix_(ys, xs)]
            payloads.append(MAGIC + struct.pack(
                "<iii", self.out_w, self.out_h, seed) + out.tobytes())
            checksums.append(int(out.astype(np.int64).sum()))
        batch = batch.append_column(
            "resized", pa.array(payloads, pa.binary()))
        return batch.append_column(
            "resized_checksum", pa.array(checksums, pa.int64()))


def formulaic_image_bytes(seed: int, width: int = 9,
                          height: int = 8) -> bytes:
    """FKIM payload whose pixels are md5-formulaic (16-byte blocks of
    ``md5(f"{seed}:{block}")``) — unlike :func:`fake_image_bytes`'s
    numpy-rng pixels, these are re-derivable in SQL, so perceptual-hash
    operators over them can carry EXACT DuckDB oracles."""
    import hashlib
    n = width * height
    blocks = b"".join(
        hashlib.md5(f"{seed}:{b}".encode()).digest()
        for b in range((n + 15) // 16))
    return (MAGIC + struct.pack("<iii", width, height, seed)
            + blocks[:n])


class PerceptualDHash:
    """Actor-pool stage: FKIM ``content`` → 64-bit difference hash as a
    16-hex-char string (the classic 9×8 dHash: bit (r, c) set when
    pixel (r, c) > pixel (r, c+1)).  Identical images collide exactly;
    near-identical ones differ in few bits — the first line of
    image-level dedup.  Real decoders would resize to 9×8 first (the
    PIL import-try slot of :class:`DecodeImage`); the FKIM path reads
    the 9×8 pixels directly.  Hex-string packing keeps every
    intermediate ≤ 255 (int64-safe both sides — no uint64 bit-63
    edge)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = []
        for v in batch.column("content"):
            raw = v.as_py()
            if raw is None or raw[:4] != MAGIC:
                raise NotImplementedError(
                    "real image codecs unavailable in this container; "
                    "payload is not FKIM fake format")
            w, h, _seed = struct.unpack("<iii", raw[4:16])
            px = np.frombuffer(raw[16:16 + w * h],
                               dtype=np.uint8).reshape(h, w)
            bits = px[:, :-1] > px[:, 1:]          # (h, w-1) bool
            weights = (1 << (7 - np.arange(w - 1, dtype=np.int64)))
            rowbytes = (bits * weights).sum(axis=1)
            hashes.append("".join(f"{b:02x}" for b in rowbytes))
        return pa.table({
            "item_id": batch.column("item_id"),
            "dhash": pa.array(hashes, pa.string())})
