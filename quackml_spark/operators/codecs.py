"""Pure-Python media codecs (zero dependencies): PPM (P6) and WAV (PCM16).

These make the multimodal decode step REAL in this container: PPM is a
4-line header plus raw RGB bytes, WAV is a fixed 44-byte RIFF header
plus little-endian PCM samples — both decodable with ``struct`` alone.
Formats that genuinely need a codec library (JPEG/PNG/MP3/...) stay
import-gated behind PIL/librosa in multimodal.py; the dispatch picks
this module whenever the mime says portable-pixmap / wav.

Decoders return numpy arrays so downstream feature extraction
(mean/stats/resample) is vectorized inside the Arrow batch.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6): "P6\n<w> <h>\n255\n" + w*h*3 raw RGB bytes
# ---------------------------------------------------------------------------

PPM_MIME = "image/x-portable-pixmap"
WAV_MIME = "audio/wav"


def encode_ppm(pixels: np.ndarray) -> bytes:
    """pixels: (h, w, 3) uint8 -> P6 bytes."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("PPM P6 requires 3 channels")
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def _parse_ppm_header(data: bytes, start: int = 0) -> tuple[int, int, int]:
    """Parse a P6 header beginning at ``start``; returns (w, h,
    absolute_pixel_data_offset). Handles comment lines and any
    whitespace between header tokens (the format's full generality).
    ``start`` lets the frame iterator parse in place — slicing the
    remaining payload per frame copied the whole unread tail each time,
    O(frames x bytes) for concatenated video payloads (review catch)."""
    if data[start : start + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = start + 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return w, h, pos


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 bytes -> (h, w, 3) uint8."""
    w, h, pos = _parse_ppm_header(data)
    n = w * h * 3
    raw = data[pos : pos + n]
    if len(raw) < n:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def ppm_frames(data: bytes):
    """Parse CONCATENATED P6 frames (the synthetic 'video' container):
    yields (h, w, 3) arrays until the buffer is exhausted.

    The next-frame offset comes from the header parse itself — never
    from searching for a byte pattern, which would misfire on a frame
    whose width/height token happens to be 255."""
    pos = 0
    while pos < len(data):
        if data[pos : pos + 2] != b"P6":
            raise ValueError(f"bad frame magic at offset {pos}")
        w, h, px_start = _parse_ppm_header(data, pos)
        n = w * h * 3
        if px_start + n > len(data):
            raise ValueError("truncated PPM frame")
        # frombuffer with offset/count: zero copies per frame
        frame = np.frombuffer(data, dtype=np.uint8, count=n, offset=px_start)
        pos = px_start + n
        yield frame.reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample (h,w,3) -> (th,tw,3); deterministic
    integer index math (src = (dst * src_dim) // dst_dim)."""
    h, w, _ = pixels.shape
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return pixels[ys][:, xs]


# ---------------------------------------------------------------------------
# WAV: 44-byte canonical RIFF/PCM header + int16 little-endian samples
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """samples: (n,) int16 mono -> canonical 44-byte-header WAV bytes."""
    pcm = samples.astype("<i2").tobytes()
    n = len(pcm)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", n)
        + pcm
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples int16 array, sample_rate). Walks RIFF
    chunks, so extra chunks (LIST/fact) before 'data' are fine."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", data, body)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            audio_format, channels, rate, _, _, bits = fmt
            if audio_format != 1 or bits != 16 or channels != 1:
                raise ValueError(
                    f"only PCM16 mono supported (fmt={audio_format}, "
                    f"bits={bits}, channels={channels})"
                )
            # trust nothing about the declared size (review catch): a
            # size past the buffer silently returned fewer samples than
            # declared; an odd size crashed frombuffer with an opaque
            # message. PCM16 mono with an odd byte count is malformed.
            avail = len(data) - body
            if size > avail:
                raise ValueError(
                    f"WAV data chunk declares {size} bytes but only "
                    f"{avail} remain — truncated payload"
                )
            if size % 2:
                raise ValueError(
                    f"WAV PCM16 data chunk has odd byte size {size}"
                )
            samples = np.frombuffer(data, dtype="<i2", count=size // 2, offset=body)
            return samples, rate
        pos = body + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk in WAV payload")
