"""Pure-stdlib RIFF/WAVE codec (struct) — no third-party audio libs.

Gives the multimodal tier a REAL audio container format next to the real
PNG codec: `operators/multimodal.wav_decode_stats` synthesizes genuine
WAV files worker-side and decodes them back through this module, with a
WAV-independent DuckDB oracle recomputing every statistic from ASCII
codes. Reference parity n/a — the reference ships no codecs (its
multimodal surface is opaque binary passthrough); this is the repo's own
declared surface.

Scope (documented, validated): canonical RIFF little-endian files,
`fmt ` format 1 (integer PCM), 16-bit mono/stereo, arbitrary sample
rate; the chunk walker tolerates extra chunks (LIST/INFO/fact) and odd
chunk sizes (RIFF pads to even), so files written by other encoders
(including the stdlib `wave` module — cross-checked in tests) parse too.

Deliberately dependency-free (stdlib only) so Spark workers can run it
when registered for by-value pickling
(`pyspark.cloudpickle.register_pickle_by_value`) — module-level functions
otherwise pickle by reference and break driver sims whose cwd is outside
the repo (see tests/test_driver_path.py rationale).
"""

from __future__ import annotations

import struct

WAVE_FORMAT_PCM = 1


class WavError(ValueError):
    """Malformed or unsupported WAV payload."""


def encode_wav(
    samples: "list[int] | bytes", sample_rate: int, channels: int = 1
) -> bytes:
    """Serialize 16-bit signed PCM samples into a canonical RIFF/WAVE file
    (RIFF → fmt → data). `samples` is a flat list of per-frame interleaved
    int16 values (or raw little-endian int16 bytes)."""
    if isinstance(samples, (bytes, bytearray)):
        data = bytes(samples)
        if len(data) % 2:
            raise WavError("raw sample buffer has odd byte length")
    else:
        data = struct.pack(f"<{len(samples)}h", *samples)
    if channels < 1:
        raise WavError(f"channels must be >= 1, got {channels}")
    n_frames_bytes = len(data)
    if n_frames_bytes % (2 * channels):
        raise WavError("sample count is not a multiple of channel count")
    block_align = 2 * channels
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", WAVE_FORMAT_PCM, channels, sample_rate, byte_rate,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", n_frames_bytes) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(payload: bytes):
    """Yield (chunk_id, chunk_bytes) from a RIFF body, honoring the spec's
    even-byte padding between chunks."""
    pos = 12  # past RIFF<size>WAVE
    end = len(payload)
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        start = pos + 8
        if start + size > end:
            raise WavError(f"chunk {cid!r} overruns file ({size} bytes)")
        yield cid, payload[start : start + size]
        pos = start + size + (size % 2)  # chunks are word-aligned


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE payload → dict with sample_rate, channels,
    n_frames, and `samples` (flat list of int16, frames interleaved).

    Walks the chunk list properly (fmt may be preceded/followed by LIST /
    fact / other chunks) instead of assuming the canonical 44-byte layout;
    validates magic, PCM format code, and 16-bit depth."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise WavError("not a RIFF file")
    if payload[8:12] != b"WAVE":
        raise WavError("RIFF file is not WAVE")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise WavError("RIFF size field overruns actual payload")
    fmt = None
    data = None
    for cid, chunk in _walk_chunks(payload):
        if cid == b"fmt " and fmt is None:
            if len(chunk) < 16:
                raise WavError(f"fmt chunk too short ({len(chunk)} bytes)")
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
        elif cid == b"data" and data is None:
            data = chunk
    if fmt is None:
        raise WavError("missing fmt chunk")
    if data is None:
        raise WavError("missing data chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format != WAVE_FORMAT_PCM:
        raise WavError(f"unsupported audio format code {audio_format}")
    if bits != 16:
        raise WavError(f"unsupported bit depth {bits} (16-bit PCM only)")
    if channels < 1:
        raise WavError("fmt declares zero channels")
    if block_align != 2 * channels:
        raise WavError(
            f"block align {block_align} inconsistent with {channels}ch 16-bit"
        )
    usable = len(data) - (len(data) % block_align)
    samples = list(struct.unpack(f"<{usable // 2}h", data[:usable]))
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "n_frames": usable // block_align,
        "samples": samples,
    }
