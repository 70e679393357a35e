"""Multimodal tests: binary column shape, Arrow batch path, and the REAL
pure-stdlib PNG codec behind `decode_image` (round-trip, per-filter spec
math, malformed-input rejection, Spark end-to-end)."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from database_toolbox_spark.functions.png import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
    filter_scanline,
    unfilter_scanline,
)
from database_toolbox_spark.operators.multimodal import (
    audio_waveform_stats,
    decode_image,
    image_decode_stats,
    image_resize_stats,
    multimodal_decode_features,
    png_payloads,
    with_binary_payload,
)
from tests.conftest import SF_DIR


def _pseudo_bytes(n: int, seed: str) -> bytes:
    """Deterministic pseudo-random bytes (md5 chain — no random module)."""
    out = bytearray()
    block = seed.encode()
    while len(out) < n:
        block = hashlib.md5(block).digest()
        out += block
    return bytes(out[:n])


# ---------------------------------------------------------------- codec unit

def test_decode_image_is_real():
    """The declared hook decodes real PNG bytes — the stub is retired."""
    img = decode_image(encode_png(bytes(range(48)), 4, 4, channels=3))
    assert (img["width"], img["height"], img["channels"]) == (4, 4, 3)
    assert img["pixels"] == bytes(range(48))


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("strategy", ["none", "cycle"])
def test_png_roundtrip(channels, strategy):
    w, h = 13, 11  # odd sizes catch stride bugs
    px = _pseudo_bytes(w * h * channels, f"rt-{channels}-{strategy}")
    payload = encode_png(px, w, h, channels, filter_strategy=strategy)
    assert payload[:8] == PNG_SIGNATURE
    img = decode_png(payload)
    assert img == {"width": w, "height": h, "channels": channels, "pixels": px}


def test_filter_math_matches_spec_by_hand():
    """Filter outputs verified against hand-computed PNG-spec values, so an
    encoder/decoder sign error can't cancel out in the round-trip test."""
    prev = bytes([10, 20, 30, 40])
    line = bytes([15, 25, 35, 45])
    # Sub: out[i] = line[i] - line[i-1] (bpp=1); first byte has no left
    assert filter_scanline(1, line, prev, 1) == bytes([15, 10, 10, 10])
    # Up: out[i] = line[i] - prev[i]
    assert filter_scanline(2, line, prev, 1) == bytes([5, 5, 5, 5])
    # Average: out[i] = line[i] - (raw_left + up)//2
    #   i=0: (0+10)//2=5→10; i=1: (15+20)//2=17→8; then 27→8, 37→8
    assert filter_scanline(3, line, prev, 1) == bytes([10, 8, 8, 8])
    # Paeth: p=a+b-c is nearest to b (up) at every i here → same as Up
    assert filter_scanline(4, line, prev, 1) == bytes([5, 5, 5, 5])
    for f in (1, 2, 3, 4):
        filtered = bytearray(filter_scanline(f, line, prev, 1))
        assert bytes(unfilter_scanline(f, filtered, prev, 1)) == line


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    channels=st.sampled_from([1, 2, 3, 4]),
    strategy=st.sampled_from(["none", "cycle"]),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, channels, strategy, data):
    """Any 8-bit pixel buffer round-trips exactly through encode→decode,
    for every dimension/channel/filter combination hypothesis finds."""
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=w * h * channels,
                max_size=w * h * channels,
            )
        )
    )
    img = decode_png(encode_png(px, w, h, channels, filter_strategy=strategy))
    assert img == {"width": w, "height": h, "channels": channels, "pixels": px}


def test_decode_rejects_malformed():
    good = encode_png(bytes(16), 4, 4, channels=1)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="truncated|IHDR|IEND"):
        decode_png(good[:20])
    corrupted = bytearray(good)
    corrupted[20] ^= 0xFF  # flip a byte inside IHDR → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupted))
    with pytest.raises(ValueError):
        encode_png(bytes(15), 4, 4, channels=1)  # wrong buffer size
    # 16-bit depth is out of scope and must be refused, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    deep = (
        PNG_SIGNATURE
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(
            deep
            + struct.pack(">I", 0) + b"IEND"
            + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
        )


def _palette_png(indices: bytes, w: int, h: int, palette: bytes) -> bytes:
    """Hand-build a color-type-3 PNG (the encoder only emits 0/2/4/6)."""
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = b"".join(
        b"\x00" + indices[y * w:(y + 1) * w] for y in range(h)
    )
    return (
        PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"PLTE", palette)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def test_decode_palette_png_expands_to_rgb():
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    img = decode_png(_palette_png(bytes([0, 1, 2, 1]), 2, 2, palette))
    assert (img["width"], img["height"], img["channels"]) == (2, 2, 3)
    assert img["pixels"] == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 255, 0]
    )


def test_decode_palette_png_rejects_bad_index_and_missing_plte():
    palette = bytes([10, 20, 30])  # single entry
    with pytest.raises(ValueError, match="PLTE range"):
        decode_png(_palette_png(bytes([0, 1]), 2, 1, palette))
    # palette image with no PLTE chunk at all
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    raw = zlib.compress(b"\x00\x00")
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )
    bad = (
        PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(bad)


def test_decode_skips_ancillary_chunks():
    good = encode_png(bytes(range(16)), 4, 4, channels=1)
    text = b"Comment\x00hello"
    extra = (
        struct.pack(">I", len(text)) + b"tEXt" + text
        + struct.pack(">I", zlib.crc32(b"tEXt" + text) & 0xFFFFFFFF)
    )
    ihdr_end = 8 + 12 + 13  # signature + IHDR chunk
    spliced = good[:ihdr_end] + extra + good[ihdr_end:]
    assert decode_png(spliced)["pixels"] == bytes(range(16))


# ------------------------------------------------------------- spark plumbing

def test_binary_payload_schema(spark):
    df = with_binary_payload(spark, SF_DIR)
    kinds = dict(df.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<n_bytes:int")
    row = df.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.payload)


def test_decode_features_roundtrip(spark):
    feats = {r.doc_id: r for r in multimodal_decode_features(spark, SF_DIR).collect()}
    src = {r.doc_id: r.payload for r in with_binary_payload(spark, SF_DIR).collect()}
    assert feats.keys() == src.keys()
    some = list(src)[:20]
    for d in some:
        assert feats[d].n_bytes == len(src[d])
        assert feats[d].first_byte == src[d][0]
        assert feats[d].checksum == sum(src[d]) % 65536


def test_png_payloads_are_real_pngs(spark):
    rows = png_payloads(spark, SF_DIR).limit(25).collect()
    assert rows
    for r in rows:
        assert bytes(r.payload[:8]) == PNG_SIGNATURE
        img = decode_png(bytes(r.payload))
        assert img["width"] == 16 and img["channels"] == 1


def test_image_resize_keeps_strided_pixels(spark):
    """Nearest-neighbor downsample keeps exactly the even-indexed rows and
    columns of the decoded image — checked against the raw text bytes."""
    docs = {
        r.doc_id: r.text.encode("utf-8")
        for r in spark.table("documents")
        .select("doc_id", "text").limit(30).collect()
    }
    stats = {r.doc_id: r for r in image_resize_stats(spark, SF_DIR).collect()}
    for d, body in docs.items():
        h = max(1, -(-len(body) // 16))
        padded = body.ljust(16 * h, b"\x00")
        expect = sum(
            padded[y * 16 + x]
            for y in range(0, h, 2)
            for x in range(0, 16, 2)
        )
        assert stats[d].out_width == 8
        assert stats[d].out_height == -(-h // 2)
        assert stats[d].sample_sum == expect


def test_audio_waveform_stats_semantics(spark):
    """PCM-style stats recomputed in Python from the payload bytes."""
    # run the operator FIRST — it registers the documents view this test
    # reads (spark.table before any load_table is order-dependent)
    stats = {r.doc_id: r for r in audio_waveform_stats(spark, SF_DIR).collect()}
    docs = {
        r.doc_id: r.text.encode("utf-8")
        for r in spark.table("documents")
        .select("doc_id", "text").limit(30).collect()
    }
    for d, body in docs.items():
        s = stats[d]
        assert s.n_samples == len(body)
        assert s.peak == max(abs(b - 64) for b in body)
        assert s.energy == sum((b - 64) ** 2 for b in body)
        assert s.crossings == sum(
            (a >= 64) != (b >= 64) for a, b in zip(body, body[1:])
        )
        assert s.crossings > 0  # spaces (32) vs letters (>=97) must cross


def test_image_decode_stats_end_to_end(spark):
    """Distributed encode→decode must reproduce the text bytes exactly."""
    docs = {
        r.doc_id: r.text.encode("utf-8")
        for r in spark.table("documents").select("doc_id", "text").collect()
    }
    stats = {r.doc_id: r for r in image_decode_stats(spark, SF_DIR).collect()}
    assert stats.keys() == docs.keys()
    for d, body in list(docs.items())[:50]:
        s = stats[d]
        assert s.width == 16
        assert s.height == max(1, -(-len(body) // 16))
        assert s.pixel_sum == sum(body)
        assert s.first_px == (body[0] if body else 0)


# --- WAV codec (functions/wav.py) ------------------------------------------


def test_wav_roundtrip_against_stdlib_wave():
    """Our encoder must be readable by the stdlib `wave` module and our
    decoder must read stdlib-written files — two independent
    implementations agreeing in both directions."""
    import io
    import wave as stdwave

    from database_toolbox_spark.functions.wav import decode_wav, encode_wav

    samples = [0, 100, -100, 32767, -32768, 5, -5, 0]
    payload = encode_wav(samples, 16000)

    with stdwave.open(io.BytesIO(payload)) as r:
        assert r.getframerate() == 16000
        assert r.getnchannels() == 1
        assert r.getsampwidth() == 2
        assert r.getnframes() == len(samples)
        back = struct.unpack(f"<{len(samples)}h", r.readframes(len(samples)))
    assert list(back) == samples

    buf = io.BytesIO()
    with stdwave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    out = decode_wav(buf.getvalue())
    assert out["sample_rate"] == 44100
    assert out["channels"] == 2
    assert out["n_frames"] == len(samples) // 2
    assert out["samples"] == samples


@given(
    rate=st.integers(min_value=1, max_value=192000),
    channels=st.integers(min_value=1, max_value=4),
    frames=st.lists(
        st.integers(min_value=-32768, max_value=32767), max_size=64
    ),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(rate, channels, frames):
    from database_toolbox_spark.functions.wav import decode_wav, encode_wav

    frames = frames[: len(frames) - (len(frames) % channels)]
    out = decode_wav(encode_wav(frames, rate, channels=channels))
    assert out["samples"] == frames
    assert out["sample_rate"] == rate
    assert out["channels"] == channels
    assert out["n_frames"] == len(frames) // channels


def test_wav_chunk_walker_tolerates_extra_chunks():
    """fmt preceded by a LIST chunk with an ODD size (word-alignment
    padding) must still parse — the canonical-44-byte assumption is
    exactly what real-world files break."""
    from database_toolbox_spark.functions.wav import decode_wav, encode_wav

    canonical = encode_wav([1, -2, 3], 8000)
    # splice a 5-byte LIST chunk (odd → 1 pad byte) between WAVE and fmt
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    body = canonical[12:]
    spliced = b"RIFF" + struct.pack("<I", 4 + len(extra) + len(body)) + b"WAVE" + extra + body
    out = decode_wav(spliced)
    assert out["samples"] == [1, -2, 3]
    assert out["sample_rate"] == 8000


def test_wav_rejects_malformed():
    import pytest as _pytest

    from database_toolbox_spark.functions.wav import (
        WavError,
        decode_wav,
        encode_wav,
    )

    good = encode_wav([1, 2], 8000)
    for bad in (
        b"",
        b"RIFF\x00\x00\x00\x00JUNK",
        good[:20],  # truncated mid-chunk
        good.replace(b"fmt ", b"fmtX"),  # missing fmt
        good.replace(b"data", b"datX"),  # missing data
    ):
        with _pytest.raises(WavError):
            decode_wav(bad)
    # non-PCM format code must be rejected, not misparsed
    tampered = bytearray(good)
    fmt_at = good.index(b"fmt ") + 8
    struct.pack_into("<H", tampered, fmt_at, 3)  # IEEE float code
    with _pytest.raises(WavError):
        decode_wav(bytes(tampered))


def test_wav_decode_stats_matches_direct_computation(spark):
    """End-to-end on a tiny SF: the distributed encode→decode path must
    equal stats computed straight from the text, WAV never involved."""
    from database_toolbox_spark.operators.multimodal import (
        AUDIO_BIAS,
        WAV_SCALE,
        wav_decode_stats,
    )

    rows = {r.doc_id: r for r in wav_decode_stats(spark, "/root/testdata/sf0.001").collect()}
    docs = spark.table("documents").select("doc_id", "text").collect()
    assert len(rows) == len(docs)
    for d in docs:
        s = [(b - AUDIO_BIAS) * WAV_SCALE for b in d.text.encode()]
        r = rows[d.doc_id]
        assert r.n_frames == len(s)
        assert r.peak == max(abs(x) for x in s)
        assert r.energy == sum(x * x for x in s)
        nn = [x >= 0 for x in s]
        assert r.crossings == sum(a != b for a, b in zip(nn, nn[1:]))
        assert r.sample_rate == 8000 + (d.doc_id % 3) * 4000
