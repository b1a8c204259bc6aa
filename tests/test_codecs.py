"""Pure-Python media codecs: PNG round-trips across ALL filter types,
BMP/PNM/WAV decode against hand-built fixtures, and the decoded-feature
Spark op end-to-end (including the quarantine column for corrupt and
contractually-undecodable payloads)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from data_ingestion_system_spark.operators.codecs import (
    decode_bmp,
    decode_image,
    decode_png,
    decode_pnm,
    decode_wav,
    encode_png,
    sniff_format,
)


def _img(h, w, ch, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_every_filter_and_colortype(filter_type, ch):
    img = _img(13, 9, ch, seed=filter_type * 10 + ch)
    blob = encode_png(img, filter_type=filter_type)
    assert sniff_format(blob) == "png"
    out = decode_png(blob)
    assert out.shape == (13, 9, ch)
    np.testing.assert_array_equal(out, img)


def test_png_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    blob = encode_png(_img(4, 4, 3))
    with pytest.raises(Exception):
        decode_png(blob[:40])  # cut inside IHDR/IDAT


def _bmp24(img, top_down=False):
    """Minimal BITMAPINFOHEADER BI_RGB 24-bit writer (test-side only)."""
    h, w, _ = img.shape
    row = (w * 3 + 3) & ~3
    px = img[:, :, ::-1]  # RGB -> BGR
    body = b""
    rows = px if top_down else px[::-1]
    for r in rows:
        body += r.tobytes() + b"\x00" * (row - w * 3)
    hdr_h = -h if top_down else h
    info = struct.pack("<IiiHHIIiiII", 40, w, hdr_h, 1, 24, 0,
                       len(body), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0,
                           14 + 40)
    return file_hdr + info + body


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_24bit_both_row_orders(top_down):
    img = _img(5, 7, 3, seed=3)  # w=7 -> 21 bytes/row -> 3 pad bytes
    blob = _bmp24(img, top_down=top_down)
    assert sniff_format(blob) == "bmp"
    np.testing.assert_array_equal(decode_bmp(blob), img)


def test_pnm_p6_with_comment_header():
    img = _img(4, 6, 3, seed=5)
    blob = b"P6\n# a comment\n6 4\n255\n" + img.tobytes()
    assert sniff_format(blob) == "pnm"
    np.testing.assert_array_equal(decode_pnm(blob), img)


def test_pnm_p5_gray():
    img = _img(3, 5, 1, seed=6)
    blob = b"P5 5 3 255\n" + img.tobytes()
    np.testing.assert_array_equal(decode_pnm(blob), img)


def test_decode_image_dispatches_on_magic():
    img = _img(4, 4, 3, seed=7)
    np.testing.assert_array_equal(decode_image(encode_png(img)), img)
    np.testing.assert_array_equal(decode_image(_bmp24(img)), img)
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01\x02garbage")


def _wav(samples, rate=16000, ch=1, sw=2):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(sw)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def test_wav_16bit_stereo():
    t = np.arange(800)
    left = (10000 * np.sin(2 * np.pi * t / 80)).astype("<i2")
    right = (5000 * np.cos(2 * np.pi * t / 40)).astype("<i2")
    inter = np.empty(1600, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    blob = _wav(inter, rate=8000, ch=2, sw=2)
    assert sniff_format(blob) == "wav"
    samples, rate = decode_wav(blob)
    assert rate == 8000 and samples.shape == (800, 2)
    np.testing.assert_array_equal(samples[:, 0], left.astype(np.int32))
    np.testing.assert_array_equal(samples[:, 1], right.astype(np.int32))


def test_wav_8bit_unsigned_centering():
    raw = np.array([0, 128, 255], dtype=np.uint8)
    samples, _ = decode_wav(_wav(raw, ch=1, sw=1))
    np.testing.assert_array_equal(samples[:, 0], [-128, 0, 127])


# ------------------------------------------------- Spark op end-to-end


def test_media_features_decoded(spark):
    from data_ingestion_system_spark.operators.multimodal import (
        media_features_decoded,
    )

    img = _img(8, 6, 3, seed=11)
    png = encode_png(img, filter_type=4)
    tone = (1000 * np.sin(np.arange(400) / 5.0)).astype("<i2")
    wav = _wav(tone, rate=22050)
    rows = [
        (1, "image", bytearray(png)),
        (2, "audio", bytearray(wav)),
        (3, "video", bytearray(b"\x00" * 64)),      # contracted: no codec
        (4, "image", bytearray(b"corrupt bytes")),  # quarantined
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, content binary")
    got = {r["media_id"]: r
           for r in media_features_decoded(df, dim=4).collect()}

    ok = got[1]
    assert (ok["width"], ok["height"]) == (6, 8)
    assert ok["decode_error"] is None
    lum = img.mean(axis=2).ravel()
    expect = [float(b.mean()) / 255.0 for b in np.array_split(lum, 4)]
    assert ok["features"] == pytest.approx(expect)

    au = got[2]
    assert au["sample_rate"] == 22050 and au["decode_error"] is None
    assert all(f >= 0 for f in au["features"])  # block RMS

    assert "video" in got[3]["decode_error"]
    assert got[3]["features"] is None
    assert got[4]["decode_error"] is not None and got[4]["features"] is None


# ---------------------------------------------------------------- AVI


def _raw_frame_payload(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB -> bottom-up BGR rows, 4-byte padded."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    out = np.zeros((h, stride), np.uint8)
    out[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    return out.tobytes()


def test_avi_raw_roundtrip():
    from data_ingestion_system_spark.operators.codecs import (
        decode_avi_raw_frame,
        demux_avi,
        encode_avi,
    )

    frames = [_img(4, 5, 3, seed=20 + i) for i in range(3)]
    avi = encode_avi([_raw_frame_payload(f) for f in frames], 5, 4, fps=12)
    m = demux_avi(avi)
    assert (m["width"], m["height"], m["n_frames"]) == (5, 4, 3)
    assert m["us_per_frame"] == 1_000_000 // 12
    assert m["fourcc"] == "DIB"
    for payload, want in zip(m["frames"], frames):
        assert (decode_avi_raw_frame(payload, 5, 4) == want).all()


def test_avi_odd_payload_padding():
    """RIFF chunks pad odd sizes with one byte; the walker must skip the
    pad, and the payload must come back WITHOUT it."""
    from data_ingestion_system_spark.operators.codecs import (
        demux_avi,
        encode_avi,
    )

    blobs = [b"\xff\xd8" + b"j" * 13 + b"\xff\xd9"]  # 17 bytes, odd
    m = demux_avi(encode_avi(blobs, 8, 8, fps=5, fourcc=b"MJPG"))
    assert m["frames"] == blobs and m["n_frames"] == 1


def test_avi_mjpeg_demux_only():
    from data_ingestion_system_spark.operators.codecs import (
        demux_avi,
        encode_avi,
    )

    blobs = [b"\xff\xd8fake-jpeg-one\xff\xd9", b"\xff\xd8two\xff\xd9"]
    m = demux_avi(encode_avi(blobs, 16, 9, fps=30, fourcc=b"MJPG"))
    assert m["fourcc"] == "MJPG"
    assert m["frames"] == blobs
    assert (m["width"], m["height"]) == (16, 9)


def test_avi_corrupt_raises():
    from data_ingestion_system_spark.operators.codecs import (
        demux_avi,
        encode_avi,
    )

    good = encode_avi([b"\x00" * 192], 16, 4)
    with pytest.raises(ValueError, match="not an AVI"):
        demux_avi(b"garbage header")
    with pytest.raises(ValueError, match="truncated"):
        demux_avi(good[:40])
    # header/stream frame-count mismatch must raise, not under-report
    hacked = bytearray(good)
    # avih dwTotalFrames sits 16 bytes into the avih payload
    pos = good.index(b"avih") + 8 + 16
    hacked[pos:pos + 4] = struct.pack("<I", 99)
    with pytest.raises(ValueError, match="frame count"):
        demux_avi(bytes(hacked))


def test_decode_real_video_avi():
    from data_ingestion_system_spark.operators.codecs import encode_avi
    from data_ingestion_system_spark.operators.multimodal import decode_real

    frames = [_img(4, 5, 3, seed=31)]
    meta, decoded = decode_real(
        encode_avi([_raw_frame_payload(f) for f in frames], 5, 4), "video")
    assert meta["fourcc"] == "DIB" and meta["n_frames"] == 1
    assert (decoded[0] == frames[0]).all()
    # MJPEG: demuxed blobs, not pixels
    meta2, blobs = decode_real(
        encode_avi([b"\xff\xd8z\xff\xd9"], 2, 2, fourcc=b"MJPG"), "video")
    assert meta2["fourcc"] == "MJPG" and blobs == [b"\xff\xd8z\xff\xd9"]
    with pytest.raises(NotImplementedError, match="delegated"):
        decode_real(b"\x00\x01\x02\x03" * 16, "video")
