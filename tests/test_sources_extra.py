"""sadf-JSON source (plain + xz) and multimodal plumbing."""

from __future__ import annotations

import json
import lzma
import os

import pytest
from pyspark.sql import functions as F

from sarfile_analyzer_ng_spark.functions import multimodal as MM
from sarfile_analyzer_ng_spark.sources.sadf_json import parse_sadf_json, read_sadf_json

SADF = {
    "sysstat": {
        "hosts": [
            {
                "nodename": "h1",
                "release": "5.14.21",
                "file-date": "2024-01-15",
                "number-of-cpus": 2,
                "statistics": [
                    {
                        "timestamp": {"date": "2024-01-15", "time": "00:10:01"},
                        "cpu-load": [
                            {"cpu": "all", "user": 1.25, "idle": 98.0},
                            {"cpu": "0", "user": 2.5, "idle": 96.0},
                        ],
                        "memory": {"memfree": 1000, "memused-percent": 75.5},
                        "io": {"tps": 5.5, "io-reads": {"rtps": 3.3, "bread": 100.0}},
                        "network": {
                            "net-dev": [{"iface": "eth0", "rxpck": 10.0, "txpck": 5.0}]
                        },
                    }
                ],
                "restarts": [{"boot": {"date": "2024-01-15", "time": "05:30:01"}}],
            }
        ]
    }
}


def test_parse_sadf_json_rows():
    rows = parse_sadf_json("f", json.dumps(SADF).encode())
    by = {(r["section"], r["metric"], r["device"]): r for r in rows}
    assert by[("cpu-load", "user", "all")]["value"] == 1.25
    assert by[("cpu-load", "user", "0")]["value"] == 2.5
    assert by[("memory", "memfree", None)]["value"] == 1000.0
    # nested io dict flattened with dotted names
    assert by[("io", "io-reads.rtps", None)]["value"] == 3.3
    assert by[("network.net-dev", "rxpck", "eth0")]["value"] == 10.0
    restart = [r for r in rows if r["restart"]]
    assert len(restart) == 1 and str(restart[0]["ts"]) == "2024-01-15 05:30:01"
    assert all(str(r["ts"]).startswith("2024-01-15") for r in rows)


def test_read_sadf_json_distributed_and_xz(spark, tmp_path):
    (tmp_path / "a.json").write_bytes(json.dumps(SADF).encode())
    (tmp_path / "b.json.xz").write_bytes(lzma.compress(json.dumps(SADF).encode()))
    (tmp_path / "broken.json").write_bytes(b"{not json")
    df = read_sadf_json(spark, str(tmp_path))
    assert df.select("file").distinct().count() == 2  # broken one skipped
    cpu = df.where((F.col("section") == "cpu-load") & (F.col("device") == "all"))
    assert cpu.count() == 4  # 2 files x 2 metrics


def test_multimodal_fake_decode(spark):
    rows = [
        (1, "image", None, b"imagebytes-1", {"path": "/x/1.png"}),
        (2, "video", None, b"videobytes-2", {"path": "/x/2.mp4", "duration_ms": "2500"}),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    feats = MM.extract_features(media, decode_fn=MM.fake_decode)
    got = {r["media_id"]: r for r in feats.collect()}
    assert got[1]["n_bytes"] == len(b"imagebytes-1")
    assert len(got[1]["feature"]) == 8
    assert got[2]["duration_ms"] > 0 and got[1]["duration_ms"] == 0
    # deterministic: same payload → same feature
    again = {r["media_id"]: r for r in
             MM.extract_features(media, decode_fn=MM.fake_decode).collect()}
    assert again[1]["feature"] == got[1]["feature"]


def test_multimodal_undecodable_policy(spark):
    """Default policy: a payload no decoder handles (unknown magic,
    damaged magic, unsupported sub-format) becomes a null-feature row;
    strict mode surfaces the documented NotImplementedError."""
    media = spark.createDataFrame(
        [(1, "image", None, b"x", {})], MM.MEDIA_SCHEMA
    )
    got = MM.extract_features(media).collect()[0]
    assert got["feature"] is None and got["n_bytes"] == 1
    with pytest.raises(Exception, match="NotImplementedError|decoding"):
        MM.extract_features(media, on_undecodable="raise").collect()
    with pytest.raises(ValueError, match="null|raise"):
        MM.extract_features(media, on_undecodable="bogus")


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [(2, "video", None, b"v", {"duration_ms": "2500"})], MM.MEDIA_SCHEMA
    )
    frames = MM.frame_sample_plan(media, every_ms=1000).collect()
    assert [r["frame_ms"] for r in frames] == [0, 1000, 2000]


def test_multimodal_features_feed_dedup_surface(spark):
    """End-to-end media near-dup: binary payloads → Arrow-batched
    feature extraction → the SAME dedup operators the text/embedding
    tables use (exact via content digest, near via feature cosine).
    Nothing about the dedup surface is multimodal-specific."""
    from sarfile_analyzer_ng_spark.functions import dedup as D
    from sarfile_analyzer_ng_spark.functions import similarity as SIM

    payloads = [b"clipA" * 40, b"clipB" * 40, b"clipC" * 40]
    rows = [(i + 1, "image", None, p, {}) for i, p in enumerate(payloads)]
    rows += [(100 + 1, "image", None, payloads[0], {})]  # exact dup of 1
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    feats = MM.extract_features(media, decode_fn=MM.fake_decode).cache()

    # exact dedup on the digest: the duplicate payload collapses
    kept = D.exact_dedup(feats, "sha256", "media_id")
    assert kept.count() == 3
    assert {r["media_id"] for r in kept.select("media_id").collect()} == {1, 2, 3}

    # near-dup via feature cosine: identical payloads → cosine 1.0
    pairs = SIM.cosine_dup_pairs(feats, "media_id", "feature", 0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 101) in got
    feats.unpersist()


def test_multimodal_real_ppm_decode(spark):
    """real_decode genuinely decodes binary netpbm without any codec
    library: a synthetic P6 image with known geometry and a bright
    left / dark right half must yield matching dims and luminance
    features."""
    width, height = 8, 4
    left = b"\xff\xff\xff" * (width // 2)
    right = b"\x00\x00\x00" * (width // 2)
    payload = b"P6\n# test comment\n8 4\n255\n" + (left + right) * height
    media = spark.createDataFrame(
        [(1, "image", None, payload, {})], MM.MEDIA_SCHEMA
    )
    got = MM.extract_features(media).collect()[0]  # default real_decode
    assert (got["width"], got["height"]) == (width, height)
    feat = got["feature"]
    assert len(feat) == 8
    # 2x4 grid: columns 0-1 fully white (1.0), columns 2-3 fully black
    assert feat[0] == feat[1] == 1.0 and feat[2] == feat[3] == 0.0
    assert got["duration_ms"] == 0


def test_multimodal_ppm_p5_gray_and_16bit(spark):
    w, h = 4, 2
    p5 = b"P5\n4 2\n255\n" + bytes([0, 64, 128, 255] * h)
    p5_16 = b"P5\n4 2\n65535\n" + b"".join(
        v.to_bytes(2, "big") for v in [0, 16384, 32768, 65535] * h
    )
    media = spark.createDataFrame(
        [(1, "image", None, p5, {}), (2, "image", None, p5_16, {})],
        MM.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert (got[1]["width"], got[1]["height"]) == (w, h)
    # 8-bit and 16-bit encodings of the same ramp give ~equal features
    for a, b in zip(got[1]["feature"], got[2]["feature"]):
        assert abs(a - b) < 0.01


def _ppm(width, height, rgb):
    header = f"P6\n{width} {height}\n255\n".encode()
    return header + bytes(rgb) * (width * height)


def test_sample_frames_real_decode_from_concatenated_ppm(spark):
    """REAL frame sampling end to end, zero codecs: a 'video' payload
    of concatenated binary PPM frames (the image2pipe/ppm layout) is
    split, every 2nd frame sliced out, and each sampled frame decoded
    by the real netpbm decoder — dims and luminance features checked
    against the constructed pixels."""
    frames = [
        _ppm(8, 4, (255, 255, 255)),   # white -> luminance 1.0
        _ppm(8, 4, (0, 0, 0)),         # black (skipped at every_n=2)
        _ppm(8, 4, (255, 0, 0)),       # red -> luminance 1/3
    ]
    video = b"".join(frames)
    media = spark.createDataFrame(
        [(7, "video", None, video, {}), (8, "image", None, frames[0], {})],
        MM.MEDIA_SCHEMA,
    )
    got = {r["frame_idx"]: r
           for r in MM.sample_frames(media, every_n=2).collect()}
    assert set(got) == {0, 2}  # image rows ignored, frame 1 skipped
    assert all(r["n_frames"] == 3 and (r["width"], r["height"]) == (8, 4)
               for r in got.values())
    assert all(abs(c - 1.0) < 1e-9 for c in got[0]["feature"])
    assert all(abs(c - 1 / 3) < 1e-6 for c in got[2]["feature"])  # float32 storage
    # splitting is exact: round-trips the constructed container
    assert MM.split_ppm_frames(video) == frames


def test_split_ppm_frames_randomized_roundtrip():
    """Property: any concatenation of valid binary netpbm frames
    (P6/P5, 8- or 16-bit, with or without header comments) splits back
    into exactly the original frame payloads."""
    import random

    rng = random.Random(23)
    for _ in range(25):
        frames = []
        for _ in range(rng.randint(1, 5)):
            w, h = rng.randint(1, 9), rng.randint(1, 9)
            gray = rng.random() < 0.5
            maxval = rng.choice([255, 65535])
            channels = 1 if gray else 3
            bpp = 2 if maxval > 255 else 1
            comment = b"# synthetic frame\n" if rng.random() < 0.3 else b""
            header = (
                (b"P5" if gray else b"P6") + b"\n" + comment
                + f"{w} {h}\n{maxval}\n".encode()
            )
            px = bytes(rng.getrandbits(8) for _ in range(w * h * channels * bpp))
            frames.append(header + px)
        video = b"".join(frames)
        assert MM.split_ppm_frames(video) == frames


def test_decode_ppm_tiny_images_never_nan(spark):
    import math

    for w, h in [(1, 1), (4, 1), (1, 4), (2, 2)]:
        payload = f"P6\n{w} {h}\n255\n".encode() + bytes((10, 20, 30)) * (w * h)
        width, height, _, feat = MM.decode_ppm(payload, "image")
        assert (width, height) == (w, h)
        assert len(feat) == 8
        assert all(not math.isnan(c) for c in feat)


def test_extract_features_skips_empty_payload_rows(spark):
    rows = [
        (1, "image", None, b"", {}),
        (2, "image", None, None, {}),
        (3, "image", None, _ppm(4, 4, (9, 9, 9)), {}),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_bytes"] == 0 and got[1]["feature"] is None
    assert got[3]["width"] == 4 and got[3]["feature"] is not None


def _png_filter_rows(px, filters):
    """Forward-filter one (sub-)image per RFC 2083 — the encoder half
    of the decoder's unfilter recurrences."""
    import numpy as np

    h, w, ch = px.shape
    raw = b""
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        cur = px[y].reshape(-1).astype(np.int32)
        ftype = filters[y % len(filters)]
        line = np.zeros(w * ch, dtype=np.int32)
        for x in range(w * ch):
            a = int(cur[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            line[x] = (int(cur[x]) - pred) % 256
        raw += bytes([ftype]) + bytes(line.astype(np.uint8))
        prev = cur
    return raw


def _png_encode(px, color_type, filters, interlace=0):
    """Minimal stdlib PNG encoder for the decoder tests: one row per
    filter type in `filters`, forward-filtered per RFC 2083 so the
    decoder's unfilter path is genuinely exercised. interlace=1 emits
    the seven Adam7 reduced images, each filtered independently."""
    import struct
    import zlib

    h, w, _ch = px.shape

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    if interlace:
        raw = b""
        for xs, ys, xst, yst in [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                                 (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                                 (0, 1, 1, 2)]:
            sub = px[ys::yst, xs::xst, :]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty pass emits nothing
            raw += _png_filter_rows(sub, filters)
    else:
        raw = _png_filter_rows(px, filters)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_multimodal_real_png_decode_matches_ppm(spark):
    """PNG is now a REAL decoder (stdlib zlib + the five unfilters):
    the same pixel array encoded as P6 netpbm and as RGB PNG — with
    every filter type 0-4 exercised across rows — must produce the
    IDENTICAL luminance feature."""
    import numpy as np

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    ppm = b"P6\n8 10\n255\n" + px.tobytes()
    png = _png_encode(px, color_type=2, filters=[0, 1, 2, 3, 4])
    media = spark.createDataFrame(
        [(1, "image", None, ppm, {}), (2, "image", None, png, {})],
        MM.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert (got[2]["width"], got[2]["height"]) == (8, 10)
    assert got[1]["feature"] == got[2]["feature"]


def test_multimodal_png_adam7_interlace_pixel_identity(spark):
    """Adam7-interlaced PNGs (round-7 directive — common in old
    screenshots) decode to the SAME pixels as their sequential twin:
    the seven reduced images unfilter independently (every filter
    type exercised inside the sub-images) and scatter back to the
    full grid. Sizes chosen so several passes are non-trivial and one
    dimension is not a multiple of 8."""
    import numpy as np

    rng = np.random.default_rng(11)
    for h, w in [(13, 9), (8, 8), (3, 2), (1, 1)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        plain = _png_encode(px, 2, [0, 1, 2, 3, 4], interlace=0)
        adam7 = _png_encode(px, 2, [4, 3, 2, 1, 0], interlace=1)
        media = spark.createDataFrame(
            [(1, "image", None, plain, {}), (2, "image", None, adam7, {})],
            MM.MEDIA_SCHEMA,
        )
        got = {r["media_id"]: r for r in MM.extract_features(media).collect()}
        assert (got[2]["width"], got[2]["height"]) == (w, h)
        assert got[1]["feature"] == got[2]["feature"], (h, w)
        assert got[2]["feature"] is not None


def test_multimodal_png_rgba_and_gray(spark):
    import numpy as np

    gray = np.tile(np.array([0, 255], dtype=np.uint8), (4, 2))[..., None]
    rgba = np.dstack([gray.repeat(3, axis=2),
                      np.full(gray.shape[:2], 9, dtype=np.uint8)])
    media = spark.createDataFrame(
        [
            (1, "image", None, _png_encode(gray, 0, [0, 1, 2, 3, 4]), {}),
            (2, "image", None, _png_encode(rgba, 6, [4, 3, 2, 1, 0]), {}),
        ],
        MM.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    # alpha is ignored for luminance: gray and RGBA features agree
    assert got[1]["feature"] == got[2]["feature"]


def test_multimodal_real_wav_decode(spark):
    """WAV/PCM decodes through the stdlib wave module: duration and
    the 8-bin amplitude envelope come from real samples."""
    import io
    import wave

    import numpy as np

    rate, n = 8000, 4000  # half a second
    t = np.arange(n)
    # quiet first half, loud second half
    amp = np.where(t < n // 2, 2000, 16000)
    samples = (amp * np.sin(2 * np.pi * 440 * t / rate)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    media = spark.createDataFrame(
        [(1, "audio", None, buf.getvalue(), {})], MM.MEDIA_SCHEMA
    )
    got = MM.extract_features(media).collect()[0]
    assert got["duration_ms"] == 500
    feat = got["feature"]
    assert len(feat) == 8 and all(0.0 <= v <= 1.0 for v in feat)
    # envelope tracks the amplitude step: loud half well above quiet half
    assert min(feat[4:]) > 4 * max(feat[:4])


def test_multimodal_corrupt_payload_yields_null_row_not_job_failure(spark):
    """A payload with a valid magic but corrupt body is a DATA
    problem: the scan survives and emits a null-feature row (audit
    with feature IS NULL); only a genuinely missing codec
    (NotImplementedError) still fails loudly."""
    corrupt_png = b"\x89PNG\r\n\x1a\n" + b"garbage" * 4
    good = b"P5\n2 2\n255\n\x00\x40\x80\xff"
    media = spark.createDataFrame(
        [(1, "image", None, corrupt_png, {}), (2, "image", None, good, {})],
        MM.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert got[1]["feature"] is None and got[1]["n_bytes"] > 0
    assert got[2]["feature"] is not None  # the good row still decodes


def test_multimodal_real_bmp_decode_matches_ppm(spark):
    """BMP (uncompressed 24-bit) is a real decoder: the same pixels as
    netpbm and as a bottom-up padded BMP give identical features."""
    import struct

    import numpy as np

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # h=5 w=3
    ppm = b"P6\n3 5\n255\n" + px.tobytes()
    stride = (3 * 3 + 3) & ~3  # 12
    body = b"".join(
        px[y][:, ::-1].tobytes() + b"\x00" * (stride - 9)  # RGB->BGR + pad
        for y in range(4, -1, -1)  # bottom-up
    )
    header = (
        b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 3, 5, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    )
    media = spark.createDataFrame(
        [(1, "image", None, ppm, {}), (2, "image", None, header + body, {})],
        MM.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert (got[2]["width"], got[2]["height"]) == (3, 5)
    assert got[1]["feature"] == got[2]["feature"]


def test_multimodal_audio_spectral_features(spark):
    """Spectral features come from a real FFT: a pure 440 Hz tone
    concentrates its energy in the band containing 440 Hz, and a
    non-WAV payload yields a null row, not a job failure."""
    import io
    import wave

    import numpy as np

    rate, n = 8000, 8192
    t = np.arange(n)
    tone = (12000 * np.sin(2 * np.pi * 440 * t / rate)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(tone.tobytes())
    media = spark.createDataFrame(
        [(1, "audio", None, buf.getvalue(), {}),
         (2, "audio", None, b"not audio", {})],
        MM.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in MM.audio_spectral_features(media).collect()}
    spec = got[1]["spectral"]
    assert got[1]["sample_rate"] == rate and got[1]["n_samples"] == n
    assert len(spec) == 8 and max(spec) == 1.0
    # 440 Hz in a 512-pt rfft at 8 kHz -> bin ~28 of 257; the peak band
    # must dominate every other band decisively
    peak = spec.index(max(spec))
    assert sum(1 for v in spec if v > 0.5) == 1
    assert 0 < peak < 7  # not the DC band, not the top band
    assert got[2]["spectral"] is None  # non-WAV -> null row


def test_multimodal_png_decompression_bomb_is_bounded(spark):
    """A hostile IDAT that inflates to ~100 MB behind a 2x2 IHDR must
    not balloon memory: the inflate is capped at the pixel bytes the
    header promises, so the row decodes (bounded) instead of OOMing."""
    import struct
    import zlib

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # 2x2 RGB
    bomb = zlib.compress(b"\x00" * (100 * 1024 * 1024), 9)  # ~100 KB IDAT
    payload = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
    )
    media = spark.createDataFrame(
        [(1, "image", None, payload, {})], MM.MEDIA_SCHEMA
    )
    got = MM.extract_features(media).collect()[0]
    # zero-filled "pixels" decode to a black 2x2 image, memory bounded
    assert (got["width"], got["height"]) == (2, 2)
    assert got["feature"] is not None and max(got["feature"]) == 0.0


def _gif_encode(idx, palette, interlace=False):
    """Minimal GIF89a encoder for the decoder tests: 8-bit global
    palette, 'uncompressed' LZW (every pixel a literal 9-bit code,
    clear codes keeping the table small) — valid per the spec and
    decodable by any conformant reader."""
    import struct

    import numpy as np

    h, w = idx.shape
    if interlace:
        order = (list(range(0, h, 8)) + list(range(4, h, 8))
                 + list(range(2, h, 4)) + list(range(1, h, 2)))
        idx = idx[order]
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([r, g, b])
    pal += b"\x00" * (3 * 256 - len(pal))

    clear, eoi = 256, 257
    bits, acc, nbits = bytearray(), 0, 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for n, v in enumerate(idx.reshape(-1)):
        if n and n % 250 == 0:
            emit(clear)  # keep the decoder's table below width growth
        emit(int(v))
    emit(eoi)
    if nbits:
        bits.append(acc & 0xFF)

    sub = b"".join(
        bytes([len(bits[i:i + 255])]) + bytes(bits[i:i + 255])
        for i in range(0, len(bits), 255)
    ) + b"\x00"
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # 256-entry GCT
        + bytes(pal)
        + b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h,
                                0x40 if interlace else 0)
        + bytes([8])  # LZW min code size
        + sub
        + b"\x3B"
    )


def test_multimodal_real_gif_decode_matches_ppm(spark):
    """GIF is a real decoder (pure-python LZW + palette): the same
    pixels as palette-mapped GIF — plain and interlaced — and as P6
    netpbm give identical features."""
    import numpy as np

    rng = np.random.default_rng(17)
    palette = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(9, 7), dtype=np.uint8)
    rgb = palette[idx]
    ppm = b"P6\n7 9\n255\n" + rgb.tobytes()
    media = spark.createDataFrame(
        [
            (1, "image", None, ppm, {}),
            (2, "image", None, _gif_encode(idx, palette), {}),
            (3, "image", None, _gif_encode(idx, palette, interlace=True), {}),
        ],
        MM.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert (got[2]["width"], got[2]["height"]) == (7, 9)
    assert got[1]["feature"] == got[2]["feature"] == got[3]["feature"]


def test_gif_interlace_order_is_the_spec_order():
    """Convention-independence check for interlacing: the file's row
    sequence for an 8-row interlaced image is HAND-DERIVED from the
    spec here (pass 1: row 0; pass 2: row 4; pass 3: rows 2,6;
    pass 4: rows 1,3,5,7) — NOT the decoder's order list — so a
    shared-but-wrong order in encoder+decoder cannot cancel out. Top
    half black, bottom half white survives deinterlacing exactly."""
    import numpy as np

    from sarfile_analyzer_ng_spark.functions.multimodal import decode_gif

    # image rows 0-3 are palette index 0 (black), 4-7 index 1 (white)
    file_row_values = [0, 1, 0, 1, 0, 0, 1, 1]  # rows 0,4,2,6,1,3,5,7
    idx = np.array([[v] * 8 for v in file_row_values], dtype=np.uint8)
    palette = [(0, 0, 0), (255, 255, 255)] + [(0, 0, 0)] * 254
    gif = _gif_encode(idx, palette)  # rows already in FILE order
    # flip the interlace bit on the image descriptor by rebuilding:
    # _gif_encode(interlace=True) would re-permute, so patch the flag
    desc_at = gif.index(b"\x2C")
    gif = gif[:desc_at + 9] + bytes([gif[desc_at + 9] | 0x40]) \
        + gif[desc_at + 10:]
    w, h, _, feat = decode_gif(gif, "image")
    assert (w, h) == (8, 8)
    assert feat[:4] == [0.0] * 4 and feat[4:] == [1.0] * 4


def test_multimodal_gif_corrupt_lzw_is_null_row(spark):
    bad = _gif_encode(
        __import__("numpy").zeros((2, 2), dtype="uint8"),
        [(0, 0, 0)] * 256,
    )[:-6]  # chop the stream mid-data
    media = spark.createDataFrame(
        [(1, "image", None, bad, {})], MM.MEDIA_SCHEMA
    )
    got = MM.extract_features(media).collect()[0]
    assert got["feature"] is None


def test_gif_lzw_roundtrip_real_compression():
    """Unit-level LZW roundtrip with a REAL compressor (growing code
    widths, table up to 4096, the KwKwK self-reference case): random
    and adversarial index streams compress and decode back exactly —
    the paths the 'uncompressed' encoder above never exercises."""
    import numpy as np

    from sarfile_analyzer_ng_spark.functions.multimodal import (
        _gif_lzw_decode,
    )

    def lzw_encode(data, min_code=8):
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code, width = clear + 2, min_code + 1
        acc = nbits = 0
        out = bytearray()

        def emit(code, w):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += w
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        emit(clear, width)
        run = b""
        for byte in data:
            cand = run + bytes([byte])
            if cand in table:
                run = cand
                continue
            emit(table[run], width)
            if next_code < 4096:
                table[cand] = next_code
                # GIF: the encoder bumps width when next_code EXCEEDS
                # the current range (decoder bumps after adding the
                # same entry — they stay in lockstep)
                if next_code == (1 << width) and width < 12:
                    width += 1
                next_code += 1
            run = bytes([byte])
        if run:
            emit(table[run], width)
        emit(eoi, width)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    rng = np.random.default_rng(29)
    cases = [
        b"\x00" * 5000,                       # KwKwK immediately, long runs
        bytes(rng.integers(0, 4, 3000)),      # small alphabet, deep table
        bytes(rng.integers(0, 256, 6000)),    # width growth past 9/10 bits
        b"abababababab" * 300,
    ]
    for data in cases:
        assert _gif_lzw_decode(8, lzw_encode(data), len(data)) == data


def _jpeg_encode(planes, w, h, sampling, quant_flat=1):
    """Minimal baseline JPEG encoder for the decoder tests: per-plane
    FDCT + flat quantization + canonical fixed-length huffman tables
    written into DHT (the decoder reads tables from the FILE, so any
    valid canonical table exercises the real path). `planes` is a
    list of (h_pixels, w_pixels) uint8 arrays already at component
    resolution; `sampling` the (h_i, v_i) factors."""
    import struct

    import numpy as np

    from sarfile_analyzer_ng_spark.functions.multimodal import (
        ZIGZAG, _dct_matrix,
    )

    dctm = _dct_matrix()
    q = float(quant_flat)

    # fixed-length canonical tables: 12 DC symbols at 4 bits,
    # 162 AC symbols at 8 bits — prefix-free by construction
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | sz for r in range(16) for sz in range(1, 11)
    ]
    dc_bits = [0, 0, 0, 12] + [0] * 12
    ac_bits = [0, 0, 0, 0, 0, 0, 0, len(ac_syms)] + [0] * 8

    def canonical(bits, syms):
        codes, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                codes[syms[k]] = (length, code)
                k += 1
                code += 1
            code <<= 1
        return codes

    dc_codes, ac_codes = canonical(dc_bits, dc_syms), canonical(ac_bits, ac_syms)

    out = bytearray()
    acc = nbits = 0

    def emit(length, code):
        nonlocal acc, nbits
        acc = (acc << length) | code
        nbits += length
        while nbits >= 8:
            b = (acc >> (nbits - 8)) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)  # byte stuffing
            nbits -= 8

    def magnitude(v):
        t = int(v).bit_length() if v > 0 else int(-v).bit_length()
        bits = v if v >= 0 else v + (1 << t) - 1
        return t, bits

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    if len(planes) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved —
        # one block per MCU in the component's own raster, whatever
        # the SOF sampling factors declare
        mcux, mcuy = -(-w // 8), -(-h // 8)
        blocks = [(1, 1)]
    else:
        mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
        blocks = sampling
    padded = []
    for plane, (hi, vi) in zip(planes, blocks):
        ph, pw = mcuy * vi * 8, mcux * hi * 8
        p = np.zeros((ph, pw))
        p[: plane.shape[0], : plane.shape[1]] = plane
        # replicate edges into the pad so DCT energy stays local
        p[plane.shape[0]:, : plane.shape[1]] = plane[-1:, :]
        p[:, plane.shape[1]:] = p[:, plane.shape[1] - 1:plane.shape[1]]
        padded.append(p)

    dc_pred = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (plane, (hi, vi)) in enumerate(zip(padded, blocks)):
                for bv in range(vi):
                    for bh in range(hi):
                        y0 = (my * vi + bv) * 8
                        x0 = (mx * hi + bh) * 8
                        block = plane[y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = dctm @ block @ dctm.T
                        zz = np.array(
                            [coef[r, c] for r, c in ZIGZAG]
                        )
                        zz = np.round(zz / q).astype(int)
                        diff = int(zz[0]) - dc_pred[ci]
                        dc_pred[ci] = int(zz[0])
                        t, bits = magnitude(diff) if diff else (0, 0)
                        ln, code = dc_codes[t]
                        emit(ln, code)
                        if t:
                            emit(t, bits)
                        run = 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run >= 16:
                                ln, code = ac_codes[0xF0]
                                emit(ln, code)
                                run -= 16
                            t, bits = magnitude(v)
                            ln, code = ac_codes[(run << 4) | t]
                            emit(ln, code)
                            emit(t, bits)
                            run = 0
                        if run:
                            ln, code = ac_codes[0x00]
                            emit(ln, code)
    if nbits:
        emit(8 - nbits, (1 << (8 - nbits)) - 1)  # pad with 1s

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    zz_q = bytes([0]) + bytes([quant_flat] * 64)
    dht = (bytes([0x00]) + bytes(dc_bits[:16]) + bytes(dc_syms)
           + bytes([0x10]) + bytes(ac_bits[:16]) + bytes(ac_syms))
    n = len(planes)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([n])
    for ci, (hi, vi) in enumerate(sampling):
        sof += bytes([ci + 1, (hi << 4) | vi, 0])
    sos = bytes([n]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(n)) \
        + bytes([0, 63, 0])
    return (b"\xff\xd8" + seg(0xDB, zz_q) + seg(0xC4, dht)
            + seg(0xC0, sof) + seg(0xDA, sos) + bytes(out) + b"\xff\xd9")


def test_multimodal_real_jpeg_decode(spark):
    """Baseline JPEG is a real decoder: grayscale, 4:4:4 color, and
    4:2:0 chroma-subsampled encodings of the same luminance decode to
    features matching the netpbm ground truth within the flat-quant
    loss bound; a flat-gray image roundtrips EXACTLY (DC-only path)."""
    import numpy as np

    rng = np.random.default_rng(23)
    h, w = 18, 13  # exercises MCU padding (not multiples of 8/16)
    # smooth luminance: low-frequency so quant=1 loss stays tiny
    yy, xx = np.mgrid[0:h, 0:w]
    lum = (128 + 90 * np.sin(yy / 5.0) * np.cos(xx / 4.0)).astype(np.uint8)
    ppm = b"P5\n" + f"{w} {h}\n255\n".encode() + lum.tobytes()

    gray = _jpeg_encode([lum], w, h, [(1, 1)])
    flat_cr = np.full(lum.shape, 128, dtype=np.uint8)
    color444 = _jpeg_encode([lum, flat_cr, flat_cr], w, h,
                            [(1, 1), (1, 1), (1, 1)])
    sub = np.full((-(-h // 2), -(-w // 2)), 128, dtype=np.uint8)
    color420 = _jpeg_encode([lum, sub, sub], w, h,
                            [(2, 2), (1, 1), (1, 1)])

    media = spark.createDataFrame(
        [(1, "image", None, ppm, {}), (2, "image", None, gray, {}),
         (3, "image", None, color444, {}), (4, "image", None, color420, {})],
        MM.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    ref = got[1]["feature"]
    for mid in (2, 3, 4):
        assert (got[mid]["width"], got[mid]["height"]) == (w, h), mid
        assert got[mid]["feature"] is not None, mid
        for a, b in zip(ref, got[mid]["feature"]):
            assert abs(a - b) < 0.02, (mid, ref, got[mid]["feature"])

    # DC-only exactness: a flat 100-gray image decodes to exactly 100
    flat = np.full((8, 8), 100, dtype=np.uint8)
    jf = _jpeg_encode([flat], 8, 8, [(1, 1)])
    wd, hd, _, feat = MM.decode_jpeg(jf, "image")
    assert (wd, hd) == (8, 8)
    assert all(abs(v - 100 / 255) < 1e-9 for v in feat)

    # a grayscale file DECLARING 2x2 sampling still scans
    # non-interleaved (T.81 A.2.2) — the sampling factors must not
    # shape a single-component scan
    g22 = _jpeg_encode([lum], w, h, [(2, 2)])
    wd, hd, _, feat22 = MM.decode_jpeg(g22, "image")
    assert (wd, hd) == (w, h)
    for a, b in zip(ref, feat22):
        assert abs(a - b) < 0.02

    # arithmetic-coded JPEG refuses clearly (SOF9); a baseline scan
    # script behind an SOF2 marker is flagged as corrupt
    import pytest as _pytest

    arith = bytearray(gray)
    sof_at = arith.index(b"\xff\xc0")
    arith[sof_at + 1] = 0xC9
    with _pytest.raises(NotImplementedError, match="huffman"):
        MM.decode_jpeg(bytes(arith), "image")
    fake_prog = bytearray(gray)
    fake_prog[sof_at + 1] = 0xC2
    with _pytest.raises(ValueError, match="scan script"):
        MM.decode_jpeg(bytes(fake_prog), "image")


_MEDIA_DIR = os.path.join(os.path.dirname(__file__), "data", "media")


def test_multimodal_jpeg_decodes_real_world_files():
    """Independent validation against a JPEG produced by a REAL
    encoder (r9: vendored into tests/data/media so the check is
    hermetic — previously it skipped when the system sample was
    absent): a radially-symmetric baseline-SOF0 mandala (the
    flower-of-life sample shipped with the requests library's docs)
    must decode to a left/right symmetric luminance grid. Catches any
    convention bug the self-roundtrip pair could share (zigzag, byte
    stuffing, huffman canonicalization).

    If the larger system samples happen to exist, they are validated
    too (extra coverage, never a skip)."""
    from sarfile_analyzer_ng_spark.functions.multimodal import decode_jpeg

    mandala = os.path.join(_MEDIA_DIR, "flower-of-life.jpg")
    w, h, _, feat = decode_jpeg(open(mandala, "rb").read(), "image")
    assert (w, h) == (161, 161)
    # radial symmetry: each grid row reads the same left-to-right as
    # right-to-left (within JPEG loss), and the image is bright
    for row in (feat[:4], feat[4:]):
        assert abs(row[0] - row[3]) < 0.02 and abs(row[1] - row[2]) < 0.02
    assert min(feat) > 0.7

    diagram = ("/usr/lib/google-cloud-sdk/platform/gsutil/third_party/"
               "pyparsing/docs/_static/pyparsingClassDiagram_1.5.2.jpg")
    if os.path.exists(diagram):
        w, h, _, feat = decode_jpeg(open(diagram, "rb").read(), "image")
        assert (w, h) == (1155, 1659)
        assert min(feat) > 0.9  # a documentation page is mostly white


def _jpeg_encode_progressive(lum, w, h, refine=False):
    """Progressive (SOF2) grayscale encoder for the decoder tests:
    spectral-selection scans, and with ``refine=True`` a successive-
    approximation script (Al=1 first passes + Ah=1 refinement for DC
    and AC) whose correction-bit stream mirrors the decoder walk.
    Quant=1 everywhere, so a full progression reconstructs EXACTLY the
    coefficients the baseline encoder writes — features must match
    bit-for-bit."""
    import numpy as np

    from sarfile_analyzer_ng_spark.functions.multimodal import (
        ZIGZAG, _dct_matrix,
    )

    dctm = _dct_matrix()
    bx, by = -(-w // 8), -(-h // 8)
    p = np.zeros((by * 8, bx * 8))
    p[:h, :w] = lum
    p[h:, :w] = lum[-1:, :]
    p[:, w:] = p[:, w - 1:w]
    blocks = []
    for myy in range(by):
        for mxx in range(bx):
            blk = p[myy * 8:myy * 8 + 8, mxx * 8:mxx * 8 + 8] - 128.0
            coefm = dctm @ blk @ dctm.T
            blocks.append(
                np.round([coefm[r, c] for r, c in ZIGZAG]).astype(int)
            )

    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | sz for r in range(16) for sz in range(1, 11)
    ]
    dc_bits = [0, 0, 0, 12] + [0] * 12
    ac_bits = [0, 0, 0, 0, 0, 0, 0, len(ac_syms)] + [0] * 8

    def canonical(bits, syms):
        codes, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                codes[syms[k]] = (length, code)
                k += 1
                code += 1
            code <<= 1
        return codes

    dc_codes, ac_codes = canonical(dc_bits, dc_syms), canonical(ac_bits, ac_syms)

    def magnitude(v):
        t = int(abs(v)).bit_length()
        return t, (v if v >= 0 else v + (1 << t) - 1)

    def entropy(emitters):
        out, acc, nbits = bytearray(), 0, 0

        def emit(length, code):
            nonlocal acc, nbits
            acc = (acc << length) | code
            nbits += length
            while nbits >= 8:
                b = (acc >> (nbits - 8)) & 0xFF
                out.append(b)
                if b == 0xFF:
                    out.append(0x00)
                nbits -= 8

        for kind, a, b_ in emitters:
            if kind == "sym_dc":
                emit(*dc_codes[a])
                if a:
                    emit(a, b_)
            elif kind == "sym_ac":
                emit(*ac_codes[a])
                if b_ is not None:
                    emit(*b_)
            elif kind == "bit":
                emit(1, a)
        if nbits:
            emit(8 - nbits, (1 << (8 - nbits)) - 1)
        return bytes(out)

    def dc_first(al):
        ops, pred = [], 0
        for zz in blocks:
            v = int(zz[0]) >> al  # DC point transform: arithmetic shift
            t, bits_ = magnitude(v - pred)
            pred = v
            ops.append(("sym_dc", t, bits_))
        return ops

    def dc_refine(al):
        return [("bit", (int(zz[0]) >> al) & 1, None) for zz in blocks]

    def ac_first(ss, se, al):
        ops = []
        for zz in blocks:
            vals = [
                (1 if v > 0 else -1) * (abs(int(v)) >> al)
                for v in zz[ss:se + 1]
            ]
            run = 0
            for v in vals:
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    ops.append(("sym_ac", 0xF0, None))
                    run -= 16
                t, bits_ = magnitude(v)
                ops.append(("sym_ac", (run << 4) | t, (t, bits_)))
                run = 0
            if run:
                ops.append(("sym_ac", 0x00, None))  # EOB0
        return ops

    def ac_refine(ss, se, al):
        ops = []
        for zz in blocks:
            true = [int(v) for v in zz]
            hist = [(1 if v > 0 else -1) * (abs(v) >> (al + 1))
                    for v in true]
            k = ss

            def advance(zeros, unbounded=False, consume_stop=False):
                nonlocal k
                while k <= se:
                    if hist[k]:
                        ops.append(("bit", abs(true[k]) & 1, None))
                    else:
                        if not unbounded and zeros == 0:
                            if consume_stop:
                                k += 1
                            break
                        zeros -= 1
                    k += 1

            while True:
                kk, r, nxt = k, 0, None
                while kk <= se:
                    if not hist[kk]:
                        if true[kk] != 0:
                            nxt = kk
                            break
                        r += 1
                    kk += 1
                if nxt is None:
                    ops.append(("sym_ac", 0x00, None))
                    advance(0, unbounded=True)
                    break
                while r >= 16:
                    # T.81 bit order: ZRL skips 15 zeros and CONSUMES
                    # its 16th (mirrors the decoder)
                    ops.append(("sym_ac", 0xF0, None))
                    advance(15, consume_stop=True)
                    r -= 16
                ops.append(("sym_ac", (r << 4) | 1, None))
                ops.append(("bit", 1 if true[nxt] > 0 else 0, None))
                advance(r)
                k += 1  # past the newly placed coefficient
        return ops

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def sos(ss, se, ah, al):
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    if refine:
        scans = (
            sos(0, 0, 0, 1) + entropy(dc_first(1))
            + sos(0, 0, 1, 0) + entropy(dc_refine(0))
            + sos(1, 63, 0, 1) + entropy(ac_first(1, 63, 1))
            + sos(1, 63, 1, 0) + entropy(ac_refine(1, 63, 0))
        )
    else:
        scans = (
            sos(0, 0, 0, 0) + entropy(dc_first(0))
            + sos(1, 20, 0, 0) + entropy(ac_first(1, 20, 0))
            + sos(21, 63, 0, 0) + entropy(ac_first(21, 63, 0))
        )
    dht = (bytes([0x00]) + bytes(dc_bits[:16]) + bytes(dc_syms)
           + bytes([0x10]) + bytes(ac_bits[:16]) + bytes(ac_syms))
    sof = (bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
           + bytes([1, 1, 0x11, 0]))
    return (b"\xff\xd8" + seg(0xDB, bytes([0]) + bytes([1] * 64))
            + seg(0xC4, dht) + seg(0xC2, sof) + scans + b"\xff\xd9")


def test_multimodal_progressive_jpeg_matches_baseline():
    """A full progression reconstructs the EXACT coefficients the
    baseline encoding carries, so the decoded features must be
    identical — for plain spectral selection AND for a successive-
    approximation script exercising DC/AC refinement, EOB, ZRL, and
    correction bits."""
    import numpy as np

    from sarfile_analyzer_ng_spark.functions.multimodal import decode_jpeg

    rng = np.random.default_rng(31)
    h, w = 21, 19
    yy, xx = np.mgrid[0:h, 0:w]
    lum = np.clip(
        128 + 70 * np.sin(yy / 3.0) + 50 * np.cos(xx / 2.0)
        + rng.normal(0, 12, (h, w)),
        0, 255,
    ).astype(np.uint8)
    base = decode_jpeg(_jpeg_encode([lum], w, h, [(1, 1)]), "image")
    spectral = decode_jpeg(_jpeg_encode_progressive(lum, w, h), "image")
    refined = decode_jpeg(
        _jpeg_encode_progressive(lum, w, h, refine=True), "image"
    )
    assert spectral == base
    assert refined == base


def test_ac_refine_zrl_bit_order_matches_libjpeg():
    """The verified divergence case: a refinement stream in
    T.81/libjpeg order — [ZRL][sym(0,1)][sign][correction][EOB0] with
    16 leading zero-history slots and a nonzero-history coefficient
    right after them. ZRL must skip 15 zeros and consume the 16th
    WITHOUT touching the following nonzero coefficient, whose
    correction bit belongs to the NEXT symbol's walk."""
    from sarfile_analyzer_ng_spark.functions.multimodal import (
        _BitReader, _ProgressiveState,
    )

    frame = (8, 8, [{"id": 1, "h": 1, "v": 1, "tq": 0}])
    st = _ProgressiveState(frame)
    st.coef[0, 0, 17] = 2  # nonzero history right after 16 zeros
    # 2-bit canonical toy table: EOB0=00, ZRL=01, (r=0,s=1)=10
    table = {(2, 0): 0x00, (2, 1): 0xF0, (2, 2): 0x01}
    # bits: ZRL(01) sym01(10) sign(1) corr(1) EOB0(00) -> 0110 1100
    reader = _BitReader(bytes([0b01101100]), 0)
    st._ac_refine(reader, table, 1, 63, 0, 0)
    assert st.coef[0, 0, 17] == 3   # correction bit applied
    assert st.coef[0, 0, 18] == 1   # new coefficient lands at 18
    assert st.coef[0, 0, 16] == 0   # the consumed zero stays zero


def test_multimodal_real_progressive_jpegs():
    """A real libjpeg progressive-SOF2 file (r9: vendored into
    tests/data/media from the nodejs docs so the check is hermetic)
    decodes with correct geometry and near-white luminance; the
    larger system sibling is validated when present (never a
    skip)."""
    from sarfile_analyzer_ng_spark.functions.multimodal import decode_jpeg

    thin = os.path.join(_MEDIA_DIR, "thin-white-stripe.jpg")
    w, h, _, feat = decode_jpeg(open(thin, "rb").read(), "image")
    assert (w, h) == (493, 58) and min(feat) > 0.7
    full = "/usr/share/doc/nodejs/full-white-stripe.jpg"
    if os.path.exists(full):
        w, h, _, feat = decode_jpeg(open(full, "rb").read(), "image")
        assert (w, h) == (493, 312) and min(feat) > 0.9


def test_multimodal_mjpeg_frame_sampling(spark):
    """Motion-JPEG video (concatenated JPEG frames) samples through
    the SAME frame pipeline as netpbm video, with the real JPEG
    decoder per frame — per-frame features must match the PPM-encoded
    twin of the same frame pixels."""
    import numpy as np

    rng = np.random.default_rng(37)
    h, w = 16, 16
    yy, xx = np.mgrid[0:h, 0:w]
    frames_px = [
        np.clip(128 + 80 * np.sin(yy / 3.0 + t) * np.cos(xx / 4.0 - t),
                0, 255).astype(np.uint8)
        for t in range(5)
    ]
    mjpeg = b"".join(_jpeg_encode([f], w, h, [(1, 1)]) for f in frames_px)
    ppm_video = b"".join(
        b"P5\n16 16\n255\n" + f.tobytes() for f in frames_px
    )
    media = spark.createDataFrame(
        [(1, "video", None, mjpeg, {}), (2, "video", None, ppm_video, {})],
        MM.MEDIA_SCHEMA,
    )
    rows = MM.sample_frames(media, every_n=2).collect()
    by = {}
    for r in rows:
        by.setdefault(r["media_id"], {})[r["frame_idx"]] = r
    assert set(by[1]) == set(by[2]) == {0, 2, 4}
    for idx in (0, 2, 4):
        a, b = by[1][idx], by[2][idx]
        assert (a["width"], a["height"], a["n_frames"]) == (16, 16, 5)
        # JPEG at quant=1 is near-lossless: features match within 0.01
        for x, y in zip(a["feature"], b["feature"]):
            assert abs(x - y) < 0.01


def test_multimodal_corrupt_video_yields_marker_row(spark):
    good = b"P5\n2 2\n255\n\x00\x40\x80\xff" * 2
    bad = b"\xff\xd8\xff\xee"  # truncated MJPEG
    media = spark.createDataFrame(
        [(1, "video", None, bad, {}), (2, "video", None, good, {})],
        MM.MEDIA_SCHEMA,
    )
    rows = MM.sample_frames(media, every_n=1).collect()
    got = {}
    for r in rows:
        got.setdefault(r["media_id"], []).append(r)
    assert len(got[1]) == 1 and got[1][0]["frame_idx"] == -1
    assert got[1][0]["feature"] is None
    assert len(got[2]) == 2 and all(r["feature"] for r in got[2])
    import pytest as _pytest
    with _pytest.raises(Exception):
        MM.sample_frames(media, every_n=1, on_undecodable="raise").collect()


def test_image_phash_is_container_invariant_and_robust(spark):
    """Perceptual-hash dedup for the multimodal column: the SAME
    pixels re-encoded as netpbm, PNG, and BMP hash identically;
    a lightly-noised copy lands within a few bits; a different image
    is far away; banding recall is exact at the default threshold."""
    import struct
    import numpy as np

    from sarfile_analyzer_ng_spark.functions import multimodal as MM

    rng = np.random.default_rng(21)
    # structured image (gradient + blob) so the DCT spectrum is rich
    yy, xx = np.mgrid[0:40, 0:48]
    base = (xx * 3 + yy * 2) % 256
    base[10:20, 12:24] = 240
    base = base.astype(np.uint8)
    px = np.stack([base] * 3, axis=2)

    def bmp(p):
        h, w, _ = p.shape
        stride = (w * 3 + 3) & ~3
        body = b""
        for y in range(h - 1, -1, -1):
            row = p[y][:, ::-1].tobytes()  # BGR
            body += row + b"\x00" * (stride - len(row))
        header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                           len(body), 2835, 2835, 0, 0)
        return header + info + body

    ppm = b"P6\n48 40\n255\n" + px.tobytes()
    png = _png_encode(px, 2, [0, 1, 2, 3, 4])
    noisy = px.copy()
    noisy[0:6, 0:6] = 255 - noisy[0:6, 0:6]  # localized edit: ~4 bits
    other = rng.integers(0, 256, size=(40, 48, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (1, "image", None, ppm, {}),
            (2, "image", None, png, {}),
            (3, "image", None, bmp(px), {}),
            (4, "image", None, b"P6\n48 40\n255\n" + noisy.tobytes(), {}),
            (5, "image", None, b"P6\n48 40\n255\n" + other.tobytes(), {}),
            (6, "image", None, b"\x89PNG\r\n\x1a\n" + b"junk" * 4, {}),
        ],
        MM.MEDIA_SCHEMA,
    )
    hashes = MM.image_phash(media)
    got = {r["media_id"]: r for r in hashes.collect()}
    assert got[1]["phash"] == got[2]["phash"] == got[3]["phash"]
    assert (got[1]["width"], got[1]["height"]) == (48, 40)
    assert got[6]["phash"] is None          # corrupt -> null audit row

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert 0 < ham(got[1]["phash"], got[4]["phash"]) <= 7
    assert ham(got[1]["phash"], got[5]["phash"]) > 10
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in MM.phash_dup_pairs(hashes).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0 and pairs[(2, 3)] == 0
    assert (1, 4) in pairs and (1, 5) not in pairs and (4, 5) not in pairs


def test_video_phash_containment_finds_recut_copies(spark):
    """Video pHash dedup: a re-cut copy (subset of frames, any order,
    same pixels) scores containment 1.0 against the original; a
    partially-overlapping edit scores its shared fraction; unrelated
    footage pairs with nothing; corrupt payloads yield marker rows."""
    import numpy as np

    from sarfile_analyzer_ng_spark.functions import multimodal as MM

    rng = np.random.default_rng(33)

    def frame(seed):
        yy, xx = np.mgrid[0:16, 0:16]
        g = ((xx * (3 + seed) + yy * (2 + seed)) % 256).astype(np.uint8)
        g[(seed % 8):(seed % 8) + 5, 2:9] = 250
        px = np.stack([g] * 3, axis=2)
        return b"P6\n16 16\n255\n" + px.tobytes()

    f = [frame(i * 7) for i in range(6)]
    video_a = b"".join(f)                      # 6 frames
    video_cut = b"".join([f[4], f[1], f[2]])   # re-cut subset
    video_mix = b"".join(f[:3] + [frame(100), frame(200), frame(300)])
    video_other = b"".join(frame(1000 + i * 13) for i in range(6))
    media = spark.createDataFrame(
        [
            (1, "video", None, video_a, {}),
            (2, "video", None, video_cut, {}),
            (3, "video", None, video_mix, {}),
            (4, "video", None, video_other, {}),
            (5, "video", None, b"P6\ngarbage", {}),
        ],
        MM.MEDIA_SCHEMA,
    )
    fh = MM.video_phash(media)
    rows = fh.collect()
    marker = [r for r in rows if r["media_id"] == 5]
    assert len(marker) == 1 and marker[0]["phash"] is None
    assert len([r for r in rows if r["media_id"] == 1]) == 6

    pairs = {(r["id_a"], r["id_b"]): r for r in
             MM.video_phash_dup_pairs(fh, min_containment=0.5).collect()}
    assert pairs[(1, 2)]["containment"] == 1.0     # re-cut: full containment
    assert pairs[(1, 3)]["containment"] == 0.5     # 3 of 6 frames shared
    assert not any(4 in p for p in pairs)


def test_video_phash_zero_frame_payload_emits_marker(spark):
    """r8 ADVICE: a payload that splits into ZERO frames (empty or
    whitespace-only container) must emit the (media_id, -1, null)
    marker row like a corrupt payload — never silently vanish from
    the dedup audit."""
    from sarfile_analyzer_ng_spark.functions import multimodal as MM

    media = spark.createDataFrame(
        [(1, "video", None, b"   ", {}), (2, "video", None, b"\n\n", {})],
        MM.MEDIA_SCHEMA,
    )
    rows = MM.video_phash(media).collect()
    got = {r["media_id"]: r for r in rows}
    assert set(got) == {1, 2}
    for r in rows:
        assert r["frame_idx"] == -1 and r["phash"] is None


def test_decode_luminance_does_not_leak_reducer():
    """r8 ADVICE: decode_luminance threads an explicit reducer through
    real_decode instead of swapping module state — a nested or
    interleaved real_decode call mid-flight must still produce the
    8-dim grid feature, and the module global must be untouched."""
    import numpy as np

    from sarfile_analyzer_ng_spark.functions import multimodal as MM

    px = np.stack([(np.arange(12 * 16).reshape(12, 16) % 256)
                   .astype(np.uint8)] * 3, axis=2)
    ppm = b"P6\n16 12\n255\n" + px.tobytes()

    before = MM._lum_feature
    w, h, lum = MM.decode_luminance(ppm)
    assert (w, h) == (16, 12) and lum.shape == (12, 16)
    # the module-level reducer is untouched and real_decode still
    # produces the pooled 8-dim feature
    assert MM._lum_feature is before
    _, _, _, feat = MM.real_decode(ppm, "image")
    assert isinstance(feat, list) and len(feat) == 8

    # interleaved: a reducer passed to one call never leaks into another
    seen = {}

    def probe(lum_plane):
        seen["shape"] = lum_plane.shape
        _, _, _, inner = MM.real_decode(ppm, "image")  # nested default call
        seen["inner_len"] = len(inner)
        return MM._lum_feature(lum_plane)

    MM.real_decode(ppm, "image", reducer=probe)
    assert seen["shape"] == (12, 16) and seen["inner_len"] == 8


def test_phash_dup_pairs_caps_hot_band_buckets(spark):
    """r8 scale fix: a band value shared by the whole corpus (solid
    cards, logo frames) must not generate a quadratic bucket. 200
    hashes share bands 0 and 2-7 exactly (all zero) while band 1 is
    unique per image; with the max_df cap the hot bands are dropped
    from candidate generation and only the genuinely-near pair (its
    band values have df=2) survives."""
    from sarfile_analyzer_ng_spark.functions import multimodal as MM

    rows = [(i, i << 8) for i in range(200)]  # band1 unique; rest hot 0
    # exact dup pair; band1 byte 0xFF > 199 so it collides with no id
    dup = 0x7EADBEEFCAFEFFAA
    rows += [(2000, dup), (2001, dup)]
    hashes = spark.createDataFrame(rows, "media_id long, phash long")

    # cap off, hamming unrestricted: the hot zero bands go quadratic
    uncapped = MM.phash_dup_pairs(hashes, max_hamming=64, max_df=None)
    assert uncapped.count() >= 199 * 200 // 2
    # cap on: the hot band is excluded, candidate work collapses to the
    # planted pair (which shares 7 other, uncapped bands)
    capped = MM.phash_dup_pairs(hashes, max_hamming=64, max_df=50)
    got = [(r["id_a"], r["id_b"]) for r in capped.collect()]
    assert got == [(2000, 2001)]
    # default threshold + cap still finds the true duplicate
    dflt = {(r["id_a"], r["id_b"]) for r in
            MM.phash_dup_pairs(hashes, max_df=50).collect()}
    assert (2000, 2001) in dflt


def test_video_phash_dup_pairs_caps_hot_frames(spark):
    """r8 scale fix: a boilerplate frame (black frame / intro slate)
    shared by 10^3 videos must not make its hash bucket quadratic.
    Containment denominators are computed BEFORE the cap, so scores
    only decrease — the re-cut true copy still scores 1.0 through its
    unique frames."""
    from sarfile_analyzer_ng_spark.functions import multimodal as MM

    BLACK = 42  # the boilerplate frame hash every video shares
    rows = []
    for v in range(1000):
        rows += [(v, 0, 3, BLACK), (v, 1, 3, 10_000 + 2 * v),
                 (v, 2, 3, 10_001 + 2 * v)]
    # a re-cut copy of video 7: subset of its unique frames
    rows += [(5000, 0, 2, 10_014), (5000, 1, 2, BLACK)]
    fh = spark.createDataFrame(
        rows, "media_id long, frame_idx int, n_frames int, phash long")

    # cap off, threshold 0: the BLACK bucket alone yields ~500k pairs
    uncapped = MM.video_phash_dup_pairs(fh, min_containment=0.0,
                                        max_df=None)
    assert uncapped.count() > 400_000
    capped = MM.video_phash_dup_pairs(fh, min_containment=0.5, max_df=50)
    got = {(r["id_a"], r["id_b"]): r["containment"] for r in capped.collect()}
    # the true re-cut copy survives at containment 1/2 (its BLACK frame
    # no longer counts as shared, denominator still 2 — only decreases)
    assert got == {(7, 5000): 0.5}


def test_image_phash_bit_exact_with_corrupt_row_in_batch(spark):
    """r8 (caught by the q117 oracle): a corrupt row sharing the
    pandas batch coerced the int64 hash column to float64, silently
    zeroing the low bits of every hash above 2^53. The kernel now
    emits nullable Int64 — the distributed hash must equal the
    driver-side computation BIT-exactly."""
    import numpy as np

    from sarfile_analyzer_ng_spark.functions import multimodal as MM

    g = ((np.arange(40 * 48).reshape(40, 48) * 7) % 256).astype(np.uint8)
    g[5:15, 8:20] = 240
    px = np.stack([g] * 3, axis=2)
    ppm = b"P6\n48 40\n255\n" + px.tobytes()
    _w, _h, lum = MM.decode_luminance(ppm)
    expect = MM._phash64(lum)
    assert abs(expect) > 2**53  # the magnitude where float64 truncates

    media = spark.createDataFrame(
        [(1, "image", None, ppm, {}),
         (2, "image", None, b"\x89PNG\r\n\x1a\njunk", {})],
        MM.MEDIA_SCHEMA,
    ).coalesce(1)  # force one Arrow batch containing the corrupt row
    got = {r["media_id"]: r["phash"] for r in MM.image_phash(media).collect()}
    assert got[1] == expect and got[2] is None

    # video path: marker row in-batch must not corrupt frame hashes
    vid = spark.createDataFrame(
        [(1, "video", None, ppm, {}), (2, "video", None, b"   ", {})],
        MM.MEDIA_SCHEMA,
    ).coalesce(1)
    vrows = {r["media_id"]: r["phash"] for r in MM.video_phash(vid).collect()}
    assert vrows[1] == expect and vrows[2] is None


def test_media_inventory_counts_and_corrupt_row(spark):
    """q156: every payload is accounted for, exactly one corrupt
    payload exists (the planted broken PNG), and all decoded images
    share the generator's 48x40 dimensions."""
    from sarfile_analyzer_ng_spark.queries import q156_media_inventory

    rows = q156_media_inventory(spark, "unused").collect()
    assert sum(r["n_payloads"] for r in rows) == 66  # 20*3 + 5 + 1
    assert sum(r["n_corrupt"] for r in rows) == 1
    for r in rows:
        assert r["n_decoded"] + r["n_corrupt"] == r["n_payloads"]
        if r["n_decoded"]:
            assert (r["min_w"], r["max_w"]) == (48, 48)
            assert (r["min_h"], r["max_h"]) == (40, 40)
