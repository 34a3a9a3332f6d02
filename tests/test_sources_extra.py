"""sadf-JSON source (plain + xz) and multimodal plumbing."""

from __future__ import annotations

import json
import lzma

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


def test_multimodal_real_decode_is_explicit_stub(spark):
    media = spark.createDataFrame(
        [(1, "image", None, b"x", {})], MM.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        MM.extract_features(media).collect()


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
