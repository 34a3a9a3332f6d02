"""Generate the checked-in deterministic media corpus for the
image-dedup correctness gate (q117) — the q55 pattern (repo-shipped
data the oracle reads by absolute path) applied to binary media.

Writes two parquet files under sarfile_analyzer_ng_spark/data/media/:

- ``media.parquet``: (media_id, kind, fmt, payload) — 20 structured
  base images, each encoded THREE ways with identical pixels (binary
  netpbm P6, PNG, uncompressed 24-bit BMP), plus 5 lightly-edited
  copies (a localized inversion — lands within a few hamming bits of
  its base) and one corrupt PNG payload.
- ``media_hashes.parquet``: (media_id, phash, width, height) — the
  64-bit perceptual hash of every payload, computed through the SAME
  pure-python decode path the Spark operator uses
  (multimodal.decode_luminance → _phash64; corrupt → NULL row).

q117's Spark side re-decodes the payloads distributively and re-runs
the banded-hamming pair join; its DuckDB oracle replays the pair join
from this hashes table with plain bit ops — so the join semantics get
genuine cross-engine verification while the decode stage's
determinism is pinned by the stored hashes.

Deterministic by construction (fixed integer arithmetic, no RNG
state beyond a seeded LCG) — re-running this script must be a no-op
diff. Usage: python tools/gen_media.py
"""

from __future__ import annotations

import os
import struct
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "sarfile_analyzer_ng_spark", "data", "media",
)

W, H = 48, 40
N_BASE = 20
N_NOISED = 5


def _lcg_image(seed: int) -> np.ndarray:
    """Structured deterministic RGB image: gradient + seeded blob —
    rich DCT spectrum, integer arithmetic only."""
    yy, xx = np.mgrid[0:H, 0:W]
    g = (xx * (3 + seed % 5) + yy * (2 + seed % 7) + seed * 11) % 256
    y0, x0 = (seed * 7) % (H - 12), (seed * 13) % (W - 14)
    g[y0:y0 + 10, x0:x0 + 12] = (235 + seed) % 256
    g = g.astype(np.uint8)
    return np.stack([g, (g + seed) % 256, (g * 2 + 7) % 256], axis=2).astype(
        np.uint8
    )


def encode_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def encode_png(px: np.ndarray) -> bytes:
    """Minimal valid PNG: 8-bit RGB, filter 0 per scanline, one IDAT."""
    h, w, _ = px.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_bmp(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = b""
    for y in range(h - 1, -1, -1):
        row = px[y][:, ::-1].tobytes()  # BGR
        body += row + b"\x00" * (stride - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(body), 2835, 2835, 0, 0)
    return header + info + body


def build_rows() -> list[tuple[int, str, str, bytes]]:
    rows = []
    for i in range(N_BASE):
        px = _lcg_image(i)
        rows.append((3 * i, "image", "ppm", encode_ppm(px)))
        rows.append((3 * i + 1, "image", "png", encode_png(px)))
        rows.append((3 * i + 2, "image", "bmp", encode_bmp(px)))
    for i in range(N_NOISED):
        px = _lcg_image(i).copy()
        px[0:6, 0:6] = 255 - px[0:6, 0:6]  # localized edit: a few bits
        rows.append((100 + i, "image", "ppm", encode_ppm(px)))
    rows.append((999, "image", "png", b"\x89PNG\r\n\x1a\n" + b"junk" * 8))
    return rows


def main() -> None:
    from sarfile_analyzer_ng_spark.functions import multimodal as MM

    rows = build_rows()
    os.makedirs(OUT_DIR, exist_ok=True)
    media = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows]),
            "fmt": pa.array([r[2] for r in rows]),
            "payload": pa.array([r[3] for r in rows], pa.binary()),
        }
    )
    pq.write_table(media, os.path.join(OUT_DIR, "media.parquet"),
                   compression="none")

    ids, hashes, widths, heights = [], [], [], []
    for mid, _kind, _fmt, payload in rows:
        ids.append(mid)
        try:
            w, h, lum = MM.decode_luminance(payload)
            hashes.append(MM._phash64(lum))
            widths.append(w)
            heights.append(h)
        except Exception:
            hashes.append(None)
            widths.append(None)
            heights.append(None)
    ht = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "phash": pa.array(hashes, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        }
    )
    pq.write_table(ht, os.path.join(OUT_DIR, "media_hashes.parquet"),
                   compression="none")
    n_null = sum(1 for x in hashes if x is None)
    print(f"wrote {len(rows)} media rows ({n_null} corrupt) to {OUT_DIR}")


if __name__ == "__main__":
    main()
