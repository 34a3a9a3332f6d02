"""sadf -j JSON ingest (``sadf -j <sa-file> -- -A``).

The reference converts sadf JSON back into sar *text* and re-parses it
(sar_ingest.py:413 ``sadf_json_to_sar_text``) so one parser owns the
format. Spark-first, the JSON is its own distributed source: one file
per task, a generic traversal of the sysstat statistics tree, and the
same long output schema as the text source — no text round-trip.

Traversal rules (sysstat's public JSON layout):
- each ``statistics`` entry is one timestamp; sections are its keys
- list-valued sections carry a per-device axis; the device key is the
  one string-valued field (cpu, disk-device, iface, line, filesystem)
- numeric fields become (metric, value) rows; nested dicts (the io
  section's io-reads/io-writes) are flattened with dotted names
- ``restarts``/boot entries become restart=True rows

xz-compressed uploads (single-file .xz) are handled transparently —
the reference does the same in sar_ingest.py:333.
"""

from __future__ import annotations

import json
import lzma
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sar_text import SAR_SCHEMA

XZ_MAGIC = b"\xfd7zXZ\x00"

_DEVICE_KEYS = ("cpu", "disk-device", "iface", "line", "filesystem", "fchost")


def _flatten(d: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out.update(_flatten(v, f"{prefix}{k}."))
        else:
            out[f"{prefix}{k}"] = v
    return out


def _rows_for_section(section: str, payload, ts, base: dict,
                      skipped: set[str] | None = None) -> list[dict]:
    rows = []
    entries = payload if isinstance(payload, list) else [payload]
    for entry in entries:
        if not isinstance(entry, dict):
            continue
        flat = _flatten(entry)
        device = None
        for dk in _DEVICE_KEYS:
            if isinstance(flat.get(dk), (str, int)) and dk in entry:
                device = str(flat.pop(dk))
                break
        for metric, value in flat.items():
            if isinstance(value, bool) or not isinstance(value, (int, float)):
                # non-numeric, non-device field the generic traversal
                # drops — surfaced to the uploader (reference
                # sar_ingest.py:382-387 warns per unknown field); a new
                # sysstat device-axis key would land here too.
                if skipped is not None:
                    skipped.add(f"unknown field skipped: {section}.{metric}")
                continue
            rows.append(
                {
                    **base,
                    "section": section,
                    "ts": ts,
                    "device": device,
                    "metric": metric,
                    "value": float(value),
                    "restart": False,
                }
            )
    return rows


def parse_sadf_json(file_name: str, content: bytes,
                    skipped: set[str] | None = None) -> list[dict]:
    """Pure per-file parser (executor-side body). Pass a ``skipped``
    set to collect unknown-field warnings (upload path only — the
    distributed read skips the bookkeeping)."""
    if content[: len(XZ_MAGIC)] == XZ_MAGIC:
        content = lzma.decompress(content)
    data = json.loads(content)
    out: list[dict] = []
    for host in data.get("sysstat", {}).get("hosts", []):
        host_name = host.get("nodename")
        file_date = host.get("file-date", "2000-01-01")
        os_details = (
            f"Linux {host.get('release', 'unknown')} ({host_name}) {file_date}"
        )
        base = {"file": file_name, "host": host_name, "os_details": os_details}

        def ts_of(time_str: str, date_str: str | None = None):
            return datetime.fromisoformat(f"{date_str or file_date}T{time_str}")

        for entry in host.get("statistics", []):
            stamp = entry.get("timestamp", {})
            time_str = stamp.get("time")
            if not time_str:
                continue
            ts = ts_of(time_str, stamp.get("date"))
            for section, payload in entry.items():
                if section == "timestamp":
                    continue
                if section == "network" and isinstance(payload, dict):
                    for sub, sub_payload in payload.items():
                        out.extend(
                            _rows_for_section(f"network.{sub}", sub_payload,
                                              ts, base, skipped)
                        )
                else:
                    out.extend(
                        _rows_for_section(section, payload, ts, base, skipped)
                    )
        for restart in host.get("restarts", []):
            boot = restart.get("boot", restart) if isinstance(restart, dict) else {}
            time_str = boot.get("time")
            if time_str:
                out.append(
                    {
                        **base,
                        "section": "LINUX RESTART",
                        "ts": ts_of(time_str, boot.get("date")),
                        "device": None,
                        "metric": "restart",
                        "value": 1.0,
                        "restart": True,
                    }
                )
    return out


def read_sadf_json(spark: SparkSession, path: str) -> DataFrame:
    """Distributed sadf-JSON read: binaryFile source (handles .xz),
    one file per task, same long schema as the text source."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*")
        .load(path)
        .select(F.col("path").alias("file"), F.col("content"))
    )
    # No repartition: the binaryFile source already packs whole files
    # into scan partitions bounded by spark.sql.files.maxPartitionBytes
    # (byte-aware, unlike a hash repartition on file name, which can
    # collide two large files into one partition). Per-file pandas
    # yields below bound python memory within a partition, and keeping
    # the plan lazy avoids an eager listing job at construction time.
    field_names = [f.name for f in SAR_SCHEMA.fields]

    def batches(iterator):
        for pdf in iterator:
            # one Arrow batch per FILE — never accumulate a whole
            # multi-file partition's rows in one python list
            for file_name, content in zip(pdf["file"], pdf["content"]):
                try:
                    rows = parse_sadf_json(file_name, bytes(content))
                except (json.JSONDecodeError, lzma.LZMAError, ValueError):
                    continue  # skip broken uploads, like the reference UI
                yield pd.DataFrame(rows, columns=field_names)

    return raw.mapInPandas(batches, SAR_SCHEMA)


def sadf_warnings(file_name: str, content: bytes) -> list[str]:
    """Upload-time scan for sysstat fields the traversal drops
    (reference sar_ingest.py:24-60, 382-387: per-field warnings on
    unrecognized keys, surfaced to the uploader). One driver-side pass
    over the single uploaded file — never part of the distributed
    read. Returns sorted, deduplicated messages; broken JSON returns
    no warnings here because upload fails loudly later anyway."""
    skipped: set[str] = set()
    try:
        if content[: len(XZ_MAGIC)] == XZ_MAGIC:
            content = lzma.decompress(content)
        parse_sadf_json(file_name, content, skipped=skipped)
    except (json.JSONDecodeError, lzma.LZMAError, ValueError, KeyError):
        return []
    return sorted(skipped)
