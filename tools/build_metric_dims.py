"""Build the metric-description dimension table from a sysstat ``sar.1``
man page (public sysstat documentation, https://github.com/sysstat/sysstat).

The reference app keeps an equivalent metric→description mapping in a
sqlite table populated from the same man page
(sarfile_analyzer_ng code/helpers_pl.py:143
``get_metric_desc_from_manpage``, code/import_metrics.py); here the
mapping is a checked-in TSV so the engine stays standalone — regenerate
with::

    python tools/build_metric_dims.py /path/to/sar.1

Parser (written against man(7) troff conventions, not the reference's
code): a ``.IP <token>`` macro names a metric; following lines that are
not troff macros are its description; the next macro ends it.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / (
    "sarfile_analyzer_ng_spark/data/metric_descriptions.tsv"
)

# sar's column headers changed names across sysstat versions; both
# spellings appear in the wild, so both get the description.
SYNONYMS = {
    "%usr": "%user",
    "%user": "%usr",
    "%sys": "%system",
    "%system": "%sys",
}

_IP = re.compile(r"^\.IP\s+(\S+)\s*$")
_MACRO = re.compile(r"^\.")


def _clean(text: str) -> str:
    """Strip troff escapes/fonts down to plain prose."""
    text = re.sub(r"\\f[BIRP]", "", text)
    text = text.replace("\\-", "-").replace("\\%", "%").replace("\\&", "")
    return " ".join(text.split())


def parse_manpage(path: str) -> dict[str, str]:
    metrics: dict[str, str] = {}
    metric: str | None = None
    buf: list[str] = []

    def flush() -> None:
        nonlocal metric, buf
        if metric and buf:
            desc = _clean(" ".join(buf))
            # first definition wins (later sections repeat e.g. tps)
            metrics.setdefault(metric, desc)
        metric, buf = None, []

    for line in Path(path).read_text().splitlines():
        m = _IP.match(line)
        if m:
            flush()
            metric = _clean(m.group(1))
        elif _MACRO.match(line):
            flush()
        elif metric is not None:
            buf.append(line)
    flush()

    for name, other in SYNONYMS.items():
        if name in metrics and other not in metrics:
            metrics[other] = metrics[name]
    return metrics


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "sar.1"
    metrics = parse_manpage(src)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with OUT.open("w") as f:
        f.write("metric\tdescription\n")
        for name in sorted(metrics):
            f.write(f"{name}\t{metrics[name]}\n")
    print(f"wrote {len(metrics)} metrics to {OUT}")


if __name__ == "__main__":
    main()
