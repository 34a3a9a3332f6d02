"""Markdown → text extraction — the stage-0 sibling of
functions/html.py for the second-biggest markup family in training
corpora (READMEs, forums, wikis, docs sites; Dolma's code/web mixes
carry large markdown shares). Reference parity: sarfile_analyzer_ng
has no markup layer; the contract here is the CommonMark-ish
subset below, chosen — like the HTML contract — to be deterministic,
RE2 ∩ Java-regex safe (no lookaround, no backreferences in
PATTERNS; group references only in REPLACEMENTS, which both engines
support), and replayable in ANSI SQL for value-hash oracling.

Extraction contract (documented, deterministic):
  1. fenced code blocks (``` … ```) drop WITH their content (code is
     counted, not extracted — the q139-family ops decide code policy
     separately);
  2. images ``![alt](target)`` keep their alt text;
  3. links ``[label](target)`` keep their label;
  4. ATX headers lose their leading ``#`` run; list bullets lose
     their ``-``/``*``/``+`` marker; emphasis runs (``*``/``_``,
     up to 3) strip;
  5. whitespace normalizes to single spaces (blocks are NOT
     segmented here — markdown's block structure is line-based and
     the doc-level ops downstream re-chunk anyway).

Scale shape: pure per-row regexp map — no UDF, no shuffle, no
explode; scan-speed on 100 TB of markdown.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FENCE_RE = r"(?s)```.*?```"
IMAGE_RE = r"!\[([^\]]*)\]\(([^)]*)\)"
LINK_RE = r"\[([^\]]*)\]\(([^)]*)\)"
HEADER_RE = r"(?m)^#{1,6}[ \t]*"
BULLET_RE = r"(?m)^[ \t]*[-*+][ \t]+"
EMPHASIS_RE = r"[*_]{1,3}"


def md_counts(md: Column) -> tuple[Column, Column, Column]:
    """(n_code_fences, n_images, n_links) BEFORE any stripping —
    links counted on the image-free string so ``![a](b)`` is an
    image, not a link."""
    n_code = F.size(F.regexp_extract_all(md, F.lit(FENCE_RE), 0))
    no_fence = F.regexp_replace(md, FENCE_RE, " ")
    n_img = F.size(F.regexp_extract_all(no_fence, F.lit(IMAGE_RE), 0))
    no_img = F.regexp_replace(no_fence, IMAGE_RE, "$1")
    n_link = F.size(F.regexp_extract_all(no_img, F.lit(LINK_RE), 0))
    return n_code, n_img, n_link


def md_text(md: Column) -> Column:
    """Rules 1–5: the extracted text column."""
    out = F.regexp_replace(md, FENCE_RE, " ")
    out = F.regexp_replace(out, IMAGE_RE, "$1")
    out = F.regexp_replace(out, LINK_RE, "$1")
    out = F.regexp_replace(out, HEADER_RE, "")
    out = F.regexp_replace(out, BULLET_RE, "")
    out = F.regexp_replace(out, EMPHASIS_RE, "")
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def md_extract(df: DataFrame, md_col: str, id_col: str) -> DataFrame:
    """The full contract: per row (id, n_code, n_images, n_links,
    text, n_chars)."""
    md = F.col(md_col)
    n_code, n_img, n_link = md_counts(md)
    text = md_text(md)
    return df.select(
        F.col(id_col),
        n_code.cast("long").alias("n_code"),
        n_img.cast("long").alias("n_images"),
        n_link.cast("long").alias("n_links"),
        text.alias("text"),
        F.length(text).cast("long").alias("n_chars"),
    )
