"""URL / domain-level curation primitives — the FIRST stage of a
web-scale training-data pipeline (RefinedWeb §3.1 runs URL filtering
before any text op; C4 and Dolma gate on domain blocklists).

Everything here is pure whole-stage-codegen column arithmetic:
regexp extract/replace + array HOFs, no UDF, no shuffle — a
canonicalizer that runs at scan speed on 100 TB of crawl metadata.
Every rule is deliberately expressible in ANSI SQL (DuckDB) so the
full canonical form is value-hash oracle-able; regex features stay
inside the RE2 ∩ Java-regex common subset (no lookaround, no
backreference replacements).

Canonicalization contract (documented, deterministic):
  1. trim; strip the ``#fragment``.
  2. scheme lowercased.
  3. host lowercased; default port (``:80`` http, ``:443`` https)
     stripped; a leading ``www.`` stripped.
  4. path: runs of ``/`` collapsed to one; trailing slash dropped
     (except the bare root); empty path becomes ``/``.
  5. query: parameters split on ``&``; tracking params dropped
     (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``, ``mc_eid``,
     ``ref``); survivors SORTED (binary order) and rejoined — empty
     query drops the ``?`` entirely.
  6. userinfo/IDN/percent-encoding are passed through untouched
     (the full WHATWG algorithm needs a UDF; this is the
     crawl-dedup canonical form, not a browser).

The registrable-domain extractor is public-suffix-LITE: the last two
host labels, or three when the second-level label is a well-known
country-code second-level (``co.uk``-style) — the bounded literal
set below, not the full PSL (which is a data file, not logic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking parameters dropped by rule 5 (one alternation, anchored)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_eid|ref)(=.*)?$"

# second-level labels that make a 2-letter ccTLD registrable at the
# THIRD label (public-suffix-lite; the PSL top offenders)
SECOND_LEVEL_RE = r"\.(co|com|org|net|ac|gov|edu)\.[a-z][a-z]$"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme ('' when the URL has no ``scheme://``)."""
    return F.lower(F.regexp_extract(F.trim(url), _SCHEME_RE, 1))


def _after_scheme(url: Column) -> Column:
    return F.regexp_replace(F.trim(url), _SCHEME_RE, "")


def _strip_fragment(col: Column) -> Column:
    return F.regexp_replace(col, r"#.*$", "")


def url_host(url: Column) -> Column:
    """Canonical host: lowercased, default port stripped (scheme-
    aware), leading ``www.`` stripped. '' for scheme-less input."""
    rest = _strip_fragment(_after_scheme(url))
    hp = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    scheme = url_scheme(url)
    no_port = (
        F.when(scheme == "http", F.regexp_replace(hp, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hp, r":443$", ""))
        .otherwise(hp)
    )
    return F.when(scheme == "", F.lit("")).otherwise(
        F.regexp_replace(no_port, r"^www\.", "")
    )


def url_path(url: Column) -> Column:
    """Canonical path: ``//``-runs collapsed, trailing slash dropped
    (root stays ``/``), empty path → ``/``."""
    rest = _strip_fragment(_after_scheme(url))
    tail = F.regexp_replace(rest, r"^[^/?]+", "")
    raw = F.regexp_extract(tail, r"^([^?]*)", 1)
    collapsed = F.regexp_replace(raw, r"/{2,}", "/")
    return _drop_trailing_slash(collapsed)


def _drop_trailing_slash(path: Column) -> Column:
    out = F.when(
        (F.length(path) > 1) & path.rlike("/$"),
        path.substr(F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    return F.when(out == "", F.lit("/")).otherwise(out)


def url_query_canonical(url: Column) -> Column:
    """Canonical query string: tracking params dropped, survivors
    sorted and '&'-joined; '' when nothing survives."""
    rest = _strip_fragment(_after_scheme(url))
    q = F.regexp_extract(rest, r"\?(.*)$", 1)
    parts = F.filter(
        F.split(q, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(parts), "&")


def canonical_url(url: Column) -> Column:
    """The full canonical form (rules 1–6 above) — the key used for
    URL-level exact dedup and host rollups. Scheme-less input is
    passed through lowercase-trimmed (no structure to normalize)."""
    scheme = url_scheme(url)
    host = url_host(url)
    path = url_path(url)
    q = url_query_canonical(url)
    assembled = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(scheme == "", F.lower(F.trim(url))).otherwise(assembled)


def registrable_domain(host: Column) -> Column:
    """Public-suffix-lite registrable domain of a canonical host:
    last two labels, or last three when the tail matches the known
    ``co.uk``-style second-level set; a dot-less host is its own
    domain."""
    three = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return (
        F.when(host.rlike(SECOND_LEVEL_RE) & (three != ""), three)
        .when(two != "", two)
        .otherwise(host)
    )
