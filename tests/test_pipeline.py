"""curate_funnel: first-rejecting-stage attribution semantics on
hand-crafted documents, and the q85 composition plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from sarfile_analyzer_ng_spark.functions import pipeline as P

from .conftest import SF_DIR

# 24 words, English stopword-rich, low punctuation — passes the
# C4/Gopher gate.
GOOD = ("the quick brown fox jumps over the lazy dog and then runs "
        "down to the wide river bank where the water is cold today")
GOOD2 = ("a small grey cat sat on the warm stone wall and watched the "
         "busy street below for most of the long afternoon hours")
EVAL = ("every model should be tested on data that was never part of "
        "the training corpus or the reported numbers are not real")


def _funnel(spark, train_rows, eval_rows):
    train = spark.createDataFrame(
        train_rows, "doc_id long, text string, source string"
    )
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    out = P.curate_funnel(train, ev, "text", "doc_id", "source")
    return {r["doc_id"]: r["stage"] for r in out.collect()}


def test_funnel_attributes_first_rejecting_stage(spark):
    rows = [
        (1, GOOD, "a"),            # clean -> kept
        (2, GOOD, "a"),            # exact dup of 1 -> duplicate
        (3, "too short", "a"),     # fails quality
        (4, "too short", "a"),     # ALSO a dup of 3 -> but quality wins
        (5, EVAL, "b"),            # verbatim eval copy -> contaminated
        (6, GOOD2, "b"),           # clean -> kept
    ]
    got = _funnel(spark, rows, [(900, EVAL)])
    assert got == {1: "kept", 2: "duplicate", 3: "quality",
                   4: "quality", 5: "contaminated", 6: "kept"}


def test_funnel_dedup_ranks_only_quality_passing_docs(spark):
    # a quality-REJECTED smaller id must not shadow the clean copy:
    # doc 10 fails quality, doc 11 (same text plus padding to pass?) —
    # instead: two clean dups where the smaller id failed quality for
    # an unrelated reason is impossible with identical text, so plant
    # a rejected doc with DIFFERENT text and assert independence,
    # plus the kept copy of a dup pair is the SMALLEST id.
    rows = [
        (20, GOOD, "a"),
        (7, GOOD, "a"),   # smaller id wins the dup group
        (8, "x", "a"),
    ]
    got = _funnel(spark, rows, [(900, EVAL)])
    assert got == {7: "kept", 20: "duplicate", 8: "quality"}


def test_funnel_contamination_needs_contiguous_overlap(spark):
    # shares vocabulary with the eval doc but no k+w-1-word run:
    # winnow decon must NOT flag it (scattered overlap stays quiet)
    shuffled = ("tested never part was that data corpus training on the "
                "numbers reported real not are model every should be of "
                "or some more padding words to clear the length gate")
    got = _funnel(spark, [(30, shuffled, "a")], [(900, EVAL)])
    assert got == {30: "kept"}
