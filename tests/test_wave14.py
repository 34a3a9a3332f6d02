"""Round-11 wave-2: HTML → text extraction (q203) and its
composition as stage 0 of the q201 crawl funnel."""

from __future__ import annotations

from pyspark.sql import functions as F

from sarfile_analyzer_ng_spark.functions import html as H

SF_DIR = "/root/testdata/sf0.001"


def _extract(spark, html: str):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return H.html_extract(df, "html", "doc_id").collect()[0]


def test_script_style_head_comment_stripped(spark):
    r = _extract(spark, (
        '<html><head><title>chrome</title><style>p{x:1}</style>'
        '<script>var t = "</p> trap & <div>fake</div>";</script></head>'
        '<body><!-- note --><p>real content stays here</p></body></html>'
    ))
    assert r.text == "real content stays here"
    assert r.n_blocks == 1 and r.n_boiler == 0
    # the script's literal </p> and <div> must NOT have split blocks,
    # and "chrome"/"trap" must not leak into the text


def test_link_density_drops_nav_keeps_article(spark):
    r = _extract(spark, (
        '<body><NAV><a href="/">Home</a> <a href="/a">About</a></NAV>'
        '<h1>Title</h1>'
        '<div><a href=x>anchor</a> with plenty of surrounding prose '
        'that dominates the block</div>'
        '<footer><a href="/t">terms of service</a> (c)</footer></body>'
    ))
    assert r.text == ("Title\nanchor with plenty of surrounding prose "
                      "that dominates the block")
    assert r.n_blocks == 4 and r.n_boiler == 2  # nav + footer


def test_entities_decode_in_order(spark):
    r = _extract(spark, "<p>a &amp;lt; b &lt;tag&gt; &quot;q&quot; "
                        "&#39;s&#39; x&nbsp;y</p>")
    # &amp; decodes LAST: "&amp;lt;" → "&lt;" literally, not "<"
    assert r.text == 'a &lt; b <tag> "q" \'s\' x y'


def test_block_tags_any_case_with_attributes(spark):
    r = _extract(spark, '<P CLASS="a">one</P><Div id=2>two</Div>'
                        '<BR/>three<h3>four</h3>')
    assert r.text.split("\n") == ["one", "two", "three", "four"]


def test_empty_and_whitespace_blocks_drop(spark):
    r = _extract(spark, "<p>  </p><div>\t\n</div><p>only</p>")
    assert r.n_blocks == 1 and r.text == "only"


def test_q203_plan_is_map_only(spark):
    from sarfile_analyzer_ng_spark.queries import q203_html_extract

    plan = q203_html_extract(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # pure per-row map, no shuffle
    assert "BatchEvalPython" not in plan  # no python UDF in the path


def test_funnel_page_roundtrips_text_exactly(spark):
    """Stage 0's wrapper must round-trip the crawl text byte-exactly,
    or stages 1–5 would silently drift from the r10 funnel."""
    from sarfile_analyzer_ng_spark.queries import (
        _funnel2_crawl, _funnel2_page_expr)

    crawl = _funnel2_crawl(spark, SF_DIR)
    pages = crawl.withColumn("html", _funnel2_page_expr())
    ext = H.html_extract(pages, "html", "doc_id").select(
        "doc_id", F.col("text").alias("ext"))
    bad = (
        crawl.join(ext, "doc_id")
        .where(F.col("text") != F.col("ext"))
    )
    assert bad.count() == 0


def test_funnel_stage0_counts(spark):
    from sarfile_analyzer_ng_spark.queries import q201_curation_funnel_v2

    rows = {r.stage_no: r for r in
            q201_curation_funnel_v2(spark, SF_DIR).collect()}
    s0 = rows[0]
    assert s0.stage == "html_extract"
    assert s0.n_in == s0.n_kept + s0.n_dropped
    # every page carries nav + footer (2 boiler blocks) and a third on
    # doc_id % 3 == 0 pages; every page keeps exactly 1 content block
    assert s0.n_kept == rows[1].n_in  # kept blocks == pages (1 per page)
    assert s0.n_dropped >= 2 * rows[1].n_in
    # stages 1-5 unchanged by stage 0: the funnel still ends non-empty
    assert rows[5].n_kept > 0
