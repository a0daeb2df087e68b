"""HTML channel: boilerplate strip rules and the round-6 Boilerpipe
link-density block filter (Kohlschütter et al. 2010), including the
ExtractConfig.html_density_filter pipeline knob."""

import pandas as pd

from vision_parse_spark.functions.html import (
    looks_like_html,
    strip_html_boilerplate,
)

_PAGE = (
    "<html><head><title>x</title></head><body>"
    "<nav><a href='/a'>Home</a><a href='/b'>About</a></nav>"
    "<div><a href='/1'>Related post one</a> <a href='/2'>Related"
    " post two</a> <a href='/3'>Related post three</a></div>"
    "<article><h1>Title</h1><p>This is the main article body with"
    " a single inline <a href='/ref'>reference link</a> inside a"
    " long paragraph of real prose that carries the content.</p>"
    "</article>"
    "<div><a href='/t1'>tag1</a> <a href='/t2'>tag2</a></div>"
    "<footer>(c) corp</footer></body></html>"
)


def test_looks_like_html():
    s = pd.Series([_PAGE, "plain text", None])
    assert looks_like_html(s).tolist() == [True, False, False]


def test_tag_rules_only_keeps_link_farm():
    out = strip_html_boilerplate(pd.Series([_PAGE])).iloc[0]
    assert "# Title" in out
    assert "main article body" in out
    assert "[reference link](/ref)" in out
    assert "Home" not in out and "(c) corp" not in out   # nav/footer
    assert "Related post one" in out     # tag rules can't catch it


def test_density_filter_drops_link_farms_keeps_article():
    out = strip_html_boilerplate(
        pd.Series([_PAGE]), density_filter=True).iloc[0]
    assert "# Title" in out
    assert "main article body" in out
    assert "[reference link](/ref)" in out   # low-density block kept
    assert "Related post" not in out         # pure-link div dropped
    assert "tag1" not in out                 # short link list dropped


def test_density_filter_noop_without_links():
    s = pd.Series(["<p>just prose</p>", "no html at all"])
    a = strip_html_boilerplate(s).tolist()
    b = strip_html_boilerplate(s, density_filter=True).tolist()
    assert a == b


def test_pipeline_html_density_knob(spark):
    from vision_parse_spark import ExtractConfig, extract

    df = spark.createDataFrame(
        [("c", 0, _PAGE)], "conv_id string, turn_idx int, text string")
    off = extract(df, ExtractConfig()).collect()[0]
    on = extract(
        df, ExtractConfig(html_density_filter=True)).collect()[0]
    assert "Related post" in off.markdown       # default unchanged
    assert "Related post" not in on.markdown
    assert "main article body" in on.markdown


def test_density_filter_keeps_prose_after_dropped_block():
    """Review-found content loss: prose between a closed link-dense
    block and the next block tag must survive the drop."""
    page = ("<div><a href='/x'>link farm link farm link</a></div>"
            "Real article content outside the div.<p>more prose</p>")
    out = strip_html_boilerplate(
        pd.Series([page]), density_filter=True).iloc[0]
    assert "Real article content outside the div." in out
    assert "more prose" in out
    assert "link farm" not in out
