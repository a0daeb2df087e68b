"""T5 formatter unit tests — deterministic re-expression of the
markdown_prompt.j2 rules (/root/reference/src/vision_parse/
markdown_prompt.j2:5-33)."""

import pandas as pd

from vision_parse_spark.functions.markdown import format_markdown_batch


def fmt(text, tables=False, latex=False):
    return format_markdown_batch(
        pd.Series([text]), pd.Series([tables]), pd.Series([latex])
    ).iloc[0]


def test_title_heading_inferred():
    out = fmt("Quarterly Report\n\nBody sentence here with detail.")
    assert out.startswith("# Quarterly Report")


def test_long_first_line_not_heading():
    long_line = "word " * 30
    out = fmt(long_line + "\n\nmore text.")
    assert not out.startswith("#")


def test_allcaps_section_heading():
    out = fmt("Title\n\nIntro para.\n\nDETAILS SECTION\n\nbody.")
    assert "\n## DETAILS SECTION\n" in out


def test_bullets_normalized():
    out = fmt("Title\n\n* one\n* two\n- three")
    assert "- one\n- two\n- three" in out


def test_numbered_normalized():
    out = fmt("Title\n\n1) first\n2) second")
    assert "1. first\n2. second" in out


def test_aligned_table_to_pipes():
    # j2:14-18: pipe columns + --- header separator, cells preserved
    out = fmt("name      count\nfoo      12\nbar      34", tables=True)
    lines = out.splitlines()
    assert lines[0] == "| name | count |"
    assert lines[1] == "| --- | --- |"
    assert lines[2] == "| foo | 12 |"
    assert lines[3] == "| bar | 34 |"


def test_existing_pipe_table_gets_separator():
    out = fmt("| a | b |\n| 1 | 2 |", tables=True)
    lines = out.splitlines()
    assert lines[0] == "| a | b |"
    assert lines[1] == "| --- | --- |"
    assert lines[2] == "| 1 | 2 |"


def test_latex_preserved_verbatim():
    # j2:20-24: $...$ inline and $$...$$ block kept untouched
    text = "Given $x_1 = \\frac{a}{b}$ we have\n\n$$\\sum_{i=0}^{n} x_i^2 = 1$$\n\nend."
    out = fmt(text, latex=True)
    assert "$x_1 = \\frac{a}{b}$" in out
    assert "$$\\sum_{i=0}^{n} x_i^2 = 1$$" in out


def test_existing_markdown_preserved():
    # j2:26: preserve existing markdown elements
    text = "# Already A Title\n\n- kept bullet\n\n[link](http://x)"
    out = fmt(text)
    assert out.splitlines()[0] == "# Already A Title"
    assert "- kept bullet" in out
    assert "[link](http://x)" in out


def test_blank_runs_collapsed():
    out = fmt("Title\n\n\n\n\nBody text here.")
    assert "\n\n\n" not in out


def test_batch_alignment_many_docs():
    texts = pd.Series(["Title A\n\nbody a.", "", "Title B\n\nbody b."])
    out = format_markdown_batch(texts, pd.Series([False] * 3), pd.Series([False] * 3))
    assert out.iloc[0].startswith("# Title A")
    assert out.iloc[1] == ""
    assert out.iloc[2].startswith("# Title B")
