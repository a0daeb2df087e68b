"""DOM / boilerplate heuristics — main-content extraction from HTML.

The reference never parses HTML (its payloads are rendered PDF pages),
but the north_rule lifts the pipeline to transcript payloads that may
carry HTML fragments, requiring "HTML boilerplate strip ... DOM
heuristics".  This module is a deterministic, fully vectorized
(pandas ``.str`` chained regex) boilerplate stripper:

* drops <script>/<style>/comments and classic boilerplate containers
  (<nav>, <header>, <footer>, <aside>);
* optional LINK-DENSITY block filter (the Boilerpipe heuristic,
  Kohlschütter et al. 2010 "Boilerplate Detection using Shallow Text
  Features"): block-level segments whose anchor-text share is high —
  link farms, "related posts", tag clouds — are boilerplate even
  inside a <div> no tag-name rule can catch.  Opt-in via
  ``ExtractConfig.html_density_filter`` (default off: the markdown
  goldens pin the tag-rule-only output);
* converts structural tags to markdown: <h1>-<h6> -> #..######,
  <li> -> "- ", <tr>/<td>/<th> -> pipe-table rows, <p>/<br> ->
  paragraph/line breaks, <b>/<strong> -> **, <i>/<em> -> *,
  <a href=u>t</a> -> [t](u);
* strips all remaining tags and unescapes basic entities.

The chained rules are ``Series.str.replace`` (no per-row Python);
the density filter loops over BLOCKS inside the Arrow batch kernel —
the same per-payload-Python budget the PDF parser spends.
"""

from __future__ import annotations

import re

import pandas as pd

# (pattern, replacement) applied in order; all DOTALL+ignorecase.
# hard boilerplate removal — always applied first
_PRE_RULES: list[tuple[str, str]] = [
    (r"(?is)<head\b.*?</head>", ""),
    (r"(?is)<script\b.*?</script>", ""),
    (r"(?is)<style\b.*?</style>", ""),
    (r"(?s)<!--.*?-->", ""),
    (r"(?is)<nav\b.*?</nav>", ""),
    (r"(?is)<header\b.*?</header>", ""),
    (r"(?is)<footer\b.*?</footer>", ""),
    (r"(?is)<aside\b.*?</aside>", ""),
]

# structural conversion + final strip
_MD_RULES: list[tuple[str, str]] = [
    # headings
    (r"(?is)<h1[^>]*>(.*?)</h1>", r"\n\n# \1\n\n"),
    (r"(?is)<h2[^>]*>(.*?)</h2>", r"\n\n## \1\n\n"),
    (r"(?is)<h3[^>]*>(.*?)</h3>", r"\n\n### \1\n\n"),
    (r"(?is)<h4[^>]*>(.*?)</h4>", r"\n\n#### \1\n\n"),
    (r"(?is)<h5[^>]*>(.*?)</h5>", r"\n\n##### \1\n\n"),
    (r"(?is)<h6[^>]*>(.*?)</h6>", r"\n\n###### \1\n\n"),
    # lists
    (r"(?is)<li[^>]*>(.*?)</li>", r"\n- \1"),
    (r"(?is)</?[uo]l[^>]*>", "\n"),
    # tables -> pipe rows (header separator inserted by the formatter)
    (r"(?is)</t[dh]>\s*<t[dh][^>]*>", " | "),
    (r"(?is)<tr[^>]*>\s*<t[dh][^>]*>", "\n| "),
    (r"(?is)</t[dh]>\s*</tr>", " |"),
    (r"(?is)</?(table|thead|tbody|tr|td|th)[^>]*>", ""),
    # inline emphasis / links
    (r"(?is)<(b|strong)[^>]*>(.*?)</\1>", r"**\2**"),
    (r"(?is)<(i|em)[^>]*>(.*?)</\1>", r"*\2*"),
    (r"""(?is)<a\s[^>]*href=["']([^"']*)["'][^>]*>(.*?)</a>""", r"[\2](\1)"),
    # paragraph / line structure
    (r"(?is)</?p[^>]*>", "\n\n"),
    (r"(?is)<br\s*/?>", "\n"),
    (r"(?is)</?(div|section|article|main|span)[^>]*>", "\n"),
    # strip whatever is left
    (r"(?s)<[^>]+>", ""),
    # entities
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&#39;", "'"),
]

# kept for compatibility with existing imports/tests
_RULES: list[tuple[str, str]] = _PRE_RULES + _MD_RULES

_HTML_HINT = r"(?is)<!doctype\s+html|<html\b|<body\b|<div\b|<p\b[^a-z]|<table\b|<h[1-6]\b"

# block-level boundaries for the density filter: cut BEFORE each
# block-opening tag AND AFTER each block-closing tag, so a dropped
# block ends at its own </...> — prose between a closed block and
# the next block tag lands in its own segment and survives
# (review-found content-loss bug: splitting only before opens glued
# trailing prose onto the preceding block)
_BLOCK_TAGS = (r"div|p|section|article|ul|ol|table|h[1-6]|"
               r"blockquote|pre")
_BLOCK_OPEN_RE = re.compile(rf"(?is)<(?:{_BLOCK_TAGS})\b")
_BLOCK_CLOSE_RE = re.compile(rf"(?is)</(?:{_BLOCK_TAGS})\s*>")
_ANCHOR_RE = re.compile(r"(?is)<a\b[^>]*>(.*?)</a>")
_TAG_RE = re.compile(r"(?s)<[^>]+>")


def _block_segments(html: str) -> list[str]:
    cuts = {0, len(html)}
    cuts.update(m.start() for m in _BLOCK_OPEN_RE.finditer(html))
    cuts.update(m.end() for m in _BLOCK_CLOSE_RE.finditer(html))
    edges = sorted(cuts)
    return [html[a:b] for a, b in zip(edges, edges[1:]) if a < b]


def looks_like_html(s: pd.Series) -> pd.Series:
    """Boolean mask: payload looks like an HTML fragment."""
    return s.str.contains(_HTML_HINT, regex=True, na=False)


def _drop_link_dense_blocks(html: str, max_density: float,
                            short_len: int) -> str:
    """Boilerpipe-style shallow-feature filter: drop block segments
    whose anchor-text share exceeds ``max_density``, or exceeds
    ``max_density / 2`` while the block is short (link lists rarely
    carry long prose).  Blocks without links always survive."""
    parts = _block_segments(html)
    if len(parts) <= 1:
        return html
    kept = []
    for seg in parts:
        anchors = _ANCHOR_RE.findall(seg)
        if not anchors:
            kept.append(seg)
            continue
        text = _TAG_RE.sub("", seg)
        tlen = len(text.strip())
        alen = len(_TAG_RE.sub("", "".join(anchors)).strip())
        density = alen / tlen if tlen else 1.0
        if density > max_density or (density > max_density / 2
                                     and tlen < short_len):
            continue
        kept.append(seg)
    return "".join(kept)


def strip_html_boilerplate(s: pd.Series,
                           density_filter: bool = False,
                           max_link_density: float = 0.5,
                           short_block_len: int = 80) -> pd.Series:
    """Vectorized main-content extraction: HTML fragment -> markdown-ish
    plain text.  Safe to call on non-HTML strings (no-op apart from
    entity unescape).  ``density_filter=True`` adds the link-density
    block drop between the hard boilerplate rules and the markdown
    conversion (``ExtractConfig.html_density_filter``)."""
    out = s
    for pat, rep in _PRE_RULES:
        out = out.str.replace(pat, rep, regex=True)
    if density_filter:
        out = out.map(
            lambda h: _drop_link_dense_blocks(
                h, max_link_density, short_block_len)
            if isinstance(h, str) else h)
    for pat, rep in _MD_RULES:
        out = out.str.replace(pat, rep, regex=True)
    # whitespace normalization: strip line edges, collapse blank runs
    out = out.str.replace(r"[ \t]+\n", "\n", regex=True)
    out = out.str.replace(r"[ \t]{2,}", " ", regex=True)
    out = out.str.replace(r"\n{3,}", "\n\n", regex=True)
    return out.str.strip()
