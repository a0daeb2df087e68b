"""DOM / boilerplate heuristics — main-content extraction from HTML.

The reference never parses HTML (its payloads are rendered PDF pages),
but the north_rule lifts the pipeline to transcript payloads that may
carry HTML fragments, requiring "HTML boilerplate strip ... DOM
heuristics".  This module is a deterministic, fully vectorized
(pandas ``.str`` chained regex) boilerplate stripper:

* drops <script>/<style>/comments and classic boilerplate containers
  (<nav>, <header>, <footer>, <aside>);
* converts structural tags to markdown: <h1>-<h6> -> #..######,
  <li> -> "- ", <tr>/<td>/<th> -> pipe-table rows, <p>/<br> ->
  paragraph/line breaks, <b>/<strong> -> **, <i>/<em> -> *,
  <a href=u>t</a> -> [t](u);
* strips all remaining tags and unescapes basic entities.

Everything is a chained ``Series.str.replace`` — no per-row Python.
"""

from __future__ import annotations

import pandas as pd

# (pattern, replacement) applied in order; all DOTALL+ignorecase.
_RULES: list[tuple[str, str]] = [
    # boilerplate removal
    (r"(?is)<head\b.*?</head>", ""),
    (r"(?is)<script\b.*?</script>", ""),
    (r"(?is)<style\b.*?</style>", ""),
    (r"(?s)<!--.*?-->", ""),
    (r"(?is)<nav\b.*?</nav>", ""),
    (r"(?is)<header\b.*?</header>", ""),
    (r"(?is)<footer\b.*?</footer>", ""),
    (r"(?is)<aside\b.*?</aside>", ""),
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

_HTML_HINT = r"(?is)<!doctype\s+html|<html\b|<body\b|<div\b|<p\b[^a-z]|<table\b|<h[1-6]\b"


def looks_like_html(s: pd.Series) -> pd.Series:
    """Boolean mask: payload looks like an HTML fragment."""
    return s.str.contains(_HTML_HINT, regex=True, na=False)


def strip_html_boilerplate(s: pd.Series) -> pd.Series:
    """Vectorized main-content extraction: HTML fragment -> markdown-ish
    plain text.  Safe to call on non-HTML strings (no-op apart from
    entity unescape)."""
    out = s
    for pat, rep in _RULES:
        out = out.str.replace(pat, rep, regex=True)
    # whitespace normalization: strip line edges, collapse blank runs
    out = out.str.replace(r"[ \t]+\n", "\n", regex=True)
    out = out.str.replace(r"[ \t]{2,}", " ", regex=True)
    out = out.str.replace(r"\n{3,}", "\n\n", regex=True)
    return out.str.strip()
