"""S2/T1 — page enumeration and render-scale parity helpers.

The transcripts grain is one turn per row, so the reference's page
loop (``/root/reference/src/vision_parse/parser.py:166-191``) is
already exploded.  For payloads that carry a whole multi-page document
in one turn, ``explode_pages`` reproduces the enumeration as
``posexplode`` over a form-feed split (SURVEY.md §2 S2).

``page_render_scale`` is the exact arithmetic of
``parser.py:98-107``: ``scale = dpi / 72 * 2`` (the reference doubles
the DPI-normalized zoom), rotation passed through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGE_BREAK = "\f"  # form feed — the text-layer page separator


def page_render_scale(dpi: int = 400) -> float:
    """parser.py:100-102: scale = dpi / 72 * 2."""
    return dpi / 72 * 2


def explode_pages(
    df: DataFrame,
    text_col: str = "text",
    out_idx: str = "page_idx",
    out_page: str = "page_text",
) -> DataFrame:
    """One row per page: posexplode(split(text, form-feed)).

    Keeps all other columns; single-page payloads yield one row with
    page_idx 0 (row count preserved — the P1 ethos).  Narrow op: no
    shuffle, Catalyst Generate node."""
    keep = [c for c in df.columns if c != text_col]
    return df.select(
        *keep,
        F.posexplode(F.split(F.col(text_col), PAGE_BREAK)).alias(
            out_idx, out_page
        ),
    )
