"""T5 — deterministic markdown formatter.

Replaces the reference's second Vision-LLM call
(``/root/reference/src/vision_parse/llm.py:356-381``).  The formatting
rules are the deterministic re-expression of the prompt contract in
``markdown_prompt.j2:5-33``:

* "do not change any content ... while applying markdown formatting"
  -> transforms are structure-only (headings, bullets, table pipes);
  words are never altered.
* tables (j2:14-18): tabular blocks become pipe tables with a
  ``| --- |`` header separator, cell values preserved.
* LaTeX (j2:20-24): ``$...$`` / ``$$...$$`` spans pass through
  untouched.
* "preserve markdown text formatting if present" (j2:26): existing
  ``#`` headings, bullets, links are kept.
* "do not generate code fences" (j2:29): fences were already stripped
  by T6 upstream.

Implementation is fully vectorized: the batch is exploded to a flat
line frame (pandas ``str.split`` + ``explode``), per-line features are
computed with vectorized regex, transforms applied via masks, and the
lines reassembled with ``groupby().agg('\\n'.join)``.  No per-row
Python loop anywhere (north_rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_TERMINAL_PUNCT_RE = r"[.!?;:,]\s*$"
_MD_HEADING_RE = r"\s*#{1,6} "
_BULLET_RE = r"\s*[-*•–]\s+\S"
_NUMBERED_RE = r"\s*\d+[.)]\s+\S"
_PIPE_ROW_RE = r"\s*\|.*\|\s*$"
_ALIGNED_RE = r"\S  +\S+(?:  +\S.*)?$"
_BLOCK_MATH_RE = r"\s*\$\$.*\$\$\s*$"
_HAS_LETTER_RE = r"[A-Za-z]"
_HAS_LOWER_RE = r"[a-z]"


def format_markdown_batch(
    extracted: pd.Series,
    tables_detected: pd.Series,
    latex_detected: pd.Series,
) -> pd.Series:
    """Format a batch of extracted texts into markdown.

    Returns a Series of markdown strings aligned to ``extracted``'s
    index.  Callers handle P1 (empty -> "") and P2 (fast-path
    passthrough) — this function always formats.
    """
    idx = extracted.index
    docs = extracted.fillna("").reset_index(drop=True)
    doc_tables = tables_detected.fillna(False).reset_index(drop=True)

    # --- explode to line frame ------------------------------------
    lf = docs.str.split("\n").explode().to_frame("line")
    lf["doc"] = lf.index
    lf = lf.reset_index(drop=True)
    line = lf["line"].fillna("").str.rstrip()
    doc = lf["doc"]

    # --- per-line features (all vectorized) -----------------------
    blank = line.str.len() == 0
    md_heading = line.str.match(_MD_HEADING_RE)
    bullet = line.str.match(_BULLET_RE)
    numbered = line.str.match(_NUMBERED_RE)
    pipe_row = line.str.match(_PIPE_ROW_RE)
    block_math = line.str.match(_BLOCK_MATH_RE)
    tables_here = doc.map(doc_tables).astype(bool)
    aligned_row = line.str.contains(_ALIGNED_RE, regex=True) & tables_here & ~pipe_row

    # nonblank rank within each doc (0 before any content line)
    nonblank_rank = (~blank).astype("int64").groupby(doc).cumsum()
    first_content = (~blank) & (nonblank_rank == 1)

    special = md_heading | bullet | numbered | pipe_row | block_math | aligned_row

    # --- transforms -----------------------------------------------
    # bullets: *, •, – normalized to "- " (content preserved)
    line = line.str.replace(r"^(\s*)[*•–]\s+", r"\1- ", regex=True)
    # numbered "1)" -> "1. "
    line = line.str.replace(r"^(\s*)(\d+)\)\s+", r"\1\2. ", regex=True)

    # aligned-column rows -> pipe rows (cells preserved verbatim)
    if aligned_row.any():
        conv = "| " + line[aligned_row].str.strip().str.replace(r"  +", " | ", regex=True) + " |"
        line = line.mask(aligned_row, conv)
    # existing pipe rows: trim edges
    if pipe_row.any():
        line = line.mask(pipe_row, line[pipe_row].str.strip())
    table_row = (pipe_row | aligned_row) & tables_here

    # headings: title = first content line, short, no terminal
    # punctuation, not a structural line
    short = line.str.len() <= 80
    no_punct = ~line.str.contains(_TERMINAL_PUNCT_RE, regex=True)
    title = first_content & short & no_punct & ~special
    # ALL-CAPS short lines become level-2 headings
    allcaps = (
        line.str.contains(_HAS_LETTER_RE, regex=True)
        & ~line.str.contains(_HAS_LOWER_RE, regex=True)
        & (line.str.len() <= 60)
        & ~special
        & ~blank
        & ~title
    )
    if title.any():
        line = line.mask(title, "# " + line[title].str.strip())
    if allcaps.any():
        line = line.mask(allcaps, "## " + line[allcaps].str.strip())

    # --- header separator after the first row of each table block --
    same_doc_prev = doc.eq(doc.shift(1))
    block_start = table_row & ~(table_row.shift(1, fill_value=False) & same_doc_prev)
    if block_start.any():
        ncols = np.maximum((line[block_start].str.count(r"\|") - 1).to_numpy(), 1)
        seps = pd.DataFrame(
            {
                "doc": doc[block_start].to_numpy(),
                "order": np.flatnonzero(block_start.to_numpy()) + 0.5,
                "line": np.char.add("|", np.char.multiply(" --- |", ncols.astype(int))),
            }
        )
        body = pd.DataFrame(
            {"doc": doc.to_numpy(), "order": np.arange(len(line), dtype="float64"),
             "line": line.to_numpy(), "blank": blank.to_numpy(),
             "lead": (nonblank_rank == 0).to_numpy()}
        )
        seps["blank"] = False
        seps["lead"] = False
        merged = pd.concat([body, seps], ignore_index=True).sort_values(
            ["order"], kind="stable"
        )
    else:
        merged = pd.DataFrame(
            {"doc": doc.to_numpy(), "order": np.arange(len(line), dtype="float64"),
             "line": line.to_numpy(), "blank": blank.to_numpy(),
             "lead": (nonblank_rank == 0).to_numpy()}
        )

    # --- blank-line normalization ---------------------------------
    m_doc = merged["doc"]
    m_blank = merged["blank"].astype(bool)
    same_prev = m_doc.eq(m_doc.shift(1))
    drop = (m_blank & m_blank.shift(1, fill_value=True) & same_prev) | (
        m_blank & merged["lead"].astype(bool)
    )
    kept = merged[~drop.to_numpy()]

    out = kept.groupby("doc")["line"].agg("\n".join)
    out = out.reindex(range(len(docs)), fill_value="")
    out = out.str.replace(r"\n{3,}", "\n\n", regex=True).str.strip()
    out.index = idx
    return out
