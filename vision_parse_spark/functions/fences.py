"""T6 — code-fence strip.

The reference unwraps model-emitted fenced markdown blocks with an
identical regex in all three providers
(``/root/reference/src/vision_parse/llm.py:444-449`` ollama,
``llm.py:541-546`` openai, ``llm.py:597-599`` gemini)::

    re.sub(r"```(?:markdown)?\\n(.*?)\\n```", r"\\1", content, flags=re.DOTALL)

Here it exists twice, semantically identical:

* a native Catalyst expression (JVM-side, whole-stage-codegen'd) for
  DataFrame pipelines — the fast path at 100 TB;
* a vectorized pandas version for use inside the fused ``mapInPandas``
  extraction stage.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Java regex: (?s) = DOTALL, same non-greedy group as the reference.
FENCE_RE_SPARK = r"(?s)```(?:markdown)?\n(.*?)\n```"
_FENCE_RE_PD = r"(?s)```(?:markdown)?\n(.*?)\n```"


def strip_code_fences_col(col: Column) -> Column:
    """Catalyst-native fence strip (no UDF): replaces every fenced
    block with its body, exactly like the reference regex."""
    return F.regexp_replace(col, FENCE_RE_SPARK, r"$1")


def strip_code_fences(s: pd.Series) -> pd.Series:
    """Vectorized pandas fence strip for use inside mapInPandas."""
    return s.str.replace(_FENCE_RE_PD, r"\1", regex=True)
