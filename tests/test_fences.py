"""T6 fence-strip — must behave exactly like the reference regex
(/root/reference/src/vision_parse/llm.py:444-449), in both the pandas
and the Catalyst-native form."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vision_parse_spark.functions.fences import (
    strip_code_fences,
    strip_code_fences_col,
)

CASES = [
    ("```markdown\n# Title\n\nbody\n```", "# Title\n\nbody"),
    ("```\nplain fence\n```", "plain fence"),
    ("no fences here", "no fences here"),
    ("prefix ```markdown\na\n``` suffix", "prefix a suffix"),
    # non-greedy: two blocks each unwrapped
    ("```\na\n```x```\nb\n```", "axb"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_pandas_fence_strip(raw, expected):
    assert strip_code_fences(pd.Series([raw])).iloc[0] == expected


def test_reference_regex_equivalence():
    # byte-for-byte identical to re.sub(r"```(?:markdown)?\n(.*?)\n```",
    # r"\1", s, flags=re.DOTALL)
    import re

    for raw, _ in CASES:
        ours = strip_code_fences(pd.Series([raw])).iloc[0]
        ref = re.sub(r"```(?:markdown)?\n(.*?)\n```", r"\1", raw, flags=re.DOTALL)
        assert ours == ref


def test_catalyst_fence_strip(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["raw"])
    out = df.select(strip_code_fences_col(F.col("raw")).alias("clean")).collect()
    assert [r.clean for r in out] == [e for _, e in CASES]
