"""Regenerate golden per-turn markdown fixtures.

Goldens are defined by the engine itself (reviewed against the
reference's formatting contract, markdown_prompt.j2:5-33 — see
SURVEY.md §7 "hard parts"); once committed they pin the formatter:
any semantic drift fails tests/test_pipeline_golden.py with a strict
string diff.

Usage: python tests/gen_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vision_parse_spark.config import ExtractConfig  # noqa: E402
from vision_parse_spark.operators.pipeline import extract_pandas  # noqa: E402
from vision_parse_spark.synth import synth_transcripts_pdf  # noqa: E402

N_GOLDEN_TURNS = 160  # covers the 96-turn skew conversation + 8 kinds

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def main():
    os.makedirs(OUT, exist_ok=True)
    pdf = synth_transcripts_pdf(N_GOLDEN_TURNS)
    out = extract_pandas(pdf, ExtractConfig(image_mode="url"))
    out = out.sort_values(["conv_id", "turn_idx"])  # A1 ordering invariant
    for _, row in out.iterrows():
        name = f"{row.conv_id}_{row.turn_idx:04d}.md"
        with open(os.path.join(OUT, name), "w") as f:
            f.write(row.markdown)
    print(f"wrote {len(out)} goldens to {OUT}")


if __name__ == "__main__":
    main()
