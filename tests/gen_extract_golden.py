"""Generate the committed flagship golden: per-distinct-text extraction
results over the UNION of the driver testdata documents tables.

The flagship contract query (`extract_markdown`) had no value-level
oracle in round 1 — the driver only row-counted it.  This golden pins
every markdown byte: the DuckDB oracle joins the runtime ``documents``
view to this parquet on ``md5(text)`` (markdown is a pure function of
the text payload), recomputes ``(conv_id, turn_idx)`` with the same
window the Spark adapter uses, and the driver hash-compares values.

Keyed by md5(text), NOT doc_id: the driver generates different texts
per scale factor for the same doc_id, and sf0.1 contains 8 duplicate
texts — a text-keyed golden serves every SF with one file.

Regenerate (after any formatter/classifier semantics change)::

    python tests/gen_extract_golden.py

then review the diff before committing — the golden is the frozen
contract (the lift of the reference's golden markdown assertions,
/root/reference/tests/test_parser.py:199-202).
"""

from __future__ import annotations

import hashlib
import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
OUT = os.path.join(_REPO, "tests", "golden", "extract_text_golden.parquet")


def build_golden() -> pd.DataFrame:
    from vision_parse_spark.config import ExtractConfig
    from vision_parse_spark.operators.pipeline import extract_pandas

    texts: dict[str, str] = {}
    for d in SF_DIRS:
        t = pq.read_table(os.path.join(d, "documents.parquet"),
                          columns=["text"])
        for s in t.column("text").to_pylist():
            s = s if s is not None else ""
            texts.setdefault(
                hashlib.md5(s.encode("utf-8")).hexdigest(), s)

    keys = sorted(texts)
    frame = pd.DataFrame(
        {"conv_id": "", "turn_idx": 0, "role": "user",
         "text": [texts[k] for k in keys], "tool": "", "ts": pd.NaT}
    )
    # image_mode has no effect on these payloads (no image markers in
    # the driver corpus — asserted in tests/test_entry_contract.py);
    # "url" matches the flagship query's config.
    out = extract_pandas(frame, ExtractConfig(image_mode="url").validate())
    golden = pd.DataFrame(
        {
            "text_md5": keys,
            "payload_kind": out["payload_kind"].astype(str).to_numpy(),
            "markdown": out["markdown"].astype(str).to_numpy(),
            "status": out["status"].astype(str).to_numpy(),
        }
    )
    return golden


def main() -> None:
    golden = build_golden()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(golden, preserve_index=False), OUT,
                   compression="zstd")
    print(f"wrote {len(golden)} rows -> {OUT}")
    print(golden["status"].value_counts().to_dict())
    print(golden["payload_kind"].value_counts().to_dict())


if __name__ == "__main__":
    main()
