"""Guards for the committed flagship golden
(tests/golden/extract_text_golden.parquet) — the value-level oracle
behind the `extract_markdown` / `extract_stats` contract queries.

If a formatter/classifier change breaks these, regenerate via
`python tests/gen_extract_golden.py` and REVIEW the diff before
committing: the golden is the frozen contract."""

import hashlib
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(_REPO, "tests", "golden",
                      "extract_text_golden.parquet")
SF_DIRS = [f"/root/testdata/sf{sf}" for sf in ("0.001", "0.01", "0.1")]


@pytest.fixture(scope="module")
def golden() -> pd.DataFrame:
    return pq.read_table(GOLDEN).to_pandas()


def test_golden_covers_every_driver_text(golden):
    """The oracle JOINs on md5(text) — a missing text silently drops
    oracle rows, which the driver would flag as a row-count mismatch.
    Catch it here first."""
    have = set(golden["text_md5"])
    for d in SF_DIRS:
        p = os.path.join(d, "documents.parquet")
        if not os.path.exists(p):
            continue
        texts = pq.read_table(p, columns=["text"]).column("text").to_pylist()
        need = {hashlib.md5((t or "").encode("utf-8")).hexdigest()
                for t in texts}
        missing = need - have
        assert not missing, f"{d}: {len(missing)} texts missing from golden"


def test_golden_unique_keys(golden):
    assert golden["text_md5"].is_unique


def test_golden_matches_current_pipeline(golden):
    """Frozen golden values == what the current extract_pandas emits.
    A semantics change shows up here (regenerate + review, don't blind-
    bump)."""
    from vision_parse_spark.config import ExtractConfig
    from vision_parse_spark.operators.pipeline import extract_pandas

    texts = pq.read_table(
        os.path.join(SF_DIRS[1], "documents.parquet"), columns=["text"]
    ).column("text").to_pylist()
    by_md5 = {hashlib.md5((t or "").encode("utf-8")).hexdigest(): (t or "")
              for t in texts}
    covered = golden[golden["text_md5"].isin(by_md5)]
    rows = covered.sample(n=min(400, len(covered)), random_state=7)
    assert len(rows) > 100
    frame = pd.DataFrame(
        {"conv_id": "", "turn_idx": 0, "role": "user",
         "text": [by_md5[k] for k in rows["text_md5"]], "tool": "",
         "ts": pd.NaT})
    out = extract_pandas(frame, ExtractConfig(image_mode="url").validate())
    assert list(out["markdown"]) == list(rows["markdown"])
    assert list(out["status"]) == list(rows["status"])
    assert list(out["payload_kind"]) == list(rows["payload_kind"])
