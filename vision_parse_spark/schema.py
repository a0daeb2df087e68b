"""Typed schemas for the engine.

The reference has no schema system — types are Pydantic annotations
(``/root/reference/src/vision_parse/llm.py:17-24`` ImageDescription,
``utils.py:17-22`` ImageData).  Here they become first-class Spark
StructTypes so Catalyst can prune/push down around the extraction
stage.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input: one turn per row (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# Mirror of ImageDescription (llm.py:17-24): Literal["Yes","No"] -> boolean,
# confidence_score_text -> double.
ANALYSIS_SCHEMA = StructType(
    [
        StructField("text_detected", BooleanType(), True),
        StructField("tables_detected", BooleanType(), True),
        StructField("images_detected", BooleanType(), True),
        StructField("latex_detected", BooleanType(), True),
        StructField("extracted_text", StringType(), True),
        StructField("confidence", DoubleType(), True),
    ]
)

# Mirror of ImageData (utils.py:17-22).
IMAGE_SCHEMA = StructType(
    [
        StructField("image_url", StringType(), True),
        StructField("base64_encoded", StringType(), True),
    ]
)

# Pipeline output: one row per input turn (A1 ordering invariant is the
# key (conv_id, turn_idx), never collect_list).
OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
        StructField("payload_kind", StringType(), True),
        StructField("analysis", ANALYSIS_SCHEMA, True),
        StructField("markdown", StringType(), True),
        StructField("images", ArrayType(IMAGE_SCHEMA), True),
        StructField("status", StringType(), True),  # 'ok' | 'empty' | 'error'
        StructField("error", StringType(), True),
    ]
)

# Per-partition lineage row (north_rule resumability).
LINEAGE_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("row_count", LongType(), False),
        StructField("bytes", LongType(), False),
        StructField("checksum", StringType(), False),
    ]
)

# Flat output columns (for mapInPandas yield frames).
OUTPUT_COLUMNS = [f.name for f in OUTPUT_SCHEMA.fields]
