"""spark-submit entry point: transcripts table -> extracted markdown,
written through the resumable MERGE sink with per-bucket lineage.

    spark-submit --py-files vision_parse_spark.zip \
        tools/run_extract_job.py <input> <output> [n_buckets]

``<input>`` is an Iceberg table name (``db.transcripts``) when a
catalog is configured, else a parquet path.  Re-running after a crash
recomputes only uncommitted buckets (sinks/merge.py contract).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    inp, outp = sys.argv[1], sys.argv[2]
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    spark = SparkSession.builder.appName("vps-extract").getOrCreate()

    from vision_parse_spark import ExtractConfig, extract
    from vision_parse_spark.sinks.merge import merge_write, verify_lineage
    from vision_parse_spark.sources.readers import read_transcripts

    df = read_transcripts(spark, inp)
    out = extract(df, ExtractConfig(image_mode="url"))
    summary = merge_write(
        out.select("conv_id", "turn_idx", "payload_kind", "markdown",
                   "status", "error"),
        outp, run_id=spark.sparkContext.applicationId,
        n_buckets=n_buckets,
    )
    print(summary)
    assert verify_lineage(spark, outp), "lineage checksum mismatch"


if __name__ == "__main__":
    main()
