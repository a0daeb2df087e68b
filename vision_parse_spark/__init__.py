"""vision_parse_spark — a from-scratch PySpark-native extraction engine.

Re-expresses the query/data-processing capabilities of the reference
``iamarunbrahma/vision-parse`` (PDF page -> per-page markdown with
table/LaTeX/image detection and image-region extraction;
``/root/reference/src/vision_parse/parser.py:152`` `convert_pdf`) as a
batch pipeline over tables of multi-turn conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

The reference's per-page Vision-LLM loop is replaced by deterministic,
vectorized pandas/Arrow operators fused into a single ``mapInPandas``
stage (no per-row Python, no remote APIs).  Semantics preserved:

* P1 empty-page rule (``llm.py:333-334``): no text detected -> output
  ``""`` with the row KEPT.
* P2 fast-path passthrough (``llm.py:336-346``): high-confidence plain
  text bypasses the formatter.
* T4 page classification (``llm.py:17-24`` ImageDescription) as a
  typed struct column.
* T5 markdown formatting rules from ``markdown_prompt.j2:5-33``.
* T6 code-fence strip (``llm.py:444-449``).
* T8-T12 image-region detection + link append
  (``utils.py:24-139``, ``llm.py:383-393``) in pure numpy.
* C4 graceful degradation -> per-row fallback defaults
  (``llm.py:371-377``), error-as-data columns.
"""

from .config import ExtractConfig
from .schema import TRANSCRIPT_SCHEMA, OUTPUT_SCHEMA, ANALYSIS_SCHEMA
from .operators.pipeline import extract, extract_pandas
from .functions.pdf import (
    extract_pdf_pages,
    extract_pdf_text,
    make_pdf_bytes,
)
from .functions.scrub import scrub_pii
from .operators.dedup import (
    dup_clusters,
    exact_dedup,
    minhash_dedup,
    minhash_dedup_incremental,
)
from .operators.curation import curate
from .operators.repetition import repetition_filter, repetition_stats
from .operators.sampling import hash_sample, with_split
from .sinks.media import media_table, read_media, write_media
from .sinks.merge import merge_upsert, merge_write, read_merged, verify_lineage
from .synth import synth_transcripts_pdf, synth_transcripts_spark
from .session import get_spark

__version__ = "0.3.0"

__all__ = [
    "ExtractConfig",
    "TRANSCRIPT_SCHEMA",
    "OUTPUT_SCHEMA",
    "ANALYSIS_SCHEMA",
    "extract",
    "extract_pandas",
    "extract_pdf_pages",
    "extract_pdf_text",
    "make_pdf_bytes",
    "scrub_pii",
    "dup_clusters",
    "exact_dedup",
    "minhash_dedup",
    "minhash_dedup_incremental",
    "curate",
    "repetition_filter",
    "repetition_stats",
    "hash_sample",
    "with_split",
    "media_table",
    "read_media",
    "write_media",
    "merge_upsert",
    "merge_write",
    "read_merged",
    "verify_lineage",
    "synth_transcripts_pdf",
    "synth_transcripts_spark",
    "get_spark",
    "__version__",
]
