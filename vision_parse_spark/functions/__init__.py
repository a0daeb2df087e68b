from .fences import strip_code_fences, strip_code_fences_col, FENCE_RE_SPARK
from .html import strip_html_boilerplate, looks_like_html
from .classify import classify_batch, detect_payload_kind
from .markdown import format_markdown_batch
from .text_stats import (
    token_count,
    quality_score,
    lang_id,
    doc_fingerprint,
)

__all__ = [
    "strip_code_fences",
    "strip_code_fences_col",
    "FENCE_RE_SPARK",
    "strip_html_boilerplate",
    "looks_like_html",
    "classify_batch",
    "detect_payload_kind",
    "format_markdown_batch",
    "token_count",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
]
