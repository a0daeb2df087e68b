from .pipeline import extract, extract_pandas

__all__ = ["extract", "extract_pandas"]
