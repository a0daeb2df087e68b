from .scoring import (
    accuracy_score,
    bleu_from_tokens,
    bleu_score,
    bleu_udf_factory,
    levenshtein_similarity,
)

__all__ = ["bleu_score", "bleu_from_tokens", "levenshtein_similarity",
           "accuracy_score", "bleu_udf_factory"]
