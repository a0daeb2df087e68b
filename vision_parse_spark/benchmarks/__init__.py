from .scoring import (
    accuracy_score,
    bleu_score,
    bleu_udf_factory,
    levenshtein_similarity,
)

__all__ = ["bleu_score", "levenshtein_similarity", "accuracy_score",
           "bleu_udf_factory"]
