from .text import DELIM_CLASS, bigrams_expr, tokens_expr
from .vector import cosine_similarity_expr, l2_norm_expr

__all__ = [
    "DELIM_CLASS",
    "tokens_expr",
    "bigrams_expr",
    "cosine_similarity_expr",
    "l2_norm_expr",
]
