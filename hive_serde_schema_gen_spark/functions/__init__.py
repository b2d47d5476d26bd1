from .decimal_safe import dec, money_sum, one
from .vector import cosine_similarity, dot, l2_norm

__all__ = ["dec", "money_sum", "one", "cosine_similarity", "dot", "l2_norm"]
