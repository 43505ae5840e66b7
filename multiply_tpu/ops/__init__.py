from .embedders import positional_encoding, embedding_dim
from .knn import knn
from .skinning import skinning, query_skinning_weights
from .density import laplace_density, laplace_beta, abs_density

__all__ = [
    "positional_encoding",
    "embedding_dim",
    "knn",
    "skinning",
    "query_skinning_weights",
    "laplace_density",
    "laplace_beta",
    "abs_density",
]
