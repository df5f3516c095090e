from headct_foundation_tpu.eval.retrieval import (
    average_precision,
    cosine_similarity_matrix,
    retrieval_map,
    retrieval_map_per_class,
)

__all__ = [
    "average_precision",
    "cosine_similarity_matrix",
    "retrieval_map",
    "retrieval_map_per_class",
]
