"""Volume-to-volume retrieval evaluation (mAP).

The reference reports hemorrhage-subtype retrieval mAP on RSNA/CQ500
(BASELINE.md, images/mAP_*_Retrieval.png): embed every volume with the frozen
encoder's CLS feature, rank the corpus by cosine similarity for each positive
query, and average the average precision of retrieving same-label volumes.

Similarities are one [N, D] x [D, N] numpy matmul: the evaluation corpora are
a few thousand volumes (score matrix <100 MB), far below the size where
shipping it to the TPU would pay for the transfer.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def cosine_similarity_matrix(embeddings: np.ndarray) -> np.ndarray:
    e = np.asarray(embeddings, dtype=np.float32)
    e = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
    return e @ e.T


def average_precision(ranked_relevance: np.ndarray) -> float:
    """AP of a ranked binary relevance list."""
    rel = np.asarray(ranked_relevance, dtype=np.float64)
    if rel.sum() == 0:
        return float("nan")
    cum = np.cumsum(rel)
    precision_at_k = cum / (np.arange(len(rel)) + 1)
    return float((precision_at_k * rel).sum() / rel.sum())


def retrieval_map(
    embeddings: np.ndarray,
    labels: np.ndarray,
    query_mask: Optional[np.ndarray] = None,
) -> float:
    """mAP: each positive volume queries the rest of the corpus; relevant =
    other positives of the same label."""
    labels = np.asarray(labels).astype(bool)
    sims = cosine_similarity_matrix(embeddings)
    n = len(labels)
    queries = np.nonzero(labels if query_mask is None else labels & query_mask)[0]
    aps = []
    for q in queries:
        order = np.argsort(-sims[q])
        order = order[order != q]  # exclude self
        aps.append(average_precision(labels[order]))
    return float(np.nanmean(aps)) if aps else float("nan")


def retrieval_map_per_class(
    embeddings: np.ndarray, label_dict: Dict[str, np.ndarray]
) -> Dict[str, float]:
    """mAP per pathology label (e.g. {'IPH': ..., 'IVH': ...})."""
    return {name: retrieval_map(embeddings, y) for name, y in label_dict.items()}
