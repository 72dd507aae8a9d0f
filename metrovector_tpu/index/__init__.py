"""Index structures over MVT spaces (SURVEY.md §2: the reference declares a
Flat/IVF/HNSW index union in its schema but implements none of them —
here Flat is the fused exact engine and IVF is fully implemented)."""

from .ivf import IVFIndex, train_kmeans

__all__ = ["IVFIndex", "train_kmeans"]
