"""Index structures over MVT spaces (SURVEY.md §2: the reference declares a
Flat/IVF/HNSW index union plus PQ quantization extensions in its schema but
implements none of them — here Flat is the fused exact engine, IVF and PQ
are fully implemented)."""

from .ivf import IVFIndex, train_kmeans
from .ivfpq import IVFPQIndex, train_ivfpq
from .pq import PQIndex, encode_pq, reconstruct_pq, train_pq

__all__ = [
    "IVFIndex",
    "IVFPQIndex",
    "PQIndex",
    "encode_pq",
    "reconstruct_pq",
    "train_ivfpq",
    "train_kmeans",
    "train_pq",
]
