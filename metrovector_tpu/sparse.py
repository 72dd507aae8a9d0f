"""Exact search over SPARSE (CSR) vector spaces.

The reference declares ``VectorType::Sparse`` in its schema but can neither
encode nor search it (SURVEY.md §2 quirks). MVT stores real CSR blocks
(:class:`~metrovector_tpu.format.manifest.SparseInfo`) and searches them
with a TPU-friendly scatter formulation:

    contrib[q, e] = queries[q, cols[e]] · values[e]          (gather, VPU)
    scores[q, :]  = scatter-add of contrib over rows[e]      (segment sum)

Memory is O(nnz) — no densified corpus ever exists. nnz is processed in
fixed-size chunks so the transient ``[Q, nnz_chunk]`` contribution tile
stays bounded; the ``[Q, N]`` score matrix is materialized (fine up to a
few million rows at serving batch sizes — the regime where exact sparse
brute force makes sense at all).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .errors import DimensionMismatchError, InvalidVectorTypeError
from .format.constants import DistanceMetric, VectorType
from .ops.distances import distances_np

_NEG_INF = jnp.float32(-jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "num_rows", "nnz_chunk")
)
def _sparse_topk(
    queries,          # [Q, dim] f32
    cols,             # [nnz_pad] i32 (padded entries point at column 0)
    rows,             # [nnz_pad] i32 (padded entries point at row num_rows)
    values,           # [nnz_pad] f32 (padded entries are 0)
    norms,            # [num_rows] f32 squared norms
    valid_mask,       # [num_rows] f32 or None
    k: int,
    metric: DistanceMetric,
    num_rows: int,
    nnz_chunk: int,
):
    metric = DistanceMetric(metric)
    qn = queries.shape[0]
    nnz_pad = cols.shape[0]
    nchunks = nnz_pad // nnz_chunk

    def body(carry, xs):
        c_cols, c_rows, c_vals = xs
        contrib = queries[:, c_cols] * c_vals[None, :]  # [Q, chunk]
        # scatter-add into this chunk's partial score matrix
        partial = jax.ops.segment_sum(
            contrib.T, c_rows, num_segments=num_rows + 1
        ).T  # [Q, num_rows+1] (last row collects padding)
        return carry + partial[:, :num_rows], None

    xs = (
        cols.reshape(nchunks, nnz_chunk),
        rows.reshape(nchunks, nnz_chunk),
        values.reshape(nchunks, nnz_chunk),
    )
    dots, _ = jax.lax.scan(body, jnp.zeros((qn, num_rows), jnp.float32), xs)

    if metric == DistanceMetric.L2:
        scores = 2.0 * dots - norms[None, :]
    elif metric == DistanceMetric.COSINE:
        scores = dots * jax.lax.rsqrt(jnp.maximum(norms, 1e-30))[None, :]
    else:
        scores = dots
    if valid_mask is not None:
        scores = jnp.where(valid_mask[None, :] != 0, scores, _NEG_INF)
    s, i = jax.lax.top_k(scores, k)
    i = jnp.where(jnp.isneginf(s), -1, i)
    return s, i


class SparseSearchEngine:
    """Exact top-k over one SPARSE space, corpus resident on device in CSR
    form (values + cols + row ids, O(nnz) HBM)."""

    def __init__(self, space, nnz_chunk: int = 1 << 20, device=None):
        if space.info.vector_type != VectorType.SPARSE:
            raise InvalidVectorTypeError(
                f"space {space.name!r} is dense; use SearchEngine"
            )
        indptr, cols, vals = space.sparse_csr()
        put = (lambda x: jax.device_put(x, device)) if device else jax.device_put
        ip = indptr.astype(np.int64)
        counts = np.diff(ip)
        rows = np.repeat(np.arange(space.num_vectors, dtype=np.int32), counts)
        nnz = int(cols.size)
        self.nnz_chunk = min(nnz_chunk, max(256, nnz)) if nnz else 256
        pad = (-nnz) % self.nnz_chunk if nnz else self.nnz_chunk
        # padded entries: column 0, sentinel row num_vectors, value 0
        self._cols = put(
            np.pad(cols.astype(np.int32), (0, pad)).astype(np.int32)
        )
        self._rows = put(
            np.pad(rows, (0, pad), constant_values=space.num_vectors)
        )
        self._vals = put(np.pad(vals.astype(np.float32), (0, pad)))
        self._norms = put(
            np.asarray(space.norms()[: space.num_vectors], np.float32)
        )
        host_mask = space.tombstone_mask()
        if host_mask is not None:
            self._valid = put((~host_mask).astype(np.float32))
        else:
            self._valid = None
        self.metric = space.metric
        self.dim = space.dim
        self.num_vectors = space.num_vectors
        self.name = space.name
        self.host_ids = space.ids()

    def search(self, queries, k: int = 10):
        """Batched exact top-k over the sparse corpus. ``queries`` are
        dense ``[Q, dim]`` float vectors (or a single vector)."""
        from .engine import SearchResult

        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        if q.shape[1] != self.dim:
            raise DimensionMismatchError(expected=self.dim, actual=q.shape[1])
        qnorms = np.einsum("ij,ij->i", q, q, dtype=np.float64).astype(np.float32)
        qk = q
        if self.metric == DistanceMetric.COSINE:
            qk = q / np.maximum(np.sqrt(qnorms)[:, None], 1e-30)
        nq = q.shape[0]
        if self.num_vectors == 0:
            return SearchResult(
                indices=np.full((nq, k), -1, np.int32),
                scores=np.full((nq, k), -np.inf, np.float32),
                distances=np.full(
                    (nq, k),
                    np.inf if self.metric == DistanceMetric.L2 else -np.inf,
                    np.float32,
                ),
                metric=self.metric,
            )
        k_eff = min(k, self.num_vectors)
        s, i = _sparse_topk(
            jax.device_put(qk), self._cols, self._rows, self._vals,
            self._norms, self._valid, k_eff, self.metric,
            self.num_vectors, self.nnz_chunk,
        )
        s, i = np.asarray(s), np.asarray(i)
        dist = distances_np(s, self.metric, qnorms)
        if k_eff < k:
            pad = ((0, 0), (0, k - k_eff))
            i = np.pad(i, pad, constant_values=-1)
            s = np.pad(s, pad, constant_values=-np.inf)
            dist = np.pad(
                dist, pad,
                constant_values=np.inf
                if self.metric == DistanceMetric.L2
                else -np.inf,
            )
        from .engine import ids_for_rows

        return SearchResult(indices=i, scores=s, distances=dist,
                            metric=self.metric,
                            ids=ids_for_rows(self.host_ids, i))
