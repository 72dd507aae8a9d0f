"""High-level query engine: load a space into device HBM and search it.

The TPU-native replacement for the reference's application layer
(`examples/simple.rs:74-103`, `examples/similarity_search.rs:111-176` in
thegenem0/metrovector): instead of a per-query scalar scan, a
:class:`DeviceSpace` holds the tile-padded corpus resident in HBM and every
search is a batched fused matmul+top-k kernel launch.

Load path: the on-disk block layout equals the in-HBM tiling, so upload is
``device_put(space.padded_array())`` — no host-side transpose or decode
(SURVEY.md §7 "zero-copy load path").
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .errors import DimensionMismatchError, InvalidVectorTypeError
from .format.constants import DataType, DistanceMetric, numpy_dtype
from .format.reader import Reader
from .ops.distances import exact_topk_xla, scores_to_distances
from .ops.topk_kernel import fused_topk
from .vectors.space import VectorSpace


def _interpret_default() -> bool:
    """Pallas kernels run compiled on TPU, interpreted elsewhere (CPU CI)."""
    return jax.default_backend() != "tpu"


@dataclasses.dataclass
class SearchResult:
    """Top-k results for a query batch.

    ``indices``: ``[Q, k]`` int32 row ids (−1 only if k > corpus size).
    ``scores``: ``[Q, k]`` f32 internal greater-is-better scores.
    ``distances``: the user-facing quantity per metric — Euclidean distance
    for L2 (ascending), cosine similarity / dot product (descending) —
    matching the reference's ``find_top_k_similar`` output convention
    (`examples/similarity_search.rs:140-176`).
    """

    indices: np.ndarray
    scores: np.ndarray
    distances: np.ndarray
    metric: DistanceMetric

    def __len__(self) -> int:
        return self.indices.shape[0]

    def top(self, query: int = 0) -> list[tuple[int, float]]:
        """(index, distance) pairs for one query, best first."""
        return [
            (int(i), float(d))
            for i, d in zip(self.indices[query], self.distances[query])
            if i >= 0
        ]


class DeviceSpace:
    """One vector space resident on device(s): the corpus block, its
    dequantized squared norms, and an optional validity mask, all as jax
    arrays ready for the fused kernel."""

    def __init__(
        self,
        data: jax.Array,
        norms: jax.Array,
        num_valid: int,
        dim: int,
        metric: DistanceMetric,
        valid_mask: jax.Array | None = None,
        scale: float = 1.0,
        zero_point: float = 0.0,
        dtype: DataType = DataType.FLOAT32,
        name: str = "",
    ):
        self.data = data
        self.norms = norms
        self.num_valid = num_valid
        self.dim = dim
        self.metric = DistanceMetric(metric)
        self.valid_mask = valid_mask
        self.scale = float(scale)
        self.zero_point = float(zero_point)
        self.dtype = DataType(dtype)
        self.name = name

    # -- construction ---------------------------------------------------------

    @classmethod
    def from_space(
        cls,
        space: VectorSpace,
        device: Any | None = None,
        include_tombstones: bool = True,
    ) -> "DeviceSpace":
        """Upload a host :class:`VectorSpace` view to one device. The padded
        block goes up verbatim; tombstones become a validity mask applied in
        the kernel epilogue (deleted rows can never enter the top-k)."""
        block = space.padded_array()
        norms = np.asarray(space.norms(), dtype=np.float32)
        put = (lambda x: jax.device_put(x, device)) if device else jax.device_put
        mask = None
        if include_tombstones:
            host_mask = space.tombstone_mask()
            if host_mask is not None:
                full = np.ones(space.padded_rows, dtype=np.float32)
                full[: space.num_vectors] = (~host_mask).astype(np.float32)
                mask = put(full)
        q = space.quantization
        return cls(
            data=put(block),
            norms=put(norms),
            num_valid=space.num_vectors,
            dim=space.dim,
            metric=space.metric,
            valid_mask=mask,
            scale=q.scale if q else 1.0,
            zero_point=q.zero_point if q else 0.0,
            dtype=space.dtype,
            name=space.name,
        )

    @property
    def padded_rows(self) -> int:
        return int(self.data.shape[0])

    @property
    def padded_dim(self) -> int:
        return int(self.data.shape[1])

    @property
    def nbytes(self) -> int:
        n = self.data.nbytes + self.norms.nbytes
        if self.valid_mask is not None:
            n += self.valid_mask.nbytes
        return n

    # -- query preprocessing --------------------------------------------------

    def prepare_queries(
        self, queries
    ) -> tuple[jax.Array, np.ndarray, float | None]:
        """Validate, pad to ``padded_dim``, pre-normalize (cosine),
        pre-quantize (int8 symmetric), and cast to the kernel's input dtype.
        Returns ``(device_queries, f32 squared query norms, query scale or
        None)`` — the scale is the int8 quantization step of the queries."""
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.ndim != 2 or q.shape[1] != self.dim:
            raise DimensionMismatchError(
                expected=self.dim, actual=int(q.shape[-1])
            )
        qnorms = np.einsum("ij,ij->i", q, q, dtype=np.float64).astype(np.float32)
        if self.metric == DistanceMetric.COSINE:
            q = q / np.maximum(np.sqrt(qnorms)[:, None], 1e-30)
        if self.padded_dim != self.dim:
            q = np.pad(q, ((0, 0), (0, self.padded_dim - self.dim)))

        if self.dtype == DataType.INT8:
            qscale = float(np.abs(q).max()) / 127.0 or 1.0
            qq = np.clip(np.rint(q / qscale), -128, 127).astype(np.int8)
            return jax.device_put(qq), qnorms, qscale
        if self.dtype == DataType.UINT8:
            # Affine uint8 needs cross-term corrections; served via the
            # dequantizing XLA path (see SearchEngine._search_uint8).
            return jax.device_put(q), qnorms, None
        kernel_dt = numpy_dtype(self.dtype)
        return jax.device_put(q.astype(kernel_dt)), qnorms, None


class SearchEngine:
    """Exact brute-force top-k search over one :class:`DeviceSpace`.

    ``backend='pallas'`` uses the fused distance+top-k kernel;
    ``backend='xla'`` uses the blocked ``lax.top_k`` path (oracle; also the
    serving path for affine-uint8 spaces). Both are exact.
    """

    def __init__(self, space: VectorSpace | DeviceSpace, backend: str = "pallas",
                 device: Any | None = None, interpret: bool | None = None):
        if isinstance(space, VectorSpace):
            space = DeviceSpace.from_space(space, device=device)
        self.space = space
        if backend not in ("pallas", "xla"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self.interpret = _interpret_default() if interpret is None else interpret

    @classmethod
    def open(cls, path, space_name: str | None = None, **kw) -> "SearchEngine":
        """One-call open: mmap the file and upload the named (or only)
        space."""
        r = Reader.open(path)
        name = space_name or r.vector_space_names[0]
        return cls(r.vector_space(name), **kw)

    def search(self, queries, k: int = 10) -> SearchResult:
        """Batched exact top-k. ``queries``: ``[Q, dim]`` (or a single
        vector). Returns best-first results for every query."""
        sp = self.space
        if sp.metric == DistanceMetric.CUSTOM:
            raise InvalidVectorTypeError(
                "CUSTOM metric spaces need a user-provided score function; "
                "use ops.distances directly"
            )
        qdev, qnorms, qscale = sp.prepare_queries(queries)
        if sp.num_valid == 0:  # empty space: all-sentinel results
            nq = qdev.shape[0]
            return SearchResult(
                indices=np.full((nq, k), -1, np.int32),
                scores=np.full((nq, k), -np.inf, np.float32),
                distances=np.full(
                    (nq, k),
                    np.inf if sp.metric == DistanceMetric.L2 else -np.inf,
                    np.float32,
                ),
                metric=sp.metric,
            )
        k_eff = min(k, sp.num_valid)

        if sp.dtype == DataType.UINT8:
            scores, idx = self._search_uint8(qdev, k_eff)
        elif self.backend == "pallas":
            scale = (qscale or 1.0) * (sp.scale if sp.dtype == DataType.INT8 else 1.0)
            scores, idx = fused_topk(
                qdev, sp.data, sp.norms,
                jnp.int32(sp.num_valid), k_eff, sp.metric,
                valid_mask=sp.valid_mask, scale=scale,
                interpret=self.interpret,
            )
        else:
            q_x, db_x = qdev, sp.data
            if sp.dtype == DataType.INT8:
                q_x = qdev.astype(jnp.float32) * jnp.float32(qscale)
                db_x = sp.data.astype(jnp.float32) * jnp.float32(sp.scale)
            scores, idx = exact_topk_xla(
                q_x, db_x, sp.norms, sp.num_valid, k_eff, sp.metric,
                valid_mask=sp.valid_mask,
            )

        scores = np.asarray(scores)
        idx = np.asarray(idx)
        dist = np.asarray(
            scores_to_distances(jnp.asarray(scores), sp.metric, jnp.asarray(qnorms))
        )
        if k_eff < k:  # pad out to requested k with sentinels
            pad = ((0, 0), (0, k - k_eff))
            idx = np.pad(idx, pad, constant_values=-1)
            scores = np.pad(scores, pad, constant_values=-np.inf)
            dist = np.pad(dist, pad, constant_values=np.inf
                          if sp.metric == DistanceMetric.L2 else -np.inf)
        return SearchResult(indices=idx, scores=scores, distances=dist,
                            metric=sp.metric)

    def _search_uint8(self, qdev, k: int):
        """Affine-uint8 spaces: dequantize on the fly in the XLA path.
        ``(c − zp)·scale`` per element; XLA fuses the dequant into the
        matmul read, so no dequantized copy persists in HBM."""
        sp = self.space
        deq = (sp.data.astype(jnp.float32) - sp.zero_point) * sp.scale
        return exact_topk_xla(
            qdev, deq, sp.norms, sp.num_valid, k, sp.metric,
            valid_mask=sp.valid_mask,
        )
