"""Multi-chip exact search: per-shard fused top-k + ICI candidate merge.

SPMD layout (SURVEY.md §5/§7 step 4):

* corpus rows ``[S·R, D]`` sharded over the mesh's ``shard`` axis (each
  chip holds ``[R, D]`` resident in its HBM),
* queries ``[Q, D]`` replicated,
* each chip runs the single-chip fused kernel over its rows, producing
  ``[Q, k]`` local candidates with **global** row ids (local id + shard
  offset),
* ``all_gather`` over ICI yields ``[S, Q, k]`` everywhere (a few KB —
  bandwidth-irrelevant), and a final ``top_k`` over the ``S·k`` candidates
  gives the exact global answer, replicated.

This is the TPU-native analog of "multiple threads share one mmap reader"
(`src/reader.rs:281-289` in thegenem0/metrovector) — except it actually
scales compute and memory across chips instead of sharing one copy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..format.constants import DistanceMetric
from ..ops.distances import exact_topk_xla
from ..ops.topk_kernel import fused_topk
from .mesh import SHARD_AXIS


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "mesh", "axis", "scale", "backend", "interpret",
        "block_rows", "dequant_bias",
    ),
)
def sharded_topk(
    queries: jax.Array,
    db: jax.Array,
    db_norms: jax.Array,
    num_valid,
    k: int,
    metric: DistanceMetric,
    mesh: Mesh,
    valid_mask: jax.Array | None = None,
    axis: str = SHARD_AXIS,
    scale: float = 1.0,
    backend: str = "pallas",
    interpret: bool = False,
    block_rows: int | None = None,
    bias_row: jax.Array | None = None,
    bias_scale: float = 0.0,
    dequant_bias: float | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact global top-k over a row-sharded corpus.

    ``dequant_bias``: affine-uint8 dequant-on-read for the XLA backend —
    each shard scores ``x = (c' + dequant_bias)·scale`` with f32 queries
    (``c'`` the re-centered int8 codes, ``dequant_bias = 128 − zero_point``),
    the sharded mirror of ``SearchEngine._search_uint8_dequant``. XLA fuses
    the dequant into the matmul read; no f32 corpus copy persists in HBM.

    ``db``: ``[total_rows, D]`` sharded ``P(axis, None)``; ``db_norms``
    ``[total_rows]`` sharded ``P(axis)``; ``queries`` ``[Q, D]``
    replicated; ``num_valid``: scalar int32 logical row count (global).
    Returns replicated ``(scores [Q, k], indices [Q, k])``, best-first,
    with global row indices.
    """
    if bias_row is not None and backend != "pallas":
        raise ValueError(
            "bias_row (the offset-uint8 correction) only exists in the "
            "pallas kernel; backend='xla' would silently drop it"
        )
    if dequant_bias is not None and backend != "xla":
        raise ValueError(
            "dequant_bias (affine-uint8 dequant-on-read) only exists on "
            "the xla backend; backend='pallas' would silently drop it"
        )
    total_rows = db.shape[0]
    n_shards = mesh.shape[axis]
    local_rows = total_rows // n_shards
    metric = DistanceMetric(metric)
    num_valid = jnp.asarray(num_valid, dtype=jnp.int32)

    def local_search(q, db_l, norms_l, nvalid, *extras):
        sid = jax.lax.axis_index(axis)
        offset = sid * local_rows
        # Rows this shard owns that are logically valid.
        nvalid_local = jnp.clip(nvalid[0] - offset, 0, local_rows)
        extras = list(extras)
        bias_l = extras.pop(0) if bias_row is not None else None
        mask_l = extras.pop(0) if valid_mask is not None else None
        if backend == "pallas":
            s, i = fused_topk(
                q, db_l, norms_l, nvalid_local, k, metric,
                valid_mask=mask_l, scale=scale, interpret=interpret,
                block_rows=block_rows, bias_row=bias_l,
                bias_scale=bias_scale,
            )
        else:
            q_x, db_x = q, db_l
            if dequant_bias is not None:
                # affine-uint8 dequant-on-read (cosine path; see docstring)
                db_x = (
                    db_l.astype(jnp.float32) + jnp.float32(dequant_bias)
                ) * jnp.float32(scale)
            elif db_l.dtype == jnp.int8.dtype:
                # symmetric int8 via dequant-on-read (bias_row spaces are
                # routed to the pallas backend by ShardedDeviceSpace)
                q_x = q.astype(jnp.float32) * jnp.float32(scale)
                db_x = db_l.astype(jnp.float32)
            s, i = exact_topk_xla(
                q_x, db_x, norms_l, nvalid_local, k, metric,
                valid_mask=mask_l,
            )
        i = jnp.where(i >= 0, i + offset, i)
        # Candidate exchange over ICI: [S, Q, k] everywhere.
        all_s = jax.lax.all_gather(s, axis)
        all_i = jax.lax.all_gather(i, axis)
        q_n = s.shape[0]
        cand_s = jnp.moveaxis(all_s, 0, 1).reshape(q_n, n_shards * k)
        cand_i = jnp.moveaxis(all_i, 0, 1).reshape(q_n, n_shards * k)
        best_s, pos = jax.lax.top_k(cand_s, k)
        best_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return best_s, best_i

    in_specs = [
        P(),              # queries replicated
        P(axis, None),    # db rows sharded
        P(axis),          # norms sharded
        P(),              # num_valid replicated
    ]
    args = [queries, db, db_norms, num_valid.reshape(1)]
    if bias_row is not None:
        in_specs.append(P(axis))
        args.append(bias_row)
    if valid_mask is not None:
        in_specs.append(P(axis))
        args.append(valid_mask)

    fn = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(*args)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "rerank", "metric", "mesh", "axis", "exact_lut", "backend",
        "interpret", "block_rows", "int8_lut", "packed4",
    ),
)
def sharded_pq_topk(
    queries: jax.Array,
    codes: jax.Array,
    codebooks: jax.Array,
    recon_norms: jax.Array,
    num_valid,
    k: int,
    metric: DistanceMetric,
    mesh: Mesh,
    db: jax.Array | None = None,
    db_norms: jax.Array | None = None,
    rerank: int = 0,
    valid_mask: jax.Array | None = None,
    axis: str = SHARD_AXIS,
    exact_lut: bool = False,
    backend: str = "pallas",
    interpret: bool = False,
    block_rows: int | None = None,
    int8_lut: bool = False,
    packed4: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Global PQ search over a row-sharded coded corpus.

    ``codes`` ``[total_rows, m]`` (or ``[total_rows, ⌈m/2⌉]`` nibble-packed
    with ``packed4=True`` — pallas backend only) and ``recon_norms``
    ``[total_rows]`` are
    sharded ``P(axis, None)`` / ``P(axis)``; ``codebooks`` and ``queries``
    replicate. With ``rerank=R`` (requires sharded ``db``/``db_norms``),
    each shard rescores its own top-R ADC candidates exactly — candidate
    rows live where their codes live, so re-ranking needs **no cross-shard
    gather**; only the final ``[Q, k]`` lists ride ICI. Queries must be
    pre-normalized for cosine. Returns replicated global results."""
    from ..index.pq import _adc_search, _rerank
    from ..ops.adc_kernel import fused_adc_topk

    if packed4 and backend != "pallas":
        raise ValueError("packed4 codes require the pallas backend")
    total_rows = codes.shape[0]
    n_shards = mesh.shape[axis]
    local_rows = total_rows // n_shards
    metric = DistanceMetric(metric)
    num_valid = jnp.asarray(num_valid, dtype=jnp.int32)
    fetch = max(k, rerank) if rerank else k
    fetch = min(fetch, local_rows)

    def local(q, codes_l, rnorms_l, nvalid, *extras):
        sid = jax.lax.axis_index(axis)
        offset = sid * local_rows
        nvalid_local = jnp.clip(nvalid[0] - offset, 0, local_rows)
        extras = list(extras)
        db_l = extras.pop(0) if db is not None else None
        dnorms_l = extras.pop(0) if db is not None else None
        mask_l = extras.pop(0) if valid_mask is not None else None
        if backend == "pallas":
            # block_rows is threaded through because the in-kernel VMEM-OOM
            # retry in fused_adc_topk only runs at trace time; Mosaic
            # scoped-VMEM rejections surface at first *execution*, outside
            # this jit, so recovery happens by the caller re-invoking with a
            # smaller explicit block_rows (advisor finding r1).
            s, i = fused_adc_topk(
                q, codes_l, codebooks, rnorms_l, nvalid_local, fetch, metric,
                valid_mask=mask_l, exact_lut=exact_lut, interpret=interpret,
                block_rows=block_rows, int8_lut=int8_lut, packed4=packed4,
            )
        else:
            s, i = _adc_search(
                q, codes_l,
                codebooks.reshape(-1, codebooks.shape[2]),
                rnorms_l, nvalid_local, fetch, metric,
                valid_mask=mask_l, exact_lut=exact_lut,
            )
        if rerank:
            s, i = _rerank(q, db_l, dnorms_l, i, min(k, fetch), metric)
        else:
            s, i = s[:, :k], i[:, :k]
        i = jnp.where(i >= 0, i + offset, i)
        all_s = jax.lax.all_gather(s, axis)
        all_i = jax.lax.all_gather(i, axis)
        q_n = s.shape[0]
        kk = s.shape[1]
        cand_s = jnp.moveaxis(all_s, 0, 1).reshape(q_n, n_shards * kk)
        cand_i = jnp.moveaxis(all_i, 0, 1).reshape(q_n, n_shards * kk)
        best_s, pos = jax.lax.top_k(cand_s, min(k, n_shards * kk))
        best_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return best_s, best_i

    in_specs = [P(), P(axis, None), P(axis), P()]
    args = [queries, codes, recon_norms, num_valid.reshape(1)]
    if db is not None:
        in_specs += [P(axis, None), P(axis)]
        args += [db, db_norms]
    if valid_mask is not None:
        in_specs.append(P(axis))
        args.append(valid_mask)
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs), out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(*args)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "mesh", "axis"),
)
def dim_sharded_topk(
    queries: jax.Array,
    db: jax.Array,
    db_norms: jax.Array,
    num_valid,
    k: int,
    metric: DistanceMetric,
    mesh: Mesh,
    valid_mask: jax.Array | None = None,
    axis: str = SHARD_AXIS,
) -> tuple[jax.Array, jax.Array]:
    """Exact global top-k with the corpus sharded over the **dimension**
    axis — the workload's "tensor parallel" mapping (SURVEY.md §5): each
    chip holds every row but only a slice of the feature dimension,
    computes partial dots, and a ``psum`` over ICI completes them before
    the epilogue + top-k (replicated).

    Useful when single rows are wide enough that dimension slicing beats
    row slicing (very wide embeddings, or combining with row sharding on a
    2-D mesh). ``db``: ``[N, D_total]`` sharded ``P(None, axis)``;
    ``queries`` ``[Q, D_total]`` sharded the same way; ``db_norms`` and
    ``valid_mask`` replicated ``[N]``.
    """
    metric = DistanceMetric(metric)
    num_valid = jnp.asarray(num_valid, dtype=jnp.int32)

    def local(q, db_l, norms, nvalid, *maybe_mask):
        dots = jax.lax.dot_general(
            q, db_l,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dots = jax.lax.psum(dots, axis)  # complete the contraction over ICI
        if metric == DistanceMetric.L2:
            scores = 2.0 * dots - norms[None, :]
        elif metric == DistanceMetric.COSINE:
            # caller pre-normalizes queries over the FULL dimension
            scores = dots * jax.lax.rsqrt(jnp.maximum(norms, 1e-30))[None, :]
        else:
            scores = dots
        n = scores.shape[1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        scores = jnp.where(rows < nvalid[0], scores, -jnp.inf)
        if maybe_mask:
            scores = jnp.where(maybe_mask[0][None, :] != 0, scores, -jnp.inf)
        s, i = jax.lax.top_k(scores, k)
        i = jnp.where(jnp.isneginf(s), -1, i)
        return s, i

    in_specs = [P(None, axis), P(None, axis), P(), P()]
    args = [queries, db, db_norms, num_valid.reshape(1)]
    if valid_mask is not None:
        in_specs.append(P())
        args.append(valid_mask)
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs), out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(*args)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "mesh", "axis", "backend", "interpret",
                     "block_rows", "scale"),
)
def query_sharded_topk(
    queries: jax.Array,
    db: jax.Array,
    db_norms: jax.Array,
    num_valid,
    k: int,
    metric: DistanceMetric,
    mesh: Mesh,
    valid_mask: jax.Array | None = None,
    axis: str = "query",
    backend: str = "pallas",
    interpret: bool = False,
    block_rows: int | None = None,
    scale: float = 1.0,
    bias_row: jax.Array | None = None,
    bias_scale: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k with the QUERY batch sharded and the corpus replicated —
    the throughput-scaling mapping for huge query streams against a corpus
    that fits one chip's HBM (SURVEY.md §5 "query-batch sharding"). No
    collective at all: each chip answers its own queries independently;
    results come back sharded ``P(axis, None)``.

    ``queries`` ``[Q_total, D]`` sharded ``P(axis, None)`` (``Q_total``
    divisible by the axis size); ``db``/``db_norms``/``valid_mask``
    replicated.
    """
    if bias_row is not None and backend != "pallas":
        raise ValueError(
            "bias_row (the offset-uint8 correction) only exists in the "
            "pallas kernel; backend='xla' would silently drop it"
        )
    metric = DistanceMetric(metric)
    num_valid = jnp.asarray(num_valid, dtype=jnp.int32)

    def local(q, db_r, norms_r, nvalid, *extras):
        extras = list(extras)
        bias_r = extras.pop(0) if bias_row is not None else None
        mask = extras.pop(0) if valid_mask is not None else None
        if backend == "pallas":
            return fused_topk(
                q, db_r, norms_r, nvalid[0], k, metric, valid_mask=mask,
                interpret=interpret, block_rows=block_rows, scale=scale,
                bias_row=bias_r, bias_scale=bias_scale,
            )
        q_x, db_x = q, db_r
        if db_r.dtype == jnp.int8.dtype:
            # symmetric int8 dequant-on-read; `scale` is the COMBINED
            # dequant factor on raw integer dots (sq·sx — the fused_topk
            # contract), folded on the query side. The offset-uint8 bias
            # path needs the in-kernel correction: use backend='pallas'.
            q_x = q.astype(jnp.float32) * jnp.float32(scale)
            db_x = db_r.astype(jnp.float32)
        return exact_topk_xla(q_x, db_x, norms_r, nvalid[0], k, metric,
                              valid_mask=mask)

    in_specs = [P(axis, None), P(), P(), P()]
    args = [queries, db, db_norms, num_valid.reshape(1)]
    if bias_row is not None:
        in_specs.append(P())
        args.append(bias_row)
    if valid_mask is not None:
        in_specs.append(P())
        args.append(valid_mask)
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=(P(axis, None), P(axis, None)), check_vma=False,
    )
    return fn(*args)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "mesh", "query_axis", "shard_axis",
                     "backend", "interpret", "block_rows", "scale"),
)
def grid_sharded_topk(
    queries: jax.Array,
    db: jax.Array,
    db_norms: jax.Array,
    num_valid,
    k: int,
    metric: DistanceMetric,
    mesh: Mesh,
    valid_mask: jax.Array | None = None,
    query_axis: str = "query",
    shard_axis: str = SHARD_AXIS,
    backend: str = "pallas",
    interpret: bool = False,
    block_rows: int | None = None,
    scale: float = 1.0,
    bias_row: jax.Array | None = None,
    bias_scale: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k on a 2-D ``(query, shard)`` mesh: the corpus rows shard
    over ``shard_axis`` (replicated across ``query_axis``), the query batch
    shards over ``query_axis`` — the composed DP×corpus-parallel mapping
    (``mesh.make_mesh_2d``). Each query sub-batch merges candidates with an
    ``all_gather`` over its row ring only; nothing crosses the query axis.
    Results return sharded ``P(query_axis, None)`` with global row ids.

    ``queries`` ``[Q_total, D]`` sharded ``P(query_axis, None)``; ``db``
    ``[total_rows, D]`` sharded ``P(shard_axis, None)``; ``db_norms`` /
    ``valid_mask`` sharded ``P(shard_axis)``; ``num_valid`` global scalar.
    """
    total_rows = db.shape[0]
    n_shards = mesh.shape[shard_axis]
    local_rows = total_rows // n_shards
    metric = DistanceMetric(metric)
    num_valid = jnp.asarray(num_valid, dtype=jnp.int32)

    if bias_row is not None and backend != "pallas":
        raise ValueError(
            "bias_row (the offset-uint8 correction) only exists in the "
            "pallas kernel; backend='xla' would silently drop it"
        )

    def local(q, db_l, norms_l, nvalid, *extras):
        sid = jax.lax.axis_index(shard_axis)
        offset = sid * local_rows
        nvalid_local = jnp.clip(nvalid[0] - offset, 0, local_rows)
        extras = list(extras)
        bias_l = extras.pop(0) if bias_row is not None else None
        mask = extras.pop(0) if valid_mask is not None else None
        if backend == "pallas":
            s, i = fused_topk(
                q, db_l, norms_l, nvalid_local, k, metric, valid_mask=mask,
                interpret=interpret, block_rows=block_rows, scale=scale,
                bias_row=bias_l, bias_scale=bias_scale,
            )
        else:
            q_x, db_x = q, db_l
            if db_l.dtype == jnp.int8.dtype:
                q_x = q.astype(jnp.float32) * jnp.float32(scale)
                db_x = db_l.astype(jnp.float32)
            s, i = exact_topk_xla(q_x, db_x, norms_l, nvalid_local, k,
                                  metric, valid_mask=mask)
        i = jnp.where(i >= 0, i + offset, i)
        all_s = jax.lax.all_gather(s, shard_axis)
        all_i = jax.lax.all_gather(i, shard_axis)
        q_n = s.shape[0]
        cand_s = jnp.moveaxis(all_s, 0, 1).reshape(q_n, n_shards * k)
        cand_i = jnp.moveaxis(all_i, 0, 1).reshape(q_n, n_shards * k)
        best_s, pos = jax.lax.top_k(cand_s, k)
        best_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return best_s, best_i

    in_specs = [P(query_axis, None), P(shard_axis, None), P(shard_axis), P()]
    args = [queries, db, db_norms, num_valid.reshape(1)]
    if bias_row is not None:
        in_specs.append(P(shard_axis))
        args.append(bias_row)
    if valid_mask is not None:
        in_specs.append(P(shard_axis))
        args.append(valid_mask)
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=(P(query_axis, None), P(query_axis, None)),
        check_vma=False,
    )
    return fn(*args)


class ShardedDeviceSpace:
    """A vector space sharded row-wise across a device mesh.

    Mirrors :class:`~metrovector_tpu.engine.DeviceSpace` but holds
    mesh-sharded arrays; construction pads rows so every shard gets an
    equal tile-aligned slice.
    """

    def __init__(self, space, mesh: Mesh, axis: str = SHARD_AXIS):
        from ..format.constants import DataType, sublane_multiple
        import numpy as np
        from .mesh import shard_rows

        self.mesh = mesh
        self.axis = axis
        self.dim = space.dim
        self.metric = space.metric
        self.num_valid = space.num_vectors
        self.dtype = DataType(space.dtype)
        q = space.quantization
        self.scale = q.scale if q else 1.0
        self.zero_point = q.zero_point if q else 0.0
        self.name = space.name

        sub = sublane_multiple(space.dtype)
        block = space.padded_array()
        self.rowsums = None
        if self.dtype == DataType.UINT8:
            # uint8 offset path (see DeviceSpace.from_space): re-center to
            # int8 and shard the per-row code sums alongside the data.
            shifted = block.astype(np.int16) - 128
            shifted[:, space.dim :] = 0
            shifted[space.num_vectors :, :] = 0
            rowsums = shifted[:, : space.dim].sum(
                axis=1, dtype=np.int32
            ).astype(np.float32)
            block = shifted.astype(np.int8)
            self.rowsums = shard_rows(rowsums, mesh, axis, sublane=sub)
        self.data = shard_rows(block, mesh, axis, sublane=sub)
        self.host_ids = space.ids()
        self.norms = shard_rows(
            np.asarray(space.norms(), np.float32), mesh, axis, sublane=sub
        )
        host_mask = space.tombstone_mask()
        if host_mask is not None:
            full = np.ones(block.shape[0], np.float32)
            full[: space.num_vectors] = (~host_mask).astype(np.float32)
            self.valid_mask = shard_rows(full, mesh, axis, sublane=sub)
        else:
            self.valid_mask = None
        self.padded_dim = int(block.shape[1])
        self._host_rows = int(block.shape[0])
        self._sublane = sub

    def prepare_filter(self, filter_mask):
        """Shard a ``[num_vectors]`` boolean/int row predicate over the
        mesh once (``P(axis)``, riding the same row partitioning as the
        corpus) for reuse across :meth:`search` calls. Returns a
        :class:`~metrovector_tpu.engine.PreparedFilter`."""
        from ..engine import PreparedFilter
        from ..utils.filters import padded_filter_plane
        from .mesh import shard_rows

        full = padded_filter_plane(
            filter_mask, self.num_valid, self._host_rows
        )
        return PreparedFilter(
            mask=shard_rows(full, self.mesh, self.axis,
                            sublane=self._sublane),
            num_valid=self.num_valid,
        )

    def _effective_mask(self, filter_mask):
        """Compose the user predicate with the tombstone plane (both
        sharded ``P(axis)``; the multiply stays shard-local)."""
        if filter_mask is None:
            return self.valid_mask
        from ..engine import PreparedFilter
        from ..utils.filters import checked_prepared_mask

        if isinstance(filter_mask, PreparedFilter):
            fdev = checked_prepared_mask(filter_mask, self.num_valid)
        else:
            fdev = self.prepare_filter(filter_mask).mask
        if self.valid_mask is None:
            return fdev
        return self.valid_mask * fdev

    def search(self, queries, k: int = 10, backend: str = "pallas",
               interpret: bool = False, filter_mask=None):
        """Replicates the query batch and runs the global sharded top-k.
        ``filter_mask``: optional ``[num_vectors]`` boolean/int row
        predicate (or a mesh-prepared one from :meth:`prepare_filter`) —
        applied inside each shard's kernel exactly like tombstones, so
        the ICI merge only ever sees filter-passing candidates. Returns a
        :class:`~metrovector_tpu.engine.SearchResult`."""
        import numpy as np

        from ..engine import DeviceSpace, SearchResult
        from ..ops.distances import distances_np

        # Reuse single-chip query preprocessing (pad/normalize/quantize).
        from ..format.constants import DataType

        helper = DeviceSpace(
            data=self.data, norms=self.norms, num_valid=self.num_valid,
            dim=self.dim, metric=self.metric, scale=self.scale,
            zero_point=self.zero_point, dtype=self.dtype,
        )
        uint8_cosine = (
            self.dtype == DataType.UINT8
            and self.metric == DistanceMetric.COSINE
        )
        dequant_bias = None
        if uint8_cosine:
            # Cosine needs float dots (normalized queries can't quantize
            # exactly): per-shard dequant-on-read, mirroring the
            # single-chip engine's _search_uint8_dequant.
            backend = "xla"
            dequant_bias = 128.0 - self.zero_point
        elif self.dtype == DataType.UINT8:
            backend = "pallas"  # the offset-bias path only exists in-kernel
        prep = helper.prepare_queries(queries)
        k_eff = min(k, max(self.num_valid, 1))
        from .mesh import replicate

        qrep = replicate(np.asarray(prep.qdev), self.mesh)
        s, i = sharded_topk(
            qrep, self.data, self.norms, self.num_valid, k_eff, self.metric,
            self.mesh, valid_mask=self._effective_mask(filter_mask),
            axis=self.axis,
            scale=self.scale if uint8_cosine else prep.dot_scale,
            backend=backend, interpret=interpret,
            bias_row=None if uint8_cosine else self.rowsums,
            bias_scale=prep.bias_scale, dequant_bias=dequant_bias,
        )
        s = np.asarray(s)
        i = np.asarray(i)
        if prep.const is not None:
            mult = 2.0 if self.metric == DistanceMetric.L2 else 1.0
            s = s + mult * prep.const[:, None]
        qnorms = prep.sq_norms
        dist = distances_np(s, self.metric, qnorms)
        if k_eff < k:
            pad = ((0, 0), (0, k - k_eff))
            i = np.pad(i, pad, constant_values=-1)
            s = np.pad(s, pad, constant_values=-np.inf)
            dist = np.pad(dist, pad, constant_values=np.inf
                          if self.metric == DistanceMetric.L2 else -np.inf)
        from .streaming import _ids_for

        return SearchResult(indices=i, scores=s, distances=dist,
                            metric=self.metric,
                            ids=_ids_for(self.host_ids, i))
