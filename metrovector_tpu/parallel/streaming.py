"""Host-DRAM → HBM streamed exact search for corpora larger than HBM.

SURVEY.md §7 step 5: the corpus stays in host memory (mmap-backed numpy
views of the MVT file — nothing is ever decoded), and fixed-size row chunks
are uploaded and searched in a pipeline:

    upload chunk j+1  (async H2D)   ─┐ overlapped: jax dispatch is async,
    kernel on chunk j (MXU)         ─┘ so the next copy rides under compute

A running candidate list (scores + global indices) is carried on-device
across chunks and merged with each chunk's local top-k — the analog of the
reference's chunked iteration (`src/vectors/iterator.rs:62-81` in
thegenem0/metrovector), except the "iterator" yields HBM-resident tiles and
the merge is exact top-k, so results are independent of chunk order and
identical to a fully-resident search.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..format.constants import DataType, DistanceMetric
from ..ops.topk_kernel import fused_topk
from ..vectors.space import VectorSpace


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=(0, 1))
def _merge_topk(best_s, best_i, s, i, k: int):
    """Merge a chunk's candidates into the carried best list (donated —
    updated in place on device)."""
    cand_s = jnp.concatenate([best_s, s], axis=1)
    cand_i = jnp.concatenate([best_i, i], axis=1)
    top_s, pos = jax.lax.top_k(cand_s, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_s, top_i



def _ids_for(host_ids, idx):
    """Alias of :func:`..engine.ids_for_rows` (kept for the parallel
    modules' imports)."""
    from ..engine import ids_for_rows

    return ids_for_rows(host_ids, idx)


class StreamingSearcher:
    """Exact top-k over a host-resident (mmap) space, streamed chunk-wise.

    ``chunk_rows`` controls the HBM working set: two chunks are in flight
    (double buffering), so peak device memory ≈ ``2 · chunk_rows ·
    padded_dim · itemsize``. Results are bit-identical to a resident
    :class:`~metrovector_tpu.engine.SearchEngine` search.
    """

    def __init__(
        self,
        space: VectorSpace,
        chunk_rows: int | None = None,
        device=None,
        interpret: bool | None = None,
    ):
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if chunk_rows is None:
            # file-manifest performance hint, else 131072 rows per chunk
            chunk_rows = int(
                space.reader.manifest.hints.get("stream_chunk_rows", 131_072)
            )
        self.space = space
        self.interpret = interpret
        self.device = device
        self.metric = space.metric
        self.dtype = DataType(space.dtype)
        q = space.quantization
        self.scale = q.scale if q else 1.0
        self.dim = space.dim
        # Chunk boundary must respect sublane tiling so every chunk keeps
        # the block's native layout (pure views, no copies).
        from ..format.constants import sublane_multiple

        sub = sublane_multiple(space.dtype)
        # Clamp to the corpus itself — a chunk larger than the block would
        # only pad the upload for nothing.
        chunk_rows = min(chunk_rows, space.padded_rows)
        self.chunk_rows = max(sub, (chunk_rows // sub) * sub)
        self._block = space.padded_array()
        self._norms = np.asarray(space.norms(), dtype=np.float32)
        host_mask = space.tombstone_mask()
        if host_mask is not None:
            self._mask = np.ones(space.padded_rows, dtype=np.float32)
            self._mask[: space.num_vectors] = (~host_mask).astype(np.float32)
        else:
            self._mask = None
        self._host_ids = space.ids()

    def search(self, queries, k: int = 10):
        """Stream all chunks and return a
        :class:`~metrovector_tpu.engine.SearchResult`."""
        from ..engine import DeviceSpace, SearchResult
        from ..ops.distances import distances_np

        sp = self.space
        q_meta = sp.quantization
        helper = DeviceSpace(
            data=jnp.zeros((0, sp.padded_dim), dtype=self._block.dtype),
            norms=jnp.zeros((0,), jnp.float32),
            num_valid=sp.num_vectors, dim=sp.dim, metric=self.metric,
            scale=self.scale,
            zero_point=q_meta.zero_point if q_meta else 0.0,
            dtype=self.dtype,
        )
        uint8_offset = (
            self.dtype == DataType.UINT8
            and self.metric != DistanceMetric.COSINE
        )
        # uint8 + cosine: normalized float queries can't quantize exactly,
        # so each chunk is dequantized host-side to f32 ((c − zp)·scale —
        # memory-speed numpy) and served by the exact f32 HIGHEST kernel.
        # Costs 4× the upload bytes of the code chunk; correctness first.
        uint8_cosine = self.dtype == DataType.UINT8 and not uint8_offset
        zp = q_meta.zero_point if q_meta else 0.0
        prep = helper.prepare_queries(queries)
        qdev, qnorms = prep.qdev, prep.sq_norms
        nq = qdev.shape[0]
        if sp.num_vectors == 0:
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
        k_eff = min(k, sp.num_vectors)

        cr = self.chunk_rows
        total = sp.padded_rows
        nchunks = -(-total // cr)
        put = (
            (lambda x: jax.device_put(x, self.device))
            if self.device
            else jax.device_put
        )

        best_s = jnp.full((nq, k_eff), -jnp.inf, jnp.float32)
        best_i = jnp.full((nq, k_eff), -1, jnp.int32)

        # Pre-issue the first upload, then pipeline: while the kernel chews
        # chunk j, the (async) H2D copy of chunk j+1 is in flight.
        def slice_chunk(j):
            lo = j * cr
            hi = min(lo + cr, total)
            blk = self._block[lo:hi]
            if blk.dtype == np.float16:
                # host-side upcast: device-side f16 casts are ~3 MB/s on
                # TPU (see fused_topk); numpy does this at memory speed
                blk = blk.astype(np.float32)
            if uint8_cosine:
                blk = (blk.astype(np.float32) - zp) * self.scale
            nrm = self._norms[lo:hi]
            msk = self._mask[lo:hi] if self._mask is not None else None
            bias = None
            pad = cr - (hi - lo)
            nvalid_here = int(np.clip(sp.num_vectors - lo, 0, hi - lo))
            if uint8_offset:
                # Re-center this chunk's codes (c' = c − 128 over the
                # logical region) and compute the per-row code sums.
                shifted = blk.astype(np.int16) - 128
                shifted[:, sp.dim :] = 0
                shifted[nvalid_here:, :] = 0
                bias = shifted[:, : sp.dim].sum(
                    axis=1, dtype=np.int32
                ).astype(np.float32)
                blk = shifted.astype(np.int8)
            if pad:  # keep shapes static for the jitted kernel
                blk = np.pad(blk, ((0, pad), (0, 0)))
                nrm = np.pad(nrm, (0, pad))
                if msk is not None:
                    msk = np.pad(msk, (0, pad))
                if bias is not None:
                    bias = np.pad(bias, (0, pad))
            return blk, nrm, msk, bias

        def upload(j):
            blk, nrm, msk, bias = slice_chunk(j)
            return (
                put(blk), put(nrm),
                (put(msk) if msk is not None else None),
                (put(bias) if bias is not None else None),
            )

        nxt = upload(0)
        for j in range(nchunks):
            blk_d, nrm_d, msk_d, bias_d = nxt
            if j + 1 < nchunks:
                nxt = upload(j + 1)
            nvalid_local = np.int32(
                np.clip(sp.num_vectors - j * cr, 0, cr)
            )
            s, i = fused_topk(
                qdev, blk_d, nrm_d, nvalid_local, k_eff, self.metric,
                valid_mask=msk_d, scale=prep.dot_scale,
                bias_row=bias_d, bias_scale=prep.bias_scale,
                interpret=self.interpret,
            )
            i = jnp.where(i >= 0, i + j * cr, i)
            best_s, best_i = _merge_topk(best_s, best_i, s, i, k_eff)

        s = np.asarray(best_s)
        i = np.asarray(best_i)
        if prep.const is not None:
            mult = 2.0 if self.metric == DistanceMetric.L2 else 1.0
            s = s + mult * prep.const[:, None]
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
        return SearchResult(indices=i, scores=s, distances=dist,
                            metric=self.metric,
                            ids=_ids_for(self._host_ids, i))
