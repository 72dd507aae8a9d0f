"""Product quantization (PQ): MXU training/encoding + LUT-matmul ADC search.

The reference *declares* PQ in its extensions schema — ``QuantizationInfo``
with product-quantization codebook blocks (``schema/extensions.fbs:6-30`` in
thegenem0/metrovector) — but no code ever writes or reads them (SURVEY.md
§2). Here PQ is implemented for real, designed TPU-first:

* **Training** splits the dimension axis into ``m`` subspaces of
  ``dsub = D/m`` dims and runs the same MXU k-means as IVF
  (:func:`..index.ivf.train_kmeans`) per subspace, producing codebooks
  ``[m, ksub, dsub]``.
* **Encoding** is a blocked nearest-centroid assignment per subspace
  (batched ``argmax 2x·c − ‖c‖²`` matmuls), yielding uint8 codes ``[N, m]``
  — a ``4·D/m``× compression of an f32 corpus.
* **Search** is asymmetric distance computation (ADC) re-expressed as a
  **single MXU matmul per block**: the per-query lookup table
  ``LUT[q, j·ksub + c] = q_j · C[j, c]`` is a small ``[Q, m·ksub]`` matrix,
  and code one-hots ``[block, m·ksub]`` × ``LUTᵀ`` accumulate
  ``Σ_j q_j · C[j, code_j]`` — the classic per-lane LUT *gather* of
  CPU/GPU PQ (which TPUs lack) becomes a dense matmul the MXU is built
  for. Reconstruction norms ``‖x̂‖²`` are precomputed at encode time, so
  L2/cosine use the same epilogue algebra as the exact engine.
* **Re-ranking**: PQ scores are approximate by construction; ``rerank=R``
  rescores the top-R PQ candidates against the original vectors with
  f32-exact matmuls (device gather + batched einsum), recovering
  recall@k ≈ 1.0 at a fraction of exact-search bandwidth.

Design note (honest trade-off): the one-hot formulation spends
``m·ksub / D`` × more MACs than an exact matmul, so on-chip PQ is a
**memory/bandwidth** optimization (HBM capacity and host→HBM streaming
shrink by ``4·D/m``×), not a FLOP optimization — TPUs trade abundant MXU
FLOPs for the absent gather unit. ``ksub=16`` (ScaNN-style 4-bit AH) keeps
the MAC overhead at ~4× in bf16 (cheaper than f32-HIGHEST exact passes);
``ksub=256`` is classic byte-code PQ with better quantization quality.

Persistence round-trips through MVT blocks (codebooks + codes +
reconstruction norms) referenced from ``SpaceInfo.pq`` — completing the
extensions story the reference left declarative-only.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..format.constants import DistanceMetric
from ..ops.distances import _gather_auto, distances_np
from ..utils.transfer import put_chunked
from .ivf import train_kmeans

# Plain Python float: a module-level jnp scalar would initialize the
# XLA backend at import time, breaking jax.distributed.initialize
# in multi-process programs. Weak-typed, so traced uses are identical.
_NEG_INF = float("-inf")


# ------------------------------------------------------------- training ---


def train_pq(
    data: np.ndarray,
    m: int = 16,
    ksub: int = 256,
    iters: int = 10,
    seed: int = 0,
    sample: int | None = 262_144,
) -> np.ndarray:
    """Train PQ codebooks on ``data`` ``[N, D]`` (host f32). ``D`` must be
    divisible by ``m``. Returns codebooks ``[m, ksub, dsub]`` f32. Each
    subspace is an independent k-means problem solved on the accelerator."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    n, d = data.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    ksub = min(ksub, n)
    books = np.empty((m, ksub, dsub), np.float32)
    for j in range(m):
        sub = np.ascontiguousarray(data[:, j * dsub : (j + 1) * dsub])
        books[j], _ = train_kmeans(
            sub, ksub, iters=iters, seed=seed + j, sample=sample
        )
    return books


@functools.partial(jax.jit, static_argnames=("block_rows",))
def _encode_blocked(data, books, block_rows: int = 8192):
    """Nearest-centroid codes per subspace: ``[N, m]`` int32 (callers cast
    to uint8). Blocked over rows; assignment is batched MXU matmuls."""
    n, d = data.shape
    m, ksub, dsub = books.shape
    b_norms = jnp.einsum(
        "mkd,mkd->mk", books, books, precision=jax.lax.Precision.HIGHEST
    )
    nblocks = -(-n // block_rows)
    pad = nblocks * block_rows - n
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
    blocks = data.reshape(nblocks, block_rows, m, dsub)

    def step(_, blk):
        dots = jnp.einsum(
            "nmd,mkd->nmk", blk, books,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        scores = 2.0 * dots - b_norms[None, :, :]
        return _, jnp.argmax(scores, axis=2).astype(jnp.int32)

    _, codes = jax.lax.scan(step, None, blocks)
    return codes.reshape(-1, m)[:n]


def encode_pq(data: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Encode rows to PQ codes ``[N, m]`` uint8 (``ksub ≤ 256``)."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    books = np.ascontiguousarray(codebooks, dtype=np.float32)
    if books.shape[1] > 256:
        raise ValueError("ksub > 256 does not fit uint8 codes")
    codes = np.asarray(_encode_blocked(jax.device_put(data), jax.device_put(books)))
    return codes.astype(np.uint8)


def pack_codes4(codes: np.ndarray) -> np.ndarray:
    """Nibble-pack 4-bit PQ codes ``[N, m]`` (values < 16) to
    ``[N, ⌈m/2⌉]`` uint8 — even subspaces in low nibbles, odd in high
    (the layout :func:`..ops.adc_kernel.fused_adc_topk` unpacks with
    ``packed4=True``). Odd ``m`` pads a zero high nibble."""
    codes = np.asarray(codes, np.uint8)
    if codes.max(initial=0) > 15:
        raise ValueError("pack_codes4 requires 4-bit codes (ksub <= 16)")
    n, m = codes.shape
    if m % 2:
        codes = np.concatenate(
            [codes, np.zeros((n, 1), np.uint8)], axis=1
        )
    return (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)


def unpack_codes4(packed: np.ndarray, m: int) -> np.ndarray:
    """Inverse of :func:`pack_codes4`: ``[N, ⌈m/2⌉]`` → ``[N, m]``."""
    packed = np.asarray(packed, np.uint8)
    n = packed.shape[0]
    out = np.empty((n, 2 * packed.shape[1]), np.uint8)
    out[:, 0::2] = packed & 15
    out[:, 1::2] = packed >> 4
    return out[:, :m]


def reconstruct_pq(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Decode codes back to approximate vectors ``[N, D]`` f32 (host)."""
    m, ksub, dsub = codebooks.shape
    codes = np.asarray(codes)
    out = np.empty((codes.shape[0], m * dsub), np.float32)
    for j in range(m):
        out[:, j * dsub : (j + 1) * dsub] = codebooks[j, codes[:, j]]
    return out


# ------------------------------------------------------------ ADC search ---


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "block_rows", "exact_lut")
)
def _adc_search(
    q,
    codes_onehot_src,  # [N, m] int32 codes
    flat_books,  # [m*ksub, dsub] f32 — codebooks flattened over (j, c)
    recon_norms,  # [N] f32 ‖x̂‖²
    num_valid,
    k: int,
    metric: DistanceMetric,
    valid_mask=None,
    block_rows: int = 4096,
    exact_lut: bool = True,
):
    """ADC top-k over PQ codes. Per block: one-hot the codes over the
    flattened ``(subspace, centroid)`` axis and matmul against the per-query
    LUT — Σ_j q_j·C[j, code_j] in one MXU pass. ``exact_lut=True`` runs the
    one-hot matmul at f32 HIGHEST so scores equal the f64 ADC oracle to f32
    rounding (bit-for-rank in tests); ``False`` uses bf16 inputs on the MXU
    default path (~3 decimal digits — fine under re-ranking)."""
    metric = DistanceMetric(metric)
    codes = codes_onehot_src
    n, m = codes.shape
    mk, dsub = flat_books.shape
    ksub = mk // m
    nq, d = q.shape

    # LUT [Q, m*ksub]: dot of each query's subvector j with centroid (j, c).
    lut = jnp.einsum(
        "qmd,mkd->qmk",
        q.reshape(nq, m, dsub),
        flat_books.reshape(m, ksub, dsub),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(nq, mk)

    qin = None
    if metric == DistanceMetric.COSINE:
        qnorm = jnp.sum(q.astype(jnp.float32) ** 2, axis=-1)
        qin = jax.lax.rsqrt(jnp.maximum(qnorm, 1e-30))

    if exact_lut:
        lut_t, oh_dtype, prec = lut.T, jnp.float32, jax.lax.Precision.HIGHEST
    else:
        lut_t, oh_dtype, prec = (
            lut.T.astype(jnp.bfloat16),
            jnp.bfloat16,
            jax.lax.Precision.DEFAULT,
        )

    nblocks = -(-n // block_rows)
    pad = nblocks * block_rows - n
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        recon_norms = jnp.pad(recon_norms, (0, pad))
        if valid_mask is not None:
            valid_mask = jnp.pad(valid_mask, (0, pad))
    cols_b = codes.reshape(nblocks, block_rows, m)
    norms_b = recon_norms.reshape(nblocks, block_rows)
    mask_b = (
        valid_mask.reshape(nblocks, block_rows) if valid_mask is not None else None
    )
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ksub), 2)

    def block_scores(cols, nrm):
        # Per-subspace one-hot [B, m, ksub] (B·m·ksub compares, not
        # B·m·m·ksub) reshaped to the flattened multi-hot [B, m·ksub]:
        # position (row, j·ksub + code[row, j]) holds 1.
        onehot = (cols[:, :, None] == iota_k).astype(oh_dtype)
        s1 = jax.lax.dot_general(
            onehot.reshape(-1, mk),
            lut_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [B, Q] = Σ_j LUT[q, col(row, j)]
        s1 = s1.T  # [Q, B]
        if metric == DistanceMetric.L2:
            return 2.0 * s1 - nrm[None, :]
        if metric == DistanceMetric.COSINE:
            inv = jax.lax.rsqrt(jnp.maximum(nrm, 1e-30))
            return s1 * inv[None, :] * qin[:, None]
        return s1

    def step(carry, xs):
        best_s, best_i = carry
        if mask_b is None:
            i, cols, nrm = xs
            msk = None
        else:
            i, cols, nrm, msk = xs
        s = block_scores(cols, nrm)
        rows = i * block_rows + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_rows), 1
        )
        s = jnp.where(rows < num_valid, s, _NEG_INF)
        if msk is not None:
            s = jnp.where(msk[None, :] != 0, s, _NEG_INF)
        cand_s = jnp.concatenate([best_s, s], axis=1)
        idx = i * block_rows + jax.lax.broadcasted_iota(
            jnp.int32, (nq, block_rows), 1
        )
        cand_i = jnp.concatenate([best_i, idx], axis=1)
        top_s, pos = jax.lax.top_k(cand_s, k)
        top_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return (top_s, top_i), None

    init = (
        jnp.full((nq, k), _NEG_INF, dtype=jnp.float32),
        jnp.full((nq, k), -1, dtype=jnp.int32),
    )
    xs = (jnp.arange(nblocks, dtype=jnp.int32), cols_b, norms_b)
    if mask_b is not None:
        xs = xs + (mask_b,)
    (best_s, best_i), _ = jax.lax.scan(step, init, xs)
    best_i = jnp.where(best_s > _NEG_INF, best_i, -1)
    return best_s, best_i


def _rerank(q, db, db_norms, cand_idx, k: int, metric: DistanceMetric):
    """Exact rescoring of PQ candidates: gather candidate rows and run the
    engine's f32-HIGHEST score algebra over the tiny ``[Q, R]`` candidate
    set. Invalid candidates (idx −1) are masked to −inf.

    The row gather routes through the DMA kernel
    (:func:`~..ops.gather_kernel.gather_rows`) only in its measured win
    region — wide rows and a small candidate set
    (:func:`~..ops.gather_kernel.auto_select`). At SIFT-like D=128 the
    XLA gather amortizes better at rerank row counts (RESULTS.md r5),
    so typical PQ re-ranks stay on ``jnp.take``; a wide-D corpus with a
    shallow rerank picks up the DMA win automatically."""
    use_dma = _gather_auto(db, int(np.prod(cand_idx.shape)))
    return _rerank_impl(
        q, db, db_norms, cand_idx, k, DistanceMetric(metric), use_dma, False
    )


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "pallas_gather", "interpret")
)
def _rerank_impl(
    q, db, db_norms, cand_idx, k: int, metric: DistanceMetric,
    pallas_gather, interpret=False,
):
    safe = jnp.maximum(cand_idx, 0)
    if pallas_gather:
        from ..ops.gather_kernel import gather_rows

        vecs = gather_rows(
            db, safe.reshape(-1).astype(jnp.int32), interpret=interpret
        )
    else:
        vecs = jnp.take(db, safe.reshape(-1), axis=0)
    vecs = vecs.reshape(
        cand_idx.shape[0], cand_idx.shape[1], db.shape[1]
    )
    nrm = jnp.take(db_norms, safe.reshape(-1), axis=0).reshape(cand_idx.shape)
    dots = jnp.einsum(
        "qd,qrd->qr", q, vecs,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    if metric == DistanceMetric.L2:
        s = 2.0 * dots - nrm
    elif metric == DistanceMetric.COSINE:
        qnorm = jnp.sum(q.astype(jnp.float32) ** 2, axis=-1)
        qin = jax.lax.rsqrt(jnp.maximum(qnorm, 1e-30))
        s = dots * jax.lax.rsqrt(jnp.maximum(nrm, 1e-30)) * qin[:, None]
    else:
        s = dots
    s = jnp.where(cand_idx >= 0, s, _NEG_INF)
    top_s, pos = jax.lax.top_k(s, k)
    top_i = jnp.take_along_axis(cand_idx, pos, axis=1)
    top_i = jnp.where(top_s > _NEG_INF, top_i, -1)
    return top_s, top_i


# -------------------------------------------------------------- the index ---


@dataclasses.dataclass
class PQIndex:
    """Product-quantized view of one space, resident on device as codes
    (``4·D/m``× smaller than the f32 rows it stands in for).

    ``codebooks``: host ``[m, ksub, dsub]`` f32; ``codes``: device
    ``[N, m]`` uint8 — or nibble-packed ``[N, ⌈m/2⌉]`` when ``packed4``
    (4-bit PQ, ``ksub ≤ 16``: half the HBM of byte codes at the same m,
    and a 16× smaller one-hot expansion in the ADC kernel — the measured
    deep100m bottleneck); ``recon_norms``: device ``[N]`` f32
    squared norms of the *reconstructed* rows; ``db``/``db_norms``:
    optional device originals enabling exact re-ranking."""

    codebooks: np.ndarray
    codes: jax.Array
    recon_norms: jax.Array
    metric: DistanceMetric
    dim: int
    num_vectors: int
    db: jax.Array | None = None
    db_norms: jax.Array | None = None
    valid: jax.Array | None = None  # 1 = live, 0 = tombstoned
    packed4: bool = False
    # Host-side stable u64 ID column (reference ``schema/core.fbs:54``
    # semantics); result positions translate through it so ids stay valid
    # across compaction, like every brute-force surface.
    host_ids: np.ndarray | None = None
    # Preferred ADC scan tile (None = the static ``default_adc_block_rows``
    # cost model). Set by :meth:`autotune` — the family where the static
    # model's measured miss was worst (auto 3072 vs best 1024 ran 77×
    # slower on the 4-bit biased path, ``benchmarks/RESULTS.md``) — or
    # adopted from persisted hints by :meth:`from_space`.
    adc_block_rows: int | None = None
    # File-backed origin (enables autotune(persist=True)); not part of the
    # value identity of the index.
    _host_space: object | None = dataclasses.field(
        default=None, repr=False, compare=False
    )
    _vmem_retry: bool = dataclasses.field(
        default=True, repr=False, compare=False
    )

    @classmethod
    def build(
        cls,
        vectors: np.ndarray,
        metric: DistanceMetric,
        m: int = 16,
        ksub: int = 256,
        iters: int = 10,
        seed: int = 0,
        codebooks: np.ndarray | None = None,
        codes: np.ndarray | None = None,
        recon_norms: np.ndarray | None = None,
        keep_vectors: bool = True,
        valid_mask: np.ndarray | None = None,
        ids: np.ndarray | None = None,
        pack4: bool | None = None,
    ) -> "PQIndex":
        """Train (or accept precomputed) codebooks, encode, and upload. With
        ``keep_vectors`` the originals stay on device for re-ranking; without
        it only codes occupy HBM (the capacity-scaling mode). Passing
        everything precomputed (as persisted by ``Builder.set_pq_index``)
        skips training, encoding and reconstruction. ``pack4``: store the
        codes nibble-packed (4-bit PQ, requires ``ksub ≤ 16`` — half the
        HBM and the fast ADC path for narrow subspaces). Opt-in (packing
        changes the public ``codes`` layout); precomputed codes whose
        column count is ``⌈m/2⌉`` are recognized as already packed."""
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        n, d = vectors.shape
        if codebooks is None:
            codebooks = train_pq(vectors, m=m, ksub=ksub, iters=iters, seed=seed)
        codebooks = np.ascontiguousarray(codebooks, dtype=np.float32)
        m_eff, ksub_eff, _ = codebooks.shape
        already_packed = False
        if codes is None:
            codes = encode_pq(vectors, codebooks)
        else:
            codes = np.asarray(codes, np.uint8)
            already_packed = (
                codes.shape[1] == (m_eff + 1) // 2 and codes.shape[1] != m_eff
            )
        if pack4 is None:
            pack4 = already_packed
        if pack4 and ksub_eff > 16:
            raise ValueError(f"pack4 requires ksub <= 16, got {ksub_eff}")
        if recon_norms is None:
            recon = reconstruct_pq(
                unpack_codes4(codes, m_eff) if already_packed else codes,
                codebooks,
            )
            recon_norms = np.einsum(
                "ij,ij->i", recon.astype(np.float64), recon.astype(np.float64)
            ).astype(np.float32)
        if pack4 and not already_packed:
            codes = pack_codes4(codes)
        recon_norms = np.ascontiguousarray(recon_norms, dtype=np.float32)
        db = db_norms = None
        if keep_vectors:
            db = put_chunked(vectors)
            db_norms = jax.device_put(
                np.einsum(
                    "ij,ij->i",
                    vectors.astype(np.float64),
                    vectors.astype(np.float64),
                ).astype(np.float32)
            )
        valid = None
        if valid_mask is not None:
            valid = jax.device_put(
                (~np.asarray(valid_mask, dtype=bool)).astype(np.int32)
            )
        if ids is not None:
            ids = np.ascontiguousarray(ids, dtype=np.uint64).reshape(-1)
        return cls(
            codebooks=codebooks,
            codes=put_chunked(np.asarray(codes, np.uint8)),
            recon_norms=jax.device_put(recon_norms),
            metric=DistanceMetric(metric),
            dim=d,
            num_vectors=n,
            db=db,
            db_norms=db_norms,
            valid=valid,
            host_ids=ids,
            packed4=bool(pack4),
        )

    @classmethod
    def from_space(
        cls,
        space,
        m: int = 16,
        ksub: int = 256,
        iters: int = 10,
        seed: int = 0,
        keep_vectors: bool = True,
    ) -> "PQIndex":
        """Build the search-ready index for a host
        :class:`~metrovector_tpu.vectors.space.VectorSpace`, reusing
        codebooks/codes persisted in the file when present (O(1)-open:
        no retraining, no re-encoding). Tombstoned rows are masked."""
        stored = space.pq_arrays()
        codebooks = codes = stored_rnorms = None
        if stored is not None and not space.info.pq.residual:
            # Residual sidecars encode x − centroid and belong to
            # :class:`.ivfpq.IVFPQIndex`; plain PQ retrains on raw rows.
            codebooks, codes, stored_rnorms = stored
        if stored_rnorms is not None and not keep_vectors:
            # Code-only fast path: everything needed lives in the sidecar —
            # never touch (or page in) the dense rows.
            valid = None
            mask = space.tombstone_mask()
            if mask is not None:
                valid = jax.device_put((~mask).astype(np.int32))
            idx = cls(
                codebooks=np.ascontiguousarray(codebooks, np.float32),
                codes=put_chunked(np.ascontiguousarray(codes, np.uint8)),
                recon_norms=jax.device_put(
                    np.ascontiguousarray(stored_rnorms, np.float32)
                ),
                metric=DistanceMetric(space.metric),
                dim=space.dim,
                num_vectors=space.num_vectors,
                valid=valid,
                host_ids=space.ids(),
                packed4=bool(space.info.pq.packed4),
            )
            return cls._adopt_hints(idx, space)
        vectors = np.asarray(space.to_numpy(), dtype=np.float32)
        q = space.quantization
        if q is not None:
            vectors = (vectors - q.zero_point) * q.scale
        idx = cls.build(
            vectors,
            space.metric,
            m=m,
            ksub=ksub,
            iters=iters,
            seed=seed,
            codebooks=codebooks,
            codes=codes,
            recon_norms=stored_rnorms,
            keep_vectors=keep_vectors,
            valid_mask=space.tombstone_mask(),
            ids=space.ids(),
        )
        return cls._adopt_hints(idx, space)

    @staticmethod
    def _adopt_hints(idx, space):
        """Adopt a persisted tuned ADC tiling (``autotune(persist=True)``
        wrote it into the file's PerformanceHints) and remember the
        file-backed origin so :meth:`autotune` can persist back."""
        from ..utils.tune import tuned_hints

        h = tuned_hints(space, "adc")
        if h.get("block_rows"):
            idx.adc_block_rows = int(h["block_rows"])
        idx._host_space = space
        return idx

    @property
    def m(self) -> int:
        return int(self.codebooks.shape[0])

    @property
    def ksub(self) -> int:
        return int(self.codebooks.shape[1])

    @property
    def code_bytes_per_vector(self) -> int:
        return (self.m + 1) // 2 if self.packed4 else self.m

    # -- online mutation ------------------------------------------------------

    def add_rows(
        self, vectors: np.ndarray, ids=None, reserve: float = 1.5
    ) -> None:
        """Encode new rows with the EXISTING codebooks and append to the
        live coded corpus (no retraining — quantization error for data far
        outside the trained distribution grows accordingly; retrain via
        ``build`` when drift matters). Device arrays grow in capacity
        steps (``reserve`` factor) so kernel shapes stay stable and
        recompiles amortize, mirroring ``DeviceSpace.add_rows`` — including
        its ID contract: appends must carry ``ids`` iff the index has an ID
        column."""
        from ..errors import DimensionMismatchError

        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None]
        if vectors.shape[1] != self.dim:
            raise DimensionMismatchError(
                expected=self.dim, actual=int(vectors.shape[1])
            )
        from ..engine import merged_append_ids

        n_new = vectors.shape[0]
        merged_ids = merged_append_ids(
            self.host_ids, ids, n_new, self.num_vectors
        )
        codes_new = encode_pq(vectors, self.codebooks)
        recon = reconstruct_pq(codes_new, self.codebooks)
        rn_new = np.einsum(
            "ij,ij->i", recon.astype(np.float64), recon.astype(np.float64)
        ).astype(np.float32)
        if self.packed4:
            codes_new = pack_codes4(codes_new)

        total = self.num_vectors + n_new
        cap = int(self.codes.shape[0])
        if total > cap:
            cap = max(
                -(-total // 128) * 128,
                -(-int(cap * reserve) // 128) * 128,
            )

        def grown(old_dev, new_host, fill=0.0, dtype=None):
            old = np.asarray(old_dev)
            dtype = dtype or old.dtype
            out = np.full((cap,) + old.shape[1:], fill, dtype=dtype)
            out[: self.num_vectors] = old[: self.num_vectors]
            out[self.num_vectors : total] = new_host
            return jax.device_put(out)

        self.codes = grown(self.codes, codes_new)
        self.recon_norms = grown(self.recon_norms, rn_new)
        if self.db is not None:
            vn = np.einsum(
                "ij,ij->i",
                vectors.astype(np.float64),
                vectors.astype(np.float64),
            ).astype(np.float32)
            self.db = grown(self.db, vectors)
            self.db_norms = grown(self.db_norms, vn)
        if self.valid is not None:
            self.valid = grown(
                self.valid, np.ones(n_new, np.int32), fill=1
            )
        if merged_ids is not None:
            self.host_ids = merged_ids
        self.num_vectors = total

    def delete_rows(self, rows) -> None:
        """Tombstone coded rows by position; they can never surface in
        results afterwards."""
        from ..errors import IndexOutOfBoundsError

        idx = [int(r) for r in np.atleast_1d(rows)]
        for r in idx:
            if r < 0 or r >= self.num_vectors:
                raise IndexOutOfBoundsError(r, self.num_vectors)
        valid = (
            np.asarray(self.valid)
            if self.valid is not None
            else np.ones(int(self.codes.shape[0]), np.int32)
        ).copy()
        valid[np.asarray(idx, np.int64)] = 0
        self.valid = jax.device_put(valid.astype(np.int32))

    def recommended_rerank(self, k: int = 10, recall_target: float = 1.0) -> int:
        """Rerank depth expected to reach ``recall_target`` at this ``k``
        (the plain-PQ mirror of ``IVFPQIndex.recommended_rerank``, anchored
        at the same measurements: ``rerank = 40·k`` reached recall 1.000 on
        both the 8-bit m=16/ksub=256 and 4-bit m=32/ksub=16 configs on a
        1M×128 clustered corpus — ``benchmarks/RESULTS.md`` §4-bit plain
        PQ). Guidance for corpora of similar difficulty, not a guarantee;
        returns 0 when the raw ADC scan alone is expected to meet the
        target. Requires ``keep_vectors`` originals to actually rerank."""
        if not 0.0 < recall_target <= 1.0:
            raise ValueError(
                f"recall_target must be in (0, 1], got {recall_target}"
            )
        raw = 0.63 if self.packed4 else 0.72
        if recall_target <= raw:
            return 0
        if recall_target >= 0.99:
            factor = 40
        elif recall_target >= 0.9:
            factor = 20
        else:
            factor = 12 if self.packed4 else 10
        return factor * k

    def prepare_filter(self, filter_mask):
        """Upload a ``[num_vectors]`` boolean/int row predicate once and
        return a :class:`~metrovector_tpu.engine.PreparedFilter` reusable
        across :meth:`search` calls (the serving path for a hot predicate).
        Composed with the live tombstone plane at launch, so deletions
        made after preparation are still honored. Invalidated by
        :meth:`add_rows` (capacity growth changes the padded length)."""
        from ..engine import PreparedFilter
        from ..utils.filters import padded_filter_plane

        full = padded_filter_plane(
            filter_mask, self.num_vectors, self.codes.shape[0], np.int32
        )
        return PreparedFilter(
            mask=jax.device_put(full), num_valid=self.num_vectors
        )

    def _effective_mask(self, filter_mask):
        """Compose the user predicate (raw array or PreparedFilter) with
        the tombstone plane into the kernel's validity input."""
        if filter_mask is None:
            return self.valid
        from ..engine import PreparedFilter
        from ..utils.filters import checked_prepared_mask

        if isinstance(filter_mask, PreparedFilter):
            fdev = checked_prepared_mask(
                filter_mask, self.num_vectors, self.codes.shape[0]
            )
        else:
            fdev = self.prepare_filter(filter_mask).mask
        if self.valid is None:
            return fdev
        return self.valid * fdev.astype(self.valid.dtype)

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        rerank: int = 0,
        exact_lut: bool = True,
        block_rows: int | None = None,
        backend: str = "auto",
        int8_lut: bool = False,
        filter_mask=None,
    ):
        """Approximate top-k by ADC over the codes. ``rerank=R`` (R ≥ k)
        rescores the top-R ADC candidates against the original vectors
        (requires ``keep_vectors``/``db``), typically recovering
        recall@k ≈ 1.0 with R ≈ 4–8·k. ``backend``: 'pallas' (fused
        kernel, the TPU fast path), 'xla' (scan formulation), or 'auto'
        (pallas on TPU, xla elsewhere — the Pallas interpreter is too slow
        for CPU serving). ``filter_mask``: optional ``[num_vectors]``
        boolean/int row predicate (or a prepared one from
        :meth:`prepare_filter`) — rows with 0 are excluded from the ADC
        scan itself (so the ``rerank`` candidate pool is all
        filter-passing), composed with tombstones exactly like the dense
        engine (``SearchEngine.search``). Under very low selectivity,
        raise ``rerank`` — recall within the filtered subset is bounded by
        how many passing rows the ADC fetch surfaces. Returns a
        ``SearchResult``."""
        from ..engine import SearchResult

        q = np.ascontiguousarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        if q.shape[1] != self.dim:
            from ..errors import DimensionMismatchError

            raise DimensionMismatchError(expected=self.dim, actual=int(q.shape[1]))
        qnorms = np.einsum("ij,ij->i", q, q, dtype=np.float64).astype(np.float32)
        qdev = jax.device_put(q)
        eff_valid = self._effective_mask(filter_mask)
        if block_rows is None:
            block_rows = self.adc_block_rows
        fetch = max(k, rerank) if rerank else k
        fetch = min(fetch, self.num_vectors) or 1
        on_tpu = jax.default_backend() == "tpu"
        use_pallas = backend == "pallas" or (backend == "auto" and on_tpu)
        if int8_lut and not use_pallas:
            raise ValueError(
                "int8_lut exists only in the pallas ADC kernel; the xla "
                "branch would silently serve exact-LUT results instead"
            )
        if use_pallas:
            from ..ops.adc_kernel import fused_adc_topk

            qk = qdev
            if self.metric == DistanceMetric.COSINE:
                qk = qdev * jax.lax.rsqrt(
                    jnp.maximum(jnp.sum(qdev * qdev, axis=1, keepdims=True),
                                1e-30)
                )
            s, i = fused_adc_topk(
                qk,
                self.codes,
                jnp.asarray(self.codebooks),
                self.recon_norms,
                jnp.int32(self.num_vectors),
                fetch,
                self.metric,
                valid_mask=eff_valid,
                exact_lut=exact_lut and not int8_lut,
                block_rows=block_rows,
                interpret=not on_tpu,
                int8_lut=int8_lut,
                packed4=self.packed4,
                vmem_retry=self._vmem_retry,
            )
        else:
            flat_books = jnp.asarray(
                self.codebooks.reshape(-1, self.codebooks.shape[2])
            )
            codes_xla = self.codes
            if self.packed4:
                # the scan formulation wants byte codes; unpack on device
                # (transient [N, m] u8 — the xla branch is the CPU/serving
                # fallback, not the capacity path)
                codes_xla = jnp.stack(
                    [self.codes & 15, self.codes >> 4], axis=2
                ).reshape(self.codes.shape[0], -1)[:, : self.m]
            s, i = _adc_search(
                qdev,
                codes_xla,
                flat_books,
                self.recon_norms,
                jnp.int32(self.num_vectors),
                fetch,
                self.metric,
                valid_mask=eff_valid,
                block_rows=min(block_rows or 4096, max(8, self.codes.shape[0])),
                exact_lut=exact_lut,
            )
        if rerank:
            if self.db is None:
                raise ValueError(
                    "rerank requires the original vectors "
                    "(build with keep_vectors=True)"
                )
            s, i = _rerank(qdev, self.db, self.db_norms, i, min(k, fetch), self.metric)
        else:
            s, i = s[:, :k], i[:, :k]
        s, i = np.asarray(s), np.asarray(i)
        dist = distances_np(s, self.metric, qnorms)
        bad_fill = np.inf if self.metric == DistanceMetric.L2 else -np.inf
        dist = np.where(i >= 0, dist, bad_fill)
        if s.shape[1] < k:
            pad = ((0, 0), (0, k - s.shape[1]))
            i = np.pad(i, pad, constant_values=-1)
            s = np.pad(s, pad, constant_values=-np.inf)
            dist = np.pad(dist, pad, constant_values=bad_fill)
        from ..engine import ids_for_rows

        return SearchResult(
            indices=i, scores=s, distances=dist, metric=self.metric,
            ids=ids_for_rows(self.host_ids, i),
        )

    def autotune(self, queries=None, k: int = 10, batch: int = 128,
                 block_rows_candidates=None, iters: int = 3,
                 apply: bool = True, persist: bool = False,
                 **search_kw) -> list[dict]:
        """Measure candidate ADC ``block_rows`` with single-launch timings
        (one launch, one forced readback each) and optionally apply the
        fastest as this index's default scan tile.

        This is the kernel family where the static cost model
        (``default_adc_block_rows``) missed worst in practice: on the
        4-bit biased path its auto pick of 3072 ran **77× slower** than
        the measured best 1024 (``benchmarks/RESULTS.md`` §4-bit IVF-PQ)
        — a silent Mosaic VMEM-spill cliff that only a timed launch
        exposes. The default candidate list includes the static model's
        own pick so the report shows whether it was right.

        ``**search_kw`` reaches :meth:`search` (e.g. ``rerank=``,
        ``int8_lut=``, ``backend=``) so the measured configuration is the
        served one. A VMEM-OOMing candidate records ``ms=inf`` and its
        error instead of the kernel's silently-halved retry tiling.
        ``apply=True`` sets :attr:`adc_block_rows`; ``persist=True``
        additionally writes it into the source file's PerformanceHints
        (``hints["tuned"][space]["adc"]``) — requires an index built via
        :meth:`from_space` on a file-backed space."""
        from ..ops.adc_kernel import default_adc_block_rows
        from ..utils.tune import measure_candidates

        if persist and self._host_space is None:
            raise ValueError(
                "persist requires an index built from a file-backed "
                "VectorSpace (PQIndex.from_space)"
            )
        if queries is None:
            queries = np.random.default_rng(0).standard_normal(
                (batch, self.dim)
            ).astype(np.float32)
        if block_rows_candidates is None:
            model_pick = default_adc_block_rows(
                self.m, self.ksub,
                exact_lut=bool(search_kw.get("exact_lut", True))
                and not search_kw.get("int8_lut", False),
                packed4=self.packed4,
            )
            block_rows_candidates = sorted(
                {512, 1024, 2048, 4096, model_pick}
            )
        candidates = [{"block_rows": int(br)} for br in block_rows_candidates]

        def run_with(cfg):
            def run():
                # search returns host arrays — the readback is inherent
                self.search(queries, k=k, block_rows=cfg["block_rows"],
                            **search_kw)
            return run

        self._vmem_retry = False
        try:
            results = measure_candidates(candidates, run_with, iters)
        finally:
            self._vmem_retry = True
        if apply and results and np.isfinite(results[0]["ms"]):
            self.adc_block_rows = results[0]["block_rows"]
            if persist:
                from ..utils.tune import persist_tuned

                persist_tuned(
                    self._host_space, "adc",
                    {"block_rows": self.adc_block_rows},
                )
        elif persist:
            raise RuntimeError(
                "nothing persisted: no finite-time winner to apply "
                f"(apply={apply})"
            )
        return results
