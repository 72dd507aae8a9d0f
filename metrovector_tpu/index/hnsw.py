"""HNSW: hierarchical navigable small-world graph index.

The reference declares an HNSW table in its index schema but its writer
stores ``graph_block_index: 0`` with a TODO and no graph is ever built or
searched (``src/builder.rs:459``, ``schema/index.fbs:25-30`` in
thegenem0/metrovector). Here HNSW is implemented for real (Malkov &
Yashunin 2016: greedy descent through sparse upper layers, beam search at
layer 0, heuristic-free closest-M neighbor selection).

Placement rationale (TPU-first means knowing what NOT to put on the TPU):
graph traversal is a chain of tiny data-dependent gathers — the exact
shape XLA TPU executes worst (see the measured gather-bound IVF-PQ probe,
``benchmarks/RESULTS.md``). HNSW therefore runs on the HOST with
numpy-vectorized candidate scoring, as the low-latency single-query
complement to the TPU engines: brute-force/ADC kernels win throughput at
any batch size; HNSW answers one query in sub-millisecond host time with
no device round-trip at all.

Persistence: per-layer compact adjacency (node-id list + fixed-width
neighbor rows) as ordinary CRC-checked MVT blocks via
``Builder.set_hnsw_index``; ``HNSWIndex.from_space`` reattaches without
rebuilding (O(1)-open philosophy).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..format.constants import DistanceMetric

_SENTINEL = -1


def _prep(vectors: np.ndarray, metric: DistanceMetric):
    """Return (rows, sq_norms) in the space where ranking == score order.
    Cosine reduces to inner product on L2-normalized rows; L2 and IP use
    the rows as-is."""
    rows = np.ascontiguousarray(vectors, np.float32)
    if metric == DistanceMetric.COSINE:
        n = np.linalg.norm(rows, axis=1, keepdims=True)
        rows = rows / np.maximum(n, 1e-30)
    norms = np.einsum("ij,ij->i", rows, rows).astype(np.float32)
    return rows, norms


def _scores(q: np.ndarray, rows: np.ndarray, norms: np.ndarray, ids,
            metric: DistanceMetric) -> np.ndarray:
    """Greater-is-better scores of ``q`` against ``rows[ids]`` (the
    engine's convention: L2 → 2q·x − ‖x‖²)."""
    sub = rows[ids]
    dots = sub @ q
    if metric == DistanceMetric.L2:
        return 2.0 * dots - norms[ids]
    return dots  # IP, and cosine (pre-normalized rows and query)


@dataclasses.dataclass
class HNSWIndex:
    """Host-side navigable small-world graph over one space.

    ``layers``: list (bottom-up) of ``(ids [N_L] i32, adj [N_L, width]
    i32)`` — ``adj`` rows are neighbor node ids (−1 padding) for the nodes
    in ``ids``; ``slot_of``: per-layer node-id → row lookup arrays."""

    rows: np.ndarray
    norms: np.ndarray
    layers: list[tuple[np.ndarray, np.ndarray]]
    entry: int
    metric: DistanceMetric
    m: int
    ef_construction: int
    valid: np.ndarray | None = None  # False = tombstoned

    def __post_init__(self):
        n = self.rows.shape[0]
        self.slot_of = []
        for ids, _ in self.layers:
            lut = np.full(n, _SENTINEL, np.int32)
            lut[ids] = np.arange(len(ids), dtype=np.int32)
            self.slot_of.append(lut)

    # ------------------------------------------------------------- build --

    @classmethod
    def build(
        cls,
        vectors: np.ndarray,
        metric: DistanceMetric,
        m: int = 16,
        ef_construction: int = 200,
        seed: int = 0,
        valid_mask: np.ndarray | None = None,
    ) -> "HNSWIndex":
        """Incremental insertion build. ``m``: neighbors per node on upper
        layers (``2m`` at layer 0); ``ef_construction``: beam width during
        construction. Tombstoned rows (``valid_mask`` True) are excluded
        from the graph entirely."""
        metric = DistanceMetric(metric)
        rows, norms = _prep(vectors, metric)
        n = rows.shape[0]
        rng = np.random.default_rng(seed)
        live = np.arange(n)
        if valid_mask is not None:
            live = live[~np.asarray(valid_mask, dtype=bool)]
        if len(live) == 0:
            return cls(rows, norms, [], _SENTINEL, metric, m, ef_construction,
                       valid=None)

        ml = 1.0 / np.log(max(m, 2))
        levels = np.minimum(
            (-np.log(rng.uniform(1e-12, 1.0, n)) * ml).astype(np.int32), 32
        )
        max_level = int(levels[live].max(initial=0))
        width0, width = 2 * m, m
        # adjacency as python dicts during build (node → int32 array)
        adj: list[dict[int, np.ndarray]] = [dict() for _ in range(max_level + 1)]
        entry = int(live[0])

        def beam(q, ep, ef, layer):
            """Best-first beam search on one layer from entry points ``ep``.
            Returns (ids, scores) of up to ``ef`` best, sorted best-first."""
            lad = adj[layer]
            ep = np.unique(np.asarray(ep, np.int64))
            visited = set(ep.tolist())
            sc = _scores(q, rows, norms, ep, metric)
            order = np.argsort(-sc, kind="stable")
            cand_ids = list(ep[order])
            cand_sc = list(sc[order])
            best_ids = list(cand_ids[:ef])
            best_sc = list(cand_sc[:ef])
            while cand_ids:
                c = cand_ids.pop(0)
                c_s = cand_sc.pop(0)
                if best_sc and c_s < best_sc[-1] and len(best_sc) >= ef:
                    break
                nbrs = lad.get(int(c))
                if nbrs is None or len(nbrs) == 0:
                    continue
                new = [v for v in nbrs.tolist() if v >= 0 and v not in visited]
                if not new:
                    continue
                visited.update(new)
                new = np.asarray(new, np.int64)
                ns = _scores(q, rows, norms, new, metric)
                worst = best_sc[-1] if len(best_sc) >= ef else -np.inf
                keep = ns > worst if len(best_sc) >= ef else np.ones(len(ns), bool)
                for v, s_v in zip(new[keep], ns[keep]):
                    # insert into both beams (sorted descending)
                    import bisect

                    pos = bisect.bisect_left([-x for x in best_sc], -s_v)
                    best_sc.insert(pos, float(s_v))
                    best_ids.insert(pos, int(v))
                    pos = bisect.bisect_left([-x for x in cand_sc], -s_v)
                    cand_sc.insert(pos, float(s_v))
                    cand_ids.insert(pos, int(v))
                if len(best_sc) > ef:
                    best_sc = best_sc[:ef]
                    best_ids = best_ids[:ef]
            return np.asarray(best_ids, np.int64), np.asarray(best_sc)

        def connect(node, neighbors, layer, cap):
            lad = adj[layer]
            lad[int(node)] = np.asarray(neighbors[:cap], np.int32)
            for v in neighbors[:cap]:
                cur = lad.get(int(v))
                merged = (
                    np.asarray([node], np.int32)
                    if cur is None
                    else np.append(cur, np.int32(node))
                )
                if len(merged) > cap:
                    sc = _scores(rows[int(v)], rows, norms, merged.astype(np.int64),
                                 metric)
                    merged = merged[np.argsort(-sc, kind="stable")[:cap]]
                lad[int(v)] = merged

        for node in live[1:]:
            node = int(node)
            lvl = int(levels[node])
            q = rows[node]
            ep = entry
            for layer in range(max_level, lvl, -1):
                ids, _ = beam(q, [ep], 1, layer)
                if len(ids):
                    ep = int(ids[0])
            eps = [ep]
            for layer in range(min(lvl, max_level), -1, -1):
                ids, _ = beam(q, eps, ef_construction, layer)
                cap = width0 if layer == 0 else width
                chosen = [int(v) for v in ids[:cap] if int(v) != node]
                connect(node, chosen, layer, cap)
                eps = list(ids[: max(1, len(ids))])
            if lvl > int(levels[entry]):
                entry = node

        # freeze to compact per-layer arrays
        layers_out: list[tuple[np.ndarray, np.ndarray]] = []
        for layer in range(max_level + 1):
            lad = adj[layer]
            ids = np.asarray(sorted(lad), np.int32)
            cap = width0 if layer == 0 else width
            mat = np.full((len(ids), cap), _SENTINEL, np.int32)
            for r, nid in enumerate(ids):
                nb = lad[int(nid)][:cap]
                mat[r, : len(nb)] = nb
            layers_out.append((ids, mat))
        # entry may be isolated if live has 1 node and loop never ran
        if not layers_out:
            layers_out = [(np.asarray([entry], np.int32),
                           np.full((1, width0), _SENTINEL, np.int32))]
        valid = None
        if valid_mask is not None:
            valid = ~np.asarray(valid_mask, dtype=bool)
        return cls(rows, norms, layers_out, entry, metric, m,
                   ef_construction, valid=valid)

    @classmethod
    def from_space(
        cls,
        space,
        m: int = 16,
        ef_construction: int = 200,
        seed: int = 0,
    ) -> "HNSWIndex":
        """Reattach the persisted graph (``Builder.set_hnsw_index``) or
        build one from the space's rows."""
        metric = DistanceMetric(space.metric)
        vectors = np.asarray(space.to_numpy(), np.float32)
        q = space.quantization
        if q is not None:
            vectors = (vectors - q.zero_point) * q.scale
        stored = space.hnsw_arrays()
        if stored is not None:
            layers, entry, sm, sef = stored
            rows, norms = _prep(vectors, metric)
            valid = None
            mask = space.tombstone_mask()
            if mask is not None:
                valid = ~mask
            return cls(rows, norms, layers, entry, metric, sm, sef,
                       valid=valid)
        return cls.build(
            vectors, metric, m=m, ef_construction=ef_construction, seed=seed,
            valid_mask=space.tombstone_mask(),
        )

    @property
    def max_level(self) -> int:
        return len(self.layers) - 1

    # ------------------------------------------------------------ search --

    def search(self, queries: np.ndarray, k: int = 10, ef: int | None = None):
        """Approximate top-k; ``ef`` (≥ k) is the layer-0 beam width —
        recall rises with it. Returns a ``SearchResult``."""
        from ..engine import SearchResult
        from ..ops.distances import distances_np

        metric = self.metric
        q2 = np.ascontiguousarray(queries, np.float32)
        if q2.ndim == 1:
            q2 = q2[None]
        qn = np.einsum("ij,ij->i", q2, q2, dtype=np.float64).astype(np.float32)
        qs = q2
        if metric == DistanceMetric.COSINE:
            qs = q2 / np.maximum(np.sqrt(qn)[:, None], 1e-30)
        ef = max(k, ef if ef is not None else max(2 * k, 64))

        out_i = np.full((len(q2), k), _SENTINEL, np.int32)
        out_s = np.full((len(q2), k), -np.inf, np.float32)
        if self.entry == _SENTINEL or not self.layers:
            dist = np.where(
                out_i >= 0, 0.0,
                np.inf if metric == DistanceMetric.L2 else -np.inf
            ).astype(np.float32)
            return SearchResult(out_i, out_s, dist, metric)

        adjs = []
        for (ids, mat), lut in zip(self.layers, self.slot_of):
            adjs.append((lut, mat))

        for qi, q in enumerate(qs):
            ep = self.entry
            for layer in range(self.max_level, 0, -1):
                ep = self._greedy(q, ep, layer)
            ids, sc = self._beam0(q, ep, ef)
            if self.valid is not None:
                keep = self.valid[ids]
                ids, sc = ids[keep], sc[keep]
            top = min(k, len(ids))
            out_i[qi, :top] = ids[:top]
            out_s[qi, :top] = sc[:top]
        if metric == DistanceMetric.COSINE:
            # scores were computed on normalized q: already cosine sim
            scores = out_s
        else:
            scores = out_s
        dist = distances_np(scores, metric, qn)
        bad = np.inf if metric == DistanceMetric.L2 else -np.inf
        dist = np.where(out_i >= 0, dist, bad)
        return SearchResult(out_i, scores, dist.astype(np.float32), metric)

    def _greedy(self, q, ep: int, layer: int) -> int:
        lut, mat = self.slot_of[layer], self.layers[layer][1]
        cur = ep
        cur_s = float(_scores(q, self.rows, self.norms,
                              np.asarray([cur], np.int64), self.metric)[0])
        while True:
            slot = lut[cur]
            if slot < 0:
                return cur
            nbrs = mat[slot]
            nbrs = nbrs[nbrs >= 0]
            if len(nbrs) == 0:
                return cur
            sc = _scores(q, self.rows, self.norms, nbrs.astype(np.int64),
                         self.metric)
            j = int(np.argmax(sc))
            if sc[j] <= cur_s:
                return cur
            cur, cur_s = int(nbrs[j]), float(sc[j])

    def _beam0(self, q, ep: int, ef: int):
        """Layer-0 beam search; returns (ids, scores) best-first."""
        import bisect

        lut, mat = self.slot_of[0], self.layers[0][1]
        visited = {ep}
        s0 = float(_scores(q, self.rows, self.norms,
                           np.asarray([ep], np.int64), self.metric)[0])
        best_ids, best_sc = [ep], [s0]
        cand_ids, cand_sc = [ep], [s0]
        while cand_ids:
            c = cand_ids.pop(0)
            c_s = cand_sc.pop(0)
            if len(best_sc) >= ef and c_s < best_sc[-1]:
                break
            slot = lut[c]
            if slot < 0:
                continue
            nbrs = mat[slot]
            new = [v for v in nbrs.tolist() if v >= 0 and v not in visited]
            if not new:
                continue
            visited.update(new)
            arr = np.asarray(new, np.int64)
            ns = _scores(q, self.rows, self.norms, arr, self.metric)
            worst = best_sc[-1] if len(best_sc) >= ef else -np.inf
            for v, s_v in zip(arr, ns):
                if len(best_sc) >= ef and s_v <= worst:
                    continue
                pos = bisect.bisect_left([-x for x in best_sc], -float(s_v))
                best_sc.insert(pos, float(s_v))
                best_ids.insert(pos, int(v))
                pos = bisect.bisect_left([-x for x in cand_sc], -float(s_v))
                cand_sc.insert(pos, float(s_v))
                cand_ids.insert(pos, int(v))
                if len(best_sc) > ef:
                    best_sc.pop()
                    best_ids.pop()
                worst = best_sc[-1] if len(best_sc) >= ef else -np.inf
        return np.asarray(best_ids, np.int32), np.asarray(best_sc, np.float32)
