"""Sparse (SPLADE-style) retrieval and metadata-filtered serving.

Two capabilities the reference declares but cannot run: its schema names
``VectorType::Sparse`` (``schema/types.fbs:14-17``) with no encoder or
search path, and has no filtering concept at all. Here both are
first-class:

1. a sparse CSR space built, persisted and served exactly (scatter-free
   ELL formulation on device — see ``sparse.py``'s module docstring),
2. a dense space served under metadata predicates compiled to exact
   in-kernel row masks, with the hot predicate prepared once
   (``SearchEngine.prepare_filter``) and reused across query batches,
3. both spaces living in ONE file behind the ``Database`` facade.
"""

import os
import tempfile

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import metrovector_tpu as mvt


def main():
    rng = np.random.default_rng(0)
    vocab, n_docs = 30_522, 20_000

    # --- build one file with a sparse space and a dense space ---------
    b = mvt.Builder()

    b.add_vector_space("docs-sparse", dim=vocab,
                       vector_type=mvt.VectorType.SPARSE,
                       metric=mvt.DistanceMetric.INNER_PRODUCT)
    rows = []
    for _ in range(n_docs):
        nnz = int(rng.integers(20, 80))  # SPLADE-ish term expansions
        cols = rng.choice(vocab, size=nnz, replace=False)
        rows.append((cols, np.abs(rng.standard_normal(nnz))
                     .astype(np.float32)))
    b.add_sparse_vectors("docs-sparse", rows)

    b.add_vector_space("docs-dense", dim=128)
    b.add_vectors("docs-dense",
                  rng.standard_normal((n_docs, 128)).astype(np.float32))
    b.add_metadata_column("docs-dense", "lang",
                          [("en" if i % 3 else "de")
                           for i in range(n_docs)])
    b.add_metadata_column("docs-dense", "year",
                          np.asarray(2015 + (np.arange(n_docs) % 10),
                                     np.int32))

    path = os.path.join(tempfile.mkdtemp(), "mixed.mvt")
    b.build().save(path)
    print(f"built {os.path.getsize(path) / 1e6:.1f} MB:", path)

    db = mvt.Database.open(path)

    # --- 1. sparse retrieval ------------------------------------------
    # dense query vector over the sparse vocabulary (the SPLADE serving
    # shape); the facade routes to the sparse engine automatically
    q = np.zeros((2, vocab), np.float32)
    qcols = rng.integers(0, vocab, (2, 48))
    q[np.arange(2)[:, None], qcols] = 1.0
    res = db.search("docs-sparse", q, k=5)
    print("sparse top-5 doc ids:", res.indices[0].tolist())

    # predicates work on sparse spaces too (exact row masks)
    res = db.search("docs-sparse", q, k=5,
                    filter_mask=(np.arange(n_docs) % 2 == 0))
    assert all(i % 2 == 0 for i in res.indices[0] if i >= 0)

    # --- 2. filtered dense serving with a prepared hot predicate ------
    eng = db.engine("docs-dense")
    recent_en = db.column_mask("docs-dense", "lang", "==", "en") & (
        db.column_mask("docs-dense", "year", ">=", 2020)
    )
    pf = eng.prepare_filter(recent_en)  # one upload, many batches
    for _ in range(3):
        batch = rng.standard_normal((32, 128)).astype(np.float32)
        out = eng.search(batch, k=10, filter_mask=pf)
        assert recent_en[out.indices[out.indices >= 0]].all()
    print("filtered serving: every hit satisfies lang=='en' & year>=2020")

    # one-shot predicates without preparation go through Database.search
    out = db.search("docs-dense", batch, k=10,
                    where=[("lang", "==", "de"), ("year", "<", 2018)])
    print("where=[lang==de, year<2018] hits:",
          int((out.indices >= 0).sum()))


if __name__ == "__main__":
    main()
