"""Similarity search over the ``embeddings`` table (``list<float>`` column).

- brute-force cosine top-k: the exact baseline — numpy matmul per batch
  against a broadcast query matrix (``ray.put`` once, loaded per actor),
  per-batch partial top-k, tiny driver merge. DuckDB-oracled via
  ``list_cosine_similarity``.
- LSH-bucketed ANN: the scale path — seeded random-hyperplane codes,
  bucket groupby, within-bucket exact scoring; recall vs brute force is
  asserted in tests.

Cross-engine float determinism: vectors are cast to float64 before any
arithmetic and similarities are ROUNDed to 6 dp before ranking, with
neighbor-id tie-breaks, in both engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .common import read


def _query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """The small query side, read with the row filter pushed into the parquet
    scan (only matching row groups/rows are decoded — not the whole table)."""
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < n_queries
    )
    ids = np.asarray(t["vec_id"])
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    order = np.argsort(ids)
    return ids[order], vecs[order]


def _embedding_dim(sf_dir: str) -> int:
    """Vector dimensionality from the first row of the first row group —
    no whole-column driver read."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    head = pf.read_row_group(0, columns=["embedding"])
    return len(head["embedding"][0])


class _BruteScorer:
    """Per-batch cosine vs the broadcast query matrix; emits each batch's
    top-k candidates per query (partial top-k → tiny global merge)."""

    def __init__(self, q_ref, k: int):
        ids, q = ray.get(q_ref)
        self.qids = ids
        self.q = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vids = batch["vec_id"].to_numpy()
        m = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = np.round(self.q @ m.T, 6)  # (Q, B)
        rows = []
        for qi, qid in enumerate(self.qids):
            c = cos[qi]
            mask = vids != qid
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                continue
            # partial top-k with (cos desc, vec_id asc) tie-break
            order = np.lexsort((vids[idx], -c[idx]))[: self.k]
            for j in idx[order]:
                rows.append((int(qid), int(vids[j]), float(c[j])))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])


def emb_knn_bruteforce(sf_dir: str, n_queries: int = 5, k: int = 5) -> pd.DataFrame:
    q_ref = ray.put(_query_matrix(sf_dir, n_queries))
    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        _BruteScorer,
        fn_constructor_args=(q_ref, k),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, 4),
    )
    df = partials.to_pandas()
    df = df.sort_values(
        ["query_id", "cos", "neighbor_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", as_index=False).head(k).copy()
    df["rank"] = df.groupby("query_id").cumcount().astype("int64") + 1
    return df.reset_index(drop=True)[["query_id", "neighbor_id", "rank", "cos"]]


def lsh_plane_signs(n_planes: int, dim: int, seed: int = 5) -> np.ndarray:
    """±1 (Rademacher) hyperplane components derived from sha256 — a valid
    sign-LSH family, chosen over Gaussian planes because the construction is
    reproducible in ANSI SQL (DuckDB ``sha256``), giving the whole emb-LSH
    query family a driver oracle. Sign = +1 iff the digest's first hex
    nibble < 8."""
    import hashlib

    out = np.empty((n_planes, dim), dtype=np.int64)
    for p in range(n_planes):
        for d in range(dim):
            h = hashlib.sha256(f"lsh:{seed}:{p}:{d}".encode()).hexdigest()
            out[p, d] = 1 if int(h[0], 16) < 8 else -1
    return out


def lsh_codes(m: np.ndarray, signs: np.ndarray) -> np.ndarray:
    """LSH code per row of ``m`` (float64): quantize to ``floor(v·1024)``
    int64 first so the dot products are EXACT integer arithmetic — bit-for-
    bit reproducible in DuckDB regardless of summation order (a float dot
    near 0 could flip a sign bit between engines)."""
    q = np.floor(m * 1024.0).astype(np.int64)  # ×1024 is exact (binary shift)
    dots = q @ signs.T  # (B, n_planes) int64, exact
    code = np.zeros(len(m), dtype=np.int64)
    for i in range(signs.shape[0]):
        code |= (dots[:, i] > 0).astype(np.int64) << i
    return code


class _LSHCoder:
    def __init__(self, signs_ref):
        self.signs = ray.get(signs_ref)  # (n_planes, dim) int64 ±1

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        return pd.DataFrame(
            {"vec_id": batch["vec_id"].to_numpy(), "bucket": lsh_codes(m, self.signs)}
        )


def emb_lsh_buckets(sf_dir: str, n_planes: int = 8, seed: int = 5) -> pd.DataFrame:
    """Bucket histogram of the random-hyperplane LSH index (the ANN scale
    path's partitioning stage). Driver-oracled: the sha-derived signs and
    integer-quantized dots are replicated exactly in DuckDB SQL."""
    dim = _embedding_dim(sf_dir)
    signs_ref = ray.put(lsh_plane_signs(n_planes, dim, seed))
    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    codes = ds.map_batches(
        _LSHCoder,
        fn_constructor_args=(signs_ref,),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, 4),
    )
    df = codes.to_pandas().groupby("bucket", as_index=False).agg(n_vecs=("vec_id", "size"))
    df["n_vecs"] = df["n_vecs"].astype("int64")
    return df.sort_values("bucket").reset_index(drop=True)


def emb_lsh_ann(
    sf_dir: str, n_queries: int = 5, k: int = 5, n_planes: int = 8, seed: int = 5
) -> pd.DataFrame:
    """ANN top-k: score only vectors whose LSH code is within Hamming
    distance 1 of the query's code (multi-probe). Approximate — recall vs
    ``emb_knn_bruteforce`` is asserted ≥0.6 in tests."""
    qids, q = _query_matrix(sf_dir, n_queries)
    dim = q.shape[1]
    signs = lsh_plane_signs(n_planes, dim, seed)
    qcodes = lsh_codes(q, signs)
    # multi-probe: the query's own code plus every Hamming-1 neighbor
    probe_sets = np.stack(
        [
            np.concatenate(([c], [c ^ (1 << i) for i in range(n_planes)]))
            for c in qcodes
        ]
    ).astype(np.int64)  # (Q, n_planes+1)
    ctx_ref = ray.put((qids, q / np.linalg.norm(q, axis=1, keepdims=True), signs, probe_sets, k))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, qn, signs_, probes_, k_ = ray.get(ctx_ref)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        vids = batch["vec_id"].to_numpy()
        code = lsh_codes(m, signs_)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        rows = []
        for qi, qid in enumerate(qids_):
            cand = np.nonzero(np.isin(code, probes_[qi]) & (vids != qid))[0]
            if len(cand) == 0:
                continue
            cos = np.round(qn[qi] @ mn[cand].T, 6)
            order = np.lexsort((vids[cand], -cos))[:k_]
            for o in order:
                rows.append((int(qid), int(vids[cand[o]]), float(cos[o])))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = ds.map_batches(score, batch_format="pandas", batch_size=4096).to_pandas()
    df = df.sort_values(["query_id", "cos", "neighbor_id"], ascending=[True, False, True])
    df = df.groupby("query_id", as_index=False).head(k).copy()
    df["rank"] = df.groupby("query_id").cumcount().astype("int64") + 1
    return df.reset_index(drop=True)[["query_id", "neighbor_id", "rank", "cos"]]


def _train_ivf_centroids(
    sf_dir: str, n_cells: int, seed: int, sample_n: int = 512, iters: int = 10
) -> np.ndarray:
    """Deterministic mini-Lloyd on a pruned sample — IVF training is
    classically a sample-based driver step; the full corpus never leaves
    storage for it. Centroids are L2-normalized (spherical k-means, since
    scoring is cosine)."""
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < sample_n
    )
    x = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    c = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            m = x[assign == j]
            if len(m):
                v = m.mean(axis=0)
                c[j] = v / np.linalg.norm(v)
    return c


def emb_ivf_ann(
    sf_dir: str,
    n_queries: int = 5,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 5,
) -> pd.DataFrame:
    """IVF approximate top-k: vectors are binned to their nearest centroid
    cell; each query scores only vectors in its ``nprobe`` closest cells.
    One streaming pass, no shuffle: the batch fn bins its own rows and
    scores the probed subset (centroids broadcast once). Recall vs
    ``emb_knn_bruteforce`` is asserted in tests — the IVF member of the
    ANN family next to the LSH one."""
    qids, q = _query_matrix(sf_dir, n_queries)
    cents = _train_ivf_centroids(sf_dir, n_cells, seed)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    probes = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    ctx_ref = ray.put((qids, qn, cents, probes, k))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, qn_, cents_, probes_, k_ = ray.get(ctx_ref)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        vids = batch["vec_id"].to_numpy()
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        cell = np.argmax(mn @ cents_.T, axis=1)
        rows = []
        for qi, qid in enumerate(qids_):
            mask = np.isin(cell, probes_[qi]) & (vids != qid)
            cand = np.nonzero(mask)[0]
            if len(cand) == 0:
                continue
            cos = np.round(qn_[qi] @ mn[cand].T, 6)
            order = np.lexsort((vids[cand], -cos))[:k_]
            for o in order:
                rows.append((int(qid), int(vids[cand[o]]), float(cos[o])))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = ds.map_batches(score, batch_format="pandas", batch_size=4096).to_pandas()
    df = df.sort_values(["query_id", "cos", "neighbor_id"], ascending=[True, False, True])
    df = df.groupby("query_id", as_index=False).head(k).copy()
    df["rank"] = df.groupby("query_id").cumcount().astype("int64") + 1
    return df.reset_index(drop=True)[["query_id", "neighbor_id", "rank", "cos"]]


def emb_label_centroid_norm(sf_dir: str) -> pd.DataFrame:
    """Per-label rollup: count + average vector L2 norm (rounded) — a
    vectorized numeric aggregate over the list column."""
    ds = read(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        norms = np.sqrt((m * m).sum(axis=1))
        return (
            pd.DataFrame({"label": batch["label"].to_numpy(), "norm": norms})
            .groupby("label", as_index=False)
            .agg(n=("norm", "size"), sum_norm=("norm", "sum"))
        )

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = partials.groupby("label", as_index=False).agg(
        n=("n", "sum"), sum_norm=("sum_norm", "sum")
    )
    out["avg_norm"] = (out["sum_norm"] / out["n"]).round(6)
    out["n"] = out["n"].astype("int64")
    out["label"] = out["label"].astype("int32")
    return out.sort_values("label").reset_index(drop=True)[["label", "n", "avg_norm"]]


class _LSHCoderWithVec(_LSHCoder):
    """LSH code per row, CARRYING the embedding through the shuffle so each
    bucket group owns its vectors — no whole-dataset driver broadcast (the
    scale fix: at 100 TB a global vec_id→vector dict cannot exist)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = super().__call__(batch)
        out["embedding"] = batch["embedding"].to_numpy()
        return out


def emb_cosine_dup_pairs(
    sf_dir: str,
    *,
    threshold: float = 0.9,
    n_planes: int = 8,
    seed: int = 5,
    max_bucket: int = 256,
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket the vectors
    (sha-derived sign hyperplanes — DuckDB-reproducible), compare only
    within buckets, verify exact cosine ≥ threshold. The dedup-by-embedding
    member of the dedup family.

    The vector column rides the bucket groupby (``_LSHCoderWithVec``), so
    each group compares only vectors it owns — data volume through the
    shuffle is one row per vector, never a global broadcast. Degenerate
    buckets (a near-duplicate-heavy corpus collapses into few codes) are
    salt-capped into deterministic ~``max_bucket``-sized cells — pair cost
    stays O(n·max_bucket) instead of O(n²); cross-cell pairs in an
    oversized bucket are traded away for bounded cost (documented recall
    loss; the deterministic cell split is part of the op's contract and is
    replicated in the oracle SQL)."""
    dim = _embedding_dim(sf_dir)
    signs_ref = ray.put(lsh_plane_signs(n_planes, dim, seed))
    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    codes = ds.map_batches(
        _LSHCoderWithVec,
        fn_constructor_args=(signs_ref,),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, 4),
    )

    def _cell_pairs(ids: np.ndarray, m: np.ndarray) -> pd.DataFrame | None:
        if len(ids) < 2:
            return None
        sim = np.round(m @ m.T, 6)
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sim[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "vec_a": ids[ia[keep]].astype("int64"),
                "vec_b": ids[ib[keep]].astype("int64"),
                "cos": sim[ia[keep], ib[keep]],
            }
        )

    empty = pd.DataFrame(
        {
            "vec_a": pd.Series(dtype="int64"),
            "vec_b": pd.Series(dtype="int64"),
            "cos": pd.Series(dtype="float64"),
        }
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id").sort_values("vec_id")
        if len(g) < 2:
            return empty
        ids = g["vec_id"].to_numpy()
        m = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        if len(ids) <= max_bucket:
            out = _cell_pairs(ids, m)
            return out if out is not None else empty
        # salt-cap: deterministic Knuth-hash cells (same trick as the text
        # MinHash-LSH twin, dedup_text._bucket_ids_pairs)
        nsub = int(np.ceil(len(ids) / max_bucket))
        cell = (
            (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
        ) % np.uint64(nsub)
        frames = []
        for s in range(nsub):
            sel = cell == np.uint64(s)
            out = _cell_pairs(ids[sel], m[sel])
            if out is not None and len(out):
                frames.append(out)
        return pd.concat(frames, ignore_index=True) if frames else empty

    out = codes.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
    df = out.to_pandas()
    if df.empty:
        return pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "cos": pd.Series(dtype="float64"),
            }
        )
    df = df.drop_duplicates(["vec_a", "vec_b"])
    return df.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
