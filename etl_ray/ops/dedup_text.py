"""Deduplication families over the ``documents`` table — exact,
MinHash+LSH, SimHash, n-gram Jaccard — the training-data-pipeline dedup
suite, built on the same patterns as the engine's LWW dedup (hash-partition
+ per-group selection; mergeable per-batch partials).

LSH pipeline shape (guide §"Aggregation at scale"):
shingle+minhash per batch (vectorized numpy, actor pool holds the seeded
permutation parameters) → explode to (band, band_hash, doc_id) rows →
groupby band bucket → candidate pairs → exact-Jaccard verify → union-find
clusters (driver-side only because the candidate set is provably tiny:
bucket sizes are bounded and logged, never the corpus).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .common import keep_extreme, read

_MERSENNE = (1 << 61) - 1


def doc_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: one row per distinct text, min doc_id wins (D1 rank-1
    semantics keyed on a content hash, hash-partitioned)."""
    ds = read(sf_dir, "documents", columns=["doc_id", "lang", "source", "text"])

    def hash_batch(t: pa.Table) -> pa.Table:
        sha = [hashlib.sha256(s.encode()).hexdigest() for s in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "source": t["source"],
                "text_sha": pa.array(sha, pa.string()),
            }
        )

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow", zero_copy_batch=True)
    out = keep_extreme(hashed, ["text_sha"], ["doc_id"], keep="first")
    df = out.to_pandas()
    return (
        df[["doc_id", "lang", "source"]].sort_values("doc_id").reset_index(drop=True)
    )


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles → stable uint64 hashes (crc32-seeded)."""
    words = re.sub(r"\s+", " ", text.lower()).split(" ")
    if len(words) < k:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(
        np.array([zlib.crc32(g.encode()) for g in grams], dtype=np.uint64)
    )


class MinHasher:
    """Per-doc MinHash signatures; permutation parameters seeded once per
    actor (the stateful-stage pattern)."""

    def __init__(self, n_perm: int = 64, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, n_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, n_perm, dtype=np.int64).astype(np.uint64)
        self.n_perm = n_perm

    def signature(self, text: str) -> np.ndarray:
        x = _shingles(text)
        if len(x) == 0:
            return np.zeros(self.n_perm, dtype=np.uint64)
        # (a*x + b) mod p, rowwise min — vectorized over shingles
        v = (self.a[:, None] * x[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return v.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch["text"]])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "sig": list(sigs),
            }
        )


def _band_rows(sig_df: pd.DataFrame, bands: int, rows_per_band: int) -> pd.DataFrame:
    out = []
    for _, r in sig_df.iterrows():
        sig = r["sig"]
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            bh = zlib.crc32(chunk.tobytes())
            out.append((int(r["doc_id"]), b, bh))
    return pd.DataFrame(out, columns=["doc_id", "band", "band_hash"])


def doc_minhash_lsh_pairs(
    sf_dir: str, *, threshold: float = 0.5, bands: int = 16, rows_per_band: int = 4
) -> pd.DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    Returns (doc_a, doc_b, jaccard) for verified pairs ≥ threshold.
    Candidate generation is fully distributed; verification re-reads only
    candidate docs' texts (pruned read)."""
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    sigs = ds.map_batches(
        MinHasher, batch_format="pandas", batch_size=1024, concurrency=(1, 4)
    )
    band_ds = sigs.map_batches(
        lambda df: _band_rows(df, bands, rows_per_band), batch_format="pandas"
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            # typed empty: singleton buckets are the common case and an
            # untyped empty frame (float64) would poison the id dtype
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")}
            )
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame(
            {"doc_a": ids[ia].astype("int64"), "doc_b": ids[ib].astype("int64")}
        )

    pairs = (
        band_ds.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if pairs.empty:
        return pd.DataFrame(
            {
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "jaccard": pd.Series(dtype="float64"),
            }
        )

    # verify: read only candidate texts (pruned), broadcast, exact jaccard
    cand_ids = sorted(set(pairs["doc_a"]) | set(pairs["doc_b"]))
    import pyarrow.dataset as pads

    table = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id").isin(cand_ids)
    )
    texts = dict(zip(table["doc_id"].to_pylist(), table["text"].to_pylist()))
    texts_ref = ray.put({i: _shingles(t) for i, t in texts.items()})

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        sh = ray.get(texts_ref)
        jac = []
        for a, b in zip(df["doc_a"], df["doc_b"]):
            sa, sb = sh[int(a)], sh[int(b)]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac.append(inter / union if union else 0.0)
        df = df.copy()
        df["jaccard"] = np.round(jac, 6)
        return df

    verified = (
        ray.data.from_pandas(pairs.reset_index(drop=True))
        .map_batches(verify, batch_format="pandas")
        .to_pandas()
    )
    out = verified[verified["jaccard"] >= threshold]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True).astype(
        {"doc_a": "int64", "doc_b": "int64"}
    )


def doc_minhash_signatures(sf_dir: str) -> pd.DataFrame:
    """Per-doc signature digest (deterministic, non-empty even when the
    corpus has no near-dups): min/max of the 64-perm MinHash signature."""
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    sigs = ds.map_batches(
        MinHasher, batch_format="pandas", batch_size=1024, concurrency=(1, 4)
    )

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        s = np.stack(df["sig"].to_numpy())
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "sig_min": s.min(axis=1).astype("int64"),
                "sig_max": s.max(axis=1).astype("int64"),
            }
        )

    out = sigs.map_batches(digest, batch_format="pandas")
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


class SimHasher:
    """64-bit SimHash over word tokens (stateful: token hash salt)."""

    def __init__(self, seed: int = 11):
        self.seed = seed

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for txt in batch["text"]:
            words = re.sub(r"\s+", " ", txt.lower()).split(" ")
            h = np.array(
                [zlib.crc32(f"{self.seed}:{w}".encode()) for w in words], dtype=np.uint64
            )
            h = h * np.uint64(0x9E3779B97F4A7C15)  # spread to 64 bits
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            v = (2 * bits - 1).sum(axis=0)
            sim = np.uint64(0)
            for i in range(64):
                if v[i] > 0:
                    sim |= np.uint64(1) << np.uint64(i)
            out.append(np.int64(sim.astype(np.int64)))
        return pd.DataFrame({"doc_id": batch["doc_id"], "simhash": out})


def doc_simhash(sf_dir: str) -> pd.DataFrame:
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(SimHasher, batch_format="pandas", batch_size=1024, concurrency=(1, 4))
    df = out.to_pandas()
    df["simhash"] = df["simhash"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def doc_ngram_jaccard_matrix(sf_dir: str, n_queries: int = 5) -> pd.DataFrame:
    """Exact n-gram Jaccard of the first ``n_queries`` docs vs the corpus:
    top-5 most similar per query (brute baseline for the LSH path).
    Query shingle sets are broadcast; corpus streams."""
    qt = (
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], n_queries)), batch_format="pyarrow"
        )
        .to_pandas()
    )
    q_ref = ray.put({int(r["doc_id"]): _shingles(r["text"]) for _, r in qt.iterrows()})

    def score(df: pd.DataFrame) -> pd.DataFrame:
        qs = ray.get(q_ref)
        rows = []
        for _, r in df.iterrows():
            sb = _shingles(r["text"])
            for qid, sa in qs.items():
                if qid == int(r["doc_id"]):
                    continue
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                union = len(sa) + len(sb) - inter
                rows.append((qid, int(r["doc_id"]), round(inter / union, 6) if union else 0.0))
        return pd.DataFrame(rows, columns=["query_id", "doc_id", "jaccard"])

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    scored = ds.map_batches(score, batch_format="pandas", batch_size=2048)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["jaccard", "doc_id"], ascending=[False, True]).head(5)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g

    out = scored.groupby("query_id").map_groups(topk, batch_format="pandas")
    return out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
