"""Deduplication families over the ``documents`` table — exact,
MinHash+LSH, SimHash, n-gram Jaccard — the training-data-pipeline dedup
suite, built on the same patterns as the engine's LWW dedup (hash-partition
+ per-group selection; mergeable per-batch partials).

LSH pipeline shape (guide §"Aggregation at scale"):
shingle+minhash per batch (vectorized numpy) → explode to
(band, band_hash, doc_id) rows → coarse band-bucket groupby → candidate
pairs (degenerate buckets salt-capped to O(n·max_bucket) pairs) →
co-partitioned two-hop verification join against per-doc shingle sets
(pair dedup inside the doc_a bucket) → exact Jaccard. Nothing corpus-sized
touches the driver or a broadcast at any stage.
"""

from __future__ import annotations

import hashlib
import re


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


def doc_dup_groups(sf_dir: str) -> pd.DataFrame:
    """Exact-duplicate CLUSTER assignment: every doc labeled with its
    group's canonical id (min doc_id sharing the text) and group size —
    the dedup output shape a training-data pipeline actually consumes
    (keep canonical, drop/weight the rest). Hash-partitioned by content
    sha; each group resolves independently."""
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def hash_batch(t: pa.Table) -> pa.Table:
        sha = [hashlib.sha256(s.encode()).hexdigest() for s in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "text_sha": pa.array(sha, pa.string())}
        )

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow", zero_copy_batch=True)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "canonical_id": np.int64(g["doc_id"].min()),
                "group_size": np.int64(len(g)),
            }
        )

    out = hashed.groupby("text_sha").map_groups(assign, batch_format="pandas")
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles → stable 32-bit hashes (first 8 hex chars of
    sha256). sha-derived rather than crc32 so the DuckDB oracle can
    recompute the exact values (``sha256`` is ANSI-available; crc32 is
    not)."""
    words = re.sub(r"\s+", " ", text.lower()).split(" ")
    if len(words) < k:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(
        np.array(
            [int(hashlib.sha256(g.encode()).hexdigest()[:8], 16) for g in grams],
            dtype=np.uint64,
        )
    )


def minhash_perm_constants(n_perm: int = 64, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) permutation constants derived from sha256 — deterministic AND
    inlinable as literals into the DuckDB oracle SQL. a ∈ [1, p-1],
    b ∈ [0, p-1] with p = 2^61-1."""
    a = np.array(
        [
            int(hashlib.sha256(f"mh:{seed}:{i}:a".encode()).hexdigest()[:15], 16)
            % (_MERSENNE - 1)
            + 1
            for i in range(n_perm)
        ],
        dtype=np.uint64,
    )
    b = np.array(
        [
            int(hashlib.sha256(f"mh:{seed}:{i}:b".encode()).hexdigest()[:15], 16)
            % _MERSENNE
            for i in range(n_perm)
        ],
        dtype=np.uint64,
    )
    return a, b


class MinHasher:
    """Per-doc MinHash signatures; permutation parameters computed once per
    actor (the stateful-stage pattern)."""

    def __init__(self, n_perm: int = 64, seed: int = 7):
        self.a, self.b = minhash_perm_constants(n_perm, seed)
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


def band_hash_constants(bands: int, rows_per_band: int, seed: int = 7) -> np.ndarray:
    """(bands, rows_per_band) sha-derived multipliers in [1, 2^28) — small
    enough that fold31·c products stay int64-exact, and inlinable as
    literals into the oracle SQL."""
    return np.array(
        [
            [
                int(hashlib.sha256(f"band:{seed}:{b}:{r}".encode()).hexdigest()[:7], 16)
                | 1
                for r in range(rows_per_band)
            ]
            for b in range(bands)
        ],
        dtype=np.uint64,
    )


def _band_rows(sig_df: pd.DataFrame, bands: int, rows_per_band: int) -> pd.DataFrame:
    """Explode signatures to (doc_id, band, band_hash) rows — fully
    vectorized: one reshape over the stacked signature matrix + a
    polynomial band hash (no per-row Python loop)."""
    n = len(sig_df)
    if n == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "band": pd.Series(dtype="int64"),
                "band_hash": pd.Series(dtype="int64"),
            }
        )
    sigs = np.stack(sig_df["sig"].to_numpy()).astype(np.uint64)
    chunks = sigs[:, : bands * rows_per_band].reshape(n, bands, rows_per_band)
    # band hash = Σ_r fold31(sig_r) · c_{band,r}: 31-bit folds × 28-bit
    # sha-derived constants keep every product < 2^59 and the 4-term sum
    # < 2^61 — exact in int64 AND in DuckDB BIGINT (the FNV-mod-2^64 hash it
    # replaces needed uint64 wraparound, which SQL can't express cheaply)
    folded = (chunks ^ (chunks >> np.uint64(31))) & np.uint64(0x7FFFFFFF)
    c = band_hash_constants(bands, rows_per_band)  # (bands, rows) < 2^28
    h = (folded * c[None, :, :]).sum(axis=2)  # exact, < 2^61
    return pd.DataFrame(
        {
            "doc_id": np.repeat(sig_df["doc_id"].to_numpy().astype("int64"), bands),
            "band": np.tile(np.arange(bands, dtype="int64"), n),
            "band_hash": h.reshape(-1).astype(np.int64),
        }
    )


_EMPTY_PAIRS = {
    "doc_a": pd.Series(dtype="int64"),
    "doc_b": pd.Series(dtype="int64"),
}


def _bucket_ids_pairs(ids: np.ndarray, max_bucket: int, out_a: list, out_b: list) -> None:
    """Emit all i<j pairs of one LSH bucket into out_a/out_b, salt-capping
    degenerate buckets: without a cap a near-identical corpus makes one
    bucket emit O(n²) pairs. Split into ~max_bucket-sized deterministic
    cells and pair within cells — pair count stays O(n·max_bucket); true
    near-dups keep bands−1 other chances to collide elsewhere."""
    if len(ids) <= max_bucket:
        ia, ib = np.triu_indices(len(ids), k=1)
        out_a.append(ids[ia])
        out_b.append(ids[ib])
        return
    nsub = int(np.ceil(len(ids) / max_bucket))
    cell = ((ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)) % np.uint64(nsub)
    for s in range(nsub):
        sub = ids[cell == np.uint64(s)]
        if len(sub) >= 2:
            ia, ib = np.triu_indices(len(sub), k=1)
            out_a.append(sub[ia])
            out_b.append(sub[ib])


def _make_bucket_pairs(max_bucket: int):
    """Per COARSE group (many complete (band, band_hash) buckets): run-length
    detect the real buckets vectorized, loop only over multi-occupancy runs.
    (One map_groups call per real bucket — tens of thousands of mostly
    singleton groups — is pure per-call overhead.)"""

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band", "band_hash", "doc_id"], kind="mergesort")
        band = g["band"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy().astype("int64")
        change = np.flatnonzero((band[1:] != band[:-1]) | (bh[1:] != bh[:-1])) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(g)]])
        out_a: list = []
        out_b: list = []
        for s, e in zip(starts, ends):
            if e - s >= 2:
                run = np.unique(ids[s:e])
                if len(run) >= 2:
                    _bucket_ids_pairs(run, max_bucket, out_a, out_b)
        if not out_a:
            return pd.DataFrame(_EMPTY_PAIRS)
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
        )

    return bucket_pairs


def doc_minhash_lsh_pairs(
    sf_dir: str,
    *,
    threshold: float = 0.5,
    bands: int = 16,
    rows_per_band: int = 4,
    n_buckets: int = 16,
    max_bucket: int = 64,
) -> pd.DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    Returns (doc_a, doc_b, jaccard) for verified pairs ≥ threshold.
    Fully distributed end-to-end — nothing corpus-sized ever touches the
    driver or a broadcast:

      signatures (actor pool) → vectorized band explode → band-bucket
      groupby → candidate pairs (degenerate buckets salt-capped) →
      co-partitioned two-hop verification join against the per-doc shingle
      sets (tagged-union bucket shuffle on doc_a, then on doc_b; pair dedup
      happens inside the doc_a group, where every copy of a pair lands) →
      exact Jaccard ≥ threshold.

    At real crawl dup rates candidates ≈ the corpus, so the verification
    side must stream/shuffle — reference shape: the engine's own
    co-partitioned state join (``etl_ray/engine/replay.py`` spill shuffle).
    """
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    mh = MinHasher()  # trivial setup: task mode beats actor-pool spin-up
    sigs = ds.map_batches(lambda df: mh(df), batch_format="pandas", batch_size=1024)
    coarse = 64  # shuffle granularity: K coarse groups, not one per bucket

    def band_rows_coarse(df: pd.DataFrame) -> pd.DataFrame:
        out = _band_rows(df, bands, rows_per_band)
        out["gb"] = (
            out["band_hash"].to_numpy().view(np.uint64) % np.uint64(coarse)
        ).astype("int64")
        return out

    band_ds = sigs.map_batches(band_rows_coarse, batch_format="pandas")
    pairs = band_ds.groupby("gb").map_groups(
        _make_bucket_pairs(max_bucket), batch_format="pandas"
    )

    empty_sh = np.array([], dtype=np.int64)

    def shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "b": (df["doc_id"].astype("int64") % n_buckets),
                "side": "s",
                "key": df["doc_id"].astype("int64"),
                "other": np.int64(-1),
                "sh": [_shingles(t).astype(np.int64) for t in df["text"]],
            }
        )

    shingles_a = ds.map_batches(shingle_rows, batch_format="pandas")
    shingles_b = ds.map_batches(shingle_rows, batch_format="pandas")

    def tag_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "b": (df["doc_a"].astype("int64") % n_buckets),
                "side": "p",
                "key": df["doc_a"].astype("int64"),
                "other": df["doc_b"].astype("int64"),
                "sh": [empty_sh] * len(df),
            }
        )

    def hop_a(g: pd.DataFrame) -> pd.DataFrame:
        """doc_a-bucket: distributed pair dedup (all copies of a pair share
        doc_a → same group) + attach doc_a's shingles; re-key by doc_b."""
        p = g[g["side"] == "p"][["key", "other"]].drop_duplicates()
        if p.empty:
            return pd.DataFrame(
                {
                    "b": pd.Series(dtype="int64"),
                    "side": pd.Series(dtype=object),
                    "key": pd.Series(dtype="int64"),
                    "other": pd.Series(dtype="int64"),
                    "sh": pd.Series(dtype=object),
                }
            )
        s = g[g["side"] == "s"]
        sh_map = dict(zip(s["key"].to_numpy(), s["sh"].to_numpy()))
        return pd.DataFrame(
            {
                "b": (p["other"].to_numpy() % n_buckets),
                "side": "q",
                "key": p["other"].to_numpy(),  # now keyed by doc_b
                "other": p["key"].to_numpy(),  # doc_a rides along
                "sh": [np.asarray(sh_map[k], dtype=np.int64) for k in p["key"]],
            }
        )

    def hop_b(g: pd.DataFrame) -> pd.DataFrame:
        q = g[g["side"] == "q"]
        if q.empty:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "jaccard": pd.Series(dtype="float64"),
                }
            )
        s = g[g["side"] == "s"]
        sh_map = dict(zip(s["key"].to_numpy(), s["sh"].to_numpy()))
        jac = np.empty(len(q))
        for i, (k, sa) in enumerate(zip(q["key"].to_numpy(), q["sh"].to_numpy())):
            sa = np.asarray(sa)
            sb = np.asarray(sh_map[k])
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac[i] = inter / union if union else 0.0
        out = pd.DataFrame(
            {
                "doc_a": q["other"].to_numpy().astype("int64"),
                "doc_b": q["key"].to_numpy().astype("int64"),
                # micro-grid quantization — identical in the DuckDB oracle
                # (np.round differs from SQL ROUND in the last ULP)
                "jaccard": np.floor(jac * 1e6 + 0.5) / 1e6,
            }
        )
        return out[out["jaccard"] >= threshold]

    hop_a_out = (
        pairs.map_batches(tag_pairs, batch_format="pandas")
        .union(shingles_a)
        .groupby("b")
        .map_groups(hop_a, batch_format="pandas")
    )
    verified = (
        hop_a_out.union(shingles_b)
        .groupby("b")
        .map_groups(hop_b, batch_format="pandas")
    )
    df = verified.to_pandas()
    if df.empty:
        return pd.DataFrame(
            {
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "jaccard": pd.Series(dtype="float64"),
            }
        )
    return (
        df.sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
        .astype({"doc_a": "int64", "doc_b": "int64"})
    )


def doc_minhash_signatures(sf_dir: str) -> pd.DataFrame:
    """Per-doc signature digest (deterministic, non-empty even when the
    corpus has no near-dups): min/max of the 64-perm MinHash signature."""
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    mh = MinHasher()  # trivial setup: task mode beats actor-pool spin-up
    sigs = ds.map_batches(lambda df: mh(df), batch_format="pandas", batch_size=1024)

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
    """64-bit SimHash over word tokens (stateful: token hash salt; per-batch
    token-hash memo). Vectorized: token hashes are computed once per UNIQUE
    token (the vocabulary is far smaller than the token stream), the ±1 bit
    votes accumulate via one ``np.add.at`` scatter over a (docs, 64) matrix,
    and the final bit-pack is a single matmul — no per-doc 64-bit loop."""

    def __init__(self, seed: int = 11):
        self.seed = seed
        self._memo: dict[str, int] = {}

    def _token_hashes(self, uniq_tokens: np.ndarray) -> np.ndarray:
        """64-bit token hash = first 16 hex chars of sha256('sh:<seed>:<w>')
        — sha-derived so the DuckDB oracle recomputes identical bits (crc32
        has no SQL equivalent); memoized per actor across batches."""
        memo = self._memo
        seed = self.seed
        out = np.empty(len(uniq_tokens), dtype=np.uint64)
        for i, w in enumerate(uniq_tokens):
            v = memo.get(w)
            if v is None:
                v = memo[w] = int(
                    hashlib.sha256(f"sh:{seed}:{w}".encode()).hexdigest()[:16], 16
                )
            out[i] = v
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"), "simhash": pd.Series(dtype="int64")}
            )
        toks = (
            batch["text"].str.lower().str.replace(r"\s+", " ", regex=True).str.split(" ")
        )
        lens = toks.map(len).to_numpy()
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        doc_idx = np.repeat(np.arange(len(batch)), lens)
        uniq, codes = np.unique(flat.astype("U"), return_inverse=True)
        hu = self._token_hashes(uniq)  # (n_uniq,) uint64
        # bit-expand per UNIQUE token (n_uniq × 64), then gather per
        # occurrence — the bit expansion over the full token stream is the
        # slow path, the vocabulary is orders of magnitude smaller
        bu = (
            (hu[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        ).astype(np.int64)
        pm = 2 * bu - 1  # ±1 votes per unique token
        votes = np.zeros((len(batch), 64), dtype=np.int64)
        np.add.at(votes, doc_idx, pm[codes])
        sim = ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "simhash": sim.view(np.int64)}
        )


def doc_simhash(sf_dir: str) -> pd.DataFrame:
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    sh = SimHasher()  # trivial setup: task mode beats actor-pool spin-up
    out = ds.map_batches(lambda df: sh(df), batch_format="pandas", batch_size=1024)
    df = out.to_pandas()
    df["simhash"] = df["simhash"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def _gram_set(text: str, k: int = 3) -> frozenset:
    """Word k-gram STRING set (no hashing) — the exact-Jaccard brute path
    uses unhashed grams so the DuckDB oracle reproduces it bit-for-bit
    (crc32 shingle collisions would be engine-specific)."""
    words = re.sub(r"\s+", " ", text.lower()).split(" ")
    if len(words) < k:
        return frozenset((" ".join(words),))
    return frozenset(" ".join(words[i : i + k]) for i in range(len(words) - k + 1))


def doc_ngram_jaccard_matrix(sf_dir: str, n_queries: int = 5) -> pd.DataFrame:
    """Exact n-gram Jaccard of the first ``n_queries`` docs vs the corpus:
    top-5 most similar per query (brute baseline for the LSH path).
    Query gram sets are broadcast; corpus streams."""
    import pyarrow.dataset as pads

    qt = (
        pads.dataset(f"{sf_dir}/documents.parquet")
        .to_table(columns=["doc_id", "text"], filter=pads.field("doc_id") < n_queries)
        .to_pandas()
    )
    q_ref = ray.put(
        {int(i): _gram_set(t) for i, t in zip(qt["doc_id"], qt["text"])}
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        qs = ray.get(q_ref)
        rows = []
        for did, text in zip(df["doc_id"].to_numpy(), df["text"].to_numpy()):
            sb = _gram_set(text)
            did = int(did)
            for qid, sa in qs.items():
                if qid == did:
                    continue
                inter = len(sa & sb)
                union = len(sa) + len(sb) - inter
                j = inter / union if union else 0.0
                # micro-grid quantization, identical in the DuckDB oracle
                rows.append((qid, did, np.floor(j * 1e6 + 0.5) / 1e6))
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
