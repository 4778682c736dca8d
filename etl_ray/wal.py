"""Deterministic CDC-log (WAL / binlog) generator.

Emits a change log over a table of source-code repositories with columns
``(repo, path, commit, lang, content)`` wrapped in a CDC envelope
``(lsn, op, commit_ts)`` — the engine's input per the north rule.

Semantics modeled on the reference ingest edge:

- globally monotonic ``lsn``; strict total order per ``(repo, path)`` — the
  analog of the reference's (collector, enricher, load)_tstamp ordering triple
  (``etl/dags/user_history/include/load/modules/mod_load_data_get_data.sql:16``);
- replay **duplicates**: ~``dup_rate`` of events re-emitted verbatim (same lsn,
  same payload) later in the stream — must be no-ops on apply, the analog of
  the idempotent anti-join insert (``mod_data_insert.sql:5-6``);
- bounded **out-of-order** delivery within ``ooo_window`` stream positions —
  the analog of allowed lateness (``event_partition.py:28-66``);
- **skew**: repo popularity ~ Zipf so one repo dominates (exercises the
  engine's per-batch pre-reduction / salted sub-key handling);
- additive **schema evolution**: events with ``lsn > evolve_lsn`` carry a new
  nullable ``size_bytes:int64`` column; earlier segment files do not have the
  column at all (``insert_user_history.sql:15-42`` semantics on apply). A
  second, struct-typed evolution (``meta: struct<author, msg>``, the analog of
  the reference's nested ``params``/``ctx_*`` payload columns, SURVEY §1.2)
  activates for ``lsn > evolve2_lsn`` when ``evolve2_at_frac < 1``.

Everything is a pure function of ``seed`` + the size parameters: no
wall-clock, no un-seeded randomness — so tests, the oracle and the engine all
see byte-identical inputs.
"""

from __future__ import annotations

import json
import os
import string
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

EXTS = ["py", "rs", "go", "js", "md", "txt", "c", "java"]
EXT_TO_LANG = {
    "py": "python",
    "rs": "rust",
    "go": "go",
    "js": "javascript",
    "md": "markdown",
    "txt": "text",
    "c": "c",
    "java": "java",
}

# Epoch for commit_ts: fixed, so the log is a pure function of the seed.
T0_US = pd.Timestamp("2024-01-01").value // 1000  # microseconds

MANIFEST_NAME = "_segments.json"


@dataclass
class WalInfo:
    """Summary of a generated WAL: segment files + per-segment lineage."""

    wal_dir: str
    n_events: int  # total emitted rows (incl. duplicate re-emits)
    n_base_events: int  # distinct LSNs
    evolve_lsn: int  # size_bytes exists for lsn > evolve_lsn (0 = from start)
    segments: list[dict] = field(default_factory=list)
    params: dict | None = None  # generation parameters (cache validation)
    evolve2_lsn: int | None = None  # meta struct exists for lsn > evolve2_lsn
    # (None/== n_base_events: never — pre-struct manifests omit the field)

    @property
    def segment_files(self) -> list[str]:
        return [s["file"] for s in self.segments]

    def save(self) -> None:
        tmp = os.path.join(self.wal_dir, MANIFEST_NAME + ".tmp")
        with open(tmp, "w") as f:
            json.dump(
                {
                    "n_events": self.n_events,
                    "n_base_events": self.n_base_events,
                    "evolve_lsn": self.evolve_lsn,
                    "evolve2_lsn": self.evolve2_lsn,
                    "segments": self.segments,
                    "params": self.params,
                },
                f,
                indent=1,
            )
        os.replace(tmp, os.path.join(self.wal_dir, MANIFEST_NAME))

    @staticmethod
    def load(wal_dir: str) -> "WalInfo":
        with open(os.path.join(wal_dir, MANIFEST_NAME)) as f:
            d = json.load(f)
        return WalInfo(
            wal_dir=wal_dir,
            n_events=d["n_events"],
            n_base_events=d["n_base_events"],
            evolve_lsn=d["evolve_lsn"],
            segments=d["segments"],
            params=d.get("params"),
            evolve2_lsn=d.get("evolve2_lsn"),
        )


def _content_pool(rng: np.random.RandomState, n_blocks: int, min_len: int, max_len: int) -> np.ndarray:
    """A pool of deterministic pseudo-source text blocks with geometric sizes.

    Per-row unique content comes from a per-event header line prepended to a
    pool block, so generation stays fully vectorized (no per-row hashing).
    """
    alphabet = np.array(list(string.ascii_lowercase + "_ ():=\n"), dtype="U1")
    sizes = np.geomspace(max(min_len, 8), max(max_len, min_len + 1), n_blocks).astype(np.int64)
    blocks = []
    for sz in sizes:
        chars = alphabet[rng.randint(0, len(alphabet), int(sz))]
        blocks.append("".join(chars.tolist()))
    return np.array(blocks, dtype=object)


def _gen_chunk(
    rng: np.random.RandomState,
    lsn: np.ndarray,
    *,
    n_repos: int,
    paths_per_repo: int,
    zipf_s: float,
    delete_rate: float,
    dup_rate: float,
    ooo_window: int,
    pool: np.ndarray,
    repo_names: np.ndarray,
    step_us: int,
    malform_rate: float = 0.0,
) -> pd.DataFrame:
    """One chunk of the stream: base events for ``lsn`` plus re-emitted
    duplicates, in bounded-out-of-order stream order. Pure function of
    (rng state, lsn range)."""
    n = len(lsn)
    repo_idx = (rng.zipf(zipf_s, n) - 1) % n_repos
    path_idx = rng.randint(0, paths_per_repo, n)

    ext_idx = (repo_idx * 31 + path_idx) % len(EXTS)
    ext_arr = np.array(EXTS, dtype=object)[ext_idx]
    repo_s = pd.Series(repo_names[repo_idx], dtype=object)
    path_s = (
        "src/m"
        + pd.Series((path_idx // 50).astype(str), dtype=object)
        + "/f"
        + pd.Series((path_idx % 50).astype(str), dtype=object)
        + "."
        + pd.Series(ext_arr, dtype=object)
    )
    lang_s = pd.Series(ext_arr, dtype=object).map(EXT_TO_LANG)

    # op labels: delete by rate; insert = first occurrence of the key within
    # this chunk (a cross-chunk repeat may be labeled 'insert' again — the
    # engine and oracle treat insert/update identically, only 'delete' acts)
    is_delete = rng.random_sample(n) < delete_rate
    key_id = repo_idx.astype(np.int64) * (paths_per_repo + 1) + path_idx
    _, first_pos = np.unique(key_id, return_index=True)
    is_first = np.zeros(n, dtype=bool)
    is_first[first_pos] = True
    op = np.where(is_delete, "delete", np.where(is_first, "insert", "update")).astype(object)

    commit_s = pd.Series(np.char.mod("%040x", lsn), dtype=object)
    header = "// " + repo_s + "/" + path_s + " @ " + pd.Series(lsn).astype(str) + "\n"
    content_s = header + pd.Series(pool[lsn % len(pool)], dtype=object)

    commit_s = commit_s.mask(is_delete)
    lang_out = lang_s.mask(is_delete)
    content_out = content_s.mask(is_delete)
    size_bytes = content_out.str.len().astype("float64").to_numpy()

    # struct-evolution payload (meta.author / meta.msg): pure function of
    # (lsn, path); null on deletes like the other payload columns
    author_s = pd.Series("dev" + pd.Series(lsn % 13).astype(str), dtype=object).mask(is_delete)
    msg_s = ("edit " + path_s + " @" + pd.Series(lsn).astype(str)).mask(is_delete)

    base = pd.DataFrame(
        {
            "lsn": lsn,
            "op": op,
            "repo": repo_s,
            "path": path_s,
            "commit": commit_s,
            "lang": lang_out,
            "content": content_out,
            "commit_ts": T0_US + lsn * step_us,
            "_size": size_bytes,
            "_author": author_s,
            "_msg": msg_s,
        }
    )

    if malform_rate > 0:
        # malformed envelope rows (the reference's bad-record reality:
        # load_data.sql event_quality marking): half get an unknown op,
        # half a null key column — the engine must quarantine, not crash
        # or silently drop
        bad = rng.random_sample(n) < malform_rate
        kind = rng.random_sample(n) < 0.5
        base.loc[bad & kind, "op"] = "corrupt"
        base.loc[bad & ~kind, "path"] = None

    pos = np.arange(n, dtype=np.float64)
    jitter = rng.randint(0, max(ooo_window // 4, 1), n)
    sort_key = pos + jitter

    n_dups = int(n * dup_rate)
    if n_dups:
        dup_src = rng.choice(np.arange(max(int(n * 0.9), 1)), size=n_dups, replace=False)
        dups = base.iloc[dup_src].copy()
        dup_key = pos[dup_src] + rng.randint(1, max(ooo_window, 2), n_dups) + 0.5
        stream = pd.concat(
            [base.assign(_k=sort_key), dups.assign(_k=dup_key)], ignore_index=True
        )
    else:
        stream = base.assign(_k=sort_key)
    return (
        stream.sort_values("_k", kind="mergesort").drop(columns="_k").reset_index(drop=True)
    )


def generate_wal(
    wal_dir: str,
    *,
    seed: int = 42,
    n_events: int = 100_000,
    n_repos: int = 50,
    paths_per_repo: int = 400,
    zipf_s: float = 1.1,
    delete_rate: float = 0.05,
    dup_rate: float = 0.02,
    ooo_window: int = 2_000,
    evolve_at_frac: float = 0.6,
    evolve2_at_frac: float = 1.0,
    widen_at_frac: float | None = None,  # size_bytes int32 before, int64 after
    malform_rate: float = 0.0,
    segment_rows: int = 50_000,
    content_min: int = 64,
    content_max: int = 4_096,
    days_span: int = 30,
    chunk_rows: int = 1_000_000,
    overwrite: bool = False,
) -> WalInfo:
    """Generate a deterministic CDC log under ``wal_dir/``.

    Generation is chunked (``chunk_rows`` at a time, each chunk seeded from
    (seed, chunk_index)) so 10^7+-event logs are memory-bounded; duplicates
    and out-of-order jitter stay within a chunk, which upper-bounds lateness
    — the allowed-lateness analog of ``event_partition.py:28-66``.

    Returns a :class:`WalInfo`; also persists it as ``_segments.json`` (the
    segment lineage manifest the engine's source discovery reads).
    """
    params = {
        "seed": seed,
        "n_events": int(n_events),
        "n_repos": n_repos,
        "paths_per_repo": paths_per_repo,
        "zipf_s": zipf_s,
        "delete_rate": delete_rate,
        "dup_rate": dup_rate,
        "ooo_window": ooo_window,
        "evolve_at_frac": evolve_at_frac,
        "evolve2_at_frac": evolve2_at_frac,
        "widen_at_frac": widen_at_frac,
        "malform_rate": malform_rate,
        "segment_rows": segment_rows,
        "content_min": content_min,
        "content_max": content_max,
        "days_span": days_span,
        "chunk_rows": chunk_rows,
        "row_group_rows": 32_768,  # cache-buster: rg layout is part of identity
    }
    manifest_path = os.path.join(wal_dir, MANIFEST_NAME)
    if os.path.exists(manifest_path) and not overwrite:
        cached = WalInfo.load(wal_dir)
        if cached.params == params:
            return cached
        # same dir, different parameters: the cache is stale — regenerate
        overwrite = True

    os.makedirs(wal_dir, exist_ok=True)
    n = int(n_events)
    pool = _content_pool(np.random.RandomState(seed), 64, content_min, content_max)
    repo_names = np.array([f"org{r % 7}/repo{r:03d}" for r in range(n_repos)], dtype=object)
    step_us = max(1, int(days_span * 86_400_000_000 // max(n, 1)))
    # evolve_at_frac semantics: <=0 → size_bytes present from the start
    # (evolve_lsn 0); >=1 → never (evolve_lsn n, no lsn exceeds it);
    # otherwise the column appears for lsn > n*frac
    if evolve_at_frac <= 0:
        evolve_lsn = 0
    elif evolve_at_frac >= 1:
        evolve_lsn = n
    else:
        evolve_lsn = int(n * evolve_at_frac)
    if evolve2_at_frac <= 0:
        evolve2_lsn = 0
    elif evolve2_at_frac >= 1:
        evolve2_lsn = n
    else:
        evolve2_lsn = int(n * evolve2_at_frac)

    info = WalInfo(
        wal_dir=wal_dir,
        n_events=0,
        n_base_events=n,
        evolve_lsn=evolve_lsn,
        params=params,
        evolve2_lsn=evolve2_lsn,
    )

    def flush_segment(seg: pd.DataFrame) -> None:
        seq = len(info.segments)
        has_evo = bool((seg["lsn"] > evolve_lsn).any())
        cols = {
            "lsn": pa.array(seg["lsn"].to_numpy(), pa.int64()),
            "op": pa.array(seg["op"], pa.string()),
            "repo": pa.array(seg["repo"], pa.string()),
            "path": pa.array(seg["path"], pa.string()),
            "commit": pa.array(seg["commit"], pa.string()),
            "lang": pa.array(seg["lang"], pa.string()),
            "content": pa.array(seg["content"], pa.string()),
            "commit_ts": pa.array(seg["commit_ts"].to_numpy(), pa.timestamp("us")),
        }
        if has_evo:
            sz = seg["_size"].where(seg["lsn"] > evolve_lsn, np.nan)
            # widening evolution: early post-evolve segments carry the
            # column at int32 (a producer that under-sized it), later ones
            # at int64 — readers unify through the widening lattice
            size32 = (
                widen_at_frac is not None
                and int(seg["lsn"].max()) <= int(n * widen_at_frac)
            )
            cols["size_bytes"] = pa.Array.from_pandas(
                sz, type=pa.int32() if size32 else pa.int64()
            )
        else:
            size32 = False
        has_evo2 = bool((seg["lsn"] > evolve2_lsn).any())
        if has_evo2:
            live2 = (seg["lsn"] > evolve2_lsn).to_numpy() & seg["_author"].notna().to_numpy()
            meta = pa.StructArray.from_arrays(
                [
                    pa.array(seg["_author"].where(live2), pa.string()),
                    pa.array(seg["_msg"].where(live2), pa.string()),
                ],
                names=["author", "msg"],
                mask=pa.array(~live2),
            )
            cols["meta"] = meta
        fpath = os.path.join(wal_dir, f"seg-{seq:08d}.parquet")
        # moderate row groups so readers can split a segment across tasks
        # (a single 1M-row default row group pins one file to one reader)
        pq.write_table(
            pa.table(cols),
            fpath + ".tmp",
            compression="zstd",
            row_group_size=32_768,
        )
        os.replace(fpath + ".tmp", fpath)
        info.segments.append(
            {
                "file": fpath,
                "seqno": seq,
                "min_lsn": int(seg["lsn"].min()),
                "max_lsn": int(seg["lsn"].max()),
                "rows": len(seg),
                "has_size_bytes": has_evo,
                "size_bytes_int32": size32,
                "has_meta": has_evo2,
                "min_ts_us": int(seg["commit_ts"].min()),
                "max_ts_us": int(seg["commit_ts"].max()),
            }
        )
        info.n_events += len(seg)

    buffer: list[pd.DataFrame] = []
    buffered = 0
    for ci, start in enumerate(range(0, n, chunk_rows)):
        cnt = min(chunk_rows, n - start)
        rng = np.random.RandomState((seed + 1_000_003 * ci) % (2**31 - 1))
        lsn = np.arange(start + 1, start + cnt + 1, dtype=np.int64)
        stream = _gen_chunk(
            rng,
            lsn,
            n_repos=n_repos,
            paths_per_repo=paths_per_repo,
            zipf_s=zipf_s,
            delete_rate=delete_rate,
            dup_rate=dup_rate,
            ooo_window=min(ooo_window, cnt),
            pool=pool,
            repo_names=repo_names,
            step_us=step_us,
            malform_rate=malform_rate,
        )
        buffer.append(stream)
        buffered += len(stream)
        while buffered >= segment_rows:
            joined = pd.concat(buffer, ignore_index=True) if len(buffer) > 1 else buffer[0]
            flush_segment(joined.iloc[:segment_rows])
            rest = joined.iloc[segment_rows:]
            buffer = [rest] if len(rest) else []
            buffered = len(rest)
    if buffered:
        joined = pd.concat(buffer, ignore_index=True) if len(buffer) > 1 else buffer[0]
        if len(joined):
            flush_segment(joined)
    info.save()
    return info
