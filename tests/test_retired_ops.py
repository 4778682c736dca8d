"""DuckDB-oracle coverage for ops retired from the driver's 50-entry judged
registry (``__ray_entry__.queries()``) but still part of the engine surface:
``sliding_window_counts`` and ``doc_winnow_fingerprints``. Same comparison
contract as tests/test_queries_vs_oracle.py (sorted columns, sorted rows,
exact values)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SLIDING_WINDOW_SQL = """
    WITH w AS (
        SELECT CAST(floor(epoch_us(ts) / 43200000000) * 43200000000 AS BIGINT)
                   AS window_start_us, value
        FROM events
        UNION ALL
        SELECT CAST(floor((epoch_us(ts) - 21600000000) / 43200000000) * 43200000000
                    + 21600000000 AS BIGINT), value
        FROM events
    )
    SELECT window_start_us, COUNT(*) AS events,
           ROUND(SUM(value), 6) AS total_value
    FROM w GROUP BY 1 ORDER BY 1
"""

WINNOW_SQL = """
    -- the winnowing hash is prime*(k-byte sum) with an xor-shift,
    -- replicable on ASCII text via codepoint lists (k=8, window=16)
    WITH base AS (
        SELECT doc_id,
               regexp_replace(lower(text), '\\s+', ' ', 'g') AS s
        FROM documents
    ), c AS (
        SELECT doc_id,
               [unicode(ch) FOR ch IN regexp_extract_all(s, '.')] AS codes
        FROM base
    ), hh AS (
        SELECT doc_id, len(codes) AS L,
            list_transform(
                [list_sum(codes[i:i+7])
                 FOR i IN range(1, len(codes) - 8 + 2)],
                v -> xor(v * 1099511628211,
                         (v * 1099511628211) >> 33)) AS h
        FROM c
    ), f AS (
        SELECT doc_id,
            CASE WHEN L < 8 THEN CAST([] AS BIGINT[])
                 WHEN len(h) >= 16 THEN list_distinct(
                     [list_min(h[i:i+15])
                      FOR i IN range(1, len(h) - 16 + 2)])
                 ELSE [list_min(h)] END AS fps
        FROM hh
    )
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           CAST(COALESCE(list_min(fps), 0) AS BIGINT) AS min_fp,
           CAST(COALESCE(list_max(fps), 0) AS BIGINT) AS max_fp
    FROM f ORDER BY doc_id
"""


LINEITEM_KMV_SQL = """
    -- KMV sketch is exact below its k=8192 capacity; sf0.01 has
    -- 2000 distinct partkeys (NOT exact at sf>=0.05)
    SELECT 'l_partkey' AS key,
           CAST(COUNT(DISTINCT l_partkey) AS DOUBLE) AS approx_distinct
    FROM lineitem
"""


ENTITY_UNION_SQL = """
    SELECT kind, name, nationkey, acctbal, mktsegment FROM (
        SELECT 'customer' AS kind, c_name AS name, c_nationkey AS nationkey,
               ROUND(c_acctbal, 2) AS acctbal, c_mktsegment AS mktsegment
        FROM customer
        UNION ALL
        SELECT 'supplier', s_name, s_nationkey, ROUND(s_acctbal, 2), NULL
        FROM supplier
    ) ORDER BY kind, name
"""


def _oracle(sf_dir: str, tables: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for table in tables.split(","):
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
        )
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize(
    "fn_name,module,table,sql",
    [
        ("sliding_window_counts", "etl_ray.ops.events", "events", SLIDING_WINDOW_SQL),
        ("doc_winnow_fingerprints", "etl_ray.ops.text", "documents", WINNOW_SQL),
        # rotated out in round 5 to admit cdc_registration_view (D7
        # union-align stays driver-covered by part_brand_union)
        ("entity_union_by_name", "etl_ray.ops.relational",
         "customer,supplier", ENTITY_UNION_SQL),
        # rotated out in round 5 to admit cdc_session_view (the KMV sketch
        # family stays driver-covered by events_approx_distinct_users)
        ("lineitem_approx_distinct_parts", "etl_ray.ops.sketch",
         "lineitem", LINEITEM_KMV_SQL),
    ],
)
def test_retired_op_matches_oracle(ray_session, sf_dir, fn_name, module, table, sql):
    import importlib

    fn = getattr(importlib.import_module(module), fn_name)
    got = fn(sf_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    exp = _oracle(sf_dir, table, sql)
    got, exp = _norm(got), _norm(exp)
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
