"""S7 REST→table small-ingest pattern: fetch → normalize → cast →
per-day idempotent delete-then-insert → broadcast enrichment."""

from __future__ import annotations

import json

import pandas as pd

from etl_ray.sources import (
    DayPartitionedTable,
    apply_casts,
    ingest_rates,
    normalize_columns,
)


def _payload(tmp_path, rows):
    p = tmp_path / "rates.json"
    p.write_text(json.dumps(rows))
    return f"file://{p}"


def test_ingest_normalize_cast_partition(tmp_path):
    url = _payload(
        tmp_path,
        [
            {"Day": "2024-01-01", "Currency Code": "EUR", "Rate": "1.09"},
            {"Day": "2024-01-01", "Currency Code": "GBP", "Rate": "1.27"},
            {"Day": "2024-01-02", "Currency Code": "EUR", "Rate": "1.10"},
        ],
    )
    root = str(tmp_path / "rates")
    res = ingest_rates(url, root)
    assert res == {"2024-01-01": 2, "2024-01-02": 1}
    df = DayPartitionedTable(root).read_all()
    assert list(df.columns) == ["day", "currency_code", "rate"]
    assert df["rate"].dtype == "float64"
    assert len(df) == 3


def test_reingest_day_is_idempotent_overwrite(tmp_path):
    """The delete-day-then-insert contract: a corrected re-delivery of one
    day replaces that day exactly, other days untouched."""
    url1 = _payload(
        tmp_path,
        [
            {"Day": "2024-01-01", "Currency Code": "EUR", "Rate": "1.09"},
            {"Day": "2024-01-02", "Currency Code": "EUR", "Rate": "1.10"},
        ],
    )
    root = str(tmp_path / "rates")
    ingest_rates(url1, root)

    fixed = tmp_path / "fixed.json"
    fixed.write_text(
        json.dumps([{"Day": "2024-01-02", "Currency Code": "EUR", "Rate": "1.11"}])
    )
    ingest_rates(f"file://{fixed}", root)
    ingest_rates(f"file://{fixed}", root)  # replay: no duplicates

    df = DayPartitionedTable(root).read_all().sort_values("day")
    assert len(df) == 2
    assert df[df["day"] == "2024-01-02"]["rate"].iloc[0] == 1.11


def test_ingested_dim_broadcast_enriches(ray_session, tmp_path, sf_dir):
    """The ingested side table feeds a broadcast join (J3), closing the
    reference's fetch→enrich loop (currency rates onto revenue)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from etl_ray.ops.common import read

    url = _payload(
        tmp_path,
        [{"Day": "2024-01-01", "Currency Code": "USD", "Rate": "0.5"}],
    )
    root = str(tmp_path / "rates")
    ingest_rates(url, root)
    rate = float(DayPartitionedTable(root).read_all()["rate"].iloc[0])
    rate_ref = ray.put(rate)

    class RateJoiner:
        def __init__(self):
            self.rate = ray.get(rate_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.append_column(
                "o_totalprice_eur", pc.multiply(t["o_totalprice"], self.rate)
            )

        # loaded once per actor — the ST6 broadcast-dim slot

    ds = read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = ds.map_batches(RateJoiner, batch_format="pyarrow", concurrency=(1, 2))
    df = out.to_pandas()
    assert np.allclose(df["o_totalprice_eur"], df["o_totalprice"] * rate)


def test_column_utils():
    df = pd.DataFrame({"Some Col!": ["1"], "OTHER": ["x"]})
    out = normalize_columns(df)
    assert list(out.columns) == ["some_col", "other"]
    cast = apply_casts(out, {"some_col": "int64"})
    assert cast["some_col"].dtype == "int64"
