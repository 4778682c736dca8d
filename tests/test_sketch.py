"""KMV approximate-distinct accuracy and deterministic sampling."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def wide_domain(tmp_path_factory):
    rng = np.random.RandomState(2)
    n, distinct = 200_000, 50_000
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array(rng.randint(0, distinct, n), pa.int64()),
            "event_type": pa.array(["x"] * n, pa.string()),
        }
    )
    d = tmp_path_factory.mktemp("wide")
    pq.write_table(t, str(d / "events.parquet"))
    true_distinct = len(np.unique(t["user_id"].to_numpy()))
    return str(d), true_distinct


def test_kmv_small_domain_exact(ray_session, sf_dir):
    from etl_ray.ops.sketch import events_approx_distinct_users

    df = events_approx_distinct_users(sf_dir)
    assert df["approx_distinct"][0] == 15.0  # < k distinct → exact


def test_kmv_wide_domain_accuracy(ray_session, wide_domain):
    from etl_ray.ops.sketch import approx_distinct

    d, truth = wide_domain
    est = approx_distinct(d, "events", ["user_id"], k=1024)["approx_distinct"][0]
    rel_err = abs(est - truth) / truth
    assert rel_err < 0.1, f"KMV rel err {rel_err:.3f} (est={est}, true={truth})"


def test_kmv_merge_associative():
    from etl_ray.ops.sketch import _kmv_merge, kmv_estimate

    rng = np.random.RandomState(4)
    vals = rng.randint(0, 2**63, 30_000).astype(np.uint64)
    k = 512
    whole = _kmv_merge([np.unique(vals)[:k]], k)
    split = _kmv_merge(
        [np.unique(vals[:10_000])[:k], np.unique(vals[10_000:])[:k]], k
    )
    assert kmv_estimate(whole, k) == kmv_estimate(split, k)


def test_deterministic_sample(ray_session, sf_dir):
    from etl_ray.ops.sketch import events_sample

    a = events_sample(sf_dir, frac=0.2)
    b = events_sample(sf_dir, frac=0.2)
    assert a.equals(b)  # same rows every run
    n_total = 1000  # sf0.001 events rows
    assert 0.1 * n_total < len(a) < 0.3 * n_total
    sup = events_sample(sf_dir, frac=0.5)
    assert set(a["event_id"]) <= set(sup["event_id"])  # nested samples
