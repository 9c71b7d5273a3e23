"""Windowed aggregates vs duckdb oracles (tumbling, sliding, session)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def events(ray_session):
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.01/events.parquet")
    con = duckdb.connect()
    con.sql("CREATE VIEW events AS SELECT * FROM "
            "'/root/testdata/sf0.01/events.parquet'")
    return ds, con


def test_tumbling_window_vs_oracle(events):
    from bloomjoin_ray.pipelines.windows import tumbling_window

    ds, con = events
    got = tumbling_window(ds, "ts", 3600, key="event_type",
                          sum_cols={"value": "sum_value"}).to_pandas()
    want = con.sql("""
        SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
               sum(value) AS sum_value, count(*) AS n
        FROM events GROUP BY 1, 2
    """).df()
    key = ["event_type", "window_start"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w)
    pd.testing.assert_series_equal(g["n"], w["n"], check_dtype=False)
    np.testing.assert_allclose(g["sum_value"], w["sum_value"], rtol=1e-9)


def test_sliding_window_counts(events):
    from bloomjoin_ray.pipelines.windows import sliding_window, tumbling_window

    ds, con = events
    got = sliding_window(ds, "ts", size_s=7200, slide_s=3600).to_pandas()
    # oracle: every event counts toward the two 2h windows covering it
    want = con.sql("""
        WITH starts AS (
          SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w FROM events
          UNION ALL
          SELECT time_bucket(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR FROM events)
        SELECT w AS window_start, count(*) AS n FROM starts GROUP BY 1
    """).df()
    g = got.sort_values("window_start").reset_index(drop=True)
    w = want.sort_values("window_start").reset_index(drop=True)
    assert len(g) == len(w)
    pd.testing.assert_series_equal(g["n"], w["n"], check_dtype=False)
    with pytest.raises(ValueError, match="multiple"):
        sliding_window(ds, "ts", size_s=5000, slide_s=3600)

    # sum_cols variant (same expansion + SUM)
    got2 = (sliding_window(ds, "ts", size_s=7200, slide_s=3600,
                           sum_cols={"value": "sum_value"})
            .to_pandas().sort_values("window_start")
            .reset_index(drop=True))
    want2 = con.sql("""
        WITH starts AS (
          SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w, value FROM events
          UNION ALL
          SELECT time_bucket(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR, value
          FROM events)
        SELECT w AS window_start, sum(value) AS sum_value, count(*) AS n
        FROM starts GROUP BY 1 ORDER BY 1
    """).df()
    assert np.allclose(got2["sum_value"], want2["sum_value"], rtol=1e-12)
    pd.testing.assert_series_equal(got2["n"], want2["n"],
                                   check_dtype=False)


def test_sessionize_vs_oracle(events):
    from bloomjoin_ray.pipelines.windows import sessionize

    ds, con = events
    got = sessionize(ds, "user_id", "ts", gap_s=86_400).to_pandas()
    want = con.sql("""
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL 86400 SECONDS OR
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 THEN 1 ELSE 0 END AS new_s
          FROM events),
        sess AS (
          SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid
          FROM flagged)
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events
        FROM sess GROUP BY user_id, sid
    """).df()
    key = ["user_id", "session_start"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(
        g[["user_id", "session_start", "session_end", "n_events"]],
        w[["user_id", "session_start", "session_end", "n_events"]],
        check_dtype=False)


def test_shift_per_key_matches_sql(ray_session):
    """shift_per_key == SQL lag()/lead() windows, including nulls at
    segment edges, multi-column shifts, offset 2, and repartitioning."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.windows import shift_per_key

    rng = np.random.default_rng(11)
    n = 5000
    t = pa.table({
        "u": pa.array(rng.integers(0, 40, n), type=pa.int64()),
        "seq": pa.array(np.arange(n), type=pa.int64()),
        "v": pa.array(rng.normal(size=n)),
        "s": pa.array([f"x{i % 7}" for i in range(n)]),
    })
    con = duckdb.connect()
    con.register("t", t)

    for offset, fn in ((1, "lag(%s, 1)"), (2, "lag(%s, 2)"),
                       (-1, "lead(%s, 1)")):
        suffix = "_lag" if offset > 0 else "_lead"
        got = (shift_per_key(rd.from_arrow(t).repartition(7), "u",
                             [("seq", "ascending")], ["v", "s"],
                             offset=offset)
               .to_pandas().sort_values(["u", "seq"])
               .reset_index(drop=True))
        want = con.sql(f"""
            SELECT u, seq, v, s,
                   {fn % 'v'} OVER w AS v{suffix},
                   {fn % 's'} OVER w AS s{suffix}
            FROM t WINDOW w AS (PARTITION BY u ORDER BY seq)
            ORDER BY u, seq
        """).df()
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                      check_dtype=False)

    with pytest.raises(ValueError, match="offset"):
        shift_per_key(rd.from_arrow(t), "u", [("seq", "ascending")],
                      ["v"], offset=0)


def test_window_agg_per_key_matches_sql(ray_session):
    """window_agg_per_key == SQL sum/avg/count() OVER (... ROWS BETWEEN
    N PRECEDING AND CURRENT ROW), cumulative + rolling frames, nulls,
    int and float inputs, across repartitioning (bucket unions)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.windows import window_agg_per_key

    rng = np.random.default_rng(23)
    n = 4000
    v = rng.integers(0, 100, n).astype(float)
    v[rng.random(n) < 0.15] = np.nan
    t = pa.table({
        "u": pa.array(rng.integers(0, 31, n), type=pa.int64()),
        "seq": pa.array(np.arange(n), type=pa.int64()),
        "v": pa.array(v, from_pandas=True),            # nullable float
        "vi": pa.array(np.where(np.isnan(v), None, v)).cast(pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)
    ob = [("seq", "ascending")]

    cases = [
        # (col, agg, rows_preceding, sql frame, sql fn, cast)
        ("vi", "sum", None, "ROWS UNBOUNDED PRECEDING",
         "CAST(sum(vi) OVER w AS BIGINT)", None),
        ("v", "sum", 5, "ROWS BETWEEN 5 PRECEDING AND CURRENT ROW",
         "sum(v) OVER w", None),
        ("v", "mean", 3, "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW",
         "avg(v) OVER w", None),
        ("v", "count", 10, "ROWS BETWEEN 10 PRECEDING AND CURRENT ROW",
         "count(v) OVER w", None),
        ("v", "count", None, "ROWS UNBOUNDED PRECEDING",
         "count(v) OVER w", None),
        ("vi", "mean", None, "ROWS UNBOUNDED PRECEDING",
         "avg(vi) OVER w", None),
    ]
    for col, agg, np_, frame, fn, _ in cases:
        out = window_agg_per_key(rd.from_arrow(t).repartition(9), "u", ob,
                                 col, agg=agg, rows_preceding=np_,
                                 out_col="o")
        got = (out.to_pandas().sort_values(["u", "seq"])
               .reset_index(drop=True))
        want = con.sql(f"""
            SELECT u, seq, {fn} AS o
            FROM t WINDOW w AS (PARTITION BY u ORDER BY seq {frame})
            ORDER BY u, seq
        """).df()
        pd.testing.assert_series_equal(got["o"], want["o"],
                                       check_dtype=False)

    # default out_col naming + frame kind
    assert "v_roll_sum" in window_agg_per_key(
        rd.from_arrow(t), "u", ob, "v", rows_preceding=2).schema().names
    assert "v_cum_sum" in window_agg_per_key(
        rd.from_arrow(t), "u", ob, "v").schema().names

    with pytest.raises(ValueError, match="agg"):
        window_agg_per_key(rd.from_arrow(t), "u", ob, "v", agg="median")
    with pytest.raises(ValueError, match="rows_preceding"):
        window_agg_per_key(rd.from_arrow(t), "u", ob, "v",
                           rows_preceding=-1)


def test_ntile_per_key_matches_sql(ray_session):
    """ntile_per_key == SQL ntile(n) bit-exactly, including keys with
    fewer rows than tiles and single-tile degenerate case."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pytest
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.windows import ntile_per_key

    rng = np.random.default_rng(31)
    n = 3000
    t = pa.table({
        # key 999 gets exactly 2 rows (< n_tiles) via the tail append
        "u": pa.array(np.concatenate([rng.integers(0, 25, n - 2),
                                      [999, 999]]), type=pa.int64()),
        "seq": pa.array(np.arange(n), type=pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)

    for nt in (1, 4, 7):
        got = (ntile_per_key(rd.from_arrow(t).repartition(5), "u",
                             [("seq", "ascending")], nt)
               .to_pandas().sort_values(["u", "seq"])
               .reset_index(drop=True))
        want = con.sql(f"""
            SELECT u, seq, ntile({nt}) OVER (PARTITION BY u
                ORDER BY seq) AS ntile
            FROM t ORDER BY u, seq
        """).df()
        pd.testing.assert_series_equal(got["ntile"], want["ntile"],
                                       check_dtype=False)

    with pytest.raises(ValueError, match="n_tiles"):
        ntile_per_key(rd.from_arrow(t), "u", [("seq", "ascending")], 0)


def test_rank_per_key_matches_sql(ray_session):
    """rank/dense_rank/percent_rank/cume_dist vs DuckDB with heavy
    ties, multi-column order, nulls-as-peers, and single-row keys."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.windows import rank_per_key

    rng = np.random.default_rng(7)
    n = 3000
    t = pa.table({
        "k": pa.array(np.concatenate([rng.integers(0, 80, n - 1), [999]]),
                      pa.int64()),            # key 999: single row
        "id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array([None if x == 0 else int(x)
                       for x in rng.integers(0, 8, n)], pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)
    got = (rank_per_key(rd.from_arrow(t).repartition(6), "k", ["v", "id"])
           .to_pandas().sort_values(["k", "id"]).reset_index(drop=True))
    want = con.sql("""
        SELECT k, id, v,
               rank() OVER w AS rank,
               dense_rank() OVER w AS dense_rank,
               percent_rank() OVER w AS percent_rank,
               cume_dist() OVER w AS cume_dist
        FROM t WINDOW w AS (PARTITION BY k ORDER BY v NULLS LAST, id)
        ORDER BY k, id
    """).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)

    # ties only on v (id dropped from order): peers share rank/cume
    got2 = (rank_per_key(rd.from_arrow(t).repartition(3), "k", ["v"],
                         ranks=("rank", "cume_dist"))
            .to_pandas().sort_values(["k", "id"]).reset_index(drop=True))
    want2 = con.sql("""
        SELECT k, id, v,
               rank() OVER w AS rank,
               cume_dist() OVER w AS cume_dist
        FROM t WINDOW w AS (PARTITION BY k ORDER BY v NULLS LAST)
        ORDER BY k, id
    """).df()
    pd.testing.assert_frame_equal(got2[want2.columns.tolist()], want2,
                                  check_dtype=False)

    with pytest.raises(ValueError):
        rank_per_key(rd.from_arrow(t), "k", ["v"], ranks=("median",))


def test_first_last_per_key_matches_sql(ray_session):
    """first_value/last_value/nth_value over the full-partition frame
    vs DuckDB, incl. nulls (both RESPECT and IGNORE), an all-null key,
    nth beyond the partition size, and string payloads."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.windows import first_last_per_key

    rng = np.random.default_rng(11)
    n = 2500
    k = np.concatenate([rng.integers(0, 60, n - 2), [777, 777]])
    v = [None if rng.random() < 0.25 else f"s{int(x)}"
         for x in rng.integers(0, 50, n)]
    v[-2:] = [None, None]                      # key 777: all-null
    t = pa.table({
        "k": pa.array(k, pa.int64()),
        "id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(v, pa.string()),
    })
    con = duckdb.connect()
    con.register("t", t)

    got = (first_last_per_key(rd.from_arrow(t).repartition(5), "k",
                              ["id"], "v", nth=2)
           .to_pandas().sort_values(["k", "id"]).reset_index(drop=True))
    want = con.sql("""
        SELECT k, id, v,
               first_value(v) OVER w AS first_v,
               last_value(v) OVER w AS last_v,
               nth_value(v, 2) OVER w AS nth2_v
        FROM t WINDOW w AS (PARTITION BY k ORDER BY id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY k, id
    """).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)

    got2 = (first_last_per_key(rd.from_arrow(t).repartition(3), "k",
                               ["id"], "v", ignore_nulls=True)
            .to_pandas().sort_values(["k", "id"]).reset_index(drop=True))
    want2 = con.sql("""
        SELECT k, id, v,
               first_value(v IGNORE NULLS) OVER w AS first_v,
               last_value(v IGNORE NULLS) OVER w AS last_v
        FROM t WINDOW w AS (PARTITION BY k ORDER BY id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY k, id
    """).df()
    pd.testing.assert_frame_equal(got2[want2.columns.tolist()], want2,
                                  check_dtype=False)

    # nth far beyond every partition: all null
    got3 = (first_last_per_key(rd.from_arrow(t), "k", ["id"], "v",
                               values=(), nth=10**6)
            .to_pandas())
    assert got3[f"nth{10**6}_v"].isna().all()

    with pytest.raises(ValueError):
        first_last_per_key(rd.from_arrow(t), "k", ["id"], "v",
                           values=("median",))
    with pytest.raises(ValueError):
        first_last_per_key(rd.from_arrow(t), "k", ["id"], "v",
                           values=(), nth=None)


def test_ewma_per_key_matches_pandas(ray_session):
    """Segmented-affine-scan EWMA vs pandas groupby().ewm(adjust=False,
    ignore_na=True).mean(): long keys (scan depth), nulls carried
    forward, leading nulls, alpha=1 degenerate, invalid alpha."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.windows import ewma_per_key

    rng = np.random.default_rng(13)
    n = 6000
    k = np.concatenate([np.zeros(3000, dtype=np.int64),  # one long key
                        rng.integers(1, 50, n - 3000)])
    v = rng.normal(0, 10, n)
    v[rng.random(n) < 0.15] = np.nan
    v[np.nonzero(k == 7)[0][:4]] = np.nan          # leading nulls for k=7
    t = pa.table({"k": pa.array(k), "id": pa.array(np.arange(n)),
                  "v": pa.array([None if np.isnan(x) else float(x)
                                 for x in v], pa.float64())})
    for alpha in (0.3, 0.9, 1.0):
        got = (ewma_per_key(rd.from_arrow(t).repartition(5), "k", ["id"],
                            "v", alpha=alpha)
               .to_pandas().sort_values(["k", "id"]).reset_index(drop=True))
        df = t.to_pandas().sort_values(["k", "id"]).reset_index(drop=True)
        want = (df.groupby("k")["v"]
                .transform(lambda s: s.ewm(alpha=alpha, adjust=False,
                                           ignore_na=True).mean()))
        assert np.allclose(got["ewma_v"], want, rtol=1e-10, atol=1e-12,
                           equal_nan=True)

    with pytest.raises(ValueError):
        ewma_per_key(rd.from_arrow(t), "k", ["id"], "v", alpha=0.0)


def test_fill_forward_per_key_matches_sql(ray_session):
    """LOCF vs DuckDB's last_value(IGNORE NULLS) running window:
    leading nulls stay null, fills never cross keys, string + numeric
    columns."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.windows import fill_forward_per_key

    rng = np.random.default_rng(17)
    n = 3000
    t = pa.table({
        "k": pa.array(rng.integers(0, 40, n), pa.int64()),
        "id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array([None if rng.random() < 0.4 else float(x)
                       for x in rng.normal(0, 5, n)], pa.float64()),
        "s": pa.array([None if rng.random() < 0.5 else f"w{int(x)}"
                       for x in rng.integers(0, 9, n)], pa.string()),
    })
    got = (fill_forward_per_key(rd.from_arrow(t).repartition(6), "k",
                                ["id"], ["v", "s"])
           .to_pandas().sort_values(["k", "id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql("""
        SELECT k, id, v, s,
               last_value(v IGNORE NULLS) OVER w AS v_ff,
               last_value(s IGNORE NULLS) OVER w AS s_ff
        FROM t WINDOW w AS (PARTITION BY k ORDER BY id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY k, id
    """).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)


def test_share_per_key_matches_sql(ray_session):
    """value/sum() OVER (PARTITION BY key) vs DuckDB: int columns
    bit-exact, nulls excluded from totals and nulled in output."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.windows import share_per_key

    rng = np.random.default_rng(43)
    n = 4000
    t = pa.table({
        "k": pa.array(rng.integers(0, 60, n), pa.int64()),
        "id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array([None if rng.random() < 0.1 else int(x)
                       for x in rng.integers(0, 500, n)], pa.int64()),
    })
    got = (share_per_key(rd.from_arrow(t).repartition(5), "k", "v")
           .to_pandas().sort_values(["k", "id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql("""
        SELECT k, id, v,
               CAST(v AS DOUBLE)
                   / CAST(sum(v) OVER (PARTITION BY k) AS DOUBLE) AS v_share
        FROM t ORDER BY k, id
    """).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    sums = got.dropna(subset=["v_share"]).groupby("k")["v_share"].sum()
    assert np.allclose(sums, 1.0)


def test_window_ops_single_hot_key_stress(ray_session):
    """Adversarial skew: ONE key holding 300k rows routes to a single
    bucket — the vectorized reduces (rank ties, EWMA scan, share sums)
    must stay linear and exact. Spot-checks against closed forms."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.windows import (
        ewma_per_key,
        rank_per_key,
        share_per_key,
    )

    n = 300_000
    t = pa.table({
        "k": pa.array(np.zeros(n, dtype=np.int64)),
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(np.ones(n, dtype=np.int64)),     # all ties
    })
    ds = rd.from_arrow(t).repartition(8)

    r = (rank_per_key(ds, "k", ["v"], ranks=("rank", "dense_rank"))
         .to_pandas())
    assert len(r) == n
    assert (r["rank"] == 1).all() and (r["dense_rank"] == 1).all()

    s = share_per_key(ds, "k", "v").to_pandas()
    assert np.allclose(s["v_share"], 1.0 / n)

    e = (ewma_per_key(ds, "k", ["id"], "v", alpha=0.5)
         .to_pandas().sort_values("id"))
    assert np.allclose(e["ewma_v"], 1.0)               # constant input


def test_tail_by_budget_vs_oracle(events):
    from bloomjoin_ray.pipelines.windows import tail_by_budget

    ds, con = events

    def add_cost(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.append_column(
            "cost", pc.cast(pc.binary_length(batch.column("props")),
                            pa.int64()))

    ev = (ds.map_batches(add_cost, batch_format="pyarrow")
          .select_columns(["user_id", "event_id", "ts", "cost"]))
    got = tail_by_budget(
        ev, "user_id", [("ts", "descending"), ("event_id", "descending")],
        "cost", 300, out_col="cum_cost").to_pandas()
    want = con.sql("""
        WITH c AS (
            SELECT user_id, event_id, ts,
                   CAST(strlen(props) AS BIGINT) AS cost,
                   CAST(sum(strlen(props)) OVER w AS BIGINT) AS cum_cost,
                   row_number() OVER o AS rn
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   o AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
        )
        SELECT user_id, event_id, ts, cost, cum_cost FROM c
        WHERE cum_cost <= 300 OR rn = 1
    """).df()
    g = got.sort_values("event_id").reset_index(drop=True)
    w = want.sort_values("event_id").reset_index(drop=True)
    assert len(g) == len(w)
    for c in ["user_id", "event_id", "cost", "cum_cost"]:
        pd.testing.assert_series_equal(g[c], w[c], check_dtype=False)
    # every user keeps at least its most recent event
    n_users = con.sql("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert g["user_id"].nunique() == n_users


def test_tail_by_budget_no_keep_first_and_null_costs(ray_session):
    import duckdb
    import ray.data as rd

    from bloomjoin_ray.pipelines.windows import tail_by_budget

    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        "i": pa.array([0, 1, 2, 3, 0, 1, 0], pa.int64()),
        "c": pa.array([5, None, 7, 100, 4, 4, 50], pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(3)
    con = duckdb.connect()
    con.register("t", t.to_pandas())

    # keep_first=False: the over-budget head row is dropped too
    got = (tail_by_budget(ds, "k", [("i", "descending")], "c", 10,
                          keep_first=False, out_col="cum")
           .to_pandas().sort_values(["k", "i"]).reset_index(drop=True))
    want = con.sql("""
        WITH w AS (SELECT k, i, c,
                          CAST(sum(c) OVER (PARTITION BY k ORDER BY i DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                              AS BIGINT) AS cum
                   FROM t)
        SELECT * FROM w WHERE cum <= 10 ORDER BY k, i
    """).df()
    assert len(got) == len(want)
    for c in ["k", "i", "c", "cum"]:
        pd.testing.assert_series_equal(got[c], want[c], check_dtype=False)
    # key 3's only row costs 50 > 10 and is dropped without keep_first...
    assert 3 not in set(got["k"])
    # ...but kept with it (the null cost adds nothing, SQL SUM semantics)
    kept = (tail_by_budget(ds, "k", [("i", "descending")], "c", 10,
                           keep_first=True, out_col="cum")
            .to_pandas())
    assert 3 in set(kept["k"])
    # key 1's head row (i=3) costs 100 > 10: it survives alone via
    # keep_first and poisons the budget for every later row
    k1 = kept[kept["k"] == 1].sort_values("i")
    assert list(k1["i"]) == [3] and list(k1["cum"]) == [100]
    # null cost adds nothing (SQL SUM): key 1 under budget 112 keeps all 4
    all1 = (tail_by_budget(ds, "k", [("i", "descending")], "c", 112,
                           keep_first=False, out_col="cum")
            .to_pandas())
    a1 = all1[all1["k"] == 1].sort_values("i")
    assert list(a1["i"]) == [0, 1, 2, 3]
    assert list(a1["cum"]) == [112, 107, 107, 100]

    with pytest.raises(ValueError, match="ascending/descending"):
        tail_by_budget(ds, "k", [("i", "desc")], "c", 10)


def test_truncate_context_transcripts(ray_session):
    import duckdb

    from bloomjoin_ray.pipelines.windows import truncate_context
    from bloomjoin_ray.sources.transcripts import transcripts_dataset

    ds = transcripts_dataset(300, seed=7, parallelism=8)
    full = ds.to_pandas()
    got = truncate_context(ds, 120).to_pandas()

    con = duckdb.connect()
    con.register("turns", full)
    want = con.sql("""
        WITH c AS (
            SELECT conv_id, turn_idx,
                   CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
                       AS n_tok,
                   CAST(sum(len(regexp_extract_all(text, '\\S+'))) OVER w
                       AS BIGINT) AS cum_tokens,
                   row_number() OVER o AS rn
            FROM turns
            WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   o AS (PARTITION BY conv_id ORDER BY turn_idx DESC)
        )
        SELECT conv_id, turn_idx, cum_tokens FROM c
        WHERE cum_tokens <= 120 OR rn = 1
    """).df()
    g = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    w = want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(g) == len(w)
    for c in ["conv_id", "turn_idx", "cum_tokens"]:
        pd.testing.assert_series_equal(g[c], w[c], check_dtype=False)
    # schema preserved + per-turn text equality vs the source table
    assert set(g.columns) == set(full.columns) | {"cum_tokens"}
    merged = g.merge(full, on=["conv_id", "turn_idx"], suffixes=("", "_src"))
    assert (merged["text"] == merged["text_src"]).all()
    # every conversation survives with exactly its most recent turns
    last = full.groupby("conv_id")["turn_idx"].max()
    gl = g.groupby("conv_id")["turn_idx"].max()
    assert gl.sort_index().equals(last.sort_index())
