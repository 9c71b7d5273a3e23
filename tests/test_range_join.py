"""Range (interval-containment) join vs a DuckDB inequality-join oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def frames(ray_session):
    """Left events + per-key DISJOINT intervals (the operator's documented
    assumption): each key gets consecutive non-overlapping windows with
    gaps between them, so some events fall outside every interval."""
    import ray.data as rd

    rng = np.random.default_rng(23)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "event_id": np.arange(3000),
        "user_id": rng.integers(0, 40, size=3000),
        "ts": base + pd.to_timedelta(rng.integers(0, 10**6, size=3000), unit="s"),
    })
    rows = []
    for u in range(40):
        t = 0
        for w in range(rng.integers(2, 6)):
            t += int(rng.integers(10_000, 100_000))        # gap
            dur = int(rng.integers(5_000, 120_000))
            rows.append((u, t, t + dur))
            t += dur
    right = pd.DataFrame(rows, columns=["user_id", "s", "e"])
    right["win_start"] = base + pd.to_timedelta(right.pop("s"), unit="s")
    right["win_end"] = base + pd.to_timedelta(right.pop("e"), unit="s")
    right["win_id"] = np.arange(len(right))

    def to_ds(df):
        return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)
                             ).repartition(4)

    return left, right, to_ds(left), to_ds(right)


def _oracle(left, right, op_end="<="):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    return con.sql(f"""
        SELECT l.event_id, l.user_id, l.ts, r.win_start, r.win_end, r.win_id
        FROM l JOIN r ON l.user_id = r.user_id
          AND l.ts >= r.win_start AND l.ts {op_end} r.win_end
    """).df()


def _sorted(df):
    return df.sort_values(["event_id"]).reset_index(drop=True)


def test_range_join_inner_vs_duckdb(frames):
    from bloomjoin_ray.pipelines.range_join import range_join

    left, right, dsl, dsr = frames
    got = _sorted(range_join(dsl, dsr, on="ts", start="win_start",
                             end="win_end", by="user_id").to_pandas())
    want = _sorted(_oracle(left, right))
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "win_id"]],
        want[["event_id", "user_id", "win_id"]], check_dtype=False)


def test_range_join_left_vs_duckdb(frames):
    from bloomjoin_ray.pipelines.range_join import range_join

    left, right, dsl, dsr = frames
    got = _sorted(range_join(dsl, dsr, on="ts", start="win_start",
                             end="win_end", by="user_id",
                             how="left").to_pandas())
    assert len(got) == len(left)          # every left row survives
    inner = _oracle(left, right)
    matched = got[got.win_id.notna()]
    assert len(matched) == len(inner)
    m = _sorted(matched)
    w = _sorted(inner)
    assert (m.win_id.to_numpy().astype(np.int64)
            == w.win_id.to_numpy().astype(np.int64)).all()


def test_range_join_closed_left_excludes_end(frames):
    from bloomjoin_ray.pipelines.range_join import range_join

    left, right, dsl, dsr = frames
    got = _sorted(range_join(dsl, dsr, on="ts", start="win_start",
                             end="win_end", by="user_id",
                             closed="left").to_pandas())
    want = _sorted(_oracle(left, right, op_end="<"))
    assert len(got) == len(want)


def test_range_join_integer_keys(ray_session):
    """Integer on/start/end columns work (no timestamps required)."""
    import ray.data as rd
    from bloomjoin_ray.pipelines.range_join import range_join

    left = pa.table({"k": [1, 1, 2, 2, 3], "pos": [5, 40, 7, 100, 1]})
    right = pa.table({"k": [1, 1, 2], "lo": [0, 30, 5], "hi": [10, 50, 8],
                      "tag": ["a", "b", "c"]})
    out = range_join(rd.from_arrow(left), rd.from_arrow(right),
                     on="pos", start="lo", end="hi", by="k").to_pandas()
    out = out.sort_values(["k", "pos"]).reset_index(drop=True)
    assert list(out["tag"]) == ["a", "b", "c"]      # (1,5)→a (1,40)→b (2,7)→c
    # boundary inclusivity: pos == hi matches under closed='both'
    out2 = range_join(rd.from_arrow(pa.table({"k": [1], "pos": [10]})),
                      rd.from_arrow(right), on="pos", start="lo", end="hi",
                      by="k").to_pandas()
    assert list(out2["tag"]) == ["a"]


def test_range_join_suffix_and_validation(ray_session):
    import ray.data as rd
    from bloomjoin_ray.pipelines.range_join import range_join

    left = pa.table({"k": [1], "pos": [5], "tag": ["L"]})
    right = pa.table({"k": [1], "lo": [0], "hi": [9], "tag": ["R"]})
    out = range_join(rd.from_arrow(left), rd.from_arrow(right),
                     on="pos", start="lo", end="hi", by="k")
    assert "tag_right" in out.schema().names
    with pytest.raises(ValueError):
        range_join(rd.from_arrow(left), rd.from_arrow(right),
                   on="pos", start="lo", end="hi", by="k", how="outer")
    with pytest.raises(ValueError):
        range_join(rd.from_arrow(left), rd.from_arrow(right),
                   on="pos", start="lo", end="hi", by="k", closed="right")


def test_range_join_null_times_never_match(ray_session):
    """SQL semantics: a null on/start/end never matches (ADVICE r2)."""
    import ray.data as rd
    from bloomjoin_ray.pipelines.range_join import range_join

    left = pa.table({"k": [1, 1], "pos": pa.array([None, 5], type=pa.int64()),
                     "tag": ["null-on", "ok"]})
    right = pa.table({"k": [1, 1, 1],
                      "lo": pa.array([-10, None, 3], type=pa.int64()),
                      "hi": pa.array([10, 10, None], type=pa.int64()),
                      "rtag": ["spans-zero", "null-lo", "null-hi"]})
    inner = range_join(rd.from_arrow(left), rd.from_arrow(right),
                       on="pos", start="lo", end="hi", by="k").to_pandas()
    # the only legal match: pos=5 in [-10, 10]; the null-pos left row must
    # NOT match the epoch-0-containing interval, and null-lo / null-hi
    # rights must never be candidates
    assert list(inner["tag"]) == ["ok"]
    assert list(inner["rtag"]) == ["spans-zero"]
    outer = (range_join(rd.from_arrow(left), rd.from_arrow(right),
                        on="pos", start="lo", end="hi", by="k", how="left")
             .to_pandas().sort_values("tag").reset_index(drop=True))
    assert len(outer) == 2
    assert outer.loc[outer["tag"] == "null-on", "rtag"].isna().all()


def test_interval_join_matches_sql(ray_session):
    """Interval-overlap join vs a DuckDB inequality join on disjoint
    per-key spans: containment, partial overlaps both directions,
    touching endpoints, non-overlaps, and cross-key isolation."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.range_join import interval_join

    rng = np.random.default_rng(29)

    def disjoint_spans(n_keys, per_key, tag):
        ks, ids, st, en = [], [], [], []
        i = 0
        for k in range(n_keys):
            t = int(rng.integers(0, 50))
            for _ in range(per_key):
                gap = int(rng.integers(1, 30))
                ln = int(rng.integers(0, 40))
                s = t + gap
                e = s + ln
                t = e
                ks.append(k); ids.append(i); st.append(s); en.append(e)
                i += 1
        return pa.table({"k": pa.array(ks, pa.int64()),
                         f"{tag}_id": pa.array(ids, pa.int64()),
                         f"{tag}_s": pa.array(st, pa.int64()),
                         f"{tag}_e": pa.array(en, pa.int64())})

    L = disjoint_spans(25, 8, "l")
    R = disjoint_spans(25, 11, "r")
    con = duckdb.connect()
    con.register("L", L)
    con.register("R", R)
    want = con.sql("""
        SELECT L.k, l_id, l_s, l_e, r_id, r_s, r_e
        FROM L JOIN R ON L.k = R.k AND l_s <= r_e AND r_s <= l_e
        ORDER BY l_id, r_id
    """).df()
    assert len(want) > 50
    for mode in ("general", "disjoint"):       # both paths, same answer
        got = (interval_join(rd.from_arrow(L).repartition(4),
                             rd.from_arrow(R).repartition(3),
                             ("l_s", "l_e"), ("r_s", "r_e"), by="k",
                             mode=mode)
               .to_pandas().sort_values(["l_id", "r_id"])
               .reset_index(drop=True))
        assert len(got) == len(want), mode
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                      check_dtype=False)


def test_interval_join_timestamp_spans(ray_session):
    """interval_join over timestamp spans (the sessionize output type)
    and the touching-endpoint edge (l_e == r_s counts as overlap)."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.range_join import interval_join

    def ts(*vals):
        return pa.array(list(vals), pa.timestamp("us"))

    L = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "l_id": pa.array([0, 1, 2], pa.int64()),
                  "l_s": ts(1_000_000, 5_000_000, 1_000_000),
                  "l_e": ts(3_000_000, 8_000_000, 2_000_000)})
    R = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "r_id": pa.array([0, 1, 2], pa.int64()),
                  "r_s": ts(3_000_000, 9_000_000, 4_000_000),
                  "r_e": ts(4_000_000, 9_500_000, 5_000_000)})
    got = (interval_join(rd.from_arrow(L), rd.from_arrow(R),
                         ("l_s", "l_e"), ("r_s", "r_e"), by="k")
           .to_pandas().sort_values(["l_id", "r_id"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("L", L)
    con.register("R", R)
    want = con.sql("""
        SELECT L.k, l_id, l_s, l_e, r_id, r_s, r_e
        FROM L JOIN R ON L.k = R.k AND l_s <= r_e AND r_s <= l_e
        ORDER BY l_id, r_id
    """).df()
    # exactly one pair: l0 touches r0 at t=3s (closed bounds)
    assert len(want) == 1 and len(got) == 1
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)


def test_range_join_overlapping_rights_raise(ray_session):
    """Verdict r4 #2: the per-key disjointness contract is ENFORCED —
    overlapping right intervals raise inside the bucket reduce instead
    of silently matching only the latest-starting interval."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.range_join import range_join

    left = pa.table({"k": pa.array([1], pa.int64()),
                     "pos": pa.array([5], pa.int64())})
    right = pa.table({"k": pa.array([1, 1], pa.int64()),
                      "lo": pa.array([0, 3], pa.int64()),
                      "hi": pa.array([6, 9], pa.int64()),
                      "tag": ["a", "b"]})
    with pytest.raises(Exception, match="overlap"):
        range_join(rd.from_arrow(left), rd.from_arrow(right),
                   on="pos", start="lo", end="hi", by="k").to_pandas()
    # same spans on DIFFERENT keys are fine (the check segments by key)
    right_ok = pa.table({"k": pa.array([1, 2], pa.int64()),
                         "lo": pa.array([0, 3], pa.int64()),
                         "hi": pa.array([6, 9], pa.int64()),
                         "tag": ["a", "b"]})
    out = range_join(rd.from_arrow(left), rd.from_arrow(right_ok),
                     on="pos", start="lo", end="hi", by="k").to_pandas()
    assert list(out["tag"]) == ["a"]
    # touching closed endpoints ([0,3],[3,9]) overlap under closed='both'
    # but are disjoint under closed='left'
    right_touch = pa.table({"k": pa.array([1, 1], pa.int64()),
                            "lo": pa.array([0, 3], pa.int64()),
                            "hi": pa.array([3, 9], pa.int64()),
                            "tag": ["a", "b"]})
    with pytest.raises(Exception, match="overlap"):
        range_join(rd.from_arrow(left), rd.from_arrow(right_touch),
                   on="pos", start="lo", end="hi", by="k").to_pandas()
    out2 = range_join(rd.from_arrow(left), rd.from_arrow(right_touch),
                      on="pos", start="lo", end="hi", by="k",
                      closed="left").to_pandas()
    assert list(out2["tag"]) == ["b"]
    # validate=False keeps the documented legacy behavior (no raise,
    # latest-starting containing interval wins)
    out3 = range_join(rd.from_arrow(left), rd.from_arrow(right),
                      on="pos", start="lo", end="hi", by="k",
                      validate=False).to_pandas()
    assert list(out3["tag"]) == ["b"]


def test_interval_join_general_overlapping_vs_duckdb(ray_session):
    """Verdict r4 #4: mode='general' handles ARBITRARY overlapping and
    nested per-key intervals on BOTH sides — checked against a DuckDB
    inequality join, including duplicate-free output and chunked
    emission (tiny chunk_elems)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.range_join import interval_join

    rng = np.random.default_rng(31)

    def messy_spans(n_keys, per_key, tag):
        n = n_keys * per_key
        ks = np.repeat(np.arange(n_keys), per_key)
        st = rng.integers(0, 200, size=n)
        ln = rng.integers(0, 80, size=n)        # heavy overlap + nesting
        return pa.table({"k": pa.array(ks, pa.int64()),
                         f"{tag}_id": pa.array(np.arange(n), pa.int64()),
                         f"{tag}_s": pa.array(st, pa.int64()),
                         f"{tag}_e": pa.array(st + ln, pa.int64())})

    L = messy_spans(20, 12, "l")
    R = messy_spans(20, 15, "r")
    con = duckdb.connect()
    con.register("L", L)
    con.register("R", R)
    want = con.sql("""
        SELECT L.k, l_id, l_s, l_e, r_id, r_s, r_e
        FROM L JOIN R ON L.k = R.k AND l_s <= r_e AND r_s <= l_e
        ORDER BY l_id, r_id
    """).df()
    assert len(want) > 500                       # real overlap volume

    for chunk in (4_000_000, 257):               # one-shot + chunked paths
        got = (interval_join(rd.from_arrow(L).repartition(4),
                             rd.from_arrow(R).repartition(3),
                             ("l_s", "l_e"), ("r_s", "r_e"), by="k",
                             mode="general", chunk_elems=chunk)
               .to_pandas().sort_values(["l_id", "r_id"])
               .reset_index(drop=True))
        assert len(got) == len(want)
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                      check_dtype=False)

    # disjoint mode on the same overlapping input must REFUSE, not mis-join
    with pytest.raises(Exception, match="overlap"):
        interval_join(rd.from_arrow(L), rd.from_arrow(R),
                      ("l_s", "l_e"), ("r_s", "r_e"), by="k",
                      mode="disjoint").to_pandas()


def test_interval_join_general_nulls_and_inverted_spans(ray_session):
    """General mode: null bounds and start>end rows never match
    (SQL semantics), string keys work, timestamps work."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.range_join import interval_join

    L = pa.table({"k": ["a", "a", "a", "b"],
                  "l_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "l_s": pa.array([0, None, 9, 0], pa.int64()),
                  "l_e": pa.array([10, 5, 2, 10], pa.int64())})
    R = pa.table({"k": ["a", "a", "b"],
                  "r_id": pa.array([0, 1, 2], pa.int64()),
                  "r_s": pa.array([4, 6, None], pa.int64()),
                  "r_e": pa.array([6, None, 8], pa.int64())})
    got = (interval_join(rd.from_arrow(L), rd.from_arrow(R),
                         ("l_s", "l_e"), ("r_s", "r_e"), by="k",
                         mode="general")
           .to_pandas().sort_values(["l_id", "r_id"])
           .reset_index(drop=True))
    # only legal pair: l0 [0,10] × r0 [4,6] on key 'a' — null bounds and
    # the inverted l2 [9,2] span never match; b-side r2 has a null start
    assert list(got["l_id"]) == [0] and list(got["r_id"]) == [0]


def test_interval_join_general_timestamp_spans(ray_session):
    """General mode over timestamp columns, nested + identical spans."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.range_join import interval_join

    def ts(*vals):
        return pa.array(list(vals), pa.timestamp("us"))

    # l0 [1s,10s] contains r0 [2s,3s] and r1 [2s,3s] (identical spans)
    # and overlaps r2 [9s,12s]; l1 [4s,5s] nests inside nothing on side R
    L = pa.table({"k": pa.array([7, 7], pa.int64()),
                  "l_id": pa.array([0, 1], pa.int64()),
                  "l_s": ts(1_000_000, 4_000_000),
                  "l_e": ts(10_000_000, 5_000_000)})
    R = pa.table({"k": pa.array([7, 7, 7], pa.int64()),
                  "r_id": pa.array([0, 1, 2], pa.int64()),
                  "r_s": ts(2_000_000, 2_000_000, 9_000_000),
                  "r_e": ts(3_000_000, 3_000_000, 12_000_000)})
    got = (interval_join(rd.from_arrow(L), rd.from_arrow(R),
                         ("l_s", "l_e"), ("r_s", "r_e"), by="k",
                         mode="general")
           .to_pandas().sort_values(["l_id", "r_id"])
           .reset_index(drop=True))
    assert list(zip(got["l_id"], got["r_id"])) == [(0, 0), (0, 1), (0, 2)]
    assert str(got["l_s"].dtype).startswith("datetime64")


def test_interval_join_general_fuzz_vs_duckdb(ray_session):
    """Seeded fuzz sweep of mode='general' against DuckDB across
    adversarial shapes: huge/negative int64 coordinates near the wrap
    guard, zero-length spans, many-duplicate starts, single-key
    pile-ups, keys present on only one side, and empty sides."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.range_join import interval_join

    rng = np.random.default_rng(101)
    imin = np.iinfo(np.int64).min

    def case(nl, nr, n_keys, lo, hi, maxlen, dup_frac=0.0):
        def side(n, tag):
            ks = rng.integers(0, n_keys, size=n)
            st = rng.integers(lo, hi, size=n)
            if dup_frac:                      # pile duplicate starts
                d = rng.random(n) < dup_frac
                st[d] = lo
            ln = rng.integers(0, maxlen, size=n)
            en = st + np.minimum(ln, np.iinfo(np.int64).max - st)
            return pa.table({"k": pa.array(ks, pa.int64()),
                             f"{tag}_id": pa.array(np.arange(n), pa.int64()),
                             f"{tag}_s": pa.array(st, pa.int64()),
                             f"{tag}_e": pa.array(en, pa.int64())})
        return side(nl, "l"), side(nr, "r")

    cases = [
        case(120, 150, 10, -50, 50, 30),                  # dense overlap
        case(80, 80, 1, 0, 40, 60, dup_frac=0.5),         # one hot key
        case(60, 60, 5, imin + 10, imin + 200, 50),       # wrap-guard zone
        case(60, 60, 5, 2**62, 2**62 + 200, 50),          # huge positives
        case(100, 100, 40, 0, 1000, 1),                   # zero/1-len spans
        case(50, 50, 25, 0, 100, 20),                     # sparse keys
    ]
    con = duckdb.connect()
    for i, (L, R) in enumerate(cases):
        got = interval_join(rd.from_arrow(L).repartition(3),
                            rd.from_arrow(R).repartition(2),
                            ("l_s", "l_e"), ("r_s", "r_e"), by="k",
                            mode="general", chunk_elems=509).to_pandas()
        if len(got):            # Ray drops the schema of empty results
            got = (got.sort_values(["l_id", "r_id"])
                      .reset_index(drop=True))
        con.register("L", L)
        con.register("R", R)
        want = con.sql("""
            SELECT L.k, l_id, l_s, l_e, r_id, r_s, r_e
            FROM L JOIN R ON L.k = R.k AND l_s <= r_e AND r_s <= l_e
            ORDER BY l_id, r_id
        """).df()
        assert len(got) == len(want), (i, len(got), len(want))
        if len(want):
            pd.testing.assert_frame_equal(
                got[want.columns.tolist()], want, check_dtype=False)

    # keys only on one side + an empty left
    L0 = pa.table({"k": pa.array([], pa.int64()),
                   "l_id": pa.array([], pa.int64()),
                   "l_s": pa.array([], pa.int64()),
                   "l_e": pa.array([], pa.int64())})
    R1 = pa.table({"k": pa.array([1], pa.int64()),
                   "r_id": pa.array([0], pa.int64()),
                   "r_s": pa.array([0], pa.int64()),
                   "r_e": pa.array([5], pa.int64())})
    out = interval_join(rd.from_arrow(L0), rd.from_arrow(R1),
                        ("l_s", "l_e"), ("r_s", "r_e"), by="k",
                        mode="general").to_pandas()
    assert len(out) == 0


def test_interval_join_general_left_vs_duckdb(ray_session):
    """how='left' (general mode): every left row survives — matched
    lefts with their pairs, unmatched/null-bound/inverted lefts with
    null right columns — vs a DuckDB LEFT JOIN inequality oracle."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.range_join import interval_join

    rng = np.random.default_rng(53)
    nl, nr, n_keys = 150, 120, 12
    lks = rng.integers(0, n_keys, size=nl)
    lst = rng.integers(0, 150, size=nl).astype(object)
    lln = rng.integers(0, 40, size=nl)
    len_ = lst + lln
    # plant null bounds and an inverted span
    lst[3] = None
    len_[7] = None
    lst[11], len_[11] = 90, 10                    # inverted: start > end
    L = pa.table({"k": pa.array(lks, pa.int64()),
                  "l_id": pa.array(np.arange(nl), pa.int64()),
                  "l_s": pa.array(list(lst), pa.int64()),
                  "l_e": pa.array(list(len_), pa.int64())})
    rks = rng.integers(0, n_keys, size=nr)
    rst = rng.integers(0, 150, size=nr)
    R = pa.table({"k": pa.array(rks, pa.int64()),
                  "r_id": pa.array(np.arange(nr), pa.int64()),
                  "r_s": pa.array(rst, pa.int64()),
                  "r_e": pa.array(rst + rng.integers(0, 40, size=nr),
                                  pa.int64())})
    got = (interval_join(rd.from_arrow(L).repartition(4),
                         rd.from_arrow(R).repartition(3),
                         ("l_s", "l_e"), ("r_s", "r_e"), by="k",
                         how="left", chunk_elems=271)
           .to_pandas().sort_values(["l_id", "r_id"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("L", L)
    con.register("R", R)
    want = con.sql("""
        SELECT L.k, l_id, l_s, l_e, r_id, r_s, r_e
        FROM L LEFT JOIN R ON L.k = R.k AND l_s <= r_e AND r_s <= l_e
        ORDER BY l_id, r_id
    """).df()
    assert len(got) == len(want) > nl             # real pairs + null rows
    pd.testing.assert_frame_equal(
        got[["l_id"]].assign(r=got["r_id"].astype("float64")),
        want[["l_id"]].assign(r=want["r_id"].astype("float64")),
        check_dtype=False)
    # the planted null/inverted lefts survive exactly once with nulls
    for lid in (3, 7, 11):
        sub = got[got["l_id"] == lid]
        assert len(sub) == 1 and sub["r_id"].isna().all()

    # inner on the same input == the LEFT JOIN's matched subset
    inner = interval_join(rd.from_arrow(L), rd.from_arrow(R),
                          ("l_s", "l_e"), ("r_s", "r_e"), by="k"
                          ).to_pandas()
    assert len(inner) == int(got["r_id"].notna().sum())

    with pytest.raises(ValueError, match="inner-only"):
        interval_join(rd.from_arrow(L), rd.from_arrow(R),
                      ("l_s", "l_e"), ("r_s", "r_e"), by="k",
                      mode="disjoint", how="left")
    with pytest.raises(ValueError, match="how="):
        interval_join(rd.from_arrow(L), rd.from_arrow(R),
                      ("l_s", "l_e"), ("r_s", "r_e"), by="k", how="full")
