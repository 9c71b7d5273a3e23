"""Driver-contract test: every oracle query matches duckdb at sf0.001 and
every rows-only query executes. Mirrors the driver's comparison (row count
+ schema-by-name + order-insensitive values), at the smallest sf so the
whole contract stays in the fast suite."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__

    return __ray_entry__


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _to_df(x):
    if isinstance(x, pd.DataFrame):
        return x
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x.to_pandas()


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_entry_smoke(entrymod):
    df = _to_df(entrymod.entry())
    assert len(df) >= 0 and len(df.columns) > 0


def test_oracle_keys_subset_of_queries(entrymod):
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(os_) >= 15


@pytest.mark.parametrize("name", [
    "bloom_join_inner", "bloom_join_left", "bloom_join_right",
    "bloom_join_full", "bloom_join_semi", "bloom_join_anti",
    "join_multikey", "pricing_summary", "events_filtered", "events_hourly",
    "topk_event_types", "distinct_users_exact", "cms_top_event_types",
    "dedup_exact_docs", "doc_text_stats", "asof_last_purchase",
    "sessionize_users", "topk_types_per_user", "theta_custkey_overlap",
    "mg_top_event_types", "events_write_roundtrip", "events_tumbling",
    "events_sliding", "events_session_assign", "curated_docs",
    "ann_topk_bruteforce", "ngram_jaccard_docs",
    "theta_user_overlap_by_type", "scrubbed_docs",
    "repetition_stats_docs", "decontam_docs", "vocab_counts_docs",
    "curation_full_docs", "doc_frequency_docs", "chunked_docs",
    "events_context_tail", "docs_cap_per_source",
    "events_range_pruned_read",
])
def test_query_matches_oracle(entrymod, con, name):
    got = _canon(_to_df(entrymod.queries()[name](SF)))
    want = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    if len(got):
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=False, rtol=1e-9)


def test_rows_only_queries_execute(entrymod):
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    for name, fn in qs.items():
        if name in os_:
            continue
        df = _to_df(fn(SF))
        assert len(df) >= 0, name
