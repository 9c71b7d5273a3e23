"""Gopher-style repetition metrics: brute-force parity, edge inputs,
filter semantics."""

import numpy as np
import pyarrow as pa

from bloomjoin_ray.functions.text import repetition_metrics
from bloomjoin_ray.pipelines.text import filter_repetitive, repetition_stats

RNG = np.random.default_rng(11)
WORDS = "red blue green gold iron stone wave mist".split()


def _brute(text, ngram_n=2):
    t = text or ""
    lines = t.split("\n")
    uniq = set(lines)
    dup_line = (len(lines) - len(uniq)) / len(lines)
    from collections import Counter

    lc = Counter(lines)
    tot_chars = sum(len(line) for line in lines)
    dup_chars = sum(len(line) * c for line, c in lc.items() if c > 1)
    dup_line_char = dup_chars / tot_chars if tot_chars else 0.0
    toks = t.lower().split()
    tc = Counter(toks)
    top_tok = max(tc.values()) / len(toks) if toks else 0.0
    grams = [tuple(toks[i:i + ngram_n])
             for i in range(len(toks) - ngram_n + 1)]
    dup_ng = ((len(grams) - len(set(grams))) / len(grams)) if grams else 0.0
    return dup_line, dup_line_char, top_tok, dup_ng


def _random_doc():
    n_lines = int(RNG.integers(1, 6))
    lines = []
    for _ in range(n_lines):
        words = RNG.choice(WORDS, size=int(RNG.integers(1, 9)))
        lines.append(" ".join(words))
    if RNG.random() < 0.5 and lines:
        lines.append(lines[0])          # force a duplicate line sometimes
    return "\n".join(lines)


def test_matches_bruteforce():
    docs = [_random_doc() for _ in range(200)]
    docs += ["", None, "   ", "\n\n", "a", "a a a a",
             "x y\nx y\nx y", "one two three"]
    m = repetition_metrics(pa.array(docs, type=pa.string()))
    for i, d in enumerate(docs):
        exp = _brute(d)
        got = (m["dup_line_frac"][i].as_py(),
               m["dup_line_char_frac"][i].as_py(),
               m["top_token_frac"][i].as_py(),
               m["dup_ngram_frac"][i].as_py())
        assert got == exp, (i, d, got, exp)  # bit-exact: same int ops + 1 div


def test_ngram_n_parameter():
    docs = ["a b c a b c a b c"]
    m3 = repetition_metrics(pa.array(docs), ngram_n=3)
    exp = _brute(docs[0], ngram_n=3)[3]
    assert m3["dup_ngram_frac"][0].as_py() == exp


def test_empty_batch():
    m = repetition_metrics(pa.array([], type=pa.string()))
    assert all(len(v) == 0 for v in m.values())


def test_repetition_stats_pipeline(ray_session):
    import ray.data as rd

    rows = [{"doc_id": 0, "text": "x\nx\ny"},
            {"doc_id": 1, "text": "clean fresh words here"}]
    out = repetition_stats(rd.from_items(rows)).to_pandas() \
        .set_index("doc_id")
    assert out.loc[0, "dup_line_frac"] == 1 / 3
    assert out.loc[1, "dup_line_frac"] == 0.0
    assert set(out.columns) >= {"dup_line_frac", "dup_line_char_frac",
                                "top_token_frac", "dup_ngram_frac"}


def test_filter_repetitive(ray_session):
    import ray.data as rd

    rows = [{"doc_id": 0, "text": "spam spam spam spam spam"},   # repetitive
            {"doc_id": 1, "text": "every word here is different now"}]
    kept = filter_repetitive(rd.from_items(rows)).to_pandas()
    assert set(kept.doc_id) == {1}
    # disabling every rule keeps everything
    all_kept = filter_repetitive(
        rd.from_items(rows),
        max_dup_line_frac=float("inf"),
        max_dup_line_char_frac=float("inf"),
        max_top_token_frac=float("inf"),
        max_dup_ngram_frac=float("inf")).to_pandas()
    assert set(all_kept.doc_id) == {0, 1}


def test_token_counts_matches_counter(ray_session):
    import ray.data as rd
    from collections import Counter

    from bloomjoin_ray.pipelines.text import token_counts

    docs = [_random_doc() for _ in range(60)] + ["", None, "  "]
    exp = Counter(t for d in docs for t in (d or "").lower().split())
    ds = rd.from_arrow(pa.table({"text": pa.array(docs, type=pa.string())}))
    got = token_counts(ds.repartition(5)).to_pandas()
    assert dict(zip(got.token, got.n)) == dict(exp)
