"""Wave-7 checks: focal-mode oracle equality, BPE apply vs a
sequential reference tokenizer, DGIM invariants + error bound."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave7 as W
from oluray.stages import sketch, text

SF = "/root/testdata/sf0.001"


def test_focal_mode_oracle_exact():
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    got = W.QUERIES["focal_mode"](SF).to_pandas()
    exp = con.sql(W.ORACLE["focal_mode"]).df()
    cols = sorted(got.columns)
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[sorted(exp.columns)][cols].sort_values(cols).reset_index(
        drop=True)
    assert gs.shape == es.shape
    assert (gs.astype(str).values == es.astype(str).values).all()


def _seq_bpe_len(word: str, rules: list[tuple[str, str]]) -> int:
    syms = list(word)
    for lft, rgt in rules:
        i, res = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == lft and syms[i + 1] == rgt:
                res.append(lft + rgt)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return len(syms)


def test_bpe_apply_matches_sequential_reference():
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    from oluray.sources.io import read_table

    ds = read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    merges = text.bpe_merges(ds, n_merges=W.BPE_APPLY_MERGES,
                             num_partitions=4)
    rules = list(zip(merges["left"].tolist(), merges["right"].tolist()))
    got = (W.QUERIES["bpe_apply"](SF).to_pandas()
           .set_index("doc_id")["n_bpe_tokens"])
    sample = docs.sample(25, random_state=9)
    for _, r in sample.iterrows():
        toks = text._explode_terms(
            pd.DataFrame({"doc_id": [r["doc_id"]], "text": [r["text"]]})
        )["term"]
        want = sum(_seq_bpe_len(w, rules) for w in toks)
        assert int(got.loc[int(r["doc_id"])]) == want

    # merges really shorten: with zero rules each token is per-char
    raw = sum(len(w) for w in text._explode_terms(docs)["term"])
    assert int(got.sum()) < raw


def test_dgim_invariants_and_bound():
    rng = np.random.default_rng(2)
    hits = np.sort(rng.choice(200000, size=8000, replace=False))
    b: list[tuple[int, int]] = []
    for t in hits:
        b = sketch.dgim_update(b, int(t))
        # invariants: newest-first, power-of-two sizes, <= R per size
        ts = [x for x, _ in b]
        assert ts == sorted(ts, reverse=True)
        sizes = [s for _, s in b]
        assert all(s & (s - 1) == 0 for s in sizes)
    from collections import Counter

    assert max(Counter(s for _, s in b).values()) <= sketch.DGIM_R
    assert len(b) < 64  # O(R log n) state
    for cutoff in (195000, 150000, 80000, 10000):
        exact = int((hits >= cutoff).sum())
        est = sketch.dgim_query(b, cutoff)
        assert abs(est - exact) <= exact / (2 * (sketch.DGIM_R - 1)) + 1


def test_dgim_clicks_query_bound():
    d = W.QUERIES["dgim_clicks"](SF).to_pandas()
    assert len(d) > 0
    err = (d["est_hits"] - d["exact_hits"]).abs()
    assert bool((err <= d["exact_hits"] / (2 * (sketch.DGIM_R - 1)) + 1)
                .all())
    assert bool((d["n_buckets"] <= 64).all())
