"""Round-4 wave-4 additions: passage dedup (C4/RefinedWeb line-level
dedup), Gopher duplicate-n-gram repetition stats, distributed Lloyd
k-means, per-column profiling, and the cumulative-distinct window.
The oracle-backed four are also covered by the driver gate; these
tests add brute-force / reference re-derivations independent of the
SQL (passage dedup vs a sequential first-wins dict; k-means vs a
single-process numpy Lloyd with identical init)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from oluray.pipelines import queries as Q
from oluray.stages import ann, text

SF = "/root/testdata/sf0.001"


def test_passage_dedup_matches_sequential_first_wins():
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    W = 8
    seen: set[str] = set()
    exp = {}
    for did, txt in zip(docs["doc_id"], docs["text"]):
        toks = txt.split(" ")
        kept, removed = [], 0
        for st in range(0, len(toks), W):
            p = " ".join(toks[st:st + W])
            if p in seen:
                removed += 1
            else:
                seen.add(p)
                kept.append(p)
        exp[int(did)] = (" ".join(kept), removed)
    out = text.passage_dedup(
        ray.data.from_pandas(docs), width=W, num_partitions=4
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(docs)
    for _, r in out.iterrows():
        e_text, e_rm = exp[int(r["doc_id"])]
        assert r["clean_text"] == e_text
        assert int(r["n_removed"]) == e_rm
    assert int(out["n_removed"].sum()) > 0  # the fixture has dups


def test_passage_dedup_within_doc_repeat_removed():
    # one doc repeating its own first passage: second copy removed
    base = " ".join(f"w{i}" for i in range(8))
    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": [base + " " + base, base + " tail"]})
    out = text.passage_dedup(ray.data.from_pandas(df), width=8,
                             num_partitions=2).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "clean_text"] == base
    assert int(out.loc[0, "n_removed"]) == 1
    # doc 2's first passage is also a dup of doc 1's; 'tail' survives
    assert out.loc[1, "clean_text"] == "tail"
    assert int(out.loc[1, "n_removed"]) == 1


def test_dup_ngram_stats_brute():
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    t = pa.Table.from_pandas(docs, preserve_index=False)
    out = text.dup_ngram_stats_batch(t, 3).to_pandas().set_index("doc_id")
    n_checked = 0
    for did, txt in zip(docs["doc_id"], docs["text"]):
        toks = txt.split(" ")
        if len(toks) < 3:
            assert int(did) not in out.index
            continue
        grams = [tuple(toks[i:i + 3]) for i in range(len(toks) - 2)]
        from collections import Counter
        c = Counter(grams)
        dup = sum(v for v in c.values() if v > 1)
        r = out.loc[int(did)]
        assert int(r["n_grams"]) == len(grams)
        assert int(r["dup_occ"]) == dup
        n_checked += 1
    assert n_checked > 0


def test_kmeans_matches_numpy_lloyd():
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    cents, assign = ann.kmeans_lloyd(emb, k=8, iters=5)
    adf = assign.to_pandas().sort_values("vec_id").reset_index(drop=True)
    sse = ann.kmeans_lloyd.last_sse
    assert all(sse[i + 1] <= sse[i] + 1e-6 for i in range(len(sse) - 1))

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    m = (t["embedding"].combine_chunks().flatten()
         .to_numpy().astype(np.float64).reshape(len(ids), -1))
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    c = m[:8].copy()
    for _ in range(5):
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        a = np.argmin(d2, axis=1)
        new = c.copy()
        for j in range(8):
            if (a == j).any():
                new[j] = m[a == j].mean(axis=0)
        c = new
    d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    a = np.argmin(d2, axis=1)
    assert np.allclose(c, cents, atol=1e-9)
    # distributed float64 partial sums vs numpy mean: identical
    # assignments away from exact ties (none in the fixture)
    assert (adf["cluster"].to_numpy() == a).mean() >= 0.99
    assert len(adf) == len(ids)


def test_profile_table_values():
    out = Q.q_profile_table(SF)
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    idx = out.set_index(["column", "metric"])["value"]
    assert int(idx[("l_quantity", "n")]) == len(li)
    assert int(idx[("l_returnflag", "n_distinct")]) == \
        li["l_returnflag"].nunique()
    assert int(idx[("l_quantity", "n_distinct")]) == \
        li["l_quantity"].nunique()
    exp_sum = int(np.floor(li["l_extendedprice"].to_numpy()
                           * 100.0 + 0.5).sum())
    assert int(idx[("l_extendedprice", "sum_e2")]) == exp_sum


def test_cum_distinct_monotone_and_final():
    out = Q.q_cum_distinct(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    final = out.groupby("user_id")["cum_types"].max()
    exp = ev.groupby("user_id")["event_type"].nunique()
    pd.testing.assert_series_equal(
        final.sort_index(), exp.sort_index(),
        check_names=False, check_dtype=False)
    # running count per user is non-decreasing in event order
    ev2 = ev.copy()
    ev2["_us"] = ev2["ts"].astype("datetime64[us]").astype("int64")
    m = out.merge(ev2[["event_id", "_us"]], on="event_id")
    m = m.sort_values(["user_id", "_us", "event_id"], kind="mergesort")
    d = m.groupby("user_id")["cum_types"].diff().fillna(1)
    assert (d >= 0).all()
