"""Text analysis, dedup, and ANN operators vs brute-force oracles."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.stages import ann, dedup, text

SF = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


def test_token_count_sql_parity():
    got = (
        _docs().map_batches(text.TokenCount, batch_format="pandas", concurrency=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = con.sql(
        f"select doc_id, length(string_split(text, ' '))::BIGINT n_tokens "
        f"from read_parquet('{SF}/documents.parquet') order by doc_id"
    ).df()
    pd.testing.assert_frame_equal(got, exp)


def test_quality_counts_sql_parity():
    got = (
        _docs().map_batches(text.QualityCounts, batch_format="pandas", concurrency=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = con.sql(
        f"""select doc_id, length(text)::BIGINT n_chars,
            length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::BIGINT n_alpha,
            length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT n_digit,
            (length(text) - length(replace(text, ' ', '')))::BIGINT n_space
            from read_parquet('{SF}/documents.parquet') order by doc_id"""
    ).df()
    pd.testing.assert_frame_equal(got, exp)


def test_langid_sql_parity():
    got = (
        _docs().map_batches(text.LangId, batch_format="pandas", concurrency=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = con.sql(
        f"select doc_id, {text.langid_sql()} "
        f"from read_parquet('{SF}/documents.parquet') order by doc_id"
    ).df()
    for c in ("n_en", "n_de", "n_fr", "n_es"):
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_fingerprint_deterministic_and_order_sensitive():
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b c", "a b c", "c b a"]})
    fp = text.Fingerprint()(df)
    assert fp["fingerprint"][0] == fp["fingerprint"][1]
    assert fp["fingerprint"][0] != fp["fingerprint"][2]


def test_exact_dedup():
    rows = [
        dict(doc_id=1, text="hello world"),
        dict(doc_id=2, text="hello world"),
        dict(doc_id=3, text="different"),
        dict(doc_id=4, text="hello world"),
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = dedup.exact_dedup(ds).to_pandas().sort_values("doc_id")
    assert sorted(out["doc_id"]) == [1, 3]  # min id per distinct text


def test_minhash_jaccard_sanity():
    a = dedup.char_shingles("the quick brown fox jumps over the lazy dog")
    b = dedup.char_shingles("the quick brown fox jumped over the lazy dog")
    c = dedup.char_shingles("completely unrelated text about databases")
    assert dedup.jaccard(a, b) > 0.6
    assert dedup.jaccard(a, c) < 0.2
    # minhash estimates jaccard
    sa = dedup.minhash_signature(a, 128)
    sb = dedup.minhash_signature(b, 128)
    est = (sa == sb).mean()
    assert abs(est - dedup.jaccard(a, b)) < 0.2


def test_minhash_lsh_finds_near_dups():
    texts = {
        1: "the quick brown fox jumps over the lazy dog in the park",
        2: "the quick brown fox jumps over the lazy dog in the yard",
        3: "a completely different document about ray data pipelines",
        4: "a completely different document about ray data pipeline",
        5: "nothing in common with anything else whatsoever here",
    }
    rows = [dict(doc_id=k, text=v) for k, v in texts.items()]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    pairs = dedup.minhash_lsh_pairs(ds, threshold=0.5, concurrency=1)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (1, 2) in got
    assert (3, 4) in got
    assert not any(5 in p for p in got)
    # jaccard values match brute force
    for row in pairs.itertuples():
        bf = dedup.jaccard(
            dedup.char_shingles(texts[row.doc_a]), dedup.char_shingles(texts[row.doc_b])
        )
        assert abs(row.jaccard - bf) < 1e-6  # pipeline rounds to 6 dp


def test_simhash_pairs():
    rows = [
        dict(doc_id=1, text="alpha beta gamma delta epsilon zeta eta theta"),
        dict(doc_id=2, text="alpha beta gamma delta epsilon zeta eta iota"),
        dict(doc_id=3, text="totally different words appear in this one now"),
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    pairs = dedup.simhash_pairs(ds, max_hamming=16, concurrency=1)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (1, 2) in got
    sh = dedup.SimHash()(pd.DataFrame(rows))
    hd12 = dedup.hamming64(
        np.array([sh["simhash"][0]]), np.array([sh["simhash"][1]])
    )[0]
    assert pairs.set_index(["doc_a", "doc_b"]).loc[(1, 2), "hamming"] == hd12


def _emb_ds():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


def _emb_np():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    return ids, m


def test_brute_topk_matches_numpy_oracle():
    ids, m = _emb_np()
    qids = ids[:3]
    qm = m[:3]
    got = (
        ann.brute_topk(_emb_ds(), qids, qm, k=5, concurrency=2)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    sims = qn @ mn.T
    for qi, qid in enumerate(qids):
        order = np.lexsort((ids, -sims[qi]))[:5]
        sub = got[got["query_id"] == qid]
        assert sub["vec_id"].tolist() == ids[order].tolist()
        np.testing.assert_allclose(sub["sim"].to_numpy(), np.round(sims[qi][order], 6))


def test_lsh_topk_recall():
    ids, m = _emb_np()
    qids = ids[:5]
    qm = m[:5]
    approx = ann.lsh_topk(_emb_ds(), qids, qm, k=5, n_bits=6, n_probe_bits=2)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    sims = qn @ mn.T
    hits = total = 0
    for qi, qid in enumerate(qids):
        exact = set(ids[np.lexsort((ids, -sims[qi]))[:5]].tolist())
        got = set(approx[approx["query_id"] == qid]["vec_id"].tolist())
        hits += len(exact & got)
        total += 5
    assert hits / total >= 0.5  # approximate by design, must beat random


def test_cosine_near_dup_pairs():
    rows = []
    rng = np.random.default_rng(4)
    base = rng.standard_normal(16)
    rows.append(dict(vec_id=1, embedding=base.tolist()))
    rows.append(dict(vec_id=2, embedding=(base + 0.01 * rng.standard_normal(16)).tolist()))
    rows.append(dict(vec_id=3, embedding=rng.standard_normal(16).tolist()))
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    pairs = ann.cosine_near_dup_pairs(ds, threshold=0.95, n_bits=4, concurrency=1)
    assert (1, 2) in set(zip(pairs["vec_a"], pairs["vec_b"]))
    assert not any(3 in p for p in zip(pairs["vec_a"], pairs["vec_b"]))
