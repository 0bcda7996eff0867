"""Corpus vocabulary / tf-idf / contamination / CC-acceleration ops
vs brute-force pandas oracles."""

import re

import numpy as np
import pandas as pd
import ray.data

from oluray.stages import joins, text


def _ds(df: pd.DataFrame, blocks: int = 3) -> ray.data.Dataset:
    parts = np.array_split(df, blocks)
    return ray.data.from_pandas([p.reset_index(drop=True) for p in parts])


DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            "The cat sat on the mat",
            "the cat ran; the dog ran too",
            "A dog! A DOG! a dog",
            "lone",
            "",
            "punctuation---only 123 456",
        ],
    }
)


def _brute_tokens(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, r in df.iterrows():
        for t in re.split(r"[^a-z]+", r["text"].lower()):
            if t:
                rows.append((r["doc_id"], t))
    return pd.DataFrame(rows, columns=["doc_id", "term"])


def test_vocab_stats_matches_brute():
    tok = _brute_tokens(DOCS)
    exp = (
        tok.groupby("term")
        .agg(df=("doc_id", "nunique"), cf=("doc_id", "size"))
        .reset_index()
    )
    got = (
        text.vocab_stats(_ds(DOCS, 3), num_partitions=4)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, exp.sort_values("term").reset_index(drop=True), check_dtype=False
    )


def test_doc_tf_is_map_side_complete():
    tok = _brute_tokens(DOCS)
    exp = (
        tok.groupby(["doc_id", "term"]).size().rename("tf").reset_index()
    )
    got = (
        text.doc_tf(_ds(DOCS, 3))
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got,
        exp.sort_values(["doc_id", "term"]).reset_index(drop=True),
        check_dtype=False,
    )


def test_tfidf_topk_ranking_and_tiebreak():
    tok = _brute_tokens(DOCS)
    tf = tok.groupby(["doc_id", "term"]).size().rename("tf").reset_index()
    df = tok.groupby("term")["doc_id"].nunique().rename("df").reset_index()
    j = tf.merge(df, on="term")
    j["score"] = j["tf"] / j["df"]
    j = j.sort_values(
        ["doc_id", "score", "term"], ascending=[True, False, True]
    )
    exp = (
        j.groupby("doc_id").head(2)[["doc_id", "term", "tf", "df"]]
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    got = (
        text.tfidf_topk(_ds(DOCS, 3), k=2, num_partitions=4)
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_doc_trigrams_distinct_and_boundaries():
    got = (
        text.doc_trigrams(_ds(DOCS, 3))
        .to_pandas()
        .sort_values(["doc_id", "tri"])
        .reset_index(drop=True)
    )
    # doc 1: "the cat sat on the mat" -> 4 trigrams, all distinct
    d1 = set(got[got["doc_id"] == 1]["tri"])
    assert d1 == {
        "the cat sat", "cat sat on", "sat on the", "on the mat",
    }
    # doc 3: "a dog a dog a dog" -> trigrams repeat; distinct = 2
    d3 = set(got[got["doc_id"] == 3]["tri"])
    assert d3 == {"a dog a", "dog a dog"}
    # short docs (<3 tokens) produce nothing; trigrams never cross docs
    assert not set(got["doc_id"]) & {4, 5}
    assert (got.groupby(["doc_id", "tri"]).size() == 1).all()


def test_contamination_counts_shared_trigrams():
    # doc 97*n is eval; craft overlap: doc 0 (eval) shares a trigram
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 97],
            "text": [
                "alpha beta gamma delta",
                "alpha beta gamma zzz",     # shares "alpha beta gamma"
                "nothing in common here",
                "beta gamma delta qqq",     # eval too; shares with eval 0
            ],
        }
    )
    got = (
        text.contamination(_ds(docs, 2), eval_mod=97, num_partitions=4)
        .to_pandas()
        .set_index("doc_id")["n_shared"]
        .to_dict()
    )
    assert got == {1: 1}


def test_cc_pointer_doubling_converges_fast():
    """A 40-node path converges within 12 rounds — impossible for
    one-hop-per-round min propagation (needs ~39), proving the
    pointer-doubling edges engage."""
    n = 40
    edges = pd.DataFrame(
        {"doc_a": np.arange(n - 1) * 7 + 3, "doc_b": np.arange(1, n) * 7 + 3}
    )
    got = (
        joins.connected_components(
            _ds(edges, 3), num_partitions=4, max_rounds=12
        )
        .to_pandas()
    )
    assert (got["label"] == 3).all() and len(got) == n


def test_pii_stats_and_redact(ray_session):
    """PII counting/redaction boundary cases: overlapping-looking
    tokens, dotted quads inside longer runs, placeholder ordering."""
    import pandas as pd
    import ray.data

    from oluray.stages import text as T

    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "a@b.io and 10.0.0.1 call 321-004-0001",
            "no pii at all",
            "edge .@x.com 1.2.3.4.5 999.999.999.999 12-345-6789",
            "two a@b.cd e@f.gh",
        ],
    }))
    st = T.pii_stats(docs).to_pandas().set_index("doc_id").sort_index()
    assert st.loc[1].tolist() == [1, 1, 1, 3]
    assert st.loc[2].tolist() == [0, 0, 0, 0]
    # ".@x.com" matches from '@'? no — local part needs >=1 char but
    # '.' qualifies; "1.2.3.4.5" contains a quad; phone needs 3-3-4
    assert st.loc[3, "n_email"] == 1
    assert st.loc[3, "n_ipv4"] >= 1
    assert st.loc[3, "n_phone"] == 0
    assert st.loc[4].tolist() == [2, 0, 0, 2]

    red = T.pii_redact(docs).to_pandas().set_index("doc_id")
    assert red.loc[1, "text"] == "<EMAIL> and <IPV4> call <PHONE>"
    assert red.loc[2, "text"] == "no pii at all"
    assert red.loc[4, "text"] == "two <EMAIL> <EMAIL>"


def test_canonical_url_cases(ray_session):
    """Canonicalization collapses scheme/host case, default ports,
    fragments and trailing slashes — and leaves PATH case, non-default
    ports and query strings alone."""
    import pandas as pd

    from oluray.stages.text import canonical_url

    s = pd.Series([
        "HTTPS://WWW.Ex.COM:443/A/B#frag",
        "https://www.ex.com/A/B",
        "http://ex.com:80/",
        "http://ex.com",
        "https://ex.com:8443/x/",     # non-default port KEPT
        "https://ex.com/p?q=1#f",     # query kept, fragment dropped
    ])
    got = canonical_url(s).tolist()
    assert got[0] == got[1] == "https://www.ex.com/A/B"
    assert got[2] == got[3] == "http://ex.com"
    assert got[4] == "https://ex.com:8443/x"
    assert got[5] == "https://ex.com/p?q=1"
