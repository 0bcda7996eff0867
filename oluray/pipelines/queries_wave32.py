"""Wave-32 catalog: Huffman code-length bound and longest repeated-
token run.

`huffman_bound` is the compression-theory yardstick: per lang, the
total bit cost of an OPTIMAL prefix code for the character
distribution (Huffman), as exact integers — the bound adaptive
coders are judged against, and the pair to `image_entropy`'s
Shannon lower bound. The alphabet histogram is aggregate-sized
(<= 26 letters + space); the greedy two-smallest merge runs
deterministically (ties: smaller weight, then earlier creation
order) in the final fold. Rows-only (a greedy heap is not SQL);
brute-verified plus the Shannon sandwich H <= L < H+1 per symbol.

`max_token_run` is the degenerate-repetition screen (LLM data
quality: "the the the ..."): per document, the length of the
longest run of one token repeated consecutively, with the
lexicographically-smallest witnessing term. Row-local run-length
encoding per doc; the oracle replays it with the zipped-unnest
gaps-and-islands trick.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import heapq
import re

import numpy as np
import pandas as pd
import ray.data

from oluray.stages import joins

_TOKEN_RE = re.compile(r"[^a-z]+")


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# huffman_bound — optimal prefix-code total bits per lang
# ---------------------------------------------------------------------------


def huffman_total_bits(weights: list[int]) -> int:
    """Total weighted codeword length of an optimal (Huffman) prefix
    code: sum of all internal-node weights. Deterministic: heap
    orders by (weight, creation index). Single symbol costs 1 bit
    per occurrence (degenerate tree convention)."""
    if not weights:
        return 0
    if len(weights) == 1:
        return int(weights[0])
    h = [(int(w), i) for i, w in enumerate(weights)]
    heapq.heapify(h)
    nxt = len(weights)
    total = 0
    while len(h) > 1:
        a, _ = heapq.heappop(h)
        b, _ = heapq.heappop(h)
        total += a + b
        heapq.heappush(h, (a + b, nxt))
        nxt += 1
    return total


def q_huffman_bound(sf_dir: str):
    """(lang, n_chars_total, huffman_bits, n_symbols): exact optimal
    prefix-code cost of each lang's character stream (letters a-z +
    space; other bytes dropped). One corpus pass through a
    per-block (lang, char) histogram; the greedy merge folds the
    alphabet-bounded table."""
    docs = _read(sf_dir, "documents", ["lang", "text"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, sub in df.groupby("lang", sort=False):
            joined = "\n".join(sub["text"].astype(str).str.lower())
            arr = np.frombuffer(joined.encode("latin-1", "ignore"),
                                dtype=np.uint8)
            counts = np.bincount(arr, minlength=256)
            for ch in list(range(ord("a"), ord("z") + 1)) + [ord(" ")]:
                if counts[ch]:
                    rows.append((lang, ch, int(counts[ch])))
        return pd.DataFrame(rows, columns=["lang", "ch", "n"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "ch"], as_index=False)["n"].sum()
        out = []
        for lang, sub in g.groupby("lang", sort=False):
            w = sub.sort_values("ch")["n"].astype(int).tolist()
            out.append((lang, int(sub["n"].sum()),
                        huffman_total_bits(w), len(w)))
        return pd.DataFrame(out, columns=["lang", "n_chars_total",
                                          "huffman_bits", "n_symbols"])

    return joins.grouped_agg(
        docs.map_batches(hist, batch_format="pandas"),
        ["lang"], fold, num_partitions=4, pre_repartition=False)


# ---------------------------------------------------------------------------
# max_token_run — longest consecutive repetition per document
# ---------------------------------------------------------------------------


def q_max_token_run(sf_dir: str):
    """(doc_id, max_run, term): longest run of one repeated token;
    witness term = lexicographically smallest among maximal runs.
    Row-local RLE — zero shuffle."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def rle(df: pd.DataFrame) -> pd.DataFrame:
        ids, runs, terms = [], [], []
        for did, txt in zip(df["doc_id"].to_numpy(),
                            df["text"].to_numpy()):
            toks = [t for t in _TOKEN_RE.split(str(txt).lower()) if t]
            if not toks:
                continue
            a = np.array(toks, dtype=object)
            brk = np.concatenate(([True], a[1:] != a[:-1]))
            starts = np.flatnonzero(brk)
            lens = np.diff(np.concatenate((starts, [len(a)])))
            best = int(lens.max())
            cands = sorted(str(a[s]) for s, l in zip(starts, lens)
                           if l == best)
            ids.append(int(did))
            runs.append(best)
            terms.append(cands[0])
        return pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"),
                             "max_run": pd.array(runs, dtype="int64"),
                             "term": pd.array(terms, dtype="string")})

    return docs.map_batches(rle, batch_format="pandas")


_MAX_RUN_SQL = """
    WITH lists AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS xs
      FROM documents),
    tok AS (
      SELECT doc_id, unnest(xs) AS term,
             unnest(range(1, len(xs) + 1)) AS ord
      FROM lists WHERE len(xs) > 0),
    runs AS (
      SELECT doc_id, term, count(*)::BIGINT AS run FROM (
        SELECT doc_id, term,
               ord - row_number() OVER (PARTITION BY doc_id, term
                                        ORDER BY ord) AS g
        FROM tok)
      GROUP BY doc_id, term, g)
    SELECT doc_id, run AS max_run, term FROM runs
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY run DESC, term) = 1
"""


QUERIES = {
    "huffman_bound": q_huffman_bound,
    "max_token_run": q_max_token_run,
}

ORACLE = {
    "max_token_run": _MAX_RUN_SQL,
}
