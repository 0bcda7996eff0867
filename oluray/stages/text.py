"""Text-analysis operators over the `documents` table.

Large-scale training-data-pipeline stages, each a vectorized
`map_batches` transform (stateful ones are callable classes so regex
compilation happens once per actor):

- token counting (whitespace split — SQL-parity with
  `string_split(text, ' ')`)
- quality signals as EXACT integer counts (alpha/digit/space/punct) —
  integers, not ratios, so SQL oracles hash-match bit-for-bit
- language-ID: marker-word counting + deterministic argmax (the
  n-gram-heuristic family, expressible in SQL via replace-length
  counting)
- document fingerprinting: rolling polynomial hash over tokens
  (not SQL-expressible; verified by pytest oracle)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# marker words per language, with surrounding spaces so they match as
# whole words mid-string; counting is non-overlapping left-to-right in
# both pandas (`str.count`) and SQL (`replace`-length difference)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of "),
    "de": (" der ", " und ", " die "),
    "fr": (" le ", " et ", " les "),
    "es": (" el ", " y ", " los "),
}
_LANG_ORDER = ("en", "de", "fr", "es")  # deterministic tie-break order


class TokenCount:
    """n_tokens = number of ' '-separated fields (SQL:
    `length(string_split(text, ' '))`) — consecutive spaces yield
    empty fields in BOTH engines, by construction."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["text"].str.count(" ", flags=0).fillna(0).astype("int64") + 1
        return pd.DataFrame({"doc_id": batch["doc_id"], "n_tokens": n})


class QualityCounts:
    """Exact integer quality signals: length, alpha, digit, space."""

    def __init__(self):
        import re

        self.alpha = re.compile(r"[A-Za-z]")
        self.digit = re.compile(r"[0-9]")
        self.space = re.compile(r" ")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["text"]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars": t.str.len().astype("int64"),
                "n_alpha": t.str.count(self.alpha).astype("int64"),
                "n_digit": t.str.count(self.digit).astype("int64"),
                "n_space": t.str.count(self.space).astype("int64"),
            }
        )


class LangId:
    """Predict language by marker-word counts, deterministic argmax
    (first language in _LANG_ORDER with the max count wins)."""

    def __init__(self):
        import re

        self.patterns = {
            lang: [re.compile(re.escape(m)) for m in ms]
            for lang, ms in LANG_MARKERS.items()
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["text"].str.lower()
        counts = {}
        for lang in _LANG_ORDER:
            c = None
            for p in self.patterns[lang]:
                cc = t.str.count(p)
                c = cc if c is None else c + cc
            counts[lang] = c.astype("int64")
        arr = np.stack([counts[lang].to_numpy() for lang in _LANG_ORDER])
        pred_idx = np.argmax(arr, axis=0)  # first max wins (ties -> _LANG_ORDER)
        pred = np.array(_LANG_ORDER)[pred_idx]
        out = {"doc_id": batch["doc_id"], "pred_lang": pred}
        for lang in _LANG_ORDER:
            out[f"n_{lang}"] = counts[lang]
        return pd.DataFrame(out)


def langid_sql(text_expr: str = "lower(text)") -> str:
    """SQL expression block computing the same marker counts +
    argmax; returns a SELECT-list fragment (pred_lang, n_en, ...)."""
    count_exprs = {}
    for lang, ms in LANG_MARKERS.items():
        parts = [
            f"((length({text_expr}) - length(replace({text_expr}, '{m}', ''))) / {len(m)})"
            for m in ms
        ]
        count_exprs[lang] = "(" + " + ".join(parts) + ")::BIGINT"
    e = count_exprs
    pred = (
        f"CASE WHEN {e['en']} >= {e['de']} AND {e['en']} >= {e['fr']} AND {e['en']} >= {e['es']} THEN 'en' "
        f"WHEN {e['de']} >= {e['fr']} AND {e['de']} >= {e['es']} THEN 'de' "
        f"WHEN {e['fr']} >= {e['es']} THEN 'fr' ELSE 'es' END"
    )
    cols = [f"{pred} AS pred_lang"]
    for lang in _LANG_ORDER:
        cols.append(f"{e[lang]} AS n_{lang}")
    return ", ".join(cols)


_FP_BASE = np.uint64(1099511628211)  # FNV-ish multiplier
_FP_OFFSET = np.uint64(14695981039346656037)


_LONG_TOKEN = 64  # padded-matrix width cap


def _fnv1a_bytes(data: bytes) -> np.uint64:
    h = _FP_OFFSET
    with np.errstate(over="ignore"):
        for b in data:
            h = (h ^ np.uint64(b)) * _FP_BASE
    return h


def token_hashes_many(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """FNV-1a per ' '-token for a whole batch of texts, vectorized.

    Returns (flat_hashes, counts): all token hashes concatenated in
    text order, plus tokens-per-text. Tokens up to 64 bytes (the vast
    majority of natural text) go through a padded byte matrix
    processed column-by-column; LONGER tokens (base64 blobs, minified
    JS, megabyte URLs in web scrapes) are hashed individually — a
    single padded matrix sized by the longest token would allocate
    O(n_tokens x longest_token) and OOM on one degenerate row.
    Bit-identical output either way.
    """
    counts = np.fromiter((t.count(" ") + 1 for t in texts), dtype=np.int64,
                         count=len(texts))
    toks: list[bytes] = []
    for t in texts:
        toks.extend(s.encode("utf-8", "surrogatepass") for s in t.split(" "))
    n = len(toks)
    if n == 0:
        return np.empty(0, dtype=np.uint64), counts
    lens = np.fromiter(map(len, toks), dtype=np.int64, count=n)
    h = np.full(n, _FP_OFFSET, dtype=np.uint64)
    long_idx = np.flatnonzero(lens > _LONG_TOKEN)
    for i in long_idx:
        h[i] = _fnv1a_bytes(toks[i])
    short_mask = lens <= _LONG_TOKEN
    short_lens = np.minimum(lens, _LONG_TOKEN)
    maxlen = int(short_lens.max()) if short_mask.any() else 0
    if maxlen == 0:
        return h, counts
    mat = np.frombuffer(
        b"".join(
            (t[:maxlen] if len(t) > maxlen else t).ljust(maxlen, b"\x00")
            for t in toks
        ),
        dtype=np.uint8,
    ).reshape(n, maxlen)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        for j in range(maxlen):
            mask = short_mask & (lens > j)
            h[mask] = (h[mask] ^ mat[mask, j].astype(np.uint64)) * _FP_BASE
    return h, counts


def token_hashes(text: str) -> np.ndarray:
    """FNV-1a per ' '-token, uint64 — shared by fingerprint / minhash
    / simhash so all sketches agree on tokenization."""
    flat, _ = token_hashes_many([text])
    return flat


class Fingerprint:
    """Rolling polynomial document fingerprint over token hashes
    (order-sensitive; a reordered document fingerprints differently).
    """

    MOD = np.uint64((1 << 61) - 1)
    MULT = np.uint64(31)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].tolist()
        flat, counts = token_hashes_many(texts)
        # replicate r1's numpy-scalar recurrence exactly with Python
        # ints (≈10x faster than np.uint64 scalar ops): each step is
        # wrap-mod-2^64 of (acc*31 + h%M), then mod M — the wraparound
        # IS part of the fingerprint definition (deterministic), so it
        # is preserved rather than "fixed".
        M = int(self.MOD)
        M64 = (1 << 64) - 1
        hm = (flat % self.MOD).tolist()
        fps = np.empty(len(texts), dtype=np.int64)
        pos = 0
        for i, c in enumerate(counts):
            acc = 0
            for h in hm[pos : pos + c]:
                acc = ((acc * 31 + h) & M64) % M
            fps[i] = acc
            pos += c
        return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": fps})
