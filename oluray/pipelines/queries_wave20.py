"""Wave-20 catalog: Spearman rank correlation per group, Benford
first-digit profile, and isotonic (PAVA) calibration.

`spearman_corr` is the robust drift detector ("is value trending
with time?") per event type: Pearson correlation of TIE-AVERAGED
ranks. Doubling the average rank (2*avg = 2*min_rank + ties - 1)
keeps every intermediate INTEGER; the moments accumulate as Python
ints (no int64 wrap — 4n^4 passes 2^63 near n=2e5), and only the
final rho is a single scaled IEEE division, the same discipline
`q_group_linreg` uses for slope_1e9. Ranks are computed per
event-type partition — group count is schema-bounded, so a
partition holds whole groups; at groups beyond one worker the
histogram-offset global-rank machinery (`balanced_shards`) slots in.

`benford_digits` is the Benford's-law fraud/data-quality screen:
distribution of the first significant digit of order totals (cents)
vs log10(1+1/d); emits exact (digit, cnt) — the chi-square fold is
the caller's. Purely a per-block combiner + 9-row regroup.

`isotonic_calib` is PAVA (pool-adjacent-violators) calibration —
THE post-hoc probability calibrator: per lang, the monotone
least-squares fit of positive-rate vs n_chars score. Fitted block
rates are exact rationals (pos_sum, n) — no float in the merge
loop, so blocks compare by cross-multiplication. Corpus passes once
through a (lang, score) combiner; PAVA runs on the aggregate-sized
distinct-score table per group. Rows-only (iterative pooling is not
SQL); brute-verified in pytest against an independent O(n^2)
implementation.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from oluray.stages import joins


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# spearman_corr — tie-averaged rank correlation per event type
# ---------------------------------------------------------------------------


def q_spearman_corr(sf_dir: str):
    """Per event type: Spearman rho between event time and value as
    rho_1e9 (round(rho * 1e9), one IEEE division on exact integer
    moments) plus n. Ranks are 2*tie-averaged (integers); moments
    fold as Python ints."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, sub in df.groupby("event_type", sort=False):
            ts = sub["ts"].astype("datetime64[us]").astype("int64")
            # 2 * average rank is always integral, ties or not
            r2x = (ts.rank(method="average") * 2).astype("int64") \
                .to_numpy().astype(object)
            r2y = (sub["value"].rank(method="average") * 2) \
                .astype("int64").to_numpy().astype(object)
            n = len(sub)
            sx, sy = int(r2x.sum()), int(r2y.sum())
            sxy = int((r2x * r2y).sum())
            sxx = int((r2x * r2x).sum())
            syy = int((r2y * r2y).sum())
            num = n * sxy - sx * sy
            denx = n * sxx - sx * sx
            deny = n * syy - sy * sy
            rho = float(num) / float(denx * deny) ** 0.5 \
                if denx > 0 and deny > 0 else 0.0
            rows.append((et, n, int(np.round(rho * 1e9))))
        return pd.DataFrame(rows,
                            columns=["event_type", "n", "rho_1e9"])

    return joins.grouped_agg(ev, ["event_type"], fold,
                             num_partitions=4)


_SPEARMAN_SQL = """
    WITH r AS (
      SELECT event_type AS et,
             (2 * RANK() OVER (PARTITION BY event_type ORDER BY ts)
              + COUNT(*) OVER (PARTITION BY event_type, ts) - 1)
               ::HUGEINT AS rx,
             (2 * RANK() OVER (PARTITION BY event_type ORDER BY value)
              + COUNT(*) OVER (PARTITION BY event_type, value) - 1)
               ::HUGEINT AS ry
      FROM events),
    m AS (
      SELECT et, count(*)::HUGEINT AS n, SUM(rx) AS sx, SUM(ry) AS sy,
             SUM(rx * ry) AS sxy, SUM(rx * rx) AS sxx,
             SUM(ry * ry) AS syy
      FROM r GROUP BY et)
    SELECT et AS event_type, n::BIGINT AS n,
           round((n * sxy - sx * sy)::DOUBLE
                 / sqrt((n * sxx - sx * sx)::DOUBLE
                        * (n * syy - sy * sy)::DOUBLE) * 1e9, 0)
             ::BIGINT AS rho_1e9
    FROM m
"""


# ---------------------------------------------------------------------------
# benford_digits — first-significant-digit profile of order totals
# ---------------------------------------------------------------------------


def q_benford_digits(sf_dir: str):
    """First significant digit of order totals in cents: (digit,
    cnt), digit in 1..9. One per-block bincount combiner, then a
    9-row regroup — nothing corpus-sized moves."""
    from oluray.pipelines.queries import _round_half_away

    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def digits(df: pd.DataFrame) -> pd.DataFrame:
        cents = _round_half_away(
            df["o_totalprice"].to_numpy(np.float64) * 100.0)
        # strip trailing digits integerly: no float log10 (ulp-wrong
        # exactly at powers of ten)
        v = cents.astype(np.int64)
        v = np.abs(v)
        while True:
            big = v >= 10
            if not big.any():
                break
            v[big] //= 10
        cnt = np.bincount(v, minlength=10)[1:10]
        return pd.DataFrame({"digit": np.arange(1, 10, dtype=np.int64),
                             "cnt": cnt.astype(np.int64)})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("digit", as_index=False)["cnt"].sum()
        g = g[g["cnt"] > 0]
        g["cnt"] = g["cnt"].astype("int64")
        return g

    return joins.grouped_agg(
        orders.map_batches(digits, batch_format="pandas"),
        ["digit"], fold, num_partitions=4, pre_repartition=False)


_BENFORD_SQL = """
    WITH c AS (
      SELECT CAST(substr(CAST(abs(round(o_totalprice * 100.0, 0)
               ::BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders)
    SELECT digit, count(*)::BIGINT AS cnt
    FROM c WHERE digit BETWEEN 1 AND 9 GROUP BY digit
"""


# ---------------------------------------------------------------------------
# isotonic_calib — PAVA monotone calibration of positive-rate vs score
# ---------------------------------------------------------------------------

ISO_POS_SOURCES = ("src0", "src1", "src2")


def _pava(scores: np.ndarray, pos: np.ndarray,
          cnt: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Pool-adjacent-violators on (score-ascending) blocks with exact
    rational means: merge while prev pos/n > next pos/n (strict —
    equal rates stay separate blocks). Returns
    (sc_lo, sc_hi, pos_sum, n) per fitted block."""
    stack: list[list[int]] = []  # [sc_lo, sc_hi, pos, n]
    for s, p, c in zip(scores.tolist(), pos.tolist(), cnt.tolist()):
        blk = [int(s), int(s), int(p), int(c)]
        while stack and stack[-1][2] * blk[3] > blk[2] * stack[-1][3]:
            top = stack.pop()
            blk = [top[0], blk[1], top[2] + blk[2], top[3] + blk[3]]
        stack.append(blk)
    return [tuple(b) for b in stack]


def q_isotonic_calib(sf_dir: str):
    """Per-lang isotonic calibration of P(source in {src0..2}) vs
    n_chars: PAVA over the (lang, score)-aggregated table; output one
    row per fitted monotone block (lang, sc_lo, sc_hi, pos_sum, n) —
    the calibrated rate is pos_sum/n, exact. The corpus never reaches
    the PAVA task: the combiner reduces it to distinct scores."""
    docs = _read(sf_dir, "documents", ["lang", "source", "n_chars"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        pos = df["source"].isin(ISO_POS_SOURCES)
        g = pd.DataFrame({"lang": df["lang"], "sc": df["n_chars"],
                          "pos": pos.astype("int64"),
                          "cnt": np.ones(len(df), dtype=np.int64)})
        return g.groupby(["lang", "sc"],
                         as_index=False)[["pos", "cnt"]].sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "sc"],
                       as_index=False)[["pos", "cnt"]].sum()
        rows = []
        for lang, sub in g.groupby("lang", sort=False):
            sub = sub.sort_values("sc")
            for lo, hi, p, n in _pava(sub["sc"].to_numpy(np.int64),
                                      sub["pos"].to_numpy(np.int64),
                                      sub["cnt"].to_numpy(np.int64)):
                rows.append((lang, lo, hi, p, n))
        return pd.DataFrame(rows, columns=["lang", "sc_lo", "sc_hi",
                                           "pos_sum", "n"])

    return joins.grouped_agg(docs, ["lang"], fold, num_partitions=4,
                             combine_fn=combine)


QUERIES = {
    "spearman_corr": q_spearman_corr,
    "benford_digits": q_benford_digits,
    "isotonic_calib": q_isotonic_calib,
}

ORACLE = {
    "spearman_corr": _SPEARMAN_SQL,
    "benford_digits": _BENFORD_SQL,
}
