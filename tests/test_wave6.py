"""Wave-6 checks: DuckDB-oracle equality at sf0.001, brute-force
oracles for containment / DBSCAN / LPA, and the PSNR accept/reject
boundary of adaptive recompression."""
import numpy as np
import pandas as pd

from oluray.functions import geo, imagecodec as ic
from oluray.pipelines import queries_wave6 as W

SF = "/root/testdata/sf0.001"

ORACLE_NAMES = ("containment_join", "temporal_hotspots", "dbscan_labels")


def _duck(sf=SF):
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "events", "documents", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")
    return con


def test_wave6_oracle_exact_sf0001():
    con = _duck()
    for name in ORACLE_NAMES:
        got = W.QUERIES[name](SF).to_pandas()
        exp = con.sql(W.ORACLE[name]).df()
        cols = sorted(got.columns)
        gs = got[cols].sort_values(cols).reset_index(drop=True)
        es = exp[sorted(exp.columns)][cols].sort_values(cols).reset_index(
            drop=True)
        assert gs.shape == es.shape, name
        assert (gs.astype(str).values == es.astype(str).values).all(), name


def test_temporal_hotspots_nontrivial_at_gate_scale():
    """sf0.001 has no hotspot (too thin); the sf0.01 gate input must
    exercise the flag path — checked oracle-side only (cheap)."""
    con = _duck("/root/testdata/sf0.01")
    n = len(con.sql(W.ORACLE["temporal_hotspots"]).df())
    assert n > 0


def test_containment_brute():
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    shingles = {int(r["doc_id"]): {r["text"][i:i + W.CONT_N]
                                   for i in range(max(
                                       len(r["text"]) - W.CONT_N + 1, 0))}
                for _, r in docs.iterrows()}
    want = set()
    ids = sorted(shingles)
    for a in ids:
        for b in ids:
            if a == b or not shingles[a]:
                continue
            inter = len(shingles[a] & shingles[b])
            if inter * 1000000 >= W.CONT_T_E6 * len(shingles[a]):
                want.add((a, b, inter, len(shingles[a]),
                          inter * 1000000 // len(shingles[a])))
    got = W.q_containment_join(SF).to_pandas()
    have = set(zip(got["doc_sub"].astype(int), got["doc_sup"].astype(int),
                   got["n_inter"].astype(int), got["cnt_sub"].astype(int),
                   got["containment_e6"].astype(int)))
    assert have == want


def test_containment_catches_subset_jaccard_misses():
    """The operator's reason to exist: a doc fully contained in a much
    larger one has containment 1.0 but low Jaccard."""
    sub = "the quick brown fox jumps over the lazy dog near the river"
    sup = sub + " " + " ".join(f"unrelated{i}tailword" for i in range(120))
    g = lambda t: {t[i:i + 8] for i in range(len(t) - 7)}
    inter = len(g(sub) & g(sup))
    containment = inter / len(g(sub))
    jaccard = inter / len(g(sub) | g(sup))
    assert containment >= 0.99 and jaccard < 0.15


def test_dbscan_brute():
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    cid = cust["c_custkey"].to_numpy(np.int64)
    lon_u, lat_u = geo.derive_units(cid)
    x = (lon_u // 100).astype(np.int64)
    y = (lat_u // 100).astype(np.int64)
    d2 = ((x[:, None] - x[None, :]) ** 2
          + (y[:, None] - y[None, :]) ** 2)
    near = d2 <= W.DB_EPS * W.DB_EPS
    n = near.sum(axis=1)  # includes self
    core = n >= W.DB_MINPTS
    border = ~core & ((near & core[None, :]).sum(axis=1) > 0)
    want = np.where(core, 2, np.where(border, 1, 0))
    got = (W.q_dbscan_labels(SF).to_pandas()
           .sort_values("c_custkey").reset_index(drop=True))
    order = np.argsort(cid)
    assert np.array_equal(got["c_custkey"].to_numpy(np.int64), cid[order])
    assert np.array_equal(got["label"].to_numpy(np.int64), want[order])


def test_label_propagation_matches_sync_sweep():
    """Distributed LPA == a literal numpy synchronous sweep with the
    same (max count, min label) rule, on a small ad-hoc graph with a
    bridge between two dense cliques."""
    import ray.data
    import pyarrow as pa

    from oluray.stages import joins

    edges = []
    for clique in ([0, 1, 2, 3], [10, 11, 12, 13]):
        for i in range(len(clique)):
            for j in range(i + 1, len(clique)):
                edges.append((clique[i], clique[j]))
    edges.append((3, 10))  # bridge
    edges.append((20, 21))  # separate dumbbell
    e = pa.table({"ka": pa.array([a for a, _ in edges], pa.int64()),
                  "kb": pa.array([b for _, b in edges], pa.int64())})
    got = (joins.label_propagation(ray.data.from_arrow(e), rounds=4,
                                   num_partitions=4)
           .to_pandas().sort_values("node").reset_index(drop=True))

    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lab = {v: v for v in nbrs}
    for _ in range(4):
        new = {}
        for v in nbrs:
            counts: dict[int, int] = {}
            for u in nbrs[v]:
                counts[lab[u]] = counts.get(lab[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            # max count, tie -> min label
            cmax = best[1]
            new[v] = min(k for k, c in counts.items() if c == cmax)
        lab = new
    want = pd.DataFrame(sorted(lab.items()), columns=["node", "label"])
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    # the two cliques must NOT share a label (LPA's point vs CC)
    g = dict(zip(got["node"], got["label"]))
    assert g[0] != g[10]


def test_recompress_psnr_boundary():
    got = W.q_recompress_images(SF).to_pandas()
    assert len(got) == 500
    assert (got["psnr_cdb"] >= 4000).all()
    assert (got["out_bytes"] > 0).all()
    # spot-check both sides of the boundary with the codec directly
    from oluray.sources import fixtures

    for i in (0, 7, 42):
        w = h = fixtures.SIZES[i % len(fixtures.SIZES)]
        px = fixtures._pixels(i, w, h, 42)
        row = got[got["image_id"] == f"img{i:08d}"].iloc[0]
        bits = int(row["bits"])
        p_chosen = ic.psnr_db(px, ic.decode_quantized(
            ic.encode_quantized(px, bits)))
        assert p_chosen >= W.RECOMP_MIN_DB
        if bits > W.RECOMP_LADDER[0]:
            p_lower = ic.psnr_db(px, ic.decode_quantized(
                ic.encode_quantized(px, bits - 1)))
            assert p_lower < W.RECOMP_MIN_DB  # one step more lossy fails
