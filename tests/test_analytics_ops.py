"""Round-5 late analytics: sliding-frame window functions, weekly cohort
retention, and daily-count anomaly flagging — each checked against its
DuckDB oracle at sf0.001 (the same compare the driver gate runs), plus
invariants the oracle can't see (block-split invariance, a hand-computed
retention triangle, the std=0 degenerate case)."""

import duckdb
import numpy as np
import pandas as pd

from cwds_jobs_ray.queries import (
    ORACLE_SQL,
    daily_count_anomalies,
    retention_cohorts,
    window_frame_functions,
)

SF = "/root/testdata/sf0.001"


def _oracle(name: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    return con.execute(ORACLE_SQL[name]).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


def test_window_frames_match_oracle_bitexact():
    got = _norm(window_frame_functions(SF).to_pandas())
    exp = _norm(_oracle("window_frame_functions"))
    # comparison/copy-only kernels: doubles must match with zero tolerance
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)


def test_retention_cohorts_match_oracle():
    got = _norm(retention_cohorts(SF).to_pandas())
    exp = _norm(_oracle("retention_cohorts"))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_daily_anomalies_match_oracle_bitexact():
    got = _norm(daily_count_anomalies(SF).to_pandas())
    exp = _norm(_oracle("daily_count_anomalies"))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)


def _events_parquet(tmp_path, df: pd.DataFrame) -> str:
    """Write a minimal events table (only the columns the ops read)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    full = pd.DataFrame({
        "event_id": np.arange(len(df), dtype=np.int64),
        "ts": df["ts"].astype("datetime64[us]"),
        "user_id": df["user_id"].astype(np.int64),
        "event_type": "view",
        "value": 0.0,
        "props": "{}",
    })
    pq.write_table(pa.Table.from_pandas(full, preserve_index=False),
                   f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_retention_hand_computed_triangle(tmp_path):
    """Three users, hand-placed weeks (Mondays 2024-01-01/08/15):
    u1 active weeks 0,1,2; u2 joins week 1, returns week 2 (offset 1);
    u3 active week 0 only. Duplicate events within a week count once."""
    rows = []
    for uid, days in [(1, ["2024-01-01", "2024-01-03", "2024-01-08",
                           "2024-01-15"]),          # dup inside week 0
                      (2, ["2024-01-10", "2024-01-16"]),
                      (3, ["2024-01-05"])]:
        rows += [(uid, pd.Timestamp(d)) for d in days]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    sf = _events_parquet(tmp_path, df)
    got = retention_cohorts(sf).to_pandas() \
        .sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    exp = pd.DataFrame({
        "cohort_week": ["2024-01-01", "2024-01-01", "2024-01-01",
                        "2024-01-08", "2024-01-08"],
        "week_offset": [0, 1, 2, 0, 1],
        "n_users": [2, 1, 1, 1, 1]})
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_anomaly_std_zero_returns_empty(tmp_path):
    """Uniform day counts -> std = 0 -> z is NaN -> no day flagged (and no
    crash), matching SQL where NaN > 2.0 is not TRUE."""
    rows = [(u, pd.Timestamp(f"2024-02-0{d}T12:00:00"))
            for d in (1, 2, 3) for u in range(5)]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    sf = _events_parquet(tmp_path, df)
    out = daily_count_anomalies(sf).to_pandas()
    assert len(out) == 0


def test_window_frames_block_split_invariant(tmp_path):
    """Frame results must not depend on how input rows land in blocks: a
    pathological 7-row-block split of sf0.001 events must equal the
    whole-file run (the user-keyed exchange owns whole groups)."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/events.parquet")
    pq.write_table(t, f"{tmp_path}/events.parquet",
                   row_group_size=7)
    whole = _norm(window_frame_functions(SF).to_pandas())
    split = _norm(window_frame_functions(str(tmp_path)).to_pandas())
    pd.testing.assert_frame_equal(whole, split, check_exact=True)


def test_repetition_signals_match_oracle_bitexact():
    from cwds_jobs_ray.queries import doc_repetition_signals
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = _norm(con.execute(ORACLE_SQL["doc_repetition_signals"]).df())
    got = _norm(doc_repetition_signals(SF).to_pandas())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)


def test_unigram_commonness_matches_oracle_bitexact():
    from cwds_jobs_ray.queries import unigram_commonness
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = _norm(con.execute(ORACLE_SQL["unigram_commonness"]).df())
    got = _norm(unigram_commonness(SF).to_pandas())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)


def test_repetition_signals_hand_computed(tmp_path):
    """'a b a b a' -> 2grams [ab, ba, ab, ba], top share 2/4; a 1-word doc
    emits no row; 2gram pairs never span documents."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cwds_jobs_ray.queries import doc_repetition_signals
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2], np.int64),
        "text": ["a b a b a", "solo", "x x x"],
        "lang": "en", "source": "t",
        "n_chars": np.array([9, 4, 5], np.int64)})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   f"{tmp_path}/documents.parquet")
    got = doc_repetition_signals(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = pd.DataFrame({
        "doc_id": np.array([0, 2], np.int64),
        "n_2grams": np.array([4, 2], np.int64),
        "top2_count": np.array([2, 2], np.int64),
        "top2_share": [0.5, 1.0]})
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_chunk_documents_hand_computed(tmp_path):
    """10-word doc, 8-word chunks every 6: chunks at word 0 (8 words) and
    word 6 (4 words). A 1-word doc yields one 1-word chunk."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cwds_jobs_ray.queries import chunk_documents
    words = [f"w{i}" for i in range(10)]
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1], np.int64),
        "text": [" ".join(words), "solo"],
        "lang": "en", "source": "t",
        "n_chars": np.array([10, 4], np.int64)})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   f"{tmp_path}/documents.parquet")
    got = chunk_documents(str(tmp_path)).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    exp = pd.DataFrame({
        "doc_id": np.array([0, 0, 1], np.int64),
        "chunk_idx": np.array([0, 1, 0], np.int64),
        "chunk_text": [" ".join(words[0:8]), " ".join(words[6:10]), "solo"],
        "n_words": np.array([8, 4, 1], np.int64)})
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_pack_offsets_block_split_invariant(tmp_path):
    """The global word-offset stream must not depend on block layout: a
    7-row-block split of sf0.001 documents equals the whole-file run, and
    offsets are the exclusive prefix sum of n_words in doc_id order."""
    import pyarrow.parquet as pq

    from cwds_jobs_ray.queries import pack_documents_offsets
    t = pq.read_table(f"{SF}/documents.parquet")
    pq.write_table(t, f"{tmp_path}/documents.parquet", row_group_size=7)
    whole = pack_documents_offsets(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    split = pack_documents_offsets(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(whole, split, check_exact=True)
    n = whole["n_words"].to_numpy()
    off = whole["stream_offset"].to_numpy()
    assert (off == np.r_[0, np.cumsum(n)[:-1]]).all()
    assert (whole["bin_id"].to_numpy() == off // 256).all()


def test_pagerank_matches_naive_loop(tmp_path):
    """Fixed-point PageRank vs an independent naive dict-based loop over a
    hand-built graph (two event types, shared edge across types must count
    once; self-transitions dropped; dangling node keeps base only)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cwds_jobs_ray.queries import (PR_ALPHA_DEN, PR_ALPHA_NUM, PR_ITERS,
                                       PR_SCALE, pagerank_user_graph)
    # type A: users 1,2,1,3  -> edges (1,2),(2,1),(1,3)
    # type B: users 1,2,2,4  -> edges (1,2) dup across types, (2,2) self
    #         dropped, (2,4)
    rows = [(0, 1, "a"), (1, 2, "a"), (2, 1, "a"), (3, 3, "a"),
            (4, 1, "b"), (5, 2, "b"), (6, 2, "b"), (7, 4, "b")]
    ev = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type"])
    ev["ts"] = pd.Timestamp("2024-01-01")
    ev["value"] = 0.0
    ev["props"] = "{}"
    ev = ev[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    ev["event_id"] = ev["event_id"].astype(np.int64)
    ev["user_id"] = ev["user_id"].astype(np.int64)
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   f"{tmp_path}/events.parquet")
    got = pagerank_user_graph(str(tmp_path)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)

    edges = {(1, 2), (2, 1), (1, 3), (2, 4)}
    nodes = [1, 2, 3, 4]
    deg = {u: sum(1 for s, _ in edges if s == u) for u in nodes}
    n = len(nodes)
    base = (15 * PR_SCALE) // (100 * n)
    rank = {u: PR_SCALE // n for u in nodes}
    for _ in range(PR_ITERS):
        acc = {u: 0 for u in nodes}
        for s, dd in edges:
            acc[dd] += rank[s] // deg[s]
        rank = {u: base + (PR_ALPHA_NUM * acc[u]) // PR_ALPHA_DEN
                for u in nodes}
    exp = pd.DataFrame({"user_id": np.array(nodes, np.int64),
                        "rank": np.array([rank[u] for u in nodes],
                                         np.int64)})
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # dangling nodes (3 and 4: no out-edges) still hold base + inflow
    assert (got["rank"] > 0).all()


def test_bm25_scores_hand_computed(tmp_path):
    """BM25 with rational idf over a 3-doc corpus vs a plain-Python
    recompute; rare-term doc must outrank common-term doc at equal length,
    and docs without any query token are excluded."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cwds_jobs_ray.queries import (BM25_B, BM25_K1, BM25_TOKENS,
                                       bm25_doc_scores)
    texts = ["dup alpha beta gamma",        # rare term once
             "join alpha beta gamma",       # common term once
             "alpha beta gamma delta"]      # no query token
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64), "text": texts,
        "lang": "en", "source": "t",
        "n_chars": np.array([len(t) for t in texts], np.int64)})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   f"{tmp_path}/documents.parquet")
    got = bm25_doc_scores(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [0, 1]

    n, sdl = 3.0, 12.0
    dfs = {"dup": 1.0, "join": 1.0}
    def score(text):
        ws = text.split(" ")
        dl = float(len(ws))
        s = 0.0
        for tok in BM25_TOKENS:
            tf = float(ws.count(tok))
            idf = (float(n - dfs[tok]) + 0.5) / (dfs[tok] + 0.5)
            s = s + (idf * (tf * (BM25_K1 + 1.0))) / (
                tf + BM25_K1 * ((1.0 - BM25_B)
                                + BM25_B * (dl / (sdl / n))))
        return s
    assert got["score"].tolist() == [score(texts[0]), score(texts[1])]
    # both tokens have df=1 here, so scores tie exactly; same value twice
    assert got["score"][0] == got["score"][1]
