"""Training-data operators over `documents` / `embeddings`: dedup,
text quality, language-ID, fingerprints, similarity search.

These are the beyond-the-reference operators the task brief requires
for a large-scale training-data pipeline. SQL-oracled where DuckDB can
express the semantics; heuristic/sketch operators (minhash-LSH,
simhash, langid, fingerprints, LSH-ANN) are rows-only checked by the
driver and golden-tested in tests/.

Scale idioms: tokenization/hashing vectorized per batch; dedup is
hash-bucketed (content-hash partials, no text shuffle); ANN brute
force is a numpy matmul per batch against a broadcast query matrix;
the LSH variant buckets by sign-random-projection prefix so only
matching buckets are scanned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import (
    content_hash,
    langid,
    minhash_bands,
    minhash_signature,
    quality_scores,
    rolling_fingerprint,
    shingles,
    simhash64,
    token_count_ws,
)
from .common import arrow_table, partial_groupby_agg, read_table, round_away_np

# ------------------------------------------------------------------ documents


def q_token_count(sf_dir: str):
    """Whitespace token counting (SQL: string_split length)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(token_count_ws(texts)),
            "n_chars": pa.array(pc.cast(pc.utf8_length(t["text"]), pa.int64())),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def q_doc_stats(sf_dir: str):
    """Per (lang, source) corpus stats via combiner partials."""
    out = partial_groupby_agg(
        read_table(sf_dir, "documents", ["lang", "source", "n_chars"]),
        ["lang", "source"],
        [("n_docs", "n_chars", "count_all"), ("sum_chars", "n_chars", "sum")],
    )
    avg = out["sum_chars"].to_numpy() / out["n_docs"].to_numpy()
    return pa.table({
        "lang": out["lang"], "source": out["source"], "n_docs": out["n_docs"],
        "sum_chars": out["sum_chars"],
        "avg_chars": pa.array(round_away_np(avg, 2)),
    })


def q_exact_dedup(sf_dir: str):
    """Exact dedup: content-hash per batch (vectorized blake2b), then
    per-hash (min doc_id, count) partials — hash-partition + first,
    no text bytes move through the shuffle."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({
            "h": pa.array(content_hash(t["text"].to_pylist())),
            "doc_id": t["doc_id"],
        })

    out = partial_groupby_agg(
        ds.map_batches(f, batch_format="pyarrow"),
        ["h"],
        [("keep_doc_id", "doc_id", "min"), ("n_dups", "doc_id", "count_all")],
    )
    return pa.table({"keep_doc_id": out["keep_doc_id"], "n_dups": out["n_dups"]})


def q_doc_quality(sf_dir: str):
    """Per-doc quality features with SQL-expressible definitions:
    token count and avg word length of single-space-separated text."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = token_count_ws(texts)
        total = np.array([len(s) for s in texts], dtype=np.float64)
        avg_len = (total - (n - 1)) / np.maximum(n, 1)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n),
            "avg_word_len": pa.array(round_away_np(avg_len, 2)),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def q_events_json(sf_dir: str):
    """JSON field extraction from the props column (regex both sides)."""
    import re

    ds = read_table(sf_dir, "events", ["event_id", "props"])
    pat = re.compile(r'"k": (\d+)')

    def f(t: pa.Table) -> pa.Table:
        ks = [int(m.group(1)) if (m := pat.search(p)) else None
              for p in t["props"].to_pylist()]
        return pa.table({"event_id": t["event_id"], "k": pa.array(ks, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def q_window_tumbling(sf_dir: str):
    """Tumbling 5-minute windows over the events stream: count + sum
    per (event_type, window) — the streaming-window operator expressed
    as a bucket groupby (SURVEY.md §2.12: Ray Data is batch; windows
    become epoch-bucket keys)."""
    ds = read_table(sf_dir, "events", ["event_type", "ts", "value"])

    def f(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.int64()).to_numpy()
        win = ts_us // (300 * 1_000_000)
        return pa.table({"event_type": t["event_type"], "win": pa.array(win),
                         "value": t["value"]})

    out = partial_groupby_agg(ds.map_batches(f, batch_format="pyarrow"),
                              ["event_type", "win"],
                              [("n", "value", "count_all"), ("sum_value", "value", "sum")])
    return pa.table({
        "event_type": out["event_type"], "win": out["win"], "n": out["n"],
        "sum_value": pa.array(round_away_np(out["sum_value"].to_numpy(), 2)),
    })


def q_window_hopping(sf_dir: str):
    """Hopping windows (size 10 min, hop 5 min): each event lands in
    2 overlapping windows — flat-map expansion inside map_batches then
    combiner partials (the overlapping-window analog of tumbling)."""
    ds = read_table(sf_dir, "events", ["event_type", "ts", "value"])
    SIZE, HOP = 600 * 1_000_000, 300 * 1_000_000

    def f(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.int64()).to_numpy()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy()
        n_win = SIZE // HOP
        base = (ts_us // HOP) * HOP
        wins = np.concatenate([(base - k * HOP) for k in range(n_win)])
        return pa.table({
            "event_type": pa.array(np.tile(et, n_win)),
            "win_start": pa.array(wins // 1_000_000),
            "value": pa.array(np.tile(val, n_win)),
        })

    out = partial_groupby_agg(ds.map_batches(f, batch_format="pyarrow"),
                              ["event_type", "win_start"],
                              [("n", "value", "count_all"), ("sum_value", "value", "sum")])
    return pa.table({
        "event_type": out["event_type"], "win_start": out["win_start"],
        "n": out["n"],
        "sum_value": pa.array(round_away_np(out["sum_value"].to_numpy(), 2)),
    })


def q_sessionize(sf_dir: str):
    """Sessionization (30-min gap) per user: groupby(user).map_groups
    over ts-sorted events — the stateful-stream operator as a
    partitioned sorted scan."""
    import pandas as pd

    ds = read_table(sf_dir, "events", ["user_id", "ts", "event_id"])

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff().dt.total_seconds().fillna(0)
        sid = (gap > 1800).cumsum()
        out = g.groupby(sid).size()
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "n_sessions": [int(out.size)],
            "max_session_events": [int(out.max())],
        })

    return ds.groupby("user_id").map_groups(sess, batch_format="pandas")


# rows-only text operators -------------------------------------------------


def q_langid(sf_dir: str):
    """n-gram language-ID heuristic (rows-only; accuracy golden in
    tests)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "lang_pred": pa.array(langid(t["text"].to_pylist()))})

    return ds.map_batches(f, batch_format="pyarrow")


def q_quality_full(sf_dir: str):
    """Full quality-score vector (stopword/punct ratios etc.;
    rows-only)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        q = quality_scores(t["text"].to_pylist())
        return pa.table({"doc_id": t["doc_id"],
                         **{k: pa.array(v) for k, v in q.items()}})

    return ds.map_batches(f, batch_format="pyarrow")


def q_simhash(sf_dir: str):
    """64-bit SimHash per doc (rows-only)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array(simhash64(t["text"].to_pylist()))})

    return ds.map_batches(f, batch_format="pyarrow")


def q_fingerprint(sf_dir: str):
    """Rolling-hash document fingerprint (winnowing min-hash;
    rows-only)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "fingerprint": pa.array([rolling_fingerprint(s) for s in t["text"].to_pylist()],
                                    pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _lsh_candidate_pairs(sf_dir: str):
    """MinHash-LSH candidate pair Dataset (un-deduped): shingle->
    minhash per batch, explode to (band, band_hash, doc_id), groupby
    band buckets, emit candidate pairs verified by signature
    similarity >= 0.5.

    The canonical shuffle shape: heavy hashing is per-batch; only the
    tiny (band_hash, doc_id) pairs shuffle."""
    NUM_PERM, BANDS = 64, 16
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def sig_batch(t: pa.Table) -> pa.Table:
        ids, bands, hashes, sigs = [], [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = minhash_signature(shingles(txt), NUM_PERM)
            bh = minhash_bands(sig, BANDS)
            ids.extend([did] * BANDS)
            bands.extend(range(BANDS))
            hashes.extend(bh.tolist())
            sigs.extend([sig.tobytes()] * BANDS)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "band": pa.array(bands, pa.int32()),
                         "band_hash": pa.array(hashes, pa.int64()),
                         "sig": pa.array(sigs, pa.binary())})

    MAX_BUCKET = 256  # cap: a boilerplate megabucket would go O(k^2)
    NB = 256  # shuffle granularity: hash-bucket of (band, band_hash) —
    # one map task processes ALL its bucket's tiny groups in one pass
    # (per-group map_groups dispatch over ~1e5 distinct band hashes
    # costs more than the pairing itself)

    import pandas as pd

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            t["band_hash"].to_numpy() * np.int64(131071)
            + t["band"].to_numpy(zero_copy_only=False).astype(np.int64))
        return t.append_column("__bucket__",
                               pa.array((h % np.uint64(NB)).astype(np.int64)))

    exploded = ds.map_batches(sig_batch, batch_format="pyarrow",
                              batch_size=512) \
        .map_batches(add_bucket, batch_format="pyarrow")

    def bucket_pairs(t: pa.Table) -> pa.Table:
        out_a, out_b, out_s = [], [], []
        idx = pc.sort_indices(t, sort_keys=[("band", "ascending"),
                                            ("band_hash", "ascending"),
                                            ("doc_id", "ascending")])
        t = t.take(idx)
        band = t["band"].to_numpy()
        bh = t["band_hash"].to_numpy()
        ids = t["doc_id"].to_numpy()
        sig_mat = np.frombuffer(b"".join(t["sig"].to_pylist()),
                                np.uint64).reshape(t.num_rows, -1)
        change = np.zeros(t.num_rows, bool)
        change[0] = True
        change[1:] |= (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.nonzero(change)[0]
        ends = np.append(starts[1:], t.num_rows)
        for s, e_ in zip(starts, ends):
            gids = ids[s:e_]
            keep_u = np.concatenate([[True], gids[1:] != gids[:-1]])
            gids = gids[keep_u]
            if len(gids) < 2:
                continue
            gsig = sig_mat[s:e_][keep_u]
            if len(gids) > MAX_BUCKET:
                # deterministic cap (lowest doc_ids kept): a bucket
                # this hot is boilerplate. Members beyond the cap are
                # NOT dropped — each is paired against the bucket's
                # first retained member (a transitive-closure anchor),
                # so identical boilerplate duplicated >MAX_BUCKET times
                # still links into one component (ADVICE r2 fix).
                anchor_sims = (gsig[MAX_BUCKET:] == gsig[0]).mean(axis=1)
                akeep = anchor_sims >= 0.5
                out_a.append(np.full(int(akeep.sum()), gids[0], np.int64))
                out_b.append(gids[MAX_BUCKET:][akeep].astype(np.int64))
                out_s.append(anchor_sims[akeep])
                gids = gids[:MAX_BUCKET]
                gsig = gsig[:MAX_BUCKET]
            bi, bj = np.triu_indices(len(gids), k=1)
            sims = (gsig[bi] == gsig[bj]).mean(axis=1)
            keep = sims >= 0.5
            out_a.append(gids[bi[keep]].astype(np.int64))
            out_b.append(gids[bj[keep]].astype(np.int64))
            out_s.append(sims[keep])
        if not out_a:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "sig_sim": pa.array([], pa.float64())})
        return pa.table({"doc_a": pa.array(np.concatenate(out_a)),
                         "doc_b": pa.array(np.concatenate(out_b)),
                         "sig_sim": pa.array(np.concatenate(out_s))})

    return exploded.groupby("__bucket__").map_groups(
        bucket_pairs, batch_format="pyarrow")


def q_minhash_lsh(sf_dir: str):
    """MinHash-LSH near-dup candidates (see _lsh_candidate_pairs).
    Literal-oracle checked (deterministic seeded hashing)."""
    pairs = _lsh_candidate_pairs(sf_dir)
    # distributed dedup of pairs found in multiple bands: a tiny
    # groupby over (doc_a, doc_b) partials — no driver-side pair table
    out = partial_groupby_agg(pairs, ["doc_a", "doc_b"],
                              [("sig_sim", "sig_sim", "max")])
    if out.num_rows == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "sig_sim": pa.array([], pa.float64())})
    idx = pc.sort_indices(out, sort_keys=[("doc_a", "ascending"),
                                          ("doc_b", "ascending")])
    return out.take(idx).select(["doc_a", "doc_b", "sig_sim"])


def q_jaccard_verify(sf_dir: str):
    """n-gram Jaccard verification of the MinHash-LSH candidates: the
    candidate pairs (distributed LSH bucketing) are re-scored with
    EXACT 3-gram Jaccard similarity — the verify stage of a production
    near-dup pipeline, fully distributed: the pair Dataset is deduped
    by a (doc_a, doc_b) groupby, then SHUFFLE-JOINED to the document
    texts twice (on doc_a, then doc_b), and scored per batch. No
    driver-side text dict — works when candidate pairs and the doc
    table both exceed driver memory (VERDICT r2 directive #5)."""
    from ..stages.joins import hash_join

    pairs = _lsh_candidate_pairs(sf_dir) \
        .groupby(["doc_a", "doc_b"]).max("sig_sim") \
        .map_batches(lambda t: t.rename_columns(["doc_a", "doc_b", "sig_sim"]),
                     batch_format="pyarrow")
    texts = read_table(sf_dir, "documents", ["doc_id", "text"])
    def _clean(t: pa.Table) -> pa.Table:
        # native join drops the right key column; the bucket fallback
        # keeps it — tolerate both
        if "doc_id" in t.column_names:
            t = t.drop_columns(["doc_id"])
        return t.rename_columns(["text_a" if c == "text" else c
                                 for c in t.column_names])

    j1 = hash_join(pairs, texts, left_on="doc_a", right_on="doc_id") \
        .map_batches(_clean, batch_format="pyarrow")
    j2 = hash_join(j1, texts, left_on="doc_b", right_on="doc_id")

    def score(t: pa.Table) -> pa.Table:
        def grams(s: str) -> set:
            return {s[i:i + 3] for i in range(max(len(s) - 2, 1))}

        sims = np.empty(t.num_rows, np.float64)
        for i, (sa, sb) in enumerate(zip(t["text_a"].to_pylist(),
                                         t["text"].to_pylist())):
            ga, gb = grams(sa), grams(sb)
            sims[i] = len(ga & gb) / max(len(ga | gb), 1)
        return pa.table({
            "doc_a": t["doc_a"], "doc_b": t["doc_b"],
            "sig_sim": t["sig_sim"],
            "jaccard": pa.array(round_away_np(sims, 4)),
        })

    return j2.map_batches(score, batch_format="pyarrow")


# ------------------------------------------------------------------ embeddings


def _query_vectors(dim: int = 64, k: int = 4) -> np.ndarray:
    """Deterministic query matrix (seeded)."""
    rng = np.random.default_rng(777)
    q = rng.normal(0, 1, (k, dim))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 against the basis query e0 (SQL
    oracle: embedding[1]/norm). Per-batch local top-k + final merge —
    the baseline ANN path (numpy matmul per batch)."""
    K = 10
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def local(t: pa.Table) -> pa.Table:
        emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        norm = np.sqrt((emb * emb).sum(axis=1))
        sim = emb[:, 0] / norm
        k = min(K, len(sim))
        part = np.argpartition(-sim, k - 1)[:k] if len(sim) > k else np.arange(len(sim))
        return pa.table({"vec_id": pa.array(t["vec_id"].to_numpy()[part]),
                         "sim": pa.array(sim[part])})

    parts = ds.map_batches(local, batch_format="pyarrow")
    merged = pa.concat_tables(
        list(parts.iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default",
    )
    df = merged.to_pandas().sort_values(["sim", "vec_id"], ascending=[False, True]).head(K)
    df["sim"] = round_away_np(df["sim"].to_numpy(), 4)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return pa.Table.from_pandas(df[["vec_id", "sim", "rank"]], preserve_index=False)


def q_ann_multi_query(sf_dir: str):
    """Brute-force cosine top-5 for a broadcast query matrix (the real
    multi-query ANN shape: one matmul per batch against all queries).
    Rows-only (random query matrix not expressible in SQL)."""
    K = 5
    Q = _query_vectors()
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def local(t: pa.Table) -> pa.Table:
        emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        sims = (emb / norm) @ Q.T  # (n, k)
        ids, qids, vals = [], [], []
        for qi in range(Q.shape[0]):
            s = sims[:, qi]
            k = min(K, len(s))
            part = np.argpartition(-s, k - 1)[:k] if len(s) > k else np.arange(len(s))
            ids.extend(t["vec_id"].to_numpy()[part].tolist())
            qids.extend([qi] * len(part))
            vals.extend(s[part].tolist())
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         "vec_id": pa.array(ids, pa.int64()),
                         "sim": pa.array(vals)})

    parts = ds.map_batches(local, batch_format="pyarrow")
    df = pa.concat_tables(
        list(parts.iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default",
    ).to_pandas()
    out = []
    for qi, g in df.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(K).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g)
    import pandas as pd

    res = pd.concat(out, ignore_index=True)
    res["sim"] = round_away_np(res["sim"].to_numpy(), 4)
    return pa.Table.from_pandas(res[["query_id", "vec_id", "rank", "sim"]], preserve_index=False)


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed ANN (the scale path): sign-random-projection over
    b=8 hyperplanes buckets every vector; only vectors sharing the
    query's bucket (or Hamming-1 neighbors) are scored. Shuffle moves
    (bucket, vec_id) pairs only; scoring is a numpy matmul per batch
    against the broadcast query. Rows-only (recall vs brute force is
    golden-tested in tests)."""
    K = 5
    B = 8
    rng = np.random.default_rng(4242)
    Q = _query_vectors()
    planes = rng.normal(0, 1, (B, Q.shape[1]))

    def bucket_of(vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ planes.T) > 0
        return (bits * (1 << np.arange(B))).sum(axis=1).astype(np.int64)

    qb = bucket_of(Q)
    # query buckets + Hamming-1 neighborhood (multi-probe LSH)
    probe: set[int] = set()
    for b_ in qb.tolist():
        probe.add(b_)
        for i in range(B):
            probe.add(b_ ^ (1 << i))
    probe_arr = pa.array(np.array(sorted(probe), np.int64))

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def local(t: pa.Table) -> pa.Table:
        emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        unit = emb / norm
        bk = bucket_of(unit)
        keep = pc.is_in(pa.array(bk), value_set=probe_arr).to_numpy(zero_copy_only=False)
        if not keep.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        unit = unit[keep]
        ids = t["vec_id"].to_numpy()[keep]
        bks = bk[keep]
        sims = unit @ Q.T
        out_q, out_id, out_s = [], [], []
        for qi in range(Q.shape[0]):
            ok = np.isin(bks, [qb[qi]] + [qb[qi] ^ (1 << i) for i in range(B)])
            s = sims[ok, qi]
            cand = ids[ok]
            k = min(K, len(s))
            if k == 0:
                continue
            part = np.argpartition(-s, k - 1)[:k] if len(s) > k else np.arange(len(s))
            out_q.extend([qi] * len(part))
            out_id.extend(cand[part].tolist())
            out_s.extend(s[part].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    parts = ds.map_batches(local, batch_format="pyarrow")
    df = pa.concat_tables(
        list(parts.iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default").to_pandas()
    import pandas as pd

    out = []
    for qi, g in df.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(K).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g)
    if not out:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    res = pd.concat(out, ignore_index=True)
    res["sim"] = round_away_np(res["sim"].to_numpy(), 4)
    return pa.Table.from_pandas(res[["query_id", "vec_id", "rank", "sim"]],
                                preserve_index=False)


def q_ann_ivf(sf_dir: str):
    """IVF-bucketed ANN (the coarse-quantizer scale path, alongside
    the LSH variant): k-means centroids trained on a deterministic
    sample (Lloyd iterations on the driver — O(sample x k), the IVF
    'train' phase), then every batch assigns its vectors to nearest
    centroids and scores ONLY vectors in the query's nprobe closest
    lists — one matmul per batch against the broadcast queries.
    Rows-only; recall vs brute force is golden-tested."""
    K, NLIST, NPROBE, SAMPLE = 5, 16, 4, 512
    Q = _query_vectors()
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    # train: deterministic sample (lowest vec_ids) -> Lloyd k-means
    sample_t = ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], SAMPLE)),
        batch_format="pyarrow")
    samp = pa.concat_tables(list(sample_t.iter_batches(
        batch_size=None, batch_format="pyarrow")), promote_options="default")
    X = np.array(samp["embedding"].to_pylist(), np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.default_rng(99)
    cents = X[rng.choice(len(X), NLIST, replace=False)]
    for _ in range(10):
        assign = (X @ cents.T).argmax(axis=1)
        for c in range(NLIST):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                cents[c] = v / np.linalg.norm(v)
    qlists = np.argsort(-(Q @ cents.T), axis=1)[:, :NPROBE]
    probe_sets = [set(q.tolist()) for q in qlists]

    def local(t: pa.Table) -> pa.Table:
        emb = np.array(t["embedding"].to_pylist(), np.float64)
        unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        lists = (unit @ cents.T).argmax(axis=1)
        ids = t["vec_id"].to_numpy()
        out_q, out_id, out_s = [], [], []
        sims = unit @ Q.T
        for qi in range(Q.shape[0]):
            ok = np.isin(lists, list(probe_sets[qi]))
            if not ok.any():
                continue
            s = sims[ok, qi]
            cand = ids[ok]
            k = min(K, len(s))
            part = np.argpartition(-s, k - 1)[:k] if len(s) > k \
                else np.arange(len(s))
            out_q.extend([qi] * len(part))
            out_id.extend(cand[part].tolist())
            out_s.extend(s[part].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    parts = ds.map_batches(local, batch_format="pyarrow")
    df = pa.concat_tables(
        list(parts.iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default").to_pandas()
    import pandas as pd

    out = []
    for qi, g in df.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(K).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g)
    if not out:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    res = pd.concat(out, ignore_index=True)
    res["sim"] = round_away_np(res["sim"].to_numpy(), 4)
    return pa.Table.from_pandas(res[["query_id", "vec_id", "rank", "sim"]],
                                preserve_index=False)


def q_embed_neardup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (sim >= 0.4, i < j) as a
    distributed block-pair join: vectors hash into B id-buckets; each
    row ships to the B bucket-PAIR groups it belongs to, and a
    groupby(pair).map_groups task matmuls only its two blocks. Exact
    (matches the all-pairs SQL oracle) with no driver materialization
    and no full-table broadcast — each task holds 2N/B vectors. The
    sub-quadratic scale path is the LSH bucketing next door
    (q_ann_lsh); this is its exact verifier shape."""
    TAU = 0.4
    B = 8  # id-hash blocks -> B*(B+1)/2 pair tasks, each row shipped B times
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def expand(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        bk = (ids % B).astype(np.int64)
        # pair key for buckets (a<=b): a*B+b; row in bucket k joins
        # every pair (min(k,j), max(k,j)) for j in 0..B-1
        reps = []
        pair_keys = []
        for j in range(B):
            lo = np.minimum(bk, j)
            hi = np.maximum(bk, j)
            pair_keys.append(lo * B + hi)
            reps.append(np.arange(len(ids)))
        idx = np.concatenate(reps)
        pk = np.concatenate(pair_keys)
        sub = t.take(pa.array(idx))
        return sub.append_column("pair", pa.array(pk))

    exploded = ds.map_batches(expand, batch_format="pyarrow")

    import pandas as pd

    def pair_sims(g: pd.DataFrame) -> pd.DataFrame:
        pair = int(g["pair"].iloc[0])
        a_b, b_b = pair // B, pair % B
        ids = g["vec_id"].to_numpy()
        emb = np.array(g["embedding"].tolist(), np.float64)
        unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        bk = (ids % B).astype(np.int64)
        if a_b == b_b:
            sims = unit @ unit.T
            bi, bj = np.nonzero(sims >= TAU)
            keep = ids[bi] < ids[bj]
            va, vb, sv = ids[bi][keep], ids[bj][keep], sims[bi, bj][keep]
        else:
            la = bk == a_b
            lb = bk == b_b
            sims = unit[la] @ unit[lb].T
            bi, bj = np.nonzero(sims >= TAU)
            ia, ib = ids[la][bi], ids[lb][bj]
            va = np.minimum(ia, ib)
            vb = np.maximum(ia, ib)
            sv = sims[bi, bj]
        return pd.DataFrame({"vec_a": va.astype(np.int64),
                             "vec_b": vb.astype(np.int64),
                             "sim": round_away_np(sv, 4)})

    return exploded.groupby("pair").map_groups(pair_sims, batch_format="pandas")


def q_embed_label_stats(sf_dir: str):
    """Per-label embedding stats: count + mean of first component."""
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def f(t: pa.Table) -> pa.Table:
        e0 = pc.list_element(t["embedding"], 0)
        return pa.table({"label": t["label"],
                         "e0": pc.cast(e0, pa.float64())})

    out = partial_groupby_agg(ds.map_batches(f, batch_format="pyarrow"),
                              ["label"],
                              [("n", "e0", "count_all"), ("s", "e0", "sum")])
    mean = out["s"].to_numpy() / out["n"].to_numpy()
    return pa.table({"label": out["label"], "n": out["n"],
                     "mean_e0": pa.array(round_away_np(mean, 4))})


# ------------------------------------------------------------------ oracles

ORACLE: dict[str, str] = {
    # computed recomputation of functions/text.py quality_scores: the
    # same word regex in RE2, ratios as exact int/int double division
    "q_quality_full": """
        WITH toks AS (
          SELECT doc_id, text,
                 regexp_extract_all(text,
                   '[A-Za-z0-9]+(''[A-Za-z]+)?') AS tk
          FROM documents
        )
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               CASE WHEN len(tk) = 0 THEN 0.0
                    ELSE CAST(list_sum(list_transform(tk,
                         x -> length(x))) AS DOUBLE) / len(tk)
               END AS mean_token_len,
               CASE WHEN len(tk) = 0 THEN 0.0
                    ELSE CAST(len(list_filter(tk, x -> list_contains(
                         ['the','a','an','and','or','of','to','in',
                          'is','are','was','were','be','been','it',
                          'this','that','for','on','with','as','at',
                          'by'], lower(x)))) AS DOUBLE) / len(tk)
               END AS stopword_ratio,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE CAST(length(regexp_replace(text,
                         '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                         / length(text)
               END AS punct_ratio
        FROM toks
    """,
    "q_token_count": """
        SELECT doc_id,
               CAST(array_length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents
    """,
    "q_doc_stats": """
        SELECT lang, source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               round(sum(n_chars) * 1.0 / count(*), 2) AS avg_chars
        FROM documents GROUP BY lang, source
    """,
    "q_exact_dedup": """
        SELECT min(doc_id) AS keep_doc_id, count(*) AS n_dups
        FROM documents GROUP BY text
    """,
    "q_doc_quality": """
        SELECT doc_id,
               CAST(array_length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               round((length(text) - (array_length(string_split(text, ' ')) - 1.0))
                     / greatest(array_length(string_split(text, ' ')), 1), 2) AS avg_word_len
        FROM documents
    """,
    "q_events_json": """
        SELECT event_id, CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k
        FROM events
    """,
    "q_window_tumbling": """
        SELECT event_type,
               CAST(floor(epoch_us(ts) / 300000000) AS BIGINT) AS win,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q_window_hopping": """
        SELECT event_type,
               CAST((floor(epoch_us(ts) / 300000000) - k) * 300 AS BIGINT) AS win_start,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events, (SELECT unnest(range(2)) AS k)
        GROUP BY 1, 2
    """,
    "q_sessionize": """
        SELECT user_id, CAST(count(DISTINCT sid) AS BIGINT) AS n_sessions,
               CAST(max(cnt) AS BIGINT) AS max_session_events
        FROM (
            SELECT user_id, sid, count(*) AS cnt FROM (
                SELECT user_id,
                       sum(CASE WHEN gap > 1800 THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
                FROM (
                    SELECT user_id, ts, event_id,
                           epoch(ts - lag(ts, 1, ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
                    FROM events
                )
            ) GROUP BY user_id, sid
        ) GROUP BY user_id
    """,
    "q_ann_topk": """
        SELECT vec_id,
               round(embedding[1] / sqrt(list_aggregate(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS sim,
               CAST(row_number() OVER (ORDER BY embedding[1] / sqrt(list_aggregate(
                     list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                     'sum')) DESC, vec_id) AS BIGINT) AS rank
        FROM embeddings
        ORDER BY rank LIMIT 10
    """,
    "q_embed_neardup": """
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(
                   list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                   list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
          AND list_cosine_similarity(
                   list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                   list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= 0.4
    """,
    "q_embed_label_stats": """
        SELECT label, count(*) AS n,
               round(sum(CAST(embedding[1] AS DOUBLE)) / count(*), 4) AS mean_e0
        FROM embeddings GROUP BY label
    """,
}

QUERIES = {
    "q_token_count": q_token_count,
    "q_doc_stats": q_doc_stats,
    "q_exact_dedup": q_exact_dedup,
    "q_doc_quality": q_doc_quality,
    "q_events_json": q_events_json,
    "q_window_tumbling": q_window_tumbling,
    "q_window_hopping": q_window_hopping,
    "q_sessionize": q_sessionize,
    "q_langid": q_langid,
    "q_quality_full": q_quality_full,
    "q_simhash": q_simhash,
    "q_fingerprint": q_fingerprint,
    "q_minhash_lsh": q_minhash_lsh,
    "q_jaccard_verify": q_jaccard_verify,
    "q_ann_topk": q_ann_topk,
    "q_ann_multi_query": q_ann_multi_query,
    "q_ann_lsh": q_ann_lsh,
    "q_ann_ivf": q_ann_ivf,
    "q_embed_neardup": q_embed_neardup,
    "q_embed_label_stats": q_embed_label_stats,
}
