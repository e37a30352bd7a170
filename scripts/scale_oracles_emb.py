#!/usr/bin/env python3
"""Linear/N^1.5-shaped scale checks for the embedding-search family, whose
DuckDB reference SQL is super-linear at 100x (the IVF assignment join alone
materializes |corpus| x 2*sqrt(N) rows — ~5.7e9 at 100x — before the
argmin, which thrashed a 128 GB host). The corpus itself is tiny as BYTES
(2M x 64 floats = 1 GB in float64), so these checks recompute the ENTIRE
search independently in numpy — matmul-based, chunked, minutes at 100x —
and compare the engine dump against the recomputation:

- ann_ivf_topk / ann_ivfpq_topk / ann_ivfpq_qscale: full independent
  reimplementation of the search (sqrt(N)-cell coarse quantizer from the
  smallest-id seeds, deterministic integer-Lloyd PQ codebooks, asymmetric
  reconstruction scoring, top-k by cosine desc / id asc). Because numpy's
  pairwise-summed dot products can differ from the engine's sequential
  fold by ulps, a per-position id mismatch passes IFF both ids' cosines
  agree within 1e-9 (a genuine near-tie); anything larger fails with the
  margin in the message.
- emb_near_dup: full independent pair recomputation (nprobe-2 cell
  duplication, per-cell Gram matrices, half-up 6-decimal rounding,
  threshold filter). Pairs in the symmetric difference fail unless their
  rounded cosine sits within one rounding step of the threshold.
- emb_dedup_keep: exact union-find connected components + min-id
  representatives over the engine's OWN emb_near_dup pair dump (itself
  verified above) — the same conditional design as the dedup_clusters
  checks.

The sf0.01 driver gate is untouched: these queries keep their exact
DuckDB oracles there.
"""
import glob
import math
import os

import numpy as np
import pandas as pd

_memo = {}


def _dump_df(out_dir, name):
    files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def _half_up(x):
    """Spark/Java ROUND_HALF_UP (away from zero) on doubles."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def _load(sf_dir):
    key = ("emb", sf_dir)
    if key not in _memo:
        df = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        ids = df["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.stack(df["embedding"].to_numpy()[order]).astype(np.float64)
        labels = df["label"].to_numpy()[order]
        _memo[key] = (ids, V, labels)
    return _memo[key]


def _coarse(sf_dir):
    """sqrt(N)-cell coarse centroids: the vectors with the k_c smallest
    vec_ids, k_c = max(16, ceil(2*sqrt(N))) — QueriesLLM.sqrtCells."""
    ids, V, _ = _load(sf_dir)
    kc = max(16, math.ceil(2.0 * math.sqrt(len(ids))))
    mask = ids < kc
    return V[mask][np.argsort(ids[mask], kind="stable")]


def _unit(M):
    n = np.sqrt((M * M).sum(axis=1, keepdims=True))
    with np.errstate(invalid="ignore", divide="ignore"):
        return M / n


def _probes_matrix(V, C, nprobe, chunk=200_000):
    """Per-row top-`nprobe` cells by cosine, ties -> HIGHER cell id
    (Kernels.centroidProbes). Returns (rows, nprobe) int array. The
    reversed-column trick makes a stable descending argsort break ties
    toward the higher original cell."""
    Vn, Cn = _unit(V), _unit(C)
    k = len(C)
    out = np.empty((len(V), min(nprobe, k)), dtype=np.int64)
    for lo in range(0, len(V), chunk):
        cos = Vn[lo:lo + chunk] @ Cn.T
        cos = np.where(np.isnan(cos), np.inf, cos)
        rev = cos[:, ::-1]
        idx = np.argsort(-rev, axis=1, kind="stable")[:, :out.shape[1]]
        out[lo:lo + chunk] = (k - 1) - idx
    return out


def _cells(sf_dir):
    """Corpus coarse-cell assignment: argmax cosine, ties -> LOWEST cell
    (Kernels.centroidCell; np.argmax also takes the first max)."""
    key = ("cells", sf_dir)
    if key not in _memo:
        ids, V, _ = _load(sf_dir)
        C = _coarse(sf_dir)
        Vn, Cn = _unit(V), _unit(C)
        cells = np.empty(len(V), dtype=np.int64)
        for lo in range(0, len(V), 200_000):
            cells[lo:lo + 200_000] = np.argmax(Vn[lo:lo + 200_000] @ Cn.T,
                                               axis=1)
        _memo[key] = cells
    return _memo[key]


def _cell_index(sf_dir):
    """cell -> sorted array of corpus ROW indices assigned to it, so a
    query's candidate list is a concatenation instead of an O(N) isin
    scan (the queries-proportional-to-N probe asks for ~N/100 of those)."""
    key = ("cellidx", sf_dir)
    if key not in _memo:
        cells = _cells(sf_dir)
        order = np.argsort(cells, kind="stable")
        sc = cells[order]
        bounds = np.searchsorted(sc, np.arange(len(_coarse(sf_dir)) + 1))
        _memo[key] = [order[bounds[c]:bounds[c + 1]]
                      for c in range(len(_coarse(sf_dir)))]
    return _memo[key]


def _check_topk(dump, ids, corpus_vecs, q_ids, q_vecs, probe_cells,
                cell_index, k, tol=1e-9):
    """Shared top-k comparator: for each query, the engine's ranked ids
    must equal the recomputed top-k, with per-position id mismatches
    allowed only when both cosines agree within `tol`."""
    if dump is None:
        return "no dump parquet found"
    got_q = set(dump["q_id"].tolist())
    want_q = set(q_ids.tolist())
    if got_q != want_q:
        return (f"query-id sets differ: {len(got_q)} dumped vs "
                f"{len(want_q)} expected")
    by_q = {q: g.sort_values("rank") for q, g in dump.groupby("q_id")}
    Vn = _unit(corpus_vecs)
    for qi, q in enumerate(q_ids):
        qv = q_vecs[qi]
        qn = qv / np.sqrt((qv * qv).sum())
        rows = np.concatenate([cell_index[c] for c in probe_cells[qi]])
        rows = rows[ids[rows] != q]
        cid = ids[rows]
        cos = Vn[rows] @ qn
        order = np.lexsort((cid, -cos))[:k]
        mine_ids, mine_cos = cid[order], cos[order]
        g = by_q[q]
        if list(g["rank"]) != list(range(1, len(mine_ids) + 1)):
            return f"q {q}: ranks not 1..{len(mine_ids)}: {list(g['rank'])}"
        cosmap = dict(zip(cid.tolist(), cos.tolist()))
        for pos, (eng, mine) in enumerate(zip(g["n_id"], mine_ids)):
            if eng == mine:
                continue
            if eng not in cosmap:
                return (f"q {q} rank {pos + 1}: engine id {eng} is not a "
                        "probed-cell candidate in the recomputation")
            margin = abs(cosmap[eng] - mine_cos[pos])
            if margin > tol:
                return (f"q {q} rank {pos + 1}: engine id {eng} vs "
                        f"recomputed {mine} (cosine margin {margin:.2e})")
    return None


def check_ann_ivf_topk(out_dir, sf_dir):
    ids, V, _ = _load(sf_dir)
    qmask = ids < 10
    probes = _probes_matrix(V[qmask], _coarse(sf_dir), nprobe=4)
    return _check_topk(_dump_df(out_dir, "ann_ivf_topk"), ids, V,
                       ids[qmask], V[qmask], probes, _cell_index(sf_dir),
                       k=5)


def _pq_books(sf_dir, m=4, k=8, iters=1, scale=1e7):
    """Deterministic integer-Lloyd PQ codebooks — Similarity.pqTrain:
    quantize once (half-up to int64), init from the k smallest ids,
    cosine-argmax assignment (ties lowest), exact integer sums, floorDiv
    round-half-up means, empty cells keep their centroid."""
    key = ("books", sf_dir, m, k, iters)
    if key in _memo:
        return _memo[key]
    ids, V, _ = _load(sf_dir)
    Q = _half_up(V * scale).astype(np.int64)
    init = Q[ids < k][np.argsort(ids[ids < k], kind="stable")]
    dim = V.shape[1]
    sub = dim // m
    books = []
    for j in range(m):
        S = Q[:, j * sub:(j + 1) * sub]
        cents = init[:, j * sub:(j + 1) * sub].copy()
        for _ in range(iters):
            Cn = _unit(cents.astype(np.float64))
            a = np.empty(len(S), dtype=np.int64)
            for lo in range(0, len(S), 200_000):
                a[lo:lo + 200_000] = np.argmax(
                    _unit(S[lo:lo + 200_000].astype(np.float64)) @ Cn.T,
                    axis=1)
            nxt = cents.copy()
            for c in range(k):
                mask = a == c
                n = int(mask.sum())
                if n > 0:
                    s = S[mask].sum(axis=0, dtype=np.int64)
                    nxt[c] = (2 * s + n) // (2 * n)
            cents = nxt
        books.append((cents / scale).astype(np.float32))
    _memo[key] = books
    return books


def _pq_decoded(sf_dir):
    """PQ-encode the corpus (cosine-argmax code per subspace over the RAW
    float slices, ties lowest) and return the decoded reconstruction."""
    key = ("decoded", sf_dir)
    if key in _memo:
        return _memo[key]
    ids, V, _ = _load(sf_dir)
    books = _pq_books(sf_dir)
    sub = V.shape[1] // len(books)
    D = np.empty_like(V)
    for j, book in enumerate(books):
        S = V[:, j * sub:(j + 1) * sub]
        Bn = _unit(book.astype(np.float64))
        codes = np.empty(len(S), dtype=np.int64)
        for lo in range(0, len(S), 200_000):
            codes[lo:lo + 200_000] = np.argmax(
                _unit(S[lo:lo + 200_000]) @ Bn.T, axis=1)
        D[:, j * sub:(j + 1) * sub] = book.astype(np.float64)[codes]
    _memo[key] = D
    return D


def _check_ivfpq(out_dir, sf_dir, name, qmask_fn):
    ids, V, _ = _load(sf_dir)
    qmask = qmask_fn(ids)
    probes = _probes_matrix(V[qmask], _coarse(sf_dir), nprobe=4)
    return _check_topk(_dump_df(out_dir, name), ids, _pq_decoded(sf_dir),
                       ids[qmask], V[qmask], probes, _cell_index(sf_dir),
                       k=5)


def check_ann_ivfpq_topk(out_dir, sf_dir):
    return _check_ivfpq(out_dir, sf_dir, "ann_ivfpq_topk",
                        lambda ids: ids < 10)


def check_ann_ivfpq_qscale(out_dir, sf_dir):
    return _check_ivfpq(out_dir, sf_dir, "ann_ivfpq_qscale",
                        lambda ids: ids % 100 == 7)


def _mined_pairs(sf_dir, threshold=0.45, nprobe=2):
    """Flat-IVF near-dup pairs — Similarity.cosineDupPairs: every vector
    lands in its nprobe nearest cells, per-cell all-pairs cosine (Gram
    matmul), half-up 6-decimal rounding, threshold filter, distinct."""
    key = ("pairs", sf_dir, threshold, nprobe)
    if key in _memo:
        return _memo[key]
    ids, V, _ = _load(sf_dir)
    probes = _probes_matrix(V, _coarse(sf_dir), nprobe=nprobe)
    Vn = _unit(V)
    pairs = {}
    ncells = len(_coarse(sf_dir))
    member = [[] for _ in range(ncells)]
    for p in range(probes.shape[1]):
        col = probes[:, p]
        for row in np.argsort(col, kind="stable"):
            member[col[row]].append(row)
    for rows in member:
        if len(rows) < 2:
            continue
        rows = np.array(sorted(set(rows)))
        M = Vn[rows]
        G = M @ M.T
        iu, ju = np.triu_indices(len(rows), 1)
        c6 = _half_up(G[iu, ju] * 1e6) / 1e6
        keep = c6 >= threshold
        for a, b, c in zip(rows[iu[keep]], rows[ju[keep]], c6[keep]):
            ia, ib = int(ids[a]), int(ids[b])
            if ia > ib:
                ia, ib = ib, ia
            pairs[(ia, ib)] = float(c)
    _memo[key] = pairs
    return pairs


def check_emb_near_dup(out_dir, sf_dir, threshold=0.45, tol=1e-9):
    dump = _dump_df(out_dir, "emb_near_dup")
    if dump is None:
        return "no dump parquet found"
    mine = _mined_pairs(sf_dir, threshold)
    ids, V, _ = _load(sf_dir)
    row_of = {int(i): r for r, i in enumerate(ids)}
    Vn = _unit(V)
    got = {(int(a), int(b)): float(c)
           for a, b, c in zip(dump["id_a"], dump["id_b"], dump["cosine"])}
    for pk, c in got.items():
        mc = mine.get(pk)
        if mc is None:
            # soundness fallback: a probed-cell ulp tie can route a pair
            # into different cells than the recomputation — the dumped
            # pair still must carry its TRUE cosine
            direct = float(Vn[row_of[pk[0]]] @ Vn[row_of[pk[1]]])
            mc = float(_half_up(np.array([direct * 1e6]))[0] / 1e6)
        if abs(mc - c) > 1e-6 + tol:
            return f"pair {pk}: dumped cos {c} vs recomputed {mc}"
    missing = [(pk, c) for pk, c in mine.items()
               if pk not in got and abs(c - threshold) > 1e-6 + tol]
    if missing:
        pk, c = missing[0]
        return (f"{len(missing)} recomputed pairs missing from dump; "
                f"first {pk} cos {c}")
    return None


def check_emb_dedup_keep(out_dir, sf_dir):
    """Conditional on the (verified) emb_near_dup pair dump: exact
    union-find components + min-id representative per cluster."""
    dump = _dump_df(out_dir, "emb_dedup_keep")
    pairs = _dump_df(out_dir, "emb_near_dup")
    if dump is None or pairs is None:
        return "missing emb_dedup_keep or emb_near_dup dump"
    ids, _, labels = _load(sf_dir)
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rep = {}
    for a in set(pairs["id_a"]).union(pairs["id_b"]):
        r = find(int(a))
        rep[r] = min(rep.get(r, int(a)), int(a))
    drop = {int(a) for a in set(pairs["id_a"]).union(pairs["id_b"])
            if find(int(a)) in rep and rep[find(int(a))] != int(a)}
    want = set(ids.tolist()) - drop
    got = set(dump["vec_id"].tolist())
    if got != want:
        extra, miss = got - want, want - got
        return (f"kept-id sets differ: {len(extra)} extra, {len(miss)} "
                f"missing (e.g. {sorted(extra)[:3]} / {sorted(miss)[:3]})")
    lab = dict(zip(ids.tolist(), labels.tolist()))
    bad = [(v, l) for v, l in zip(dump["vec_id"], dump["label"])
           if lab.get(int(v)) != l]
    if bad:
        return f"label mismatch on {len(bad)} rows, first {bad[0]}"
    return None


def _mix32(x):
    """The engine's 32-bit avalanche mix exactly as the SQL oracles write
    it: two xorshift-multiply rounds + a final xorshift (PortableHash)."""
    x = x % (1 << 32)
    x = ((x ^ (x >> 16)) * 73244475) % (1 << 32)
    x = ((x ^ (x >> 16)) * 73244475) % (1 << 32)
    return x ^ (x >> 16)


_HASH_MULT = 2654435761


def _hash_unit(ids, seed):
    a = _mix32(ids + seed)
    b = _mix32(ids + seed + _HASH_MULT)
    return ((a % (1 << 31)) * (1 << 32) + b) / 9.223372036854776e18


def _check_pack(out_dir, sf_dir, name, sizes_fn,
                budget=1000, num_buckets=8, seed=42):
    """Exact sequential recomputation of Sampling.packSequences — the
    DuckDB oracle is a per-row recursive CTE, fine at 10x and effectively
    quadratic at 100x; the greedy fill IS the linear algorithm, so this
    runs it directly over the (bucket, hashUnit, id)-sorted rows."""
    dump = _dump_df(out_dir, name)
    if dump is None:
        return "no dump parquet found"
    df = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "n_chars"])
    ids = df["doc_id"].to_numpy().astype(np.int64)
    sz = sizes_fn(ids, df["n_chars"].to_numpy().astype(np.int64))
    bucket = _mix32(ids + seed) % num_buckets
    u = _hash_unit(ids, seed + _HASH_MULT)
    order = np.lexsort((ids, u, bucket))
    pack_id = np.empty(len(ids), dtype=np.int64)
    pack_off = np.empty(len(ids), dtype=np.int64)
    cur_b, pid, fill = -1, 0, 0
    for r in order:
        b = bucket[r]
        if b != cur_b:
            cur_b, pid, fill = b, 0, 0
        t = sz[r]
        if fill > 0 and fill + t > budget:
            pid += 1
            fill = 0
        pack_id[r], pack_off[r] = pid, fill
        fill += t
    mine = pd.DataFrame({"doc_id": ids, "pack_bucket": bucket,
                         "pack_id": pack_id, "pack_offset": pack_off})
    got = dump[["doc_id", "pack_bucket", "pack_id", "pack_offset"]] \
        .sort_values("doc_id").reset_index(drop=True).astype(np.int64)
    mine = mine.sort_values("doc_id").reset_index(drop=True)
    if len(got) != len(mine):
        return f"row count {len(got)} vs {len(mine)}"
    for c in mine.columns:
        neq = got[c].to_numpy() != mine[c].to_numpy()
        if neq.any():
            i = int(np.argmax(neq))
            return (f"col {c}: {int(neq.sum())} differ; first doc_id "
                    f"{got['doc_id'][i]}: got {got[c][i]} exp {mine[c][i]}")
    return None


def check_pack_sequences(out_dir, sf_dir):
    return _check_pack(out_dir, sf_dir, "pack_sequences",
                       lambda ids, n_chars: n_chars)


def check_skew_pack_sequences(out_dir, sf_dir):
    return _check_pack(out_dir, sf_dir, "skew_pack_sequences",
                       lambda ids, n_chars:
                       np.where(ids % 2 == 0, 900, ids % 97 + 1))


def check_strip_spans(out_dir, sf_dir):
    """Conditional on the (verified) dup_spans dump — the same design as
    the component checks: replay Dedup.stripDuplicateSpans directly
    (keep token i iff no span has start <= i < end, rejoin on single
    spaces, md5 the result). The DuckDB oracle rebuilds token-by-token
    with window SQL and OOMs at 100x; this is the linear replay."""
    import hashlib
    dump = _dump_df(out_dir, "strip_spans")
    spans = _dump_df(out_dir, "dup_spans")
    if dump is None or spans is None:
        return "missing strip_spans or dup_spans dump"
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    span_map = {}
    for d, s, e in zip(spans["doc_id"], spans["start_pos"],
                       spans["end_pos"]):
        span_map.setdefault(int(d), []).append((int(s), int(e)))
    got = dict(zip(dump["doc_id"].astype(int), dump["stripped_md5"]))
    if len(got) != len(docs):
        return f"dump rows {len(got)} vs corpus {len(docs)}"
    bad = 0
    first = None
    for did, text in zip(docs["doc_id"], docs["text"]):
        did = int(did)
        sp = span_map.get(did)
        if sp is None:
            out = text
        else:
            toks = text.split(" ")
            out = " ".join(t for i, t in enumerate(toks)
                           if not any(s <= i < e for s, e in sp))
        md5 = hashlib.md5(out.encode("utf-8")).hexdigest()
        if got.get(did) != md5:
            bad += 1
            if first is None:
                first = (did, got.get(did), md5)
    if bad:
        return f"{bad} md5 mismatches, first {first}"
    return None


def check_summarize_corr_pairs(out_dir, sf_dir):
    """Independent float64 recomputation of the grouped pairwise
    correlations + t-stats (numpy pairwise summation, ~1e-15 relative on
    the power sums). The l_linenumber/l_orderkey pair is statistically
    zero (r ~ 4e-10 at 100x), so its value is PURE summation-order noise:
    engine, DuckDB, and numpy legitimately disagree in absolute terms
    that grow with n. Bounds reflect that: correlations within
    max(1e-11, 1e-9*|value|); t-stats (r scaled by ~sqrt(n)) within
    max(4e-12*sqrt(n), 1e-9*|value|). The observed engine drift is
    ~3e-15 on r / ~3e-11 on t at n = 6e7 — two to three orders inside
    these bounds — while any real estimator defect (wrong moment, wrong
    n) lands far outside them."""
    dump = _dump_df(out_dir, "summarize_corr_pairs")
    if dump is None:
        return "no dump parquet found"
    cols = ["l_returnflag", "l_quantity", "l_linenumber", "l_orderkey"]
    li = pd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=cols)
    pairs = [("l_quantity", "l_linenumber"), ("l_quantity", "l_orderkey"),
             ("l_linenumber", "l_orderkey")]
    for flag, g in li.groupby("l_returnflag"):
        row = dump[dump["l_returnflag"] == flag]
        if len(row) != 1:
            return f"group {flag}: {len(row)} dump rows"
        row = row.iloc[0]
        n = float(len(g))
        for xc, yc in pairs:
            x = g[xc].to_numpy().astype(np.float64)
            y = g[yc].to_numpy().astype(np.float64)
            mx, my = x.sum() / n, y.sum() / n
            r = ((x * y).sum() / n - mx * my) / (
                math.sqrt((x * x).sum() / n - mx * mx) *
                math.sqrt((y * y).sum() / n - my * my))
            t = r * math.sqrt((n - 2.0) / (1.0 - r * r))
            for col, mine, tol in (
                    (f"{xc}_{yc}_correlation", r,
                     max(1e-11, 1e-9 * abs(r))),
                    (f"{xc}_{yc}_correlationTStat", t,
                     max(4e-12 * math.sqrt(n), 1e-9 * abs(t)))):
                got = float(row[col])
                if abs(got - mine) > tol:
                    return (f"group {flag} {col}: got {got!r} vs "
                            f"recomputed {mine!r} (|diff| "
                            f"{abs(got - mine):.2e} > tol {tol:.2e})")
    return None


SCALE_INVARIANT_EMB = ["ann_ivf_topk", "ann_ivfpq_topk", "ann_ivfpq_qscale",
                       "emb_near_dup", "emb_dedup_keep",
                       "pack_sequences", "skew_pack_sequences",
                       "strip_spans", "summarize_corr_pairs"]


def run(name, out_dir, sf_dir):
    fns = {
        "ann_ivf_topk": lambda: check_ann_ivf_topk(out_dir, sf_dir),
        "ann_ivfpq_topk": lambda: check_ann_ivfpq_topk(out_dir, sf_dir),
        "ann_ivfpq_qscale": lambda: check_ann_ivfpq_qscale(out_dir, sf_dir),
        "emb_near_dup": lambda: check_emb_near_dup(out_dir, sf_dir),
        "emb_dedup_keep": lambda: check_emb_dedup_keep(out_dir, sf_dir),
        "pack_sequences": lambda: check_pack_sequences(out_dir, sf_dir),
        "skew_pack_sequences":
            lambda: check_skew_pack_sequences(out_dir, sf_dir),
        "strip_spans": lambda: check_strip_spans(out_dir, sf_dir),
        "summarize_corr_pairs":
            lambda: check_summarize_corr_pairs(out_dir, sf_dir),
    }
    return fns[name]()
