#!/usr/bin/env python3
"""Linear-shaped scale oracles for the queries whose DuckDB reference SQL
is quadratic (all-pairs Jaccard joins, closed-form EMA self-joins) and
therefore infeasible on derived 10x+ datasets.

Each check verifies the ENGINE DUMP (the parquet graft.Verify wrote) against
invariants that are exact and computable in time linear (or near-linear) in
the corpus:

- pair families (dedup_minhash_lsh, near_dup_jaccard):
    soundness  — every emitted pair's Jaccard is recomputed from the source
                 documents and must match the reported value and clear the
                 threshold (linear in |pairs|);
    completeness — for a deterministic ~1% document sample, the TRUE pair
                 set is computed exactly (candidates via shared
                 shingles/block membership) and must equal the dump's pairs
                 touching the sample (linear in N x sample).
- component families (dedup_clusters, dedup_keep_docs):
    exact recursive-CTE connected components over the engine's OWN
    dedup_minhash_lsh pair dump (itself verified above) — linear in
    |V| + |E| iterations, never an all-pairs join. Conditional on the pair
    dump, which is what makes it scale-shaped.
- per-row EMA families (ema_rows_es_current_core, ema_rows_ewma_legacy,
    skew_ema_rows_ewma):
    full sequential recomputation of the per-key recurrence in float64
    (one pass over every key's rows — the closed-form telescopes, so the
    recurrence IS the linear algorithm), compared at the dumped 4-decimal
    rounding with a 2e-4 absolute guard for summation-order drift.

Used by scripts/selfcheck.py --scale-invariants; the sf0.01 driver gate is
untouched (these queries keep their exact quadratic oracles there).
"""
import glob
import math
import os

import numpy as np
import pandas as pd

import scale_oracles_emb

# queries this module replaces at scale, in dependency order. The
# embedding-search family (scale_oracles_emb) joined in round 11: their
# DuckDB oracles are Theta(N^1.5) SQL — the IVF assignment join alone
# materializes ~5.7e9 rows at 100x — while the corpus as BYTES fits in
# numpy, so those checks recompute the full search independently there.
SCALE_INVARIANT = [
    "dedup_minhash_lsh", "dedup_lsh_edit", "near_dup_jaccard",
    "dedup_against_minhash", "dedup_against_index",
    "dedup_clusters", "dedup_keep_docs", "dedup_keep_best",
    "pipeline_e2e",
    "ema_rows_es_current_core", "ema_rows_ewma_legacy", "skew_ema_rows_ewma",
] + scale_oracles_emb.SCALE_INVARIANT_EMB

_SHINGLES = """
    SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
        for i in range(1, greatest(len(toks) - 2, 1) + 1)]) AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents {pred})
"""

_J = ("CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / "
      "CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)")


def _dump(out_dir, name, con, view):
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        return f"{name}: no dump parquet found"
    flist = ", ".join(f"'{f}'" for f in files)
    con.execute(f"CREATE OR REPLACE VIEW {view} AS "
                f"SELECT * FROM read_parquet([{flist}])")
    return None


def check_dedup_minhash_lsh(con, out_dir):
    err = _dump(out_dir, "dedup_minhash_lsh", con, "got_mh")
    if err:
        return err
    # structural: canonical ordering, no duplicates
    bad = con.execute(
        "SELECT count(*) FROM got_mh WHERE id_a >= id_b").fetchone()[0]
    if bad:
        return f"{bad} pairs with id_a >= id_b"
    dup = con.execute(
        "SELECT count(*) - count(DISTINCT (id_a, id_b)) FROM got_mh"
    ).fetchone()[0]
    if dup:
        return f"{dup} duplicate pairs"
    # soundness: recompute J for every emitted pair
    sh = _SHINGLES.format(
        pred="WHERE doc_id IN (SELECT id_a FROM got_mh "
             "UNION SELECT id_b FROM got_mh)")
    bad = con.execute(f"""
        WITH d AS ({sh})
        SELECT count(*) FROM got_mh p
        JOIN d a ON a.doc_id = p.id_a JOIN d b ON b.doc_id = p.id_b
        WHERE {_J} < 0.5 OR abs({_J} - p.jaccard) > 1e-9""").fetchone()[0]
    if bad:
        return f"{bad} emitted pairs fail exact-Jaccard recheck"
    # completeness on a deterministic ~1% sample: true pairs of sampled
    # docs (candidates must share a shingle when J >= 0.5) == dump pairs
    # touching the sample
    n_cand = con.execute(f"""
        WITH d AS ({_SHINGLES.format(pred='')}),
        s AS (SELECT * FROM d WHERE doc_id % 97 = 3),
        sg AS (SELECT doc_id, unnest(sh) AS g FROM s),
        ag AS (SELECT doc_id, unnest(sh) AS g FROM d)
        SELECT count(*) FROM sg JOIN ag USING (g)
        WHERE sg.doc_id <> ag.doc_id""").fetchone()[0]
    if n_cand > 50_000_000:
        return f"completeness candidate blowup ({n_cand} rows) — shingle " \
               "frequencies are no longer rare; sample check not run"
    con.execute(f"""
        CREATE OR REPLACE TABLE mh_truth AS
        WITH d AS ({_SHINGLES.format(pred='')}),
        s AS (SELECT * FROM d WHERE doc_id % 97 = 3),
        sg AS (SELECT doc_id, unnest(sh) AS g FROM s),
        ag AS (SELECT doc_id, unnest(sh) AS g FROM d),
        cand AS (SELECT DISTINCT least(sg.doc_id, ag.doc_id) AS ca,
                        greatest(sg.doc_id, ag.doc_id) AS cb
                 FROM sg JOIN ag USING (g) WHERE sg.doc_id <> ag.doc_id)
        SELECT ca, cb FROM cand
        JOIN d a ON a.doc_id = ca JOIN d b ON b.doc_id = cb
        WHERE {_J} >= 0.5""")
    missing, extra = con.execute("""
        WITH gotp AS (SELECT id_a AS ca, id_b AS cb FROM got_mh
                      WHERE id_a % 97 = 3 OR id_b % 97 = 3)
        SELECT
          (SELECT count(*) FROM
             (SELECT ca, cb FROM mh_truth EXCEPT SELECT ca, cb FROM gotp)),
          (SELECT count(*) FROM
             (SELECT ca, cb FROM gotp EXCEPT SELECT ca, cb FROM mh_truth))
        """).fetchone()
    if missing or extra:
        return f"sampled completeness: {missing} true pairs missing, " \
               f"{extra} unexpected pairs"
    return None


def check_dedup_lsh_edit(con, out_dir):
    """Same shape as check_dedup_minhash_lsh plus the edit tier: soundness
    recomputes Jaccard AND Levenshtein for every emitted pair (linear in
    |pairs|, DP bounded by the corpus max doc length); sampled
    completeness applies both thresholds (J >= 0.5, edit_sim >= 0.6) to
    the exact shared-shingle candidate pairs of a deterministic ~1%
    sample."""
    err = _dump(out_dir, "dedup_lsh_edit", con, "got_de")
    if err:
        return err
    bad = con.execute(
        "SELECT count(*) FROM got_de WHERE id_a >= id_b").fetchone()[0]
    if bad:
        return f"{bad} pairs with id_a >= id_b"
    dup = con.execute(
        "SELECT count(*) - count(DISTINCT (id_a, id_b)) FROM got_de"
    ).fetchone()[0]
    if dup:
        return f"{dup} duplicate pairs"
    # soundness: J + Levenshtein recheck per emitted pair
    touched = ("SELECT id_a FROM got_de UNION SELECT id_b FROM got_de")
    sh = _SHINGLES.format(pred=f"WHERE doc_id IN ({touched})")
    bad = con.execute(f"""
        WITH d AS ({sh}),
        t AS (SELECT doc_id, text FROM documents
              WHERE doc_id IN ({touched}))
        SELECT count(*) FROM got_de p
        JOIN d a ON a.doc_id = p.id_a JOIN d b ON b.doc_id = p.id_b
        JOIN t ta ON ta.doc_id = p.id_a JOIN t tb ON tb.doc_id = p.id_b
        WHERE {_J} < 0.5 OR abs({_J} - p.jaccard) > 1e-9
           OR levenshtein(ta.text, tb.text) <> p.dist
           OR 1.0 - CAST(p.dist AS DOUBLE)
                / CAST(greatest(length(ta.text), length(tb.text)) AS DOUBLE)
              <> p.edit_sim
           OR p.edit_sim < 0.6""").fetchone()[0]
    if bad:
        return f"{bad} emitted pairs fail Jaccard/Levenshtein recheck"
    # completeness on a deterministic ~1% sample with both tiers applied
    n_cand = con.execute(f"""
        WITH d AS ({_SHINGLES.format(pred='')}),
        s AS (SELECT * FROM d WHERE doc_id % 97 = 3),
        sg AS (SELECT doc_id, unnest(sh) AS g FROM s),
        ag AS (SELECT doc_id, unnest(sh) AS g FROM d)
        SELECT count(*) FROM sg JOIN ag USING (g)
        WHERE sg.doc_id <> ag.doc_id""").fetchone()[0]
    if n_cand > 50_000_000:
        return f"completeness candidate blowup ({n_cand} rows) — shingle " \
               "frequencies are no longer rare; sample check not run"
    con.execute(f"""
        CREATE OR REPLACE TABLE de_truth AS
        WITH d AS ({_SHINGLES.format(pred='')}),
        s AS (SELECT * FROM d WHERE doc_id % 97 = 3),
        sg AS (SELECT doc_id, unnest(sh) AS g FROM s),
        ag AS (SELECT doc_id, unnest(sh) AS g FROM d),
        cand AS (SELECT DISTINCT least(sg.doc_id, ag.doc_id) AS ca,
                        greatest(sg.doc_id, ag.doc_id) AS cb
                 FROM sg JOIN ag USING (g) WHERE sg.doc_id <> ag.doc_id),
        jpass AS (SELECT ca, cb FROM cand
                  JOIN d a ON a.doc_id = ca JOIN d b ON b.doc_id = cb
                  WHERE {_J} >= 0.5)
        SELECT ca, cb FROM jpass
        JOIN documents ta ON ta.doc_id = ca
        JOIN documents tb ON tb.doc_id = cb
        WHERE 1.0 - CAST(levenshtein(ta.text, tb.text) AS DOUBLE)
            / CAST(greatest(length(ta.text), length(tb.text)) AS DOUBLE)
          >= 0.6""")
    missing, extra = con.execute("""
        WITH gotp AS (SELECT id_a AS ca, id_b AS cb FROM got_de
                      WHERE id_a % 97 = 3 OR id_b % 97 = 3)
        SELECT
          (SELECT count(*) FROM
             (SELECT ca, cb FROM de_truth EXCEPT SELECT ca, cb FROM gotp)),
          (SELECT count(*) FROM
             (SELECT ca, cb FROM gotp EXCEPT SELECT ca, cb FROM de_truth))
        """).fetchone()
    if missing or extra:
        return f"sampled completeness: {missing} true pairs missing, " \
               f"{extra} unexpected pairs"
    return None


def check_near_dup_jaccard(con, out_dir):
    err = _dump(out_dir, "near_dup_jaccard", con, "got_nj")
    if err:
        return err
    ws = ("SELECT source, doc_id, list_sort(list_distinct("
          "string_split(text, ' '))) AS sh FROM documents")
    # soundness: block + J recheck per emitted pair
    bad = con.execute(f"""
        WITH d AS ({ws})
        SELECT count(*) FROM got_nj p
        JOIN d a ON a.doc_id = p.id_a JOIN d b ON b.doc_id = p.id_b
        WHERE a.source <> p.block OR b.source <> p.block
           OR {_J} < 0.5 OR abs({_J} - p.jaccard) > 1e-9""").fetchone()[0]
    if bad:
        return f"{bad} emitted pairs fail block/Jaccard recheck"
    # completeness: sampled docs x their ENTIRE source block, exact
    j_sd = _J.replace("a.sh", "s.sh").replace("b.sh", "d.sh")
    con.execute(f"""
        CREATE OR REPLACE TABLE nj_truth AS
        WITH d AS ({ws}),
        s AS (SELECT * FROM d WHERE doc_id % 199 = 3)
        SELECT DISTINCT least(s.doc_id, d.doc_id) AS ca,
               greatest(s.doc_id, d.doc_id) AS cb
        FROM s JOIN d ON d.source = s.source AND d.doc_id <> s.doc_id
        WHERE {j_sd} >= 0.5""")
    missing, extra = con.execute("""
        WITH gotp AS (SELECT DISTINCT id_a AS ca, id_b AS cb FROM got_nj
                      WHERE id_a % 199 = 3 OR id_b % 199 = 3)
        SELECT
          (SELECT count(*) FROM
             (SELECT ca, cb FROM nj_truth EXCEPT SELECT ca, cb FROM gotp)),
          (SELECT count(*) FROM
             (SELECT ca, cb FROM gotp EXCEPT SELECT ca, cb FROM nj_truth))
        """).fetchone()
    if missing or extra:
        return f"sampled completeness: {missing} true pairs missing, " \
               f"{extra} unexpected pairs"
    return None


def check_dedup_against_minhash(con, out_dir, name="dedup_against_minhash"):
    """Linear-shaped invariants for the incremental (incoming = odd
    doc_ids, existing = even) near-dedup: the all-cross-pairs SQL oracle
    is quadratic, so at scale we verify (1) output structure, (2) drop
    soundness — every dropped incoming doc really has a J >= 0.5 match in
    the existing half, recomputed exactly over shared-shingle candidates —
    and (3) keep completeness on a deterministic ~1% sample — no sampled
    survivor has any J >= 0.5 existing match. dedup_against_index shares
    the exact contract (same split / threshold / shingles / exact-Jaccard
    verify; only the engine path differs — prebuilt index), so the same
    invariants check it."""
    err = _dump(out_dir, name, con, "got_dam")
    if err:
        return err
    bad = con.execute(
        "SELECT count(*) FROM got_dam WHERE doc_id % 2 = 0").fetchone()[0]
    if bad:
        return f"{bad} even doc_ids in the incoming-survivor output"
    dup = con.execute(
        "SELECT count(*) - count(DISTINCT doc_id) FROM got_dam").fetchone()[0]
    if dup:
        return f"{dup} duplicate doc_ids"
    orphan = con.execute("""
        SELECT count(*) FROM got_dam g
        WHERE NOT EXISTS (SELECT 1 FROM documents d
                          WHERE d.doc_id = g.doc_id AND d.source = g.source)
        """).fetchone()[0]
    if orphan:
        return f"{orphan} output rows not in documents"
    sh_drop = _SHINGLES.format(
        pred="WHERE doc_id % 2 = 1 AND doc_id NOT IN "
             "(SELECT doc_id FROM got_dam)")
    sh_even = _SHINGLES.format(pred="WHERE doc_id % 2 = 0")
    unsound = con.execute(f"""
        WITH da AS ({sh_drop}), db AS ({sh_even}),
        ag AS (SELECT doc_id, unnest(sh) AS g FROM da),
        bg AS (SELECT doc_id, unnest(sh) AS g FROM db),
        cand AS (SELECT DISTINCT ag.doc_id AS ia, bg.doc_id AS ib
                 FROM ag JOIN bg USING (g)),
        hit AS (SELECT DISTINCT c.ia FROM cand c
                JOIN da a ON a.doc_id = c.ia JOIN db b ON b.doc_id = c.ib
                WHERE {_J} >= 0.5)
        SELECT count(*) FROM da WHERE doc_id NOT IN (SELECT ia FROM hit)
        """).fetchone()[0]
    if unsound:
        return f"{unsound} dropped docs with no true J>=0.5 existing match"
    sh_sample = _SHINGLES.format(
        pred="WHERE doc_id % 2 = 1 AND doc_id % 97 = 3 "
             "AND doc_id IN (SELECT doc_id FROM got_dam)")
    n_cand = con.execute(f"""
        WITH s AS ({sh_sample}), e AS ({sh_even}),
        sg AS (SELECT doc_id, unnest(sh) AS g FROM s),
        eg AS (SELECT doc_id, unnest(sh) AS g FROM e)
        SELECT count(*) FROM sg JOIN eg USING (g)""").fetchone()[0]
    if n_cand > 50_000_000:
        return f"completeness candidate blowup ({n_cand} rows) — shingle " \
               "frequencies are no longer rare; sample check not run"
    extra = con.execute(f"""
        WITH s AS ({sh_sample}), e AS ({sh_even}),
        sg AS (SELECT doc_id, unnest(sh) AS g FROM s),
        eg AS (SELECT doc_id, unnest(sh) AS g FROM e),
        cand AS (SELECT DISTINCT sg.doc_id AS ia, eg.doc_id AS ib
                 FROM sg JOIN eg USING (g))
        SELECT count(DISTINCT c.ia) FROM cand c
        JOIN s a ON a.doc_id = c.ia JOIN e b ON b.doc_id = c.ib
        WHERE {_J} >= 0.5""").fetchone()[0]
    if extra:
        return f"{extra} sampled survivors actually have a J>=0.5 " \
               "existing match"
    return None


_comp_done = set()


def _components(con, out_dir):
    """Exact components over the engine's verified minhash pair dump
    (computed once per (connection, out_dir); three check functions
    share the comp_ref table)."""
    key = (id(con), out_dir)
    if key in _comp_done:
        return None
    err = _dump(out_dir, "dedup_minhash_lsh", con, "edges_mh")
    if err:
        return err
    con.execute("""
        CREATE OR REPLACE TABLE comp_ref AS
        WITH RECURSIVE
        und AS (SELECT id_a AS s, id_b AS d FROM edges_mh
                UNION ALL SELECT id_b, id_a FROM edges_mh),
        comp(id, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT u.d, c.lbl FROM comp c JOIN und u ON u.s = c.id)
        SELECT id AS doc_id, min(lbl) AS cluster_id FROM comp GROUP BY id""")
    _comp_done.add(key)
    return None


def check_dedup_clusters(con, out_dir):
    err = _dump(out_dir, "dedup_clusters", con, "got_cl")
    if err:
        return err
    err = _components(con, out_dir)
    if err:
        return err
    n_bad, n_got, n_ref = con.execute("""
        SELECT
          (SELECT count(*) FROM got_cl g JOIN comp_ref r USING (doc_id)
             WHERE g.cluster_id <> r.cluster_id),
          (SELECT count(*) FROM got_cl),
          (SELECT count(*) FROM comp_ref)""").fetchone()
    if n_got != n_ref:
        return f"row count {n_got} != expected {n_ref}"
    if n_bad:
        return f"{n_bad} rows with wrong cluster label (vs components of " \
               "the verified pair dump)"
    return None


def check_dedup_keep_docs(con, out_dir):
    err = _dump(out_dir, "dedup_keep_docs", con, "got_kd")
    if err:
        return err
    err = _components(con, out_dir)
    if err:
        return err
    missing, extra = con.execute("""
        WITH keep AS (SELECT doc_id FROM comp_ref WHERE doc_id = cluster_id)
        SELECT
          (SELECT count(*) FROM keep
             WHERE doc_id NOT IN (SELECT doc_id FROM got_kd)),
          (SELECT count(*) FROM got_kd
             WHERE doc_id NOT IN (SELECT doc_id FROM keep))""").fetchone()
    if missing or extra:
        return f"keep set: {missing} representatives missing, " \
               f"{extra} non-representatives kept"
    return None


def check_dedup_keep_best(con, out_dir):
    """Exact keep-best check from two independently verified dumps: the
    minhash pair list (components) and doc_quality (the scores, whose own
    oracle is linear and runs exactly at scale)."""
    err = _dump(out_dir, "dedup_keep_best", con, "got_kb")
    if err:
        return err
    err = _dump(out_dir, "doc_quality", con, "got_dq")
    if err:
        return err
    err = _components(con, out_dir)
    if err:
        return err
    missing, extra = con.execute("""
        WITH best AS (
          SELECT doc_id FROM (
            SELECT r.doc_id, row_number() OVER (PARTITION BY r.cluster_id
              ORDER BY q.quality DESC, r.doc_id ASC) AS rn
            FROM comp_ref r JOIN got_dq q USING (doc_id)) WHERE rn = 1)
        SELECT
          (SELECT count(*) FROM best
             WHERE doc_id NOT IN (SELECT doc_id FROM got_kb)),
          (SELECT count(*) FROM got_kb
             WHERE doc_id NOT IN (SELECT doc_id FROM best))""").fetchone()
    if missing or extra:
        return f"keep-best set: {missing} best-copies missing, " \
               f"{extra} non-best kept"
    return None


# --------------------------------------------------------- pipeline_e2e

_PIPE_STOP = "'the', 'a', 'is', 'of', 'to', 'and', 'in', 'that', 'it', 'on'"
_PIPE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)*\.[A-Za-z]{2,}"
_PIPE_PHONE = r"\+[0-9]{1,3}([ -]?[0-9]{2,4}){2,4}\b"
_PIPE_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
_SHUFFLE_SALT = 5000011


def _pipe_lanes(seed, from_):
    """graft hashUnit lanes over an upstream CTE (mirrors the sf0.01
    oracle's hashLanesFrom)."""
    return f"""SELECT doc_id,
        (doc_id + {seed}) % 4294967296 AS a0,
        xor(a0, a0 >> 16) * 73244475 % 4294967296 AS a1,
        xor(a1, a1 >> 16) * 73244475 % 4294967296 AS a2,
        xor(a2, a2 >> 16) AS h1,
        (doc_id + {seed + 2654435761}) % 4294967296 AS b0,
        xor(b0, b0 >> 16) * 73244475 % 4294967296 AS b1,
        xor(b1, b1 >> 16) * 73244475 % 4294967296 AS b2,
        xor(b2, b2 >> 16) AS h2,
        ((h1 % 2147483648) * 4294967296 + h2) / 9.223372036854776e18 AS u
      FROM {from_}"""


def check_pipeline_e2e(con, out_dir):
    """Exact replay of the composed pipeline, linear-shaped: the only
    quadratic stage (near-dup pair mining) is sourced from the VERIFIED
    dedup_minhash_lsh dump restricted to the hard-filtered survivor set
    (LSH candidacy is pair-local, so pairs(hf) = dump ∩ hf x hf); every
    other stage — filter, components, span strip, PII scrub, quality
    sample, packing, shuffle — is the same linear SQL the sf0.01 oracle
    runs. Stages are MATERIALIZED as temp tables (not one CTE chain)
    because the final recursive greedy-fill CTE re-evaluates any inlined
    upstream once per recursion step — with the regex/quality chain
    inlined that turned a seconds-long replay into ~15 minutes at 10x."""
    err = _dump(out_dir, "pipeline_e2e", con, "got_pipe")
    if err:
        return err
    err = _dump(out_dir, "dedup_minhash_lsh", con, "edges_pipe")
    if err:
        return err
    n = "len(string_split(text, ' '))"
    mtl = (f"(CAST(length(text) AS DOUBLE) - (CAST({n} AS DOUBLE) - 1.0))"
           f" / CAST({n} AS DOUBLE)")
    nq = "CAST(len(string_split(text, ' ')) AS DOUBLE)"
    uniq = "CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)"
    stopq = (f"CAST(len(list_filter(string_split(text, ' '), "
             f"t -> t IN ({_PIPE_STOP}))) AS DOUBLE)")
    mtlq = f"(CAST(length(text) AS DOUBLE) - ({nq} - 1.0)) / {nq}"
    quality = f"""(((CASE WHEN {nq} >= 20 AND {nq} <= 1000 THEN 1.0 ELSE 0.5 END) * 0.25)
        + ((CASE WHEN {mtlq} >= 3.0 AND {mtlq} <= 10.0 THEN 1.0 ELSE 0.5 END) * 0.25)
        + (({uniq} / {nq}) * 0.25) + (({stopq} / {nq}) * 0.25))"""
    con.execute(f"""
      CREATE OR REPLACE TEMP TABLE pipe_hf AS
      SELECT doc_id, text FROM documents
      WHERE ({n} >= 50 AND {n} <= 100000)
        AND ({mtl} >= 3.0 AND {mtl} <= 10.0)
        AND len(list_filter(string_split(text, ' '),
              t -> t IN ({_PIPE_STOP}))) >= 2
        AND position('{{' IN text) = 0
        AND position('lorem ipsum' IN lower(text)) = 0""")
    con.execute("""
      CREATE OR REPLACE TEMP TABLE pipe_uq AS
      WITH RECURSIVE
      e0 AS (SELECT id_a, id_b FROM edges_pipe
        WHERE id_a IN (SELECT doc_id FROM pipe_hf)
          AND id_b IN (SELECT doc_id FROM pipe_hf)),
      und AS (SELECT id_a AS src, id_b AS dst FROM e0
              UNION ALL SELECT id_b, id_a FROM e0),
      comp(id, lbl) AS (
        SELECT doc_id, doc_id FROM pipe_hf
        UNION
        SELECT u.dst, c.lbl FROM comp c JOIN und u ON u.src = c.id),
      reps AS (SELECT id FROM comp GROUP BY id HAVING id = min(lbl))
      SELECT h.doc_id, h.text FROM pipe_hf h JOIN reps ON h.doc_id = reps.id""")
    con.execute("""
      CREATE OR REPLACE TEMP TABLE pipe_strp AS
      WITH
      t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM pipe_uq),
      g AS (SELECT doc_id, unnest(range(1, len(toks) - 2)) AS i, toks FROM t),
      gr AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
               array_to_string(toks[i : i + 3], ' ') AS gram FROM g),
      dg AS (SELECT gram FROM gr GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
      hh AS (SELECT gr.doc_id, gr.pos FROM gr JOIN dg USING (gram)),
      cc AS (SELECT doc_id, pos,
               CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 4
                    THEN 1 ELSE 0 END AS cut FROM hh),
      ss AS (SELECT doc_id, pos,
               sum(cut) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id FROM cc),
      sp AS (SELECT doc_id, min(pos) AS start_pos, max(pos) + 4 AS end_pos
             FROM ss GROUP BY doc_id, span_id),
      tk AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS ti, toks FROM t),
      tok AS (SELECT doc_id, ti, toks[ti] AS tok FROM tk),
      kp AS (SELECT k.doc_id, k.ti, k.tok FROM tok k
             WHERE NOT EXISTS (SELECT 1 FROM sp
               WHERE sp.doc_id = k.doc_id
                 AND k.ti - 1 >= sp.start_pos AND k.ti - 1 < sp.end_pos)),
      ag AS (SELECT doc_id, array_to_string(list(tok ORDER BY ti), ' ') AS txt
             FROM kp GROUP BY doc_id)
      SELECT t.doc_id, COALESCE(a.txt, '') AS txt
      FROM t LEFT JOIN ag a USING (doc_id)""")
    con.execute(f"""
      CREATE OR REPLACE TEMP TABLE pipe_smp AS
      WITH
      inj AS (SELECT doc_id,
          txt || ' contact u' || CAST(doc_id AS VARCHAR) ||
          '@mail.example.com ip 10.' || CAST(doc_id % 250 AS VARCHAR) ||
          '.0.1 call +1 555 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
          ' end' AS tt
        FROM pipe_strp),
      red AS (SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(tt,
            '{_PIPE_EMAIL}', '<EMAIL>', 'g'),
            '{_PIPE_PHONE}', '<PHONE>', 'g'),
            '{_PIPE_IP}', '<IP>', 'g') AS text
        FROM inj),
      qw AS (SELECT doc_id, text, {quality} AS q FROM red),
      hw AS ({_pipe_lanes(42, "qw")})
      SELECT qw.doc_id, qw.text, qw.q FROM qw JOIN hw USING (doc_id)
      WHERE hw.u < least(1.0, 0.9 * qw.q)""")
    con.execute("""
      CREATE OR REPLACE TEMP TABLE pipe_ranked AS
      WITH hashed AS (SELECT doc_id,
          CAST(len(regexp_extract_all(text,
            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS sz,
          (doc_id + 42) % 4294967296 AS c0,
          xor(c0, c0 >> 16) * 73244475 % 4294967296 AS c1,
          xor(c1, c1 >> 16) * 73244475 % 4294967296 AS c2,
          xor(c2, c2 >> 16) AS ch,
          ch % 8 AS pack_bucket,
          (doc_id + 2654435803) % 4294967296 AS a0,
          xor(a0, a0 >> 16) * 73244475 % 4294967296 AS a1,
          xor(a1, a1 >> 16) * 73244475 % 4294967296 AS a2,
          xor(a2, a2 >> 16) AS ah,
          (doc_id + 5308871564) % 4294967296 AS b0,
          xor(b0, b0 >> 16) * 73244475 % 4294967296 AS b1,
          xor(b1, b1 >> 16) * 73244475 % 4294967296 AS b2,
          xor(b2, b2 >> 16) AS bh,
          ((ah % 2147483648) * 4294967296 + bh) / 9.223372036854776e18 AS u
        FROM pipe_smp)
      SELECT doc_id, sz, pack_bucket,
        row_number() OVER (PARTITION BY pack_bucket ORDER BY u, doc_id) AS rn
      FROM hashed""")
    con.execute(f"""
      CREATE OR REPLACE TABLE ref_pipe AS
      WITH RECURSIVE
      packs AS (
        SELECT pack_bucket, rn, doc_id,
          CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS pack_offset,
          CAST(sz AS BIGINT) AS fill
        FROM pipe_ranked WHERE rn = 1
        UNION ALL
        SELECT r.pack_bucket, r.rn, r.doc_id,
          CASE WHEN p.fill + r.sz > 256 THEN p.pack_id + 1 ELSE p.pack_id END,
          CASE WHEN p.fill + r.sz > 256 THEN CAST(0 AS BIGINT) ELSE p.fill END,
          CASE WHEN p.fill + r.sz > 256 THEN CAST(r.sz AS BIGINT)
               ELSE p.fill + r.sz END
        FROM pipe_ranked r JOIN packs p
          ON r.pack_bucket = p.pack_bucket AND r.rn = p.rn + 1),
      shl AS ({_pipe_lanes(42 + _SHUFFLE_SALT, "pipe_smp")}),
      pos AS (SELECT doc_id,
          row_number() OVER (ORDER BY u, doc_id) - 1 AS shuffle_pos
        FROM shl)
      SELECT s.doc_id, md5(s.text) AS final_md5,
        p.pack_bucket, p.pack_id, p.pack_offset, pos.shuffle_pos
      FROM pipe_smp s JOIN packs p USING (doc_id) JOIN pos USING (doc_id)""")
    n_bad, n_got, n_ref = con.execute("""
        SELECT
          (SELECT count(*) FROM got_pipe g JOIN ref_pipe r USING (doc_id)
             WHERE g.final_md5 <> r.final_md5
                OR g.pack_bucket <> r.pack_bucket
                OR g.pack_id <> r.pack_id
                OR g.pack_offset <> r.pack_offset
                OR g.shuffle_pos <> r.shuffle_pos),
          (SELECT count(*) FROM got_pipe),
          (SELECT count(*) FROM ref_pipe)""").fetchone()
    if n_got != n_ref:
        return f"row count {n_got} != expected {n_ref}"
    if n_bad:
        return f"{n_bad} rows mismatch the conditional pipeline replay"
    return None


# ------------------------------------------------------------------ EMA

_K = math.log(1.0 - 0.05)
_DAY = 86400000000000.0


def _events(sf_dir):
    df = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    # pandas surfaces the ns-precision parquet timestamps at us precision;
    # the engine truncates ns -> us too (time div 1000 * 1000), so the
    # int64 us value * 1000 IS the engine's time column
    t = df["ts"].astype("int64") * 1000
    return pd.DataFrame({
        "time": t, "event_id": df["event_id"],
        "event_type": df["event_type"], "user_id": df["user_id"],
        "value": df["value"].astype("float64")})


def _ewma_rows(ev, key_col):
    """y(t) = sum_{r.t <= t} x_r * exp(k*(t - t_r)/day), per key — the
    recurrence form (telescoping product), tie-correct: rows sharing a
    timestamp all receive the tied group's full sum."""
    out = np.empty(len(ev))
    ev = ev.reset_index(drop=True)
    for _, g in ev.groupby(key_col, dropna=False, sort=False):
        idx = g.index.to_numpy()
        order = np.lexsort((g["event_id"].to_numpy(), g["time"].to_numpy()))
        t = g["time"].to_numpy()[order]
        x = g["value"].to_numpy()[order]
        y = np.empty(len(t))
        s = 0.0
        i = 0
        prev_t = None
        while i < len(t):
            j = i
            while j < len(t) and t[j] == t[i]:
                j += 1
            if prev_t is not None:
                s *= math.exp(_K * (t[i] - prev_t) / _DAY)
            s += x[i:j].sum()
            y[i:j] = s
            prev_t = t[i]
            i = j
        out[idx[order]] = y
    return pd.Series(out, index=ev.index)


def _es_rows_current_core(ev, key_col, priming=1.0):
    """Per-row ES (current interpolation, core convention) with priming:
    same closed form as the sf0.01 oracle, evaluated as the linear
    recurrence ps_i = ps_{i-1}*d_i + (1-d_i)*x_i (and likewise the
    normalizer), priming decayed from the key's first timestamp."""
    out = np.empty(len(ev))
    ev = ev.reset_index(drop=True)
    pd_term = 1.0 - math.exp(_K * priming)
    for _, g in ev.groupby(key_col, dropna=False, sort=False):
        idx = g.index.to_numpy()
        order = np.lexsort((g["event_id"].to_numpy(), g["time"].to_numpy()))
        t = g["time"].to_numpy()[order]
        x = g["value"].to_numpy()[order]
        y = np.empty(len(t))
        tmin, x0 = t[0], x[0]
        ps = 0.0
        asum = 0.0
        prev_t = None
        i = 0
        while i < len(t):
            j = i
            while j < len(t) and t[j] == t[i]:
                j += 1
            if prev_t is not None:
                d = math.exp(_K * (t[i] - prev_t) / _DAY)
                ps *= d
                asum *= d
                ps += (1.0 - d) * x[i:j].sum()
                asum += (1.0 - d) * (j - i)
            decay0 = math.exp(_K * (t[i] - tmin) / _DAY)
            num = pd_term * x0 * decay0 + ps
            den = pd_term * decay0 + asum
            y[i:j] = num / den
            prev_t = t[i]
            i = j
        out[idx[order]] = y
    return pd.Series(out, index=ev.index)


def _check_ema(sf_dir, out_dir, name, key_col, compute, val_col):
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        return f"{name}: no dump parquet found"
    got = pd.concat([pd.read_parquet(f) for f in files])
    ev = _events(sf_dir)
    if key_col == "skew_key":
        ev["skew_key"] = np.where(ev["user_id"] % 2 == 0, 0,
                                  ev["user_id"] % 50 + 1).astype("int64")
    ref = ev.copy()
    ref["__ref"] = compute(ev, key_col)
    m = got.merge(ref[["event_id", "__ref"]], on="event_id", how="left")
    if m["__ref"].isna().any():
        return f"{int(m['__ref'].isna().sum())} dump rows missing in source"
    if len(m) != len(ev):
        return f"row count {len(m)} != {len(ev)}"
    diff = (m[val_col] - m["__ref"].round(4)).abs()
    # ~(x <= tol) so NaN in the dump (or the recompute) counts as BAD —
    # `diff > tol` is False for NaN and would wave a corrupted dump through
    bad = int((~(diff <= 2e-4)).sum())
    if bad:
        w = m.loc[diff.idxmax()]
        return (f"{bad} rows beyond 2e-4 of the sequential recurrence "
                f"(worst: event_id {w['event_id']} got {w[val_col]} "
                f"ref {round(w['__ref'], 4)})")
    return None


def check_ema_rows_es_current_core(con, out_dir, sf_dir):
    return _check_ema(sf_dir, out_dir, "ema_rows_es_current_core",
                      "event_type", _es_rows_current_core, "value_ema")


def check_ema_rows_ewma_legacy(con, out_dir, sf_dir):
    return _check_ema(sf_dir, out_dir, "ema_rows_ewma_legacy",
                      "event_type", _ewma_rows, "value_ewma")


def check_skew_ema_rows_ewma(con, out_dir, sf_dir):
    return _check_ema(sf_dir, out_dir, "skew_ema_rows_ewma",
                      "skew_key", _ewma_rows, "value_ewma")


def run(name, con, out_dir, sf_dir):
    """Dispatch one scale-invariant check; returns None on pass, else an
    error description."""
    fns = {
        "dedup_minhash_lsh": lambda: check_dedup_minhash_lsh(con, out_dir),
        "dedup_lsh_edit": lambda: check_dedup_lsh_edit(con, out_dir),
        "near_dup_jaccard": lambda: check_near_dup_jaccard(con, out_dir),
        "dedup_against_minhash":
            lambda: check_dedup_against_minhash(con, out_dir),
        "dedup_against_index":
            lambda: check_dedup_against_minhash(
                con, out_dir, name="dedup_against_index"),
        "dedup_clusters": lambda: check_dedup_clusters(con, out_dir),
        "dedup_keep_docs": lambda: check_dedup_keep_docs(con, out_dir),
        "dedup_keep_best": lambda: check_dedup_keep_best(con, out_dir),
        "pipeline_e2e": lambda: check_pipeline_e2e(con, out_dir),
        "ema_rows_es_current_core":
            lambda: check_ema_rows_es_current_core(con, out_dir, sf_dir),
        "ema_rows_ewma_legacy":
            lambda: check_ema_rows_ewma_legacy(con, out_dir, sf_dir),
        "skew_ema_rows_ewma":
            lambda: check_skew_ema_rows_ewma(con, out_dir, sf_dir),
    }
    if name in fns:
        return fns[name]()
    return scale_oracles_emb.run(name, out_dir, sf_dir)
