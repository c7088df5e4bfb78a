"""Two-scale (sf0.1) oracle coverage for the quadratic-oracle family.

The registered DuckDB oracles for the near-dup/pair family compute exact
set intersections with ``list_intersect`` over an all-pairs join — O(n²)
list work that is fine at the sf0.01 grade scale but a wall at sf0.1
(hours).  r7 verified these 10 queries on a 2×-grade-scale slice; r8
upgrades them to FULL sf0.1 exact verification by restructuring the
oracle's pair-generation step, not by sampling:

    |a ∩ b| == count of shared shingles  ==  a postings self-join
    (explode shingles, join on the shingle, group by the pair)

which costs sum-over-shingles(df²) instead of n²·|set| — measured 122 s
at sf0.1 for the char-5-gram shape vs hours for the registered form.
Everything downstream of the pair table (thresholds, cluster walk,
triangle census, evidence ranking) is the registered oracle's own SQL
verbatim.  Two equivalence arguments, one mechanical and one checked:

1. the length prunes in the registered joins (``a.ls * 2 >= b.ls`` etc.)
   are implied by the jaccard threshold (j <= min/max), so dropping them
   cannot change the thresholded result — except for a pair whose
   UNROUNDED jaccard sits within 5e-7 below the threshold while its
   length ratio sits within the same sliver below the prune bound, which
   requires near-total containment at an adversarial length ratio and
   cannot occur on these fixtures (shingle counts are O(100)-denominator
   rationals);
2. ``--check-equiv`` runs every restructured oracle AND its registered
   original side by side at sf0.01 and diffs the frames — run it after
   any oracle edit.

Verdicts per query: ``full`` (green at sf0.1), ``slice`` (green at the
2×-grade-scale slice; only used if a restructured oracle is missing or
times out), ``FAIL``.

Usage: python tools/two_scale_sweep.py [--timeout N] [--check-equiv] [query ...]
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import sys
import tempfile
import threading
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import TABLES, _normalize, compare  # noqa: E402

BIG = "/root/testdata/sf0.1"
SMALL = "/root/testdata/sf0.01"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tree_sha() -> str:
    """The tree state a sweep row was produced on: HEAD sha, suffixed
    ``-dirty`` when the source dirs have uncommitted changes.  Called per
    row (cheap) so a mid-sweep commit stamps rows on the tree that
    actually ran them; certify.py diffs a row's sha against the current
    tree to decide whether the row still certifies its query."""
    import subprocess

    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=REPO, timeout=30,
        ).stdout.strip()
        if not head:
            return "unknown"
        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--",
             "apache_arrow_spark", "__spark_entry__.py"],
            capture_output=True, text=True, cwd=REPO, timeout=30,
        ).stdout.strip()
        return head + ("-dirty" if dirty else "")
    except Exception:
        return "unknown"
SLICE_DOCS = 1000  # 2x sf0.01's 500 documents — the fallback fixture only
SLICE_VECS = 1000

# The quadratic-oracle family (everything else is swept by check_oracle).
FAMILY = [
    "q33_minhash_near_duplicates",
    "q34_simhash_near_duplicates",
    "q36_ann_lsh_topk",
    "q37_embedding_near_duplicates",
    "q78_curation_funnel",
    "q79_neardup_clusters",
    "q89_incremental_dedup",
    "q112_incremental_neardup",
    "q119_winnow_fingerprints",
    "q127_pagerank_neardup",
    "q130_semantic_dedup_pairs",
    "q135_triangle_census",
    "q139_sharded_bloom_dedup",
    "q140_ngram_jaccard_pairs",
    "q143_containment_pairs",
    "q160_dedup_keep_best",
    "q206_dup_weighted_sample",
    "q207_streaming_ann_index",
    "q221_image_near_duplicates",
    "q222_similarity_profile",
    "q243_match_evidence",
]

# ---------------------------------------------------------------------------
# Restructured full-scale oracles: one exact pair table per shingle shape
# (ia < ib, i = |a∩b| >= 1, la/lb = set sizes), then the registered
# downstream SQL verbatim.
# ---------------------------------------------------------------------------

# shingle CTE chains, verbatim from the registered oracles
_SHAPE_SHINGLES = {
    "char5": """
      d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM {docs}),
      sh AS (
        SELECT doc_id,
               CASE WHEN length(t) < 5 THEN CAST([] AS VARCHAR[])
                    ELSE list_distinct(list_transform(range(1, length(t) - 3),
                                                      i -> substr(t, i, 5))) END AS s
        FROM d)""",
    "char9": """
      d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM {docs}),
      sh AS (
        SELECT doc_id,
               CASE WHEN length(t) < 9 THEN CAST([] AS VARCHAR[])
                    ELSE list_distinct(list_transform(range(1, length(t) - 7),
                                                      i -> substr(t, i, 9))) END AS s
        FROM d)""",
    "tri": """
      d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM {docs}),
      tk AS (
        SELECT doc_id,
               CASE WHEN length(t) = 0 THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(t, '\\s+') END AS toks
        FROM d),
      sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(toks) - 1),
                                            i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS s
        FROM tk WHERE len(toks) >= 3)""",
}

# the exact jaccard expression, verbatim from the registered oracles
_J = "round(CAST(i AS DOUBLE) / greatest(la + lb - i, 1), 6)"

# the registered oracles' cluster-walk chain, verbatim (pr comes from the
# pair table instead of the quadratic join)
_WALK = """
    edges AS (SELECT ia AS a, ib AS b FROM pr UNION SELECT ib, ia FROM pr),
    walk(n, lbl) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges) s0
        UNION
        SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.n
    ),
    comp AS (SELECT n, min(lbl) AS component FROM walk GROUP BY n)"""

# name -> (shape, SQL template over {pairs}; {docs} resolves to the
# documents view registered by oracle_with_timeout)
FULL_ORACLE: dict[str, tuple[str, str]] = {
    "q33_minhash_near_duplicates": ("char5", f"""
    SELECT ia AS id_a, ib AS id_b, {_J} AS jaccard
    FROM read_parquet('{{pairs}}') WHERE {_J} >= 0.5
    """),
    "q112_incremental_neardup": ("char5", f"""
    SELECT CASE WHEN ia % 5 = 0 THEN ia ELSE ib END AS new_id,
           CASE WHEN ia % 5 = 0 THEN ib ELSE ia END AS corpus_id,
           {_J} AS jaccard
    FROM read_parquet('{{pairs}}')
    WHERE (ia % 5 = 0) <> (ib % 5 = 0) AND {_J} >= 0.5
    """),
    "q135_triangle_census": ("char5", f"""
    WITH p AS (SELECT ia, ib FROM read_parquet('{{pairs}}') WHERE {_J} >= 0.5),
    und AS (SELECT ia AS a, ib AS b FROM p UNION ALL SELECT ib, ia FROM p),
    deg AS (SELECT a, count(*) AS deg FROM und GROUP BY a),
    w AS (SELECT CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS w FROM deg),
    t AS (SELECT count(*) AS t FROM p e1
          JOIN p e2 ON e1.ib = e2.ia
          JOIN p e3 ON e3.ia = e1.ia AND e3.ib = e2.ib)
    SELECT (SELECT count(*) FROM p) AS n_edges, w.w AS n_wedges,
           CAST(t.t AS BIGINT) AS n_triangles,
           round(3.0 * t.t / greatest(CAST(w.w AS DOUBLE), 1.0), 6) AS clustering_coefficient
    FROM w CROSS JOIN t
    """),
    "q79_neardup_clusters": ("char5", f"""
    WITH RECURSIVE
    pr AS (SELECT ia, ib FROM read_parquet('{{pairs}}') WHERE {_J} >= 0.5),
    {_WALK}
    SELECT doc.doc_id AS doc_id,
           coalesce(c.component, doc.doc_id) AS cluster_id,
           doc.doc_id = coalesce(c.component, doc.doc_id) AS is_canonical
    FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.n
    """),
    "q160_dedup_keep_best": ("char5", f"""
    WITH RECURSIVE
    pr AS (SELECT ia, ib FROM read_parquet('{{pairs}}') WHERE {_J} >= 0.5),
    {_WALK},
    asg AS (
      SELECT doc.doc_id, doc.lang, doc.n_chars,
             coalesce(c.component, doc.doc_id) AS cluster_id
      FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.n),
    kept AS (
      SELECT *, row_number() OVER (PARTITION BY cluster_id
                                   ORDER BY n_chars DESC, doc_id) AS rk
      FROM asg)
    SELECT lang,
           count(*) AS n_before,
           count(*) FILTER (WHERE rk = 1) AS n_after,
           CAST(sum(n_chars) AS BIGINT) AS chars_before,
           CAST(sum(CASE WHEN rk = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_after
    FROM kept GROUP BY lang
    """),
    "q206_dup_weighted_sample": ("char5", f"""
    WITH RECURSIVE
    pr AS (SELECT ia, ib FROM read_parquet('{{pairs}}') WHERE {_J} >= 0.5),
    {_WALK},
    asg AS (
      SELECT doc.doc_id AS doc_id,
             coalesce(c.component, doc.doc_id) AS cluster_id
      FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.n),
    sz AS (SELECT cluster_id, count(*) AS cluster_size
           FROM asg GROUP BY cluster_id),
    j AS (
      SELECT a.doc_id, a.cluster_id, s.cluster_size,
             (('0x' || substr(md5('q206' || CAST(a.doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000) * s.cluster_size < 1000000 AS keep
      FROM asg a JOIN sz s USING (cluster_id))
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN keep THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_checksum
    FROM j GROUP BY cluster_size
    """),
    "q243_match_evidence": ("char5", """
    WITH {shingles},
    pr AS (SELECT ia, ib FROM read_parquet('{pairs}') WHERE %s >= 0.5),
    cells AS (SELECT doc_id, unnest(s) AS g FROM sh),
    freq AS (SELECT g, count(*) AS df FROM cells GROUP BY g),
    -- restrict the posting join to docs that appear in a qualifying pair
    -- BEFORE matching shingles: ``shared`` only ever reads those docs, so
    -- this is a pure pushdown, and it stops DuckDB from picking the
    -- corpus-wide cells x cells join order (sum df^2 rows) that walled
    -- the first full-sf0.1 attempt; freq stays corpus-global
    ids AS (SELECT ia AS doc_id FROM pr UNION SELECT ib FROM pr),
    pcells AS (SELECT c.doc_id, c.g FROM cells c JOIN ids USING (doc_id)),
    shared AS (
      SELECT pr.ia, pr.ib, ca.g, f.df
      FROM pr
      JOIN pcells ca ON ca.doc_id = pr.ia
      JOIN pcells cb ON cb.doc_id = pr.ib AND cb.g = ca.g
      JOIN freq f ON f.g = ca.g),
    r AS (
      SELECT ia, ib, g, CAST(df AS BIGINT) AS df,
             row_number() OVER (PARTITION BY ia, ib ORDER BY df, g) AS rnk
      FROM shared)
    SELECT ia AS id_a, ib AS id_b, CAST(rnk AS INT) AS rnk, g AS shingle, df
    FROM r WHERE rnk <= 3
    """ % _J),
    "q140_ngram_jaccard_pairs": ("tri", f"""
    SELECT ia AS id_a, ib AS id_b, {_J} AS jaccard
    FROM read_parquet('{{pairs}}') WHERE {_J} >= 0.4
    """),
    "q222_similarity_profile": ("tri", f"""
    WITH p AS (SELECT {_J} AS j FROM read_parquet('{{pairs}}'))
    SELECT CAST(floor(j * 10) AS INT) AS decile, count(*) AS n_pairs
    FROM p WHERE j >= 0.3 GROUP BY 1
    """),
    # the funnel's near-dedup stage embeds the same quadratic pair join,
    # but over the FILTERED doc set (raw -> quality -> exact-dedup) with
    # pre-hashed shingles — so the pair generation inlines as a postings
    # self-join on the hashed shingle values instead of reusing the shared
    # pair parquet (shape None).  Everything before and after the
    # ``dropped`` CTE is the registered oracle verbatim; the 0.5 length
    # prune is implied by the 0.5 jaccard threshold as usual.
    "q78_curation_funnel": (None, r"""
    WITH raw AS (SELECT doc_id, text, lang FROM documents
                 WHERE (('0x' || substr(md5('bench' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000) >= 100000),
    bench AS (SELECT text FROM documents
              WHERE (('0x' || substr(md5('bench' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000) < 100000
                AND length(trim(text)) > 0),
    q AS (SELECT * FROM raw WHERE CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END >= 20),
    e AS (SELECT * FROM q WHERE doc_id IN
            (SELECT min(doc_id) FROM q GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))),
    sh AS (SELECT doc_id,
                  CASE WHEN length(t) < 5 THEN CAST([] AS UBIGINT[])
                       ELSE list_distinct(list_transform(range(1, length(t) - 3),
                                                         i -> hash(substr(t, i, 5)))) END AS s
           FROM (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM e)),
    sh2 AS MATERIALIZED (SELECT doc_id, len(s) AS ls FROM sh),
    cells AS (SELECT doc_id, unnest(s) AS g FROM sh),
    pp AS (SELECT ca.doc_id AS ia, cb.doc_id AS ib, count(*) AS i
           FROM cells ca JOIN cells cb ON ca.g = cb.g AND ca.doc_id < cb.doc_id
           GROUP BY 1, 2),
    pj AS (SELECT pp.ia, pp.ib, pp.i, a.ls AS la, b.ls AS lb
           FROM pp JOIN sh2 a ON a.doc_id = pp.ia JOIN sh2 b ON b.doc_id = pp.ib),
    dropped AS (
      SELECT DISTINCT ib
      FROM pj
      WHERE round(CAST(i AS DOUBLE) / greatest(la + lb - i, 1), 6) >= 0.5
    ),
    n AS (SELECT * FROM e WHERE doc_id NOT IN (SELECT ib FROM dropped)),
    tb AS (SELECT regexp_split_to_array(trim(text), '\s+') AS tk FROM bench),
    gb AS (SELECT DISTINCT array_to_string(tk[i:i+12], ' ') AS g
           FROM tb, unnest(generate_series(1, len(tk) - 12)) s(i)),
    tn AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
           FROM n WHERE length(trim(text)) > 0),
    gn AS (SELECT doc_id, array_to_string(tk[i:i+12], ' ') AS g
           FROM tn, unnest(generate_series(1, len(tk) - 12)) s(i)),
    contaminated AS (SELECT DISTINCT doc_id FROM gn WHERE g IN (SELECT g FROM gb)),
    de AS (SELECT * FROM n WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
    sam AS (SELECT * FROM de
            WHERE (('0x' || substr(md5('curate' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000) <
                  CASE lang WHEN 'en' THEN 700000 WHEN 'de' THEN 1000000
                            ELSE 500000 END),
    spl AS (SELECT doc_id,
                   CASE WHEN b < 100000 THEN 'test'
                        WHEN b < 900000 THEN 'train'
                        ELSE 'valid' END AS split
            FROM (SELECT doc_id, (('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000) AS b FROM sam))
    SELECT '0_raw' AS stage, count(*) AS n FROM raw
    UNION ALL SELECT '1_quality', count(*) FROM q
    UNION ALL SELECT '2_exact_dedup', count(*) FROM e
    UNION ALL SELECT '3_near_dedup', count(*) FROM n
    UNION ALL SELECT '4_decontaminated', count(*) FROM de
    UNION ALL SELECT '5_sampled', count(*) FROM sam
    UNION ALL SELECT '6_split_' || split, count(*) FROM spl GROUP BY split
    """),
    # containment keeps BOTH orientations with the smaller set first;
    # la = lb legitimately emits both rows (mirrors the registered
    # ``a.doc_id <> b.doc_id AND a.ls <= b.ls`` join)
    "q143_containment_pairs": ("char9", """
    SELECT ia AS id_a, ib AS id_b,
           round(CAST(i AS DOUBLE) / greatest(la, 1), 6) AS containment
    FROM read_parquet('{pairs}')
    WHERE la <= lb AND round(CAST(i AS DOUBLE) / greatest(la, 1), 6) >= 0.9
    UNION ALL
    SELECT ib, ia, round(CAST(i AS DOUBLE) / greatest(lb, 1), 6)
    FROM read_parquet('{pairs}')
    WHERE lb <= la AND round(CAST(i AS DOUBLE) / greatest(lb, 1), 6) >= 0.9
    """),
}


_RUN_TMP: str | None = None


def _run_tmp() -> str:
    """Per-run scratch dir (mkdtemp, cleaned at exit) — a fixed /tmp path
    raced concurrent sweeps and external /tmp reapers (ADVICE r7)."""
    global _RUN_TMP
    if _RUN_TMP is None:
        _RUN_TMP = tempfile.mkdtemp(prefix="aas_two_scale_")
        atexit.register(shutil.rmtree, _RUN_TMP, ignore_errors=True)
    return _RUN_TMP


_PAIR_CACHE: dict[tuple[str, str], str] = {}


def ensure_pair_table(sf_dir: str, shape: str) -> str:
    """Build (once per run per (sf_dir, shape)) the exact pair parquet:
    (ia < ib, i = |shingles(a) ∩ shingles(b)|, la, lb) for every pair
    with at least one shared shingle, via the postings self-join."""
    key = (sf_dir, shape)
    if key in _PAIR_CACHE:
        return _PAIR_CACHE[key]
    out = os.path.join(_run_tmp(), f"pairs_{shape}_{os.path.basename(sf_dir.rstrip('/'))}.parquet")
    docs = f"read_parquet('{sf_dir}/documents.parquet')"
    shingles = _SHAPE_SHINGLES[shape].format(docs=docs)
    sql = f"""
    COPY (
      WITH {shingles},
      sh2 AS (SELECT doc_id, len(s) AS ls FROM sh),
      cells AS (SELECT doc_id, unnest(s) AS g FROM sh),
      pp AS (SELECT ca.doc_id AS ia, cb.doc_id AS ib, count(*) AS i
             FROM cells ca JOIN cells cb ON ca.g = cb.g AND ca.doc_id < cb.doc_id
             GROUP BY 1, 2)
      SELECT pp.ia, pp.ib, pp.i, a.ls AS la, b.ls AS lb
      FROM pp JOIN sh2 a ON a.doc_id = pp.ia JOIN sh2 b ON b.doc_id = pp.ib
    ) TO '{out}' (FORMAT PARQUET)
    """
    t0 = time.time()
    con = duckdb.connect()
    try:
        con.execute(sql)
    finally:
        con.close()
    print(f"    [pair table {shape}@{os.path.basename(sf_dir)}: {time.time()-t0:.1f}s]",
          flush=True)
    _PAIR_CACHE[key] = out
    return out


def full_oracle_sql(name: str, sf_dir: str) -> str:
    shape, template = FULL_ORACLE[name]
    if shape is None:
        # self-contained rewrite (pair generation inlined on a filtered
        # doc subset — q78); no shared pair table involved
        return template
    pairs = ensure_pair_table(sf_dir, shape)
    docs = f"read_parquet('{sf_dir}/documents.parquet')"
    return template.format(
        pairs=pairs, shingles=_SHAPE_SHINGLES[shape].format(docs=docs)
    )


def build_slice_dir() -> str:
    """Deterministic slice fixture: documents/embeddings id-prefix cut,
    all other tables symlinked to the full sf0.1 files.  Lives under the
    per-run mkdtemp scratch (no fixed-path races)."""
    path = os.path.join(_run_tmp(), "sf01_slice")
    if os.path.isdir(path):
        return path
    os.makedirs(path)
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{BIG}/documents.parquet')"
        f" ORDER BY doc_id LIMIT {SLICE_DOCS})"
        f" TO '{path}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{BIG}/embeddings.parquet')"
        f" ORDER BY vec_id LIMIT {SLICE_VECS})"
        f" TO '{path}/embeddings.parquet' (FORMAT PARQUET)"
    )
    con.close()
    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        src = os.path.join(BIG, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(path, f"{t}.parquet"))
    return path


def oracle_with_timeout(sf_dir: str, sql: str, timeout_s: float):
    """Run the oracle on a fresh connection; interrupt from a timer.
    Returns (pdf, elapsed) or raises TimeoutError."""
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    timed_out = threading.Event()

    def _kill():
        timed_out.set()
        con.interrupt()

    timer = threading.Timer(timeout_s, _kill)
    timer.start()
    t0 = time.time()
    try:
        pdf = con.sql(sql).df()
    except Exception:
        if timed_out.is_set():
            raise TimeoutError(f"oracle exceeded {timeout_s}s")
        raise
    finally:
        timer.cancel()
        con.close()
    return pdf, time.time() - t0


def check_equiv(names: list[str], oracles: dict[str, str], timeout_s: float) -> int:
    """Run each restructured oracle AND its registered original at sf0.01
    and diff the frames — the mechanical proof that the postings-join
    rewrite is the same function.  Returns the number of mismatches."""
    bad = 0
    for name in names:
        if name not in FULL_ORACLE:
            continue
        t0 = time.time()
        reg, _ = oracle_with_timeout(SMALL, oracles[name], timeout_s)
        new, _ = oracle_with_timeout(SMALL, full_oracle_sql(name, SMALL), timeout_s)
        ok = (
            len(reg) == len(new)
            and sorted(reg.columns) == sorted(new.columns)
            and _normalize(reg).equals(_normalize(new))
        )
        bad += 0 if ok else 1
        print(f"  {'✓' if ok else '✗'} equiv {name}: registered == restructured at sf0.01"
              f"  [{time.time()-t0:.1f}s]", flush=True)
    return bad


def main() -> None:
    timeout_s = 600.0
    slice_only = False
    equiv = False
    args = sys.argv[1:]
    while args and args[0].startswith("--"):
        if args[0] == "--timeout":
            timeout_s = float(args[1])
            args = args[2:]
        elif args[0] == "--slice-only":
            # fallback mode: skip full-sf0.1 attempts entirely
            slice_only = True
            args = args[1:]
        elif args[0] == "--check-equiv":
            equiv = True
            args = args[1:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    names = args or FAMILY

    import __spark_entry__ as entrymod
    from apache_arrow_spark.session import get_spark

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()

    if equiv:
        sys.exit(1 if check_equiv(names, oracles, timeout_s) else 0)

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    slice_dir = None
    results: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        verdict, detail = "FAIL", ""
        try:
            if slice_only:
                raise TimeoutError("skipped: --slice-only")
            sdf = queries[name](spark, BIG)
            if name in FULL_ORACLE:
                osql = full_oracle_sql(name, BIG)
                opdf, osec = oracle_with_timeout(BIG, osql, timeout_s)
                label = f"postings-join exact oracle {osec:.1f}s"
            else:
                opdf, osec = oracle_with_timeout(BIG, oracles[name], timeout_s)
                label = f"oracle {osec:.1f}s"
            problems = compare(name, sdf, opdf)
            if problems:
                detail = "; ".join(problems)[:400]
            else:
                verdict, detail = "full", label
        except TimeoutError:
            # last-resort: exact verification on the slice fixture
            if slice_dir is None:
                slice_dir = build_slice_dir()
            try:
                sdf = queries[name](spark, slice_dir)
                opdf, osec = oracle_with_timeout(
                    slice_dir, oracles[name], timeout_s
                )
                problems = compare(name, sdf, opdf)
                if problems:
                    detail = "slice: " + "; ".join(problems)[:400]
                else:
                    verdict = "slice"
                    detail = f"sf0.1 oracle timed out; slice oracle {osec:.1f}s"
            except Exception as e:  # noqa: BLE001
                detail = f"slice: {type(e).__name__}: {str(e)[:300]}"
        except Exception as e:  # noqa: BLE001
            detail = f"{type(e).__name__}: {str(e)[:300]}"
        # self-certifying row (r8 verdict #5): stamp the PER-QUERY run
        # completion time and the tree SHA at run time — not one batch
        # stamp at ledger write — so certify can reject a row whose tree
        # predates a later change to that query.
        results[name] = {
            "verdict": verdict,
            "detail": detail,
            "at": time.time(),
            "sha": tree_sha(),
        }
        mark = {"full": "✓", "slice": "◐"}.get(verdict, "✗")
        print(f"  {mark} {name}: {verdict}  [{time.time()-t0:.1f}s] {detail}",
              flush=True)
    counts = {
        v: sum(1 for r in results.values() if r["verdict"] == v)
        for v in ("full", "slice", "FAIL")
    }
    print(json.dumps({"counts": counts, "results": results}))
    # persist per-query rows (merge-update) so tools/certify.py can check
    # grade freshness: a query changed after its last driver grade must be
    # in the window or carry a sweep row newer than the round boundary
    ledger = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "SCALE_SWEEP.json")
    merged: dict = {}
    if os.path.exists(ledger):
        try:
            with open(ledger) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
    merged.update(results)
    with open(ledger, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    sys.exit(1 if counts["FAIL"] else 0)


if __name__ == "__main__":
    main()
