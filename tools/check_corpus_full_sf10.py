#!/usr/bin/env python3
"""sf10 oracle check for q_corpus_clean_full (the r11 verdict's owed
drill): the stock oracle SQL is infeasible at sf10 — NOT because the
engine's output is big, but because the EXACT pair enumeration the SQL
oracle uses is quadratic in shingle document frequency, and the planted
pipeline text (TextOps.withPlantedPipeline) appends the IDENTICAL
Gopher stopword line to half the corpus at query time. Measured on
/tmp/graft_sf10: the shingle self-join is 2.20e11 rows, 99.92 % of it
from shingles with df > 1000 (max df 250,000) — DuckDB spilled past the
host's 78 GB of scratch and died. (The raw-documents dedup oracles stay
feasible because ScaleUp decorrelates replica text; r10 ran them
hash-green at sf10.) The engine side runs the same corpus in ~14 s:
LSH bucketing + the bucket cap is precisely the design that avoids the
df^2 blowup this drill demonstrates.

So this check replaces ONLY the oracle's `jp` CTE with a two-phase
EXACT-equivalent (everything else is the stock SQL, and the engine
parquet being checked is untouched):

  phase 1 — candidate pairs from RARE shingles only (df <= CAP over the
    canon corpus): join rows collapse from 2.2e11 to ~1e8;
  phase 2 — exact common count c = rare_common + |hot_a ∩ hot_b| via
    per-doc hot-shingle lists (few distinct hot shingles), then the
    IDENTICAL jaccard division and threshold as the stock oracle.

Completeness proof (asserted, not assumed): rare/hot partition every
doc's shingle set, so phase 1 misses a pair (a, b) only if NO common
shingle is rare. j >= 0.8 forces c >= 0.8*max(na, nb) >= 0.8*na, and a
doc's non-common shingles number na - c <= 0.2*na, so if a's rare
shingles exceed 0.2*na at least one rare shingle is common. The script
computes min(rare/n) over canon docs and ABORTS unless it is > 0.2
(strictly greater: the bound needs r_a > 0.2*na, and ties would make
the argument vacuous).

Usage: python3 tools/check_corpus_full_sf10.py <sfDir> <verifyOutDir> [CAP]
(expects <verifyOutDir>/q_corpus_clean_full/*.parquet from graft.Verify
and the stock oracle under <verifyOutDir>/oracle_sql.json, whose
pp..canon prefix is reused verbatim). CAP (default 1000) is the rare/hot
df split — a plan parameter only: the completeness assertion re-derives
its validity at whatever value is passed, and the emitted pair set is
CAP-independent by the phase-2 exact count.
"""
import sys, glob, json, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def main(sf_dir, out_dir, cap=1000):
    CAP = cap
    con = duckdb.connect()
    con.execute("SET memory_limit='60GB'")
    con.execute("SET temp_directory='/tmp/duck_tmp'")
    doc = os.path.join(sf_dir, "documents.parquet")
    src = os.path.join(doc, "*.parquet") if os.path.isdir(doc) else doc
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{src}')")

    stock = json.load(open(os.path.join(out_dir, "oracle_sql.json")))["q_corpus_clean_full"]
    # reuse the stock oracle's pipeline prefix verbatim: everything up to
    # (and including) the canon CTE, i.e. cut at the jsh definition
    cut = stock.index("jsh AS (")
    prefix = stock[:cut].rstrip().rstrip(",")
    con.execute(f"CREATE TEMP TABLE canon AS WITH {prefix.split('WITH',1)[1]} SELECT * FROM canon")
    n_canon = con.execute("SELECT count(*) FROM canon").fetchone()[0]
    print(f"[drill] canon docs: {n_canon}")

    con.execute("""
      CREATE TEMP TABLE jsh AS
      SELECT doc_id, list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
                                    FOR i IN range(1, len(s)-1)]) AS gs
      FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS s
            FROM canon)""")
    con.execute("CREATE TEMP TABLE jinv AS SELECT doc_id, unnest(gs) AS shingle FROM jsh")
    con.execute(f"""
      CREATE TEMP TABLE hot AS
      SELECT shingle FROM (SELECT shingle, count(*) AS d FROM jinv GROUP BY 1)
      WHERE d > {CAP}""")
    n_hot = con.execute("SELECT count(*) FROM hot").fetchone()[0]
    print(f"[drill] hot shingles (df > {CAP}): {n_hot}")

    # per-doc full size and hot list via a JOIN on the registered hot
    # table (r12 inlined the hot set as a list literal because DuckDB
    # lambdas can't reference subqueries; the join form has no size
    # ceiling and keeps the SQL parameterizable — ADVICE r12)
    con.execute("""
      CREATE TEMP TABLE dochot AS
      SELECT doc_id, list_sort(list(shingle)) AS hot_gs
      FROM jinv JOIN hot USING (shingle) GROUP BY doc_id""")
    con.execute("""
      CREATE TEMP TABLE docsets AS
      SELECT j.doc_id, len(j.gs) AS n, coalesce(d.hot_gs, []) AS hot_gs
      FROM jsh j LEFT JOIN dochot d USING (doc_id)""")
    min_rare = con.execute("""
      SELECT min(CAST(n - len(hot_gs) AS DOUBLE) / CAST(n AS DOUBLE))
      FROM docsets WHERE n > 0""").fetchone()[0]
    print(f"[drill] min rare-shingle fraction over canon docs: {min_rare:.4f}")
    assert min_rare > 0.2, (
        f"completeness precondition violated (min rare fraction {min_rare} <= 0.2): "
        f"phase-1 candidate generation is not provably complete at CAP={CAP}; "
        "lower CAP only widens the hot set — raise it instead and re-derive")

    # phase 1: rare-shingle candidate join (the feasible ~1e8-row join)
    con.execute("""
      CREATE TEMP TABLE rarepairs AS
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS rare_c
      FROM (SELECT * FROM jinv ANTI JOIN hot USING (shingle)) a
      JOIN (SELECT * FROM jinv ANTI JOIN hot USING (shingle)) b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2""")
    n_cand = con.execute("SELECT count(*) FROM rarepairs").fetchone()[0]
    print(f"[drill] phase-1 candidate pairs: {n_cand}")

    # phase 2: exact c = rare_c + |hot_a ∩ hot_b|; IDENTICAL jaccard
    # division + threshold as the stock oracle
    drop = con.execute("""
      SELECT DISTINCT doc_id_b FROM (
        SELECT p.doc_id_a, p.doc_id_b,
               p.rare_c + len(list_intersect(da.hot_gs, db.hot_gs)) AS c,
               da.n AS na, db.n AS nb
        FROM rarepairs p
        JOIN docsets da ON p.doc_id_a = da.doc_id
        JOIN docsets db ON p.doc_id_b = db.doc_id)
      WHERE CAST(c AS DOUBLE)/CAST(na+nb-c AS DOUBLE) >= 0.8""").df()
    print(f"[drill] near-dup drop ids: {len(drop)}")

    exp = con.execute(
        "SELECT doc_id, quality_score FROM canon "
        "WHERE doc_id NOT IN (SELECT doc_id_b FROM drop)").df()
    files = glob.glob(os.path.join(out_dir, "q_corpus_clean_full", "*.parquet"))
    got = pd.concat([pq.read_table(f).to_pandas() for f in files])

    def canon_df(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    g, e = canon_df(got), canon_df(exp)
    if list(g.columns) != list(e.columns):
        print(f"FAIL: columns {list(g.columns)} vs {list(e.columns)}"); sys.exit(1)
    if len(g) != len(e):
        print(f"FAIL: rows {len(g)} vs {len(e)}"); sys.exit(1)
    try:
        pd.testing.assert_frame_equal(g, e, check_exact=True, check_dtype=False)
    except AssertionError as ex:
        print(f"FAIL: value mismatch: {ex}"); sys.exit(1)
    print(f"OK   q_corpus_clean_full at {sf_dir}  ({len(g)} rows, exact match)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 1000)
