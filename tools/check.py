#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: tools/check.py [sfdir] [outdir]
Reads each <outdir>/<name> parquet written by graft.Verify, runs the
matching oracle_sql.json entry in DuckDB with fixture tables registered
as views, and diffs (columns sorted by name, rows SORTED after
normalization — mirroring the driver's pandas sort_values — floats
rounded to 6dp). Array-typed compared columns are a hard FAIL: the
driver's pandas row-sort throws `unhashable type: numpy.ndarray` on
them (the r5 q_matrix_offsets gate failure), so any query emitting one
must be rewritten to scalar cells (array_join / explode) first.

TYPE-STRICT (round 9): both sides are materialized as pandas frames —
the same representation the driver hashes — and per-column dtype KINDS
must match. An uncast DuckDB sum(BIGINT) comes back HUGEINT, which
pandas renders float64 against the parquet's int64; the old str()
cell normalization erased that (123 vs 123.0 both hash fine as "123"
vs "123.000000"? no — they DIFFER, but only when a str() happened to
collide the gate passed what the driver failed). Kind mismatch is now
a loud FAIL before any value compare: the r8 x_salted_agg /
r_window_range HUGEINT bugs can no longer ship locally green.
"""
import json, math, sys
import duckdb
import numpy as np

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

class ArrayColumn(Exception):
    pass

def norm_cell(v):
    # np.float64 subclasses float; np.float32 does NOT — without the
    # np.floating arm a REAL-typed parquet column str()s as '0.1' vs
    # the oracle float64's '0.100000' and spurious-fails
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple, np.ndarray)):
        raise ArrayColumn("array-typed compared cell (driver pandas sort "
                          "cannot hash it); emit array_join'd strings or "
                          "explode to rows instead")
    return str(v)

def norm_seq(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(r[i]) for i in order) for r in rows]

def norm_rows(cols, rows):
    return sorted(norm_seq(cols, rows))

def dtype_kind(dt):
    """Collapse a pandas dtype to the equivalence class the driver's
    value hash distinguishes: ints of any width hash alike, but int vs
    float vs object vs bool vs datetime do NOT (123 != 123.0 after the
    float 6dp format)."""
    k = dt.kind  # i/u int, f float, O object, b bool, M datetime, m timedelta
    return {"u": "i"}.get(k, k)

def frame(rel):
    """Materialize a DuckDB relation the way the driver does (pandas),
    returning (cols, kinds, rows)."""
    df = rel.df()
    cols = list(df.columns)
    kinds = {c: dtype_kind(df[c].dtype) for c in cols}
    rows = list(df.itertuples(index=False, name=None))
    return cols, kinds, rows

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            gcols, gkinds, grows = frame(
                con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'"))
            ecols, ekinds, erows = frame(con.execute(sql))
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(ecols)}")
            n_fail += 1
            continue
        bad_types = {c: (gkinds[c], ekinds[c]) for c in gcols
                     if gkinds[c] != ekinds[c]}
        if bad_types:
            print(f"FAIL {name}: dtype kind mismatch (spark vs oracle) "
                  f"{bad_types} — uncast DuckDB HUGEINT/DECIMAL? see "
                  "CLAUDE.md cast rule")
            n_fail += 1
            continue
        try:
            g, e = norm_rows(gcols, grows), norm_rows(ecols, erows)
        except ArrayColumn as ac:
            print(f"FAIL {name}: {ac}")
            n_fail += 1
            continue
        if g == e:
            # the gate sorts rows, so a drift between the two engines'
            # declared ORDER BY is invisible to PASS/FAIL — surface it:
            # CLAUDE.md requires a total ORDER BY precisely so that the
            # orders AGREE, and silent divergence means a tiebreak or
            # NULLS placement differs and will bite the next query
            if norm_seq(gcols, grows) != norm_seq(ecols, erows):
                print(f"WARN {name}: row ORDER differs between engines "
                      "(masked by the gate's sort) — check ORDER BY "
                      "tiebreaks/NULLS placement")
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"  first diff row {i}: spark={a} oracle={b}")
                    break
            if len(g) != len(e) and min(len(g), len(e)) > 0:
                print(f"  spark[0]={g[0]} oracle[0]={e[0]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
