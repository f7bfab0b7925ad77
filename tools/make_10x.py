#!/usr/bin/env python3
"""Rebuild the 10x scale-evidence corpora used by graft.BenchScale.

Two corpora derive from /root/testdata/sf0.1 (driver-generated, never
modified):

  docs10x  (default /tmp/sf01x10):  documents duplicated 10x under
      shifted doc_id (doc_id + i*(max+1), i=0..9) -- 10x corpus over the
      same vocabulary, so shingle/minhash/jaccard work scales
      super-linearly exactly as a grown real corpus would. All other
      tables are byte-identical copies.

  temporal10x (default /tmp/sf01x10t): events and orders duplicated 10x
      under shifted ids (row ids + i*10_000_000) with ALIGNED user/cust
      key shifts (user_id and o_custkey both + i*100_000) -- 10
      independent populations over the same time range, so range/as-of
      joins do 10x the true pair work with no cross-population leakage.
      All other tables are byte-identical copies.

The BenchScale anchors (BASELINE.md 10x tables, measured r12) were taken
on corpora built by exactly this construction; the build is
deterministic (pure column arithmetic, stable input), so a rebuilt
corpus reproduces the anchored workload.

Usage: python3 tools/make_10x.py [docsDir] [temporalDir] [factor]
`factor` defaults to 10 (the anchored construction, bit-identical);
pass e.g. 100 to build the two-orders-of-magnitude linearity corpora
(/tmp/sf01x100 + /tmp/sf01x100t in the r13 BASELINE sweep).
Driver-side tooling only (duckdb is not a library dependency of the
engine itself).
"""
import shutil
import sys

import duckdb

SF_DIR = "/root/testdata/sf0.1"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
ID_SHIFT = 10_000_000   # event_id / o_orderkey per-copy shift
KEY_SHIFT = 100_000     # user_id / o_custkey per-copy shift (aligned)


def nfold(con, src, dst, select_shifted, factor):
    con.execute(f"""
      COPY (
        SELECT s.* FROM generate_series(0, {factor - 1}) AS t(i),
          LATERAL ({select_shifted.format(src=src)}) AS s
        ORDER BY 1
      ) TO '{dst}' (FORMAT PARQUET)
    """)


def build_docs10x(out, factor=10, indep=False):
    """Duplication corpus (default): copies share the vocabulary, so every
    shingle's df scales by `factor` and pair-family work grows ~factor² —
    the super-linear robustness test. indep=True suffixes EVERY TOKEN of
    each copy's text with the copy index — a PREFIX tag would only shift
    the first shingle window, every interior shingle would still be
    shared across copies and pair work would stay quadratic (measured as
    a disk-filling shuffle before this fix). With the whole vocabulary
    shifted per copy the corpus is `factor` independent populations and
    pair-family work grows ~linearly — the 100× LINEARITY corpus (at
    factor=100 the duplication construction would be a 10,000× work
    test, not a scale-up test).
    """
    con = duckdb.connect()
    mx = con.execute(
        f"SELECT max(doc_id) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    # regexp_replace, not a list_transform lambda: DuckDB's binder cannot
    # correlate the LATERAL's t.i inside a lambda body
    text = (r"regexp_replace(d.text, '(\S+)', '\1_' || t.i, 'g')"
            if indep else "d.text")
    # n_chars recomputed from the REWRITTEN text under indep (r16,
    # advisor): the token suffixes grow every line, so a verbatim copy
    # would silently disagree with length(text) on the independent corpus
    # and skew any n_chars-family bucketing/sums measured there
    n_chars = f"length({text})" if indep else "d.n_chars"
    nfold(con, f"{SF_DIR}/documents.parquet", f"{out}/documents.parquet",
          "SELECT d.doc_id + t.i*({mx}+1) AS doc_id, {text} AS text, d.lang,"
          " d.source, {n_chars} AS n_chars FROM read_parquet('{src}') d"
          .replace("{mx}", str(mx)).replace("{text}", text)
          .replace("{n_chars}", n_chars), factor)
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{out}/{t}.parquet")


def build_temporal10x(out, factor=10):
    con = duckdb.connect()
    nfold(con, f"{SF_DIR}/events.parquet", f"{out}/events.parquet",
          f"SELECT e.event_id + t.i*{ID_SHIFT} AS event_id, e.ts,"
          f" e.user_id + t.i*{KEY_SHIFT} AS user_id, e.event_type,"
          " e.value, e.props FROM read_parquet('{src}') e", factor)
    nfold(con, f"{SF_DIR}/orders.parquet", f"{out}/orders.parquet",
          f"SELECT o.o_orderkey + t.i*{ID_SHIFT} AS o_orderkey,"
          f" o.o_custkey + t.i*{KEY_SHIFT} AS o_custkey,"
          " o.* EXCLUDE (o_orderkey, o_custkey)"
          " FROM read_parquet('{src}') o", factor)
    # r14: lineitem rides along 10x (shifted order keys, all value columns
    # verbatim) for the quantile-family scale rows (q177). No previously
    # anchored temporal row reads lineitem, so this extends the corpus
    # without de-anchoring events/orders.
    nfold(con, f"{SF_DIR}/lineitem.parquet", f"{out}/lineitem.parquet",
          f"SELECT l.l_orderkey + t.i*{ID_SHIFT} AS l_orderkey,"
          " l.* EXCLUDE (l_orderkey)"
          " FROM read_parquet('{src}') l", factor)
    for t in TABLES:
        if t not in ("events", "orders", "lineitem"):
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{out}/{t}.parquet")


if __name__ == "__main__":
    import os
    docs = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf01x10"
    temp = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf01x10t"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    assert factor * KEY_SHIFT <= ID_SHIFT, "copies must not cross id shifts"
    # r14 (advisor): the line above only relates the two shift CONSTANTS;
    # nothing stopped the source data itself from outgrowing a per-copy
    # shift, which would silently overlap copies and de-anchor the rebuilt
    # corpora. Assert every shifted column's actual max fits its shift.
    _con = duckdb.connect()
    for _col, _tbl, _shift in [
        ("event_id", "events", ID_SHIFT), ("user_id", "events", KEY_SHIFT),
        ("o_orderkey", "orders", ID_SHIFT), ("o_custkey", "orders", KEY_SHIFT),
    ]:
        _mx = _con.execute(
            f"SELECT max({_col}) FROM read_parquet('{SF_DIR}/{_tbl}.parquet')"
        ).fetchone()[0]
        assert _mx < _shift, (
            f"max({_tbl}.{_col}) = {_mx} >= per-copy shift {_shift}: "
            "copies would overlap; raise the shift constants")
    indep = "--indep" in sys.argv
    os.makedirs(docs, exist_ok=True)
    os.makedirs(temp, exist_ok=True)
    build_docs10x(docs, factor, indep=indep)
    build_temporal10x(temp, factor)
    mode = "independent-population" if indep else "duplication"
    print(f"built {docs} (documents x{factor}, {mode}) and {temp} (events+orders x{factor})")
