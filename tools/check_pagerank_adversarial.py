#!/usr/bin/env python3
"""Adversarial check for the graph_pagerank DuckDB twin's dangling-node path.

The planted citation graph (hub, parent, permutation families) leaves
every node with out-degree >= 1 at the shipped corpus sizes, so the
DANGLING-node behavior -- a node with no out-edges contributes no mass
(this simplified PageRank deliberately does not redistribute it) and
reports outdeg 0 through the final left join's coalesce -- is never
exercised by the hash gate. Edges are a pure function of doc_id and the
corpus size n, so the plant is a corpus SIZE: at n = 7, node 0's three
targets (0 mod 10, 0 div 2, (0*31+7) mod 7) are all 0 and the self-loop
drop leaves it with no out-edges at all. This tool runs the twin on that
corpus (plus a 2-node cycle and a control) and compares every row with a
reference replay of the exact integer algebra.

Usage: python3 tools/check_pagerank_adversarial.py <verify_out_dir>
"""
import json
import sys

import duckdb

ITERS, K = 3, 20

CORPORA = [
    ("dangling-node-n7", 7, True),
    ("two-node-cycle", 2, False),
    ("control-n20", 20, False),
]


def edges_of(n):
    es = set()
    for i in range(n):
        for t in (i % 10, i // 2, (i * 31 + 7) % n):
            if t != i:
                es.add((i, t))
    return es


def reference(n):
    es = edges_of(n)
    outdeg = {}
    for s, _ in es:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: 10**6 for v in range(n)}
    for _ in range(ITERS):
        sc = {}
        for s, d in es:
            sc[d] = sc.get(d, 0) + pr[s] // outdeg[s]
        pr = {v: 150000 + (850 * sc.get(v, 0)) // 1000 for v in range(n)}
    rows = sorted(((v, pr[v], outdeg.get(v, 0)) for v in range(n)),
                  key=lambda r: (-r[1], r[0]))[:K]
    return rows


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
    try:
        export = json.load(open(f"{out_dir}/oracle_sql.json"))
    except FileNotFoundError:
        sys.exit(f"check_pagerank_adversarial: no oracle_sql.json in "
                 f"{out_dir} — re-run Verify first (tools/run.sh "
                 f"graft.Verify /root/testdata/sf0.01 {out_dir})")
    if "graph_pagerank" not in export:
        sys.exit(f"check_pagerank_adversarial: {out_dir}/oracle_sql.json "
                 f"has {len(export)} keys but no 'graph_pagerank' — the "
                 "export is stale. Re-run Verify first: tools/run.sh "
                 f"graft.Verify /root/testdata/sf0.01 {out_dir}")
    sql = export["graph_pagerank"]
    failures = 0
    for name, n, expect_dangling in CORPORA:
        con = duckdb.connect()
        view = " UNION ALL ".join(
            f"SELECT {i} AS doc_id, 'doc {i}' AS text, 'en' AS lang, "
            f"'s' AS source, 6 AS n_chars" for i in range(n))
        con.sql(f"CREATE VIEW documents AS {view}")
        got = [tuple(r) for r in con.sql(sql).fetchall()]
        want = reference(n)
        dangling = [v for v in range(n)
                    if v not in {s for s, _ in edges_of(n)}]
        ok = got == want
        if expect_dangling and not dangling:
            ok = False
            print(f"   {name}: plant failed to produce a dangling node")
        if (not expect_dangling) and dangling:
            ok = False
            print(f"   {name}: control unexpectedly dangling: {dangling}")
        print(f"{'✓' if ok else '✗'} {name}: {len(got)} rows, "
              f"dangling {dangling if dangling else 'none'}")
        if got != want:
            failures += 1
            for a, b in zip(got, want):
                if a != b:
                    print(f"   oracle {a} != reference {b}")
        elif not ok:
            failures += 1
    print(f"== {len(CORPORA) - failures} pass, {failures} fail")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
