#!/usr/bin/env python3
"""Adversarial check for the embed_kmeans DuckDB twin's empty-cell branch.

At every shipped SF the smallest Lloyd cell holds 40+ vectors, so the
empty-cluster branch (a centroid that captured no points CARRIES ITS
PREVIOUS VALUE into the next round — the LEFT-JOIN/COALESCE arm of the
twin's cv CTEs) is NEVER exercised by the hash gate; a twin that dropped
or zeroed empty centroids instead would stay green forever. This tool
plants corpora that force the branch deterministically — two IDENTICAL
seed vectors make every assignment tie break to the lower cluster, so
the higher seed's cell is empty in every round — and compares the twin's
final summary with a reference implementation of the exact algebra
(lowest-vec_id init, (distance, cluster) struct-min ties, fixed-point
floor sums, empty cells carrying forward).

Usage: python3 tools/check_kmeans_adversarial.py <verify_out_dir>
"""
import json
import math
import sys

import duckdb

K, ITERS, DIM = 10, 5, 4


def corpus_twin_seeds():
    # vec 7 == vec 3 exactly: cluster 7's cell is empty every round
    vecs = []
    for i in range(10):
        base = [float(i), float(i % 3), float((i * 2) % 5), 0.5 * i]
        vecs.append((i, base))
    vecs[7] = (7, list(vecs[3][1]))
    # extra points near seeds 0..2 so centroids actually move per round
    for j in range(10, 22):
        a = j % 3
        vecs.append((j, [vecs[a][1][d] + 0.25 * ((j + d) % 3) for d in range(DIM)]))
    return vecs


def corpus_mass_ties():
    # every non-seed point EQUIDISTANT-by-duplication: many exact
    # duplicates of seed vectors — tie-breaks dominate the assignment
    vecs = [(i, [float(i), float(i), 0.0, 1.0]) for i in range(10)]
    for j in range(10, 30):
        vecs.append((j, list(vecs[j % 5][1])))
    return vecs


def corpus_control():
    # well-separated, no empties, no ties — the sanity control
    vecs = []
    for i in range(10):
        vecs.append((i, [10.0 * i, 5.0 * i, 0.25 * i, 1.0]))
    for j in range(10, 26):
        vecs.append((j, [10.0 * (j % 10) + 0.5, 5.0 * (j % 10), 0.25 * (j % 10), 1.25]))
    return vecs


CORPORA = [
    # exercises the empty-cell carry branch
    ("twin-seeds-empty-cell", corpus_twin_seeds(), True),
    # exercises heavy (distance, cluster) tie-breaking (duplicates keep
    # their seed's cell occupied, so no empties expected)
    ("mass-ties", corpus_mass_ties(), False),
    ("control", corpus_control(), False),
]


def reference(vecs):
    byid = sorted(vecs)
    cents = [list(v) for _, v in byid[:K]]
    assign = {}
    for _ in range(ITERS):
        counts = [0] * K
        sums = [[0] * DIM for _ in range(K)]
        assign = {}
        for vid, e in byid:
            c = min((sum((x - cx) ** 2 for x, cx in zip(e, cc)), i)
                    for i, cc in enumerate(cents))[1]
            assign[vid] = c
            counts[c] += 1
            for d, x in enumerate(e):
                sums[c][d] += math.floor(x * (1 << 20))
        cents = [[(sums[i][d] / (counts[i] * (1 << 20))) if counts[i] > 0
                  else cents[i][d] for d in range(DIM)] for i in range(K)]
    out = {}
    for vid, e in byid:
        c = assign[vid]
        q = sum(math.floor(x * (1 << 20)) for x in e)
        n, fv, qs = out.get(c, (0, vid, 0))
        out[c] = (n + 1, min(fv, vid), qs + q)
    return sorted((c, n, fv, qs) for c, (n, fv, qs) in out.items())


def empties_of(vecs):
    """Clusters empty in the FINAL assignment (absent from the summary)."""
    ref = reference(vecs)
    return set(range(K)) - {r[0] for r in ref}


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
    try:
        export = json.load(open(f"{out_dir}/oracle_sql.json"))
    except FileNotFoundError:
        sys.exit(f"check_kmeans_adversarial: no oracle_sql.json in {out_dir} "
                 "— re-run Verify first (tools/run.sh graft.Verify "
                 f"/root/testdata/sf0.01 {out_dir})")
    if "embed_kmeans" not in export:
        sys.exit(f"check_kmeans_adversarial: {out_dir}/oracle_sql.json has "
                 f"{len(export)} keys but no 'embed_kmeans' — the export is "
                 "stale. Re-run Verify first: tools/run.sh graft.Verify "
                 f"/root/testdata/sf0.01 {out_dir}")
    sql = export["embed_kmeans"]
    failures = 0
    for name, vecs, expect_empty in CORPORA:
        con = duckdb.connect()
        view = " UNION ALL ".join(
            f"SELECT {vid} AS vec_id, {e} AS embedding, 'x' AS label"
            for vid, e in vecs)
        con.sql(f"CREATE VIEW embeddings AS {view}")
        got = sorted(tuple(r) for r in con.sql(sql).fetchall())
        want = reference(vecs)
        empt = empties_of(vecs)
        ok = got == want
        if expect_empty and not empt:
            ok = False
            print(f"   {name}: plant failed to produce an empty cell — "
                  "the corpus no longer exercises the branch it exists for")
        if (not expect_empty) and empt:
            ok = False
            print(f"   {name}: control corpus unexpectedly emptied {empt}")
        print(f"{'✓' if ok else '✗'} {name}: {len(got)} clusters, "
              f"empty cells {sorted(empt) if empt else 'none'}")
        if got != want:
            failures += 1
            for a, b in zip(got, want):
                if a != b:
                    print(f"   oracle {a} != reference {b}")
            if len(got) != len(want):
                print(f"   cluster counts differ: {len(got)} vs {len(want)}")
        elif not ok:
            failures += 1
    print(f"== {len(CORPORA) - failures} pass, {failures} fail")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
