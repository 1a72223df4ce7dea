#!/usr/bin/env python3
"""Adversarial check for the dd_ngram_jaccard / dd_containment PRUNING
boundaries on the SPARK side (and their brute-force DuckDB twins).

The Spark operators prune with three epsilon-guarded double comparisons
(Dedup.scala): the prefix lengths `n - ceil(n*t - 1e-9) + 1`, the ppjoin
length filter `na >= nb*t - 1e-9`, and the positional bound
`ub >= (na+nb)*(t/(1+t)) - 1e-9`. At the default thresholds the shipped
corpora never place a pair AT those boundaries, so an IEEE over-ceiling
regression (the round-10 bug class: a product like 77*(0.4/1.4) =
22.000000000000004 ceiling one too high and silently dropping a true
pair) would stay green on every SF. The twins are brute-force all-pairs
SQL — trivially boundary-free — which is exactly why a hash match cannot
certify the Spark pruning.

This tool plants a corpus whose pairs sit EXACTLY on each boundary:

  P1  J = 22/55 = 0.4 exactly, a 24-word verbatim quote of a 57-word doc.
      The single candidate token match yields positional bound ub = 22
      against requirement 77*(0.4/1.4) = 22.000000000000004 — without the
      epsilon the pair is pruned (verified by the built-in simulation).
      The quote's min common shingle also sits at the LAST probe-prefix
      slot of the long side (rank 33 of prefix 34) and the length filter
      holds with equality (22 >= 55*0.4), pinning both off-by-ones.
  P2  J = 12/30 = 0.4 exactly between two 21-shingle docs. The index
      prefix 21 - ceil(21*(2*0.4/1.4)) + 1 computes over 12.000000000000002
      — without the epsilon the prefix shrinks from 10 to 9 and excludes
      the only shared token, dropping the pair.
  P3  containment = 44/55 = 0.8 exactly, with the smaller side's min
      common shingle at the LAST prefix slot (rank 11 of prefix 12) — a
      one-shorter prefix (any ceiling or +1 regression) drops it.
  P4/P5  just-below-threshold controls (11/31 Jaccard, 43/55 containment)
      that must NOT appear.
  P6/P7  an exact-duplicate clique and sub-3-word docs (whole-text
      shingle), covering the identical-set expansion and short-doc paths.
  P8  a null-text doc (must pair with nothing on either engine).

It then runs the REAL Spark operators on that corpus (tools/run.sh
graft.Verify), runs the DuckDB twins from the verify export on the same
rows, and compares both against an independent brute-force reference —
plus a guarded-vs-unguarded simulation of the pruning pipeline proving
the plants engage the boundaries they exist for.

Usage: python3 tools/check_ppjoin_adversarial.py <verify_out_dir>
"""
import json
import math
import os
import subprocess
import sys
import tempfile

import duckdb

T_JAC, T_CONT, NGRAM = 0.4, 0.8, 3
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_docs():
    docs = []  # (doc_id, text or None)
    # P1: positional-bound + probe-prefix-last-slot + length-filter-equality
    a1 = [f"p1w{i}" for i in range(57)]
    docs.append((100, " ".join(a1)))
    docs.append((101, " ".join(a1[33:57])))
    # P2: index-prefix over-ceiling (21 * (2t/(1+t)) = 12.000000000000002)
    sh2 = [f"p2s{i}" for i in range(14)]
    docs.append((200, " ".join([f"p2a{i}" for i in range(9)] + sh2)))
    docs.append((201, " ".join([f"p2b{i}" for i in range(9)] + sh2)))
    # P3: containment exactly 0.8 with min common shingle at last prefix slot
    sh3 = [f"p3s{i}" for i in range(46)]
    docs.append((300, " ".join([f"p3a{i}" for i in range(11)] + sh3)))
    docs.append((301, " ".join([f"p3b{i}" for i in range(16)] + sh3)))
    # P4: Jaccard control just below threshold (11/31)
    sh4 = [f"p4s{i}" for i in range(13)]
    docs.append((400, " ".join([f"p4a{i}" for i in range(10)] + sh4)))
    docs.append((401, " ".join([f"p4b{i}" for i in range(10)] + sh4)))
    # P5: containment control just below threshold (43/55)
    sh5 = [f"p5s{i}" for i in range(45)]
    docs.append((500, " ".join([f"p5a{i}" for i in range(12)] + sh5)))
    docs.append((501, " ".join([f"p5b{i}" for i in range(17)] + sh5)))
    # P6: exact-duplicate clique (identical shingle sets -> score 1.0 pairs)
    dup = " ".join(f"p6w{i}" for i in range(10))
    docs.append((600, dup))
    docs.append((601, dup))
    # P7: sub-3-word docs — the whole text is the single shingle
    docs.append((700, "p7short pair"))
    docs.append((701, "p7short pair"))
    docs.append((702, "p7lone"))
    # P8: null text pairs with nothing
    docs.append((800, None))
    return docs


def shingle_set(text):
    if text is None:
        return None
    w = text.split(" ")
    if len(w) < NGRAM:
        return {" ".join(w)}
    return {" ".join(w[i:i + NGRAM]) for i in range(len(w) - NGRAM + 1)}


def brute(docs, score):
    """Ground truth: all-pairs over shingle sets; score in {'j','c'}."""
    sets = {d: shingle_set(t) for d, t in docs}
    out = {}
    ids = sorted(d for d in sets if sets[d] is not None)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            inter = len(sa & sb)
            if inter == 0:
                continue
            v = (inter / (len(sa) + len(sb) - inter) if score == "j"
                 else inter / min(len(sa), len(sb)))
            if v >= (T_JAC if score == "j" else T_CONT):
                out[(a, b)] = v
    return out


def _ranked(reps, df):
    import hashlib
    # any deterministic total order stands in for the 64-bit hash tie-break:
    # the planted boundary ranks depend only on the df split (see module doc)
    return {d: sorted(s, key=lambda sh: (df[sh], hashlib.md5(sh.encode()).hexdigest()))
            for d, s in reps.items()}


def _collapse(docs):
    sets = {d: shingle_set(t) for d, t in docs if t is not None}
    groups = {}
    for d in sorted(sets):
        groups.setdefault(frozenset(sets[d]), []).append(d)
    reps = {min(ds): set(k) for k, ds in groups.items()}
    df = {}
    for s in reps.values():
        for sh in s:
            df[sh] = df.get(sh, 0) + 1
    return groups, reps, df


def sim_jaccard(docs, guarded, probe_shrink=0):
    """Independent replay of the ppjoin pruning pipeline (Dedup.scala
    ngramRepPairs). guarded=False drops the 1e-9 epsilons; probe_shrink
    shortens the probe prefix (off-by-one probes)."""
    eps = 1e-9 if guarded else 0.0
    groups, reps, df = _collapse(docs)
    rk = _ranked(reps, df)
    n = {d: len(s) for d, s in reps.items()}
    t = T_JAC

    def cl(x):
        return math.ceil(x - eps)
    pref = {d: n[d] - cl(n[d] * t) + 1 - probe_shrink for d in reps}
    idx = {d: n[d] - cl(n[d] * (2 * t / (1 + t))) + 1 for d in reps}
    post = {}
    for d in reps:
        for p, sh in enumerate(rk[d][:pref[d]]):
            post.setdefault(sh, []).append((d, p))
    cand = {}
    for d in reps:
        for pa, sh in enumerate(rk[d][:idx[d]]):
            for (b, pb) in post.get(sh, []):
                if (n[d] < n[b] or (n[d] == n[b] and d < b)) \
                        and n[d] >= n[b] * t - eps:
                    ub = min(pa, pb) + 1 + min(n[d] - pa - 1, n[b] - pb - 1)
                    cand[(d, b)] = min(cand.get((d, b), 1 << 60), ub)
    kept = set()
    for (a, b), ub in cand.items():
        if ub >= (n[a] + n[b]) * (t / (1 + t)) - eps:
            inter = len(reps[a] & reps[b])
            if inter / (n[a] + n[b] - inter) >= t:
                kept.add((min(a, b), max(a, b)))
    return _expand(kept, groups)


def sim_containment(docs, guarded, probe_shrink=0):
    eps = 1e-9 if guarded else 0.0
    groups, reps, df = _collapse(docs)
    rk = _ranked(reps, df)
    n = {d: len(s) for d, s in reps.items()}
    t = T_CONT
    pref = {d: n[d] - math.ceil(n[d] * t - eps) + 1 - probe_shrink for d in reps}
    post = {}
    for d in reps:
        for sh in rk[d]:
            post.setdefault(sh, []).append(d)
    kept = set()
    for d in reps:
        for sh in rk[d][:pref[d]]:
            for b in post.get(sh, []):
                if n[d] < n[b] or (n[d] == n[b] and d < b):
                    inter = len(reps[d] & reps[b])
                    if inter / min(n[d], n[b]) >= t:
                        kept.add((d, b))
    return _expand(kept, groups)


def _expand(rep_pairs, groups):
    memb = {min(ds): ds for ds in groups.values()}
    out = set()
    for (a, b) in rep_pairs:
        for x in memb[a]:
            for y in memb[b]:
                out.add((min(x, y), max(x, y)))
    for ds in memb.values():
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                out.add((ds[i], ds[j]))
    return out


def write_corpus(docs, dirpath):
    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array(["plant"] * len(docs), pa.string()),
        "n_chars": pa.array([len(t) if t else 0 for _, t in docs], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(dirpath, "documents.parquet"))


def run_spark(corpus_dir, out_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [os.path.join(REPO, "tools", "run.sh"), "graft.Verify", corpus_dir,
         out_dir, "dd_ngram_jaccard,dd_containment"],
        capture_output=True, text=True, env=env, timeout=600)
    failed = [ln for ln in r.stderr.splitlines() if "failed:" in ln]
    if r.returncode != 0 or failed:
        sys.exit("check_ppjoin_adversarial: Spark run failed:\n"
                 + "\n".join(failed or [r.stderr[-2000:]]))


def compare(name, got_rows, want):
    """got_rows: [(a, b, score)]; want: {(a,b): score}. Exact values."""
    ok = True
    got = {(int(r[0]), int(r[1])): float(r[2]) for r in got_rows}
    if set(got) != set(want):
        ok = False
        print(f"   {name}: pair sets differ — missing {sorted(set(want) - set(got))}, "
              f"extra {sorted(set(got) - set(want))}")
    else:
        for k in want:
            if abs(got[k] - want[k]) > 1e-12:
                ok = False
                print(f"   {name}: score mismatch at {k}: {got[k]} != {want[k]}")
    return ok


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
    try:
        export = json.load(open(f"{out_dir}/oracle_sql.json"))
    except FileNotFoundError:
        sys.exit(f"check_ppjoin_adversarial: no oracle_sql.json in {out_dir} "
                 "— re-run Verify first (tools/run.sh graft.Verify "
                 f"/root/testdata/sf0.01 {out_dir})")
    for k in ("dd_ngram_jaccard", "dd_containment"):
        if k not in export:
            sys.exit(f"check_ppjoin_adversarial: oracle_sql.json has "
                     f"{len(export)} keys but no '{k}' — stale export; "
                     "re-run Verify first")
    docs = build_docs()
    want_j = brute(docs, "j")
    want_c = brute(docs, "c")
    failures = 0

    # 1. plant-engagement proofs: the boundaries must actually flip
    eng_ok = True
    g = sim_jaccard(docs, guarded=True)
    u = sim_jaccard(docs, guarded=False)
    if g != set(want_j):
        eng_ok = False
        print(f"   engagement: guarded simulation != brute force "
              f"({sorted(g ^ set(want_j))}) — the replay itself drifted")
    lost = set(want_j) - u
    for pair, why in (((100, 101), "positional-bound over-ceiling"),
                      ((200, 201), "index-prefix over-ceiling")):
        if pair in lost:
            print(f"✓ engagement: unguarded pruning drops {pair} ({why})")
        else:
            eng_ok = False
            print(f"✗ engagement: {pair} SURVIVES unguarded pruning — the "
                  f"plant no longer sits on the {why} boundary")
    if (100, 101) not in sim_jaccard(docs, guarded=True, probe_shrink=1) \
            and (100, 101) in g:
        print("✓ engagement: probe prefix one-short drops (100, 101) "
              "(last-slot pin)")
    else:
        eng_ok = False
        print("✗ engagement: (100, 101) not pinned to the last probe slot")
    if (300, 301) not in sim_containment(docs, guarded=True, probe_shrink=1) \
            and (300, 301) in sim_containment(docs, guarded=True):
        print("✓ engagement: containment prefix one-short drops (300, 301)")
    else:
        eng_ok = False
        print("✗ engagement: (300, 301) not pinned to the last prefix slot")
    if sim_containment(docs, guarded=True) != set(want_c):
        eng_ok = False
        print("   engagement: containment guarded simulation != brute force")
    if not eng_ok:
        failures += 1
    print(f"{'✓' if eng_ok else '✗'} plant engagement "
          f"({len(want_j)} jaccard / {len(want_c)} containment true pairs)")

    # 2. the REAL Spark operators on the planted corpus
    with tempfile.TemporaryDirectory(prefix="ppjoin_adv_") as tmp:
        corpus = os.path.join(tmp, "corpus")
        os.makedirs(corpus)
        write_corpus(docs, corpus)
        sout = os.path.join(tmp, "vout")
        run_spark(corpus, sout)
        con = duckdb.connect()
        spark_ok = True
        for qname, want, scol in (
                ("dd_ngram_jaccard", want_j, "jaccard"),
                ("dd_containment", want_c, "containment")):
            rows = con.sql(
                f"SELECT a, b, {scol} FROM '{sout}/{qname}/*.parquet' "
                "ORDER BY a, b").fetchall()
            if not compare(f"spark {qname}", rows, want):
                spark_ok = False
        print(f"{'✓' if spark_ok else '✗'} spark operators on planted corpus")
        if not spark_ok:
            failures += 1

        # 3. the DuckDB twins on the same rows
        view = " UNION ALL ".join(
            ("SELECT {} AS doc_id, {} AS text, 'en' AS lang, 'plant' AS "
             "source, {} AS n_chars").format(
                d, "NULL" if t is None else "'" + t.replace("'", "''") + "'",
                len(t) if t else 0)
            for d, t in docs)
        con.sql(f"CREATE VIEW documents AS {view}")
        twin_ok = True
        for qname, want in (("dd_ngram_jaccard", want_j),
                            ("dd_containment", want_c)):
            rows = con.sql(export[qname]).fetchall()
            if not compare(f"twin {qname}", [(r[0], r[1], r[2]) for r in rows],
                           want):
                twin_ok = False
        print(f"{'✓' if twin_ok else '✗'} duckdb twins on planted corpus")
        if not twin_ok:
            failures += 1

    print(f"== {3 - failures} pass, {failures} fail")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
