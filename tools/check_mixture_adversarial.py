#!/usr/bin/env python3
"""Adversarial check for the samp_mixture_train DuckDB twin's clamp paths.

The shipped corpus's per-domain fluencies are near-uniform (~32k-39k), so
the trainer's max(1, .) clamps are NEVER engaged by the hash gate: a twin
that mis-spelled either clamp would stay green on every SF. This tool
plants a corpus whose fluency spread drives the multiplicative factor
NEGATIVE for the most fluent domain (10^6 + excess*eta < 1 -- the inner
clamp) and replays every round from the twin's own round-0 loss table
with an independent implementation of the exact integer algebra,
comparing (excess, weight) per (round, source).

Usage: python3 tools/check_mixture_adversarial.py <verify_out_dir>
"""
import json
import sys

import duckdb

ETA, C, ITERS = 50, 10000, 5

# (name, docs-as-(text, source) builders): the rich domain repeats one
# fluent sentence (bigrams land in the perplexity reference slice -> high
# flu); junk domains carry unique-token texts (unseen bigrams, backoff
# floor). The spread makes excess*ETA cross -10^6 for 'rich'.
def corpus_clamp():
    docs = []
    rich = "the cat sat on the mat and the dog ran to the cat"
    for _ in range(20):
        docs.append((rich, "rich"))
    for s in ("junk1", "junk2"):
        for j in range(20):
            docs.append((" ".join(f"{s}tok{len(docs)}x{k}" for k in range(12)), s))
    return docs


def corpus_mild():
    # near-uniform domains: NO clamp engages -- the sanity control that
    # the replay matches off the clamp path too
    docs = []
    for s in ("a1", "a2", "a3"):
        for j in range(15):
            docs.append((f"common words appear here with {s} token {j}", s))
    return docs


CORPORA = [("clamp-floor", corpus_clamp(), True), ("no-clamp", corpus_mild(), False)]


def sq(s):
    return s.replace("'", "''")


def replay(r0, rows):
    """Replay rounds from the twin's round-0 flu; return (ok, clamped_any)."""
    srcs = sorted(r0)
    nd = len(srcs)
    u = 10**6 // nd
    w = {s: u for s in srcs}
    ok, clamped_any = True, False
    for r in range(1, ITERS + 1):
        wsum = sum(w.values())
        wavg = sum(r0[s] * w[s] for s in srcs) // wsum
        exc = {s: wavg - r0[s] for s in srcs}
        for s in srcs:
            if 10**6 + exc[s] * ETA < 1:
                clamped_any = True
        raw = {s: max(1, w[s] * max(1, 10**6 + exc[s] * ETA) // 10**6)
               for s in srcs}
        rsum = sum(raw.values())
        w = {s: max(1, ((10**6 - C) * (raw[s] * 10**6 // rsum) + C * u) // 10**6)
             for s in srcs}
        got = {q[1]: (q[3], q[4]) for q in rows if q[0] == r}
        want = {s: (exc[s], w[s]) for s in srcs}
        if got != want:
            ok = False
            print(f"   round {r}: oracle {got} != reference {want}")
    return ok, clamped_any


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
    try:
        export = json.load(open(f"{out_dir}/oracle_sql.json"))
    except FileNotFoundError:
        sys.exit(f"check_mixture_adversarial: no oracle_sql.json in {out_dir} "
                 "— re-run Verify first (tools/run.sh graft.Verify "
                 f"/root/testdata/sf0.01 {out_dir})")
    if "samp_mixture_train" not in export:
        sys.exit(f"check_mixture_adversarial: {out_dir}/oracle_sql.json has "
                 f"{len(export)} keys but no 'samp_mixture_train' — the "
                 "export is stale. Re-run Verify first: tools/run.sh "
                 f"graft.Verify /root/testdata/sf0.01 {out_dir}")
    sql = export["samp_mixture_train"]
    failures = 0
    for name, docs, expect_clamp in CORPORA:
        con = duckdb.connect()
        view = " UNION ALL ".join(
            f"SELECT {i} AS doc_id, '{sq(t)}' AS text, 'en' AS lang, "
            f"'{s}' AS source, {len(t)} AS n_chars"
            for i, (t, s) in enumerate(docs))
        con.sql(f"CREATE VIEW documents AS {view}")
        rows = con.sql(sql).fetchall()
        r0 = {r[1]: r[2] for r in rows if r[0] == 0}
        ok, clamped = replay(r0, rows)
        if expect_clamp and not clamped:
            ok = False
            print(f"   {name}: the plant failed to engage the clamp — "
                  "the corpus no longer exercises the path it exists for")
        if (not expect_clamp) and clamped:
            ok = False
            print(f"   {name}: control corpus unexpectedly engaged the clamp")
        print(f"{'✓' if ok else '✗'} {name}: {len(r0)} domains, "
              f"clamp {'engaged' if clamped else 'not engaged'}")
        if not ok:
            failures += 1
    print(f"== {len(CORPORA) - failures} pass, {failures} fail")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
