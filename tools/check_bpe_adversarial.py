#!/usr/bin/env python3
"""Adversarial check for the tx_bpe DuckDB twin.

The shipped testdata never exercises the island-parity collision case
(a word like 'abab' where a non-candidate position interleaves two
merge candidates of the same rule), so a corpus hash match alone cannot
certify the oracle's merge replay — round 13's review found exactly
such a bug surviving three green SF runs. This tool re-runs the twin's
SQL (taken from a Verify dump's oracle_sql.json) against planted
collision corpora and compares with a reference Python mergeFold
(the same leftmost-greedy fold Spark's mergeFold spells).

Usage: python3 tools/check_bpe_adversarial.py <verify_out_dir>
"""
import json
import sys

import duckdb

CORPORA = [
    # (name, words-with-counts): collision patterns for l==r runs,
    # interleaved candidates, empty-ish words, early-stop tails
    ("abab-collision", [("abab", 2), ("ab", 1)]),
    ("l-eq-r-runs", [("aaaa", 3), ("aaa", 2), ("aa", 1)]),
    ("merged-reenters", [("abcabc", 2), ("abc", 2), ("bc", 1)]),
    ("single-chars", [("a", 5), ("b", 4)]),
]


def merge_fold(syms, l, r):
    out = []
    for x in syms:
        if out and out[-1] == l and x == r:
            out[-1] = l + r
        else:
            out.append(x)
    return out


def reference_rules(words, merges=30):
    hist = {w: [list(w) + ["</w>"], c] for w, c in words}
    rules = []
    for rank in range(merges):
        pairs = {}
        for w, (syms, c) in hist.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get(
                    (syms[i], syms[i + 1]), 0) + c
        if not pairs:
            break
        (l, r), n = sorted(pairs.items(),
                           key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        rules.append((rank, l, r, n))
        for w in hist:
            hist[w][0] = merge_fold(hist[w][0], l, r)
    return rules


def sq(s):
    """Escape a string for a single-quoted SQL literal."""
    return s.replace("'", "''")


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
    try:
        export = json.load(open(f"{out_dir}/oracle_sql.json"))
    except FileNotFoundError:
        sys.exit(f"check_bpe_adversarial: no oracle_sql.json in {out_dir} — "
                 "re-run Verify first (tools/run.sh graft.Verify "
                 f"/root/testdata/sf0.01 {out_dir})")
    if "tx_bpe" not in export:
        sys.exit(f"check_bpe_adversarial: {out_dir}/oracle_sql.json has "
                 f"{len(export)} keys but no 'tx_bpe' — the export is stale "
                 "(pre-round-13). Re-run Verify first: tools/run.sh "
                 f"graft.Verify /root/testdata/sf0.01 {out_dir}")
    sql = export["tx_bpe"]
    failures = 0
    for name, words in CORPORA:
        con = duckdb.connect()
        # one doc per word, repeated c times inside the doc — the word
        # histogram then carries count c, matching the reference
        docs = " UNION ALL ".join(
            f"SELECT {i} AS doc_id, '{sq(' '.join([w] * c))}' AS text, "
            f"'en' AS lang, 's' AS source, 0 AS n_chars"
            for i, (w, c) in enumerate(words))
        con.sql(f"CREATE VIEW documents AS {docs}")
        got = [tuple(r) for r in con.sql(sql).fetchall()]
        want = reference_rules(words)
        ok = got == want
        print(f"{'✓' if ok else '✗'} {name}: {len(got)} rules")
        if not ok:
            failures += 1
            for a, b in zip(got, want):
                if a != b:
                    print(f"   oracle {a} != reference {b}")
    print(f"== {len(CORPORA) - failures} pass, {failures} fail")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
