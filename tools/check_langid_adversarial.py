#!/usr/bin/env python3
"""Adversarial check for the tx_langid2 DuckDB twin.

The shipped corpus never exercises the collision cases of the trained
language scorer -- margin TIES between languages (struct-max must break
to the LARGEST language code), sub-3-char and empty texts (the chargram
guard), quote characters (SQL escaping), and single-language corpora
(one-vs-rest labels all +1/-1 for some class). A green hash match on the
testdata cannot certify the twin's replay of training + prediction on
those, so this tool re-runs the twin's SQL (from a Verify dump's
oracle_sql.json) against planted corpora and compares with a reference
Python implementation of the exact integer algebra.

Usage: python3 tools/check_langid_adversarial.py <verify_out_dir>
"""
import hashlib
import json
import sys

import duckdb

LANGS = ["de", "en", "es", "fr", "zh"]
ITERS = 8
B = 16

CORPORA = [
    # every text IDENTICAL across languages: all margins equal per doc,
    # so every prediction is decided purely by the tie-break (largest
    # language code wins) -- the case the corpus never hits
    ("all-tie", [(i, "same words here", LANGS[i % 5]) for i in range(10)]),
    # sub-3-char and empty texts: chargrams must be EMPTY (the Spark side
    # guards sequence(1, len-2) descending; DuckDB generate_series(1, len-2)
    # is empty) -- margins all 0, tie-break again
    ("short-docs", [(0, "ab", "en"), (1, "x", "de"), (2, "", "fr"),
                    (3, "abc", "es"), (4, "abcd", "zh")]),
    # apostrophes and SQL-sensitive chars in text survive literal quoting
    ("quotes", [(0, "l'ete c'est l'ami", "fr"), (1, "don't won't can't", "en"),
                (2, "it's o'clock somewhere", "en")]),
    # one language only: y = +1 for en on every doc, -1 for every other
    # language on every doc -- the one-vs-rest degenerate corner
    ("single-lang", [(i, f"doc number {i} text body", "en") for i in range(6)]),
    # two near-identical languages, one distinguishing trigram
    ("one-gram-apart", [(i, ("alpha beta" if i % 2 == 0 else "alphq beta"),
                         ("en" if i % 2 == 0 else "de")) for i in range(8)]),
    # astral-plane codepoints (surrogate pairs in UTF-16): length() and
    # substr() must count CODEPOINTS identically on both engines or the
    # chargram windows shift -- zh (BMP) does not cover this class
    ("astral", [(0, "\U0001F600 ok \U0001F680 go", "en"),
                (1, "\U0001F436\U0001F431\U0001F42D mix", "zh"),
                (2, "plain text row", "en")]),
]


def bucket(g):
    return int(hashlib.md5(g.encode()).hexdigest()[0], 16)


def feats(text):
    x = [0] * B
    if len(text) >= 3:
        for i in range(len(text) - 2):
            x[bucket(text[i:i + 3])] += 1
    return x, max(len(text) - 2, 0)


def reference(docs):
    """(doc_id, actual, predicted, margin) rows of the exact algorithm."""
    feat = [(d, l, *feats(t)) for d, t, l in docs if t is not None]

    def z(x, n, i):
        return B * x[i] - n if i < B else n

    w = {L: [0] * (B + 1) for L in LANGS}
    for _ in range(ITERS):
        grads = {}
        for L in LANGS:
            g = [0] * (B + 1)
            for _, lang, x, n in feat:
                y = 1 if lang == L else -1
                m = sum(w[L][i] * z(x, n, i) for i in range(B + 1))
                if y * m <= 0:
                    for i in range(B + 1):
                        g[i] += y * z(x, n, i)
            grads[L] = g
        for L in LANGS:
            w[L] = [w[L][i] + grads[L][i] for i in range(B + 1)]
    weff = {}
    for L in LANGS:
        shift = w[L][B] - sum(w[L][:B])
        weff[L] = [B * w[L][i] + shift for i in range(B)]
    out = []
    for d, lang, x, n in feat:
        # struct-max: max by (margin, lang) -- ties to the LARGEST code
        m, pl = max((sum(weff[L][i] * x[i] for i in range(B)), L) for L in LANGS)
        out.append((d, lang, pl, m))
    return sorted(out)


def sq(s):
    return s.replace("'", "''")


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
    try:
        export = json.load(open(f"{out_dir}/oracle_sql.json"))
    except FileNotFoundError:
        sys.exit(f"check_langid_adversarial: no oracle_sql.json in {out_dir} "
                 "— re-run Verify first (tools/run.sh graft.Verify "
                 f"/root/testdata/sf0.01 {out_dir})")
    if "tx_langid2" not in export:
        sys.exit(f"check_langid_adversarial: {out_dir}/oracle_sql.json has "
                 f"{len(export)} keys but no 'tx_langid2' — the export is "
                 "stale (pre-round-14). Re-run Verify first: tools/run.sh "
                 f"graft.Verify /root/testdata/sf0.01 {out_dir}")
    sql = export["tx_langid2"]
    failures = 0
    for name, docs in CORPORA:
        con = duckdb.connect()
        view = " UNION ALL ".join(
            f"SELECT {d} AS doc_id, '{sq(t)}' AS text, '{l}' AS lang, "
            f"'s' AS source, {len(t)} AS n_chars"
            for d, t, l in docs)
        con.sql(f"CREATE VIEW documents AS {view}")
        got = sorted(tuple(r) for r in con.sql(sql).fetchall())
        want = reference(docs)
        ok = got == want
        print(f"{'✓' if ok else '✗'} {name}: {len(got)} rows")
        if not ok:
            failures += 1
            for a, b in zip(got, want):
                if a != b:
                    print(f"   oracle {a} != reference {b}")
            if len(got) != len(want):
                print(f"   row counts differ: oracle {len(got)} vs reference {len(want)}")
    print(f"== {len(CORPORA) - failures} pass, {failures} fail")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
