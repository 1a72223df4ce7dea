#!/usr/bin/env python3
"""Adversarial check for the tx_bm25 / decon_bm25 FIXED-POINT and
TIE-BREAK boundaries on both engines.

Both operators keep BM25 inside the hash oracle with exact integer
arithmetic: log2Fp (TextAnalysis.scala — e = bitlen(num div den) - 1,
then 20 square-and-shift rounds at 30 fractional bits) replayed by a
recursive CTE in the DuckDB twins, a millionths tf lift, and pinned
tie-breaks (top-m query terms: idf DESC then term ASC; retrieval rank:
score DESC then doc_id ASC). On the shipped corpora (31-token vocab,
smooth df spectrum) none of those sit on a boundary, so a hash match
cannot certify:

  B1  the EXPONENT path: e must come from bitlen(num div den), not the
      bitlen(num)-bitlen(den) shortcut. Planted df values make the two
      DISAGREE (num=54, den=7: 54//7=7 -> e=2, shortcut 3) and AGREE
      exactly at a power of two (den=27: 54//27=2, idf_fp = exactly
      1<<20, every fractional bit zero).
  B2  the ROUND COUNT: planted df values whose idf_fp is ODD — the
      20th round's bit is load-bearing; a 19-round (or >>1) regression
      flips the score of every doc matching that term.
  B3  the e=0 path: df high enough that num div den = 1 (idf < 1<<20)
      — DuckDB's length(bin(1))-1 = 0 must agree with
      63-numberOfLeadingZeros(1).
  B4  decon_bm25's top-m QUERY tie: the 8th and 9th distinctive terms
      of a planted eval doc carry EQUAL df (equal idf_fp); lexicographic
      order decides which enters the query, and the two candidate terms
      retrieve DISJOINT train docs, so the wrong tie-break changes the
      emitted set, not just its order.
  B5  decon_bm25's rank-k RETRIEVAL tie: six train docs match a planted
      eval query, ranks 1-4 strictly ordered, ranks 5-6 VERBATIM twins
      (identical score); k=5 keeps exactly the smaller doc_id.
  B6  df=0 exclusion: an eval doc whose only term never occurs in
      training retrieves nothing (no row, no error); a NULL-text train
      row joins nothing and is absent from N and S on both engines.

The tool plants that corpus, proves each boundary ENGAGES (a python
replay with the broken variant flips the output), then runs the REAL
Spark operators (tools/run.sh graft.Verify) and the DuckDB twins from
the verify export on the same rows, comparing both against the
independent integer reference — exact equality, no tolerance.

Usage: python3 tools/check_bm25_adversarial.py <verify_out_dir>
"""
import json
import os
import subprocess
import sys
import tempfile

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Robertson defaults as exact rationals + the pinned config — shared with
# TextAnalysis.bm25* / Curation.deconBm25* (drift-checked against the twin
# SQL text below before anything runs)
K1N, K1D, BN, BD = 6, 5, 3, 4
TX_QUERY = ["merge", "sort", "dup", "window"]
TX_K = 100
EVAL_SOURCE, DEC_M, DEC_K = "src0", 8, 5


def log2fp(num, den, rounds=20, shortcut_e=False):
    assert den >= 1 and num >= den and num < (1 << 33)
    e = (num.bit_length() - den.bit_length()) if shortcut_e \
        else (num // den).bit_length() - 1
    r = (num << 30) // (den << e)
    frac = 0
    for _ in range(rounds):
        r = (r * r) >> 30
        frac <<= 1
        if r >= (1 << 31):
            r >>= 1
            frac |= 1
    return (e << 20) | (frac << (20 - rounds))


def build_docs():
    """(doc_id, text, source); text None for the null row."""
    docs = []
    ev = lambda i, t: docs.append((i, t, EVAL_SOURCE))
    tr = lambda i, t: docs.append((i, t, "src1"))
    # B4 eval: seven df=1 terms + the tiea/tieb df=2 pair at slots 8/9
    ev(900, "qa qb qc qd qe qf qg tiea tieb")
    # B5 eval: one term matched by exactly six train docs
    ev(901, "rone")
    # B6 eval: the only term never occurs in training
    ev(902, "ghostx ghostx")
    # decon train plants
    tr(1000, "qa qb qc qd qe qf qg merge")       # df=1 carrier (+merge for tx)
    tr(1001, "tiea f1a window")                   # tiea df=2
    tr(1002, "tiea f1b window")
    tr(1003, "tieb fchg")                         # tieb df=2 — selected only
    tr(1004, "tieb f2b")                          # under a broken tie-break
    tr(1010, "rone rone rone")                    # B5 ranks 1..4 strictly
    tr(1011, "rone rone rone x11a")
    tr(1012, "rone rone x12a x12b")
    tr(1013, "rone x13a x13b")
    tr(1014, "rone x14a x14b x14c")               # B5 twins: identical text,
    tr(1015, "rone x14a x14b x14c")               # equal score, ranks 5/6
    # fillers: reach N_train=23 and set the tx df targets over T=26
    # (merge df=13: 12 fillers + 1000; sort df=3; dup df=1; window df=14:
    # 12 fillers + 1001 + 1002)
    for i in range(12):
        extra = {0: " sort", 1: " sort", 2: " sort", 3: " dup"}.get(i, "")
        tr(1100 + i, f"merge window junk{i}{extra}")
    docs.append((990, None, "src1"))              # B6 null-text row
    return docs


def words(t):
    return t.split(" ")


def ppm(tf, dl, n, s):
    if tf == 0:
        return 0
    num = 1000000 * BD * (K1N + K1D) * s * tf
    den = K1D * BD * s * tf + K1N * (BD - BN) * s + K1N * BN * dl * n
    return num // den


def ref_tx(docs, idf_fn=log2fp):
    live = [(d, words(t)) for d, t, _ in docs if t is not None]
    n = len(live)
    s = sum(len(w) for _, w in live)
    df = {t: sum(1 for _, w in live if t in w) for t in TX_QUERY}
    idf = {t: idf_fn(2 * n + 2, 2 * df[t] + 1) for t in TX_QUERY}
    rows = []
    for d, w in live:
        dl = len(w)
        tfs = {t: sum(1 for x in w if x == t) for t in TX_QUERY}
        hits = sum(1 for t in TX_QUERY if tfs[t] > 0)
        if hits == 0:
            continue
        score = sum(idf[t] * ppm(tfs[t], dl, n, s) for t in TX_QUERY)
        rows.append((d, dl, hits, score))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:TX_K], df, idf


def ref_dec(docs, tie_lex_desc=False, tie_doc_desc=False, idf_fn=log2fp):
    train = [(d, words(t)) for d, t, src in docs
             if t is not None and src != EVAL_SOURCE]
    evals = [(d, words(t)) for d, t, src in docs
             if t is not None and src == EVAL_SOURCE]
    n = len(train)
    s = sum(len(w) for _, w in train)
    vocab = {t for _, w in evals for t in w}
    df = {t: c for t in vocab
          if (c := sum(1 for _, w in train if t in w)) > 0}
    idf = {t: idf_fn(2 * n + 2, 2 * c + 1) for t, c in df.items()}
    rows = []
    for e, ew in evals:
        terms = sorted({t for t in ew if t in idf},
                       key=lambda t: (-idf[t], t if not tie_lex_desc
                                      else "".join(chr(255 - ord(c)) for c in t)))
        q = terms[:DEC_M]
        scored = []
        for d, w in train:
            dl = len(w)
            hits = [(t, sum(1 for x in w if x == t)) for t in q]
            hits = [(t, tf) for t, tf in hits if tf > 0]
            if not hits:
                continue
            score = sum(idf[t] * ppm(tf, dl, n, s) for t, tf in hits)
            scored.append((d, dl, len(hits), score))
        scored.sort(key=lambda r: (-r[3], -r[0] if tie_doc_desc else r[0]))
        for rk, (d, dl, nt, sc) in enumerate(scored[:DEC_K], 1):
            rows.append((e, d, dl, nt, sc, rk))
    return rows, n, s, df, idf


def write_corpus(docs, dirpath):
    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
        "text": pa.array([t for _, t, _ in docs], pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array([src for _, _, src in docs], pa.string()),
        "n_chars": pa.array([len(t) if t else 0 for _, t, _ in docs],
                            pa.int64()),
    })
    pq.write_table(tbl, os.path.join(dirpath, "documents.parquet"))


def run_spark(corpus_dir, out_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [os.path.join(REPO, "tools", "run.sh"), "graft.Verify", corpus_dir,
         out_dir, "tx_bm25,decon_bm25"],
        capture_output=True, text=True, env=env, timeout=600)
    failed = [ln for ln in r.stderr.splitlines() if "failed:" in ln]
    if r.returncode != 0 or failed:
        sys.exit("check_bm25_adversarial: Spark run failed:\n"
                 + "\n".join(failed or [r.stderr[-2000:]]))


def compare(name, got, want):
    got, want = [tuple(map(int, r)) for r in got], [tuple(r) for r in want]
    if got != want:
        print(f"   {name}: rows differ")
        for g, w in zip(got, want):
            if g != w:
                print(f"     got {g} != want {w}")
        for x in got[len(want):]:
            print(f"     extra {x}")
        for x in want[len(got):]:
            print(f"     missing {x}")
        return False
    return True


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
    try:
        export = json.load(open(f"{out_dir}/oracle_sql.json"))
    except FileNotFoundError:
        sys.exit(f"check_bm25_adversarial: no oracle_sql.json in {out_dir} "
                 "— re-run Verify first")
    for k in ("tx_bm25", "decon_bm25"):
        if k not in export:
            sys.exit(f"check_bm25_adversarial: oracle_sql.json has no '{k}' "
                     "— stale export; re-run Verify first")
    # config drift check: the tool's mirrored constants must appear in the
    # twins' SQL text, else the plant certifies a config that no longer runs
    for tok in ("('merge')", "('sort')", "('dup')", "('window')",
                f"LIMIT {TX_K}"):
        if tok not in export["tx_bm25"]:
            sys.exit(f"check_bm25_adversarial: tx_bm25 twin lost {tok!r} — "
                     "update the tool's mirrored constants")
    for tok in (f"'{EVAL_SOURCE}'", f"rk <= {DEC_M}", f'"rank" <= {DEC_K}'):
        if tok not in export["decon_bm25"]:
            sys.exit(f"check_bm25_adversarial: decon_bm25 twin lost {tok!r} "
                     "— update the tool's mirrored constants")

    docs = build_docs()
    want_tx, df_tx, idf_tx = ref_tx(docs)
    want_dec, n_dec, s_dec, df_dec, idf_dec = ref_dec(docs)
    failures = 0

    # 1. plant-engagement proofs
    eng_ok = True
    checks = [
        ("B1 pow2-exact: idf(merge) == exactly 1<<20 (df 13 of 26)",
         df_tx["merge"] == 13 and idf_tx["merge"] == (1 << 20)),
        ("B1 shortcut-e flips idf(sort) (54//7=7: e 2 vs shortcut 3)",
         df_tx["sort"] == 3 and
         log2fp(54, 7, shortcut_e=True) != idf_tx["sort"]),
        ("B2 idf(dup) and idf(sort) are ODD — 19 rounds flips both",
         idf_tx["dup"] & 1 == 1 and idf_tx["sort"] & 1 == 1 and
         log2fp(54, 3, rounds=19) != idf_tx["dup"]),
        ("B3 e=0 path: idf(window) < 1<<20 (54//29 = 1)",
         df_tx["window"] == 14 and 0 < idf_tx["window"] < (1 << 20)),
        ("B1 dec pow2-exact: idf(qa) == exactly 4<<20 (df 1 of 23)",
         n_dec == 23 and idf_dec.get("qa") == (4 << 20)),
        ("B2 dec tie-pair idf is ODD (tiea == tieb, both df 2)",
         idf_dec.get("tiea") == idf_dec.get("tieb")
         and idf_dec["tiea"] & 1 == 1),
    ]
    for name, ok in checks:
        print(("✓ " if ok else "✗ ") + name)
        eng_ok &= ok
    # B4: the wrong lexicographic tie admits tieb and swaps the retrieved
    # SET for eval 900 (1003/1004 in, 1001/1002 out)
    alt_lex = {r for r in ref_dec(docs, tie_lex_desc=True)[0] if r[0] == 900}
    base900 = {r for r in want_dec if r[0] == 900}
    b4 = ({r[1] for r in base900} & {1001, 1002} == {1001, 1002}
          and {r[1] for r in alt_lex} & {1003, 1004} == {1003, 1004}
          and not {r[1] for r in base900} & {1003, 1004})
    print(("✓ " if b4 else "✗ ")
          + "B4 query tie: lex-desc tie-break swaps eval 900's retrieved set")
    eng_ok &= b4
    # B5: six matchers for eval 901, twins tie at the k boundary — the
    # wrong doc-id tie emits 1015 instead of 1014
    e901 = sorted((r for r in want_dec if r[0] == 901), key=lambda r: r[5])
    alt_doc = sorted((r for r in ref_dec(docs, tie_doc_desc=True)[0]
                      if r[0] == 901), key=lambda r: r[5])
    b5 = (len(e901) == DEC_K and [r[1] for r in e901[:4]] ==
          [1010, 1011, 1012, 1013] and e901[4][1] == 1014
          and alt_doc[4][1] == 1015
          and df_dec["rone"] == 6)
    print(("✓ " if b5 else "✗ ")
          + "B5 rank-k tie: twins tie at rank 5; doc-id order decides")
    eng_ok &= b5
    # B6: ghost eval retrieves nothing; null row absent from stats
    b6 = (not any(r[0] == 902 for r in want_dec)
          and "ghostx" not in df_dec and n_dec == 23)
    print(("✓ " if b6 else "✗ ")
          + "B6 df=0 eval retrieves nothing; null row out of N/S")
    eng_ok &= b6
    if not eng_ok:
        failures += 1
    print(f"{'✓' if eng_ok else '✗'} plant engagement "
          f"({len(want_tx)} tx rows / {len(want_dec)} dec rows)")

    with tempfile.TemporaryDirectory(prefix="bm25_adv_") as tmp:
        corpus = os.path.join(tmp, "corpus")
        os.makedirs(corpus)
        write_corpus(docs, corpus)
        sout = os.path.join(tmp, "vout")
        run_spark(corpus, sout)
        con = duckdb.connect()
        # 2. the REAL Spark operators on the planted corpus
        spark_ok = compare(
            "spark tx_bm25",
            con.sql(f"SELECT doc_id, dl, n_terms, score_fp FROM "
                    f"'{sout}/tx_bm25/*.parquet' ORDER BY score_fp DESC, "
                    "doc_id").fetchall(), want_tx)
        spark_ok &= compare(
            "spark decon_bm25",
            con.sql(f'SELECT eval_id, doc_id, dl, n_terms, score_fp, "rank" '
                    f"FROM '{sout}/decon_bm25/*.parquet' "
                    'ORDER BY eval_id, "rank"').fetchall(), want_dec)
        print(f"{'✓' if spark_ok else '✗'} spark operators on planted corpus")
        if not spark_ok:
            failures += 1
        # 3. the DuckDB twins on the same rows
        view = " UNION ALL ".join(
            "SELECT {} AS doc_id, {} AS text, 'en' AS lang, '{}' AS source, "
            "{} AS n_chars".format(
                d, "NULL" if t is None else "'" + t + "'", src,
                len(t) if t else 0)
            for d, t, src in docs)
        con.sql(f"CREATE VIEW documents AS {view}")
        twin_ok = compare("twin tx_bm25",
                          con.sql(export["tx_bm25"]).fetchall(), want_tx)
        twin_ok &= compare("twin decon_bm25",
                           con.sql(export["decon_bm25"]).fetchall(), want_dec)
        print(f"{'✓' if twin_ok else '✗'} duckdb twins on planted corpus")
        if not twin_ok:
            failures += 1

    print(f"== {3 - failures} pass, {failures} fail")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
