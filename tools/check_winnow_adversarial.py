#!/usr/bin/env python3
"""Adversarial check for the remaining no-oracle operators an
independent replica makes reachable: tx_fingerprint (winnowing
selection) and dd_cluster (min-label CC over the MinHash candidate
graph) via the sketch gate's validated XXH64 replica, plus tx_compress
(deflate-ratio quality signal) via CPython's zlib — the SAME C library
Java's Deflater wraps, so level-1 output sizes are byte-identical, not
approximately equal (validated 500/500 on the shipped corpus before
wiring).

Like check_sketch_adversarial.py, these are DuckDB-inexpressible
(data-dependent xxhash64), so no corpus hash oracle exists; their
shipped certification is planted specs on the shipped corpora — which
never place inputs EXACTLY on the operators' decision boundaries:

  tx_fingerprint (shingle n=3, winnow window w=4)
    W1  3-word doc: ONE shingle, the slice-clamped short window
        (len < w) — n_fps=1 (a window scan that required w elements
        would emit nothing).
    W2  6-word doc: exactly 4 shingles = exactly ONE window
        (m = len-w+1 boundary; an off-by-one yields 0 or 2 windows).
    W3  7-word doc: 5 shingles, TWO windows — the window at text end
        exists and its min differs from window 0's here (n_fps=2).
    W4  "w w w w w w": every shingle identical — all window minima tie
        to one value; n_fps=1 (equal hashes in a window collapse).
    W5  period-2 text: shingles alternate between two hashes, every
        window sees both — 5 windows, 1 distinct min (recurring-min
        dedup across windows).
    W6  empty text: one ""-shingle, one clamped window — n_fps=1 over
        xxhash64("") (the degenerate-but-present case).
    W7  null text: n_fps NULL, doc_fp md5("") — the pass-through
        convention (pinned against the live operator, see probe note).
    W8  the TAIL plant (searched offline): the corpus-global minimum
        hash sits in the LAST shingle, so the final window (start
        i = len-w) introduces a brand-new minimum — a loop that stops
        at i < len-w (exclusive) loses exactly this fingerprint.
  dd_cluster (k=32, bands=8x4, threshold=0.5, rep grouping by SIGNATURE)
    C1  merge CHAIN: A-B are candidates (agreement 17/32, aligned band
        5 only), B-C are candidates (19/32, band 1 only), A-C are NOT
        (11/32, no aligned band) — the three docs must still land in
        ONE cluster labeled min(id): transitivity through B, which a
        pair-level dedup view cannot express.
    C2  threshold edge: agreement 15/32 WITH an aligned band (the
        sketch gate's M2 text) — the banding surfaces the pair but the
        est >= 0.5 filter drops the edge, so the doc stays OUT of the
        chain's cluster (and, having no other edge, out of the output).
    C3  exact-dup pair: identical texts share one signature group —
        intra-group members inherit the rep label (min member) even
        with zero inter-group edges (the self-node path).
    C4  isolated singleton: no edge, one member — ABSENT from the
        output entirely (the rep-join membership contract).
    C5  null text: excluded everywhere.
  tx_compress (Deflater BEST_SPEED = zlib level 1, zlib wrapper)
    Z1  empty text: the in.length == 0 branch pins ratio exactly 1.0
        (a naive n/len would divide by zero).
    Z2  a repetitive doc (the winnow corpus's repeated-word texts)
        compresses far below 1 — the signal engages.
    Z3  short distinct docs land ABOVE 1 (the zlib header+overhead
        exceeds the raw bytes) — a ratio clamp would hide it.

Ground truth is the same independent Python XXH64 replica the sketch
gate validated value-for-value against catalyst XxHash64 (imported from
check_sketch_adversarial), extended with the winnowing scan and a
union-find over the replica's candidate edges. Plant engagement is
re-asserted first so a hash/primitive drift fails loudly instead of
silently degrading the plants to ordinary inputs.

Beyond the plants, the gate replays tx_fingerprint's replica over the
WHOLE verify corpus (every real document, value-for-value against the
fresh Verify dump) — tx_fingerprint is a no-oracle operator, so this is
its only corpus-scale certification; the plants alone cover boundaries,
not distributional behavior.

Usage: python3 tools/check_winnow_adversarial.py <verify_out_dir> [sf_dir]
"""
import hashlib
import importlib.util
import os
import sys
import tempfile

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

_spec = importlib.util.spec_from_file_location(
    "check_sketch_adversarial",
    os.path.join(HERE, "check_sketch_adversarial.py"))
sk = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(sk)


# ------------------------------------------------------------- replicas
def shingle_list(text, n=3):
    """TextFunctions.shingles: ORDERED sliding n-word windows (whole text
    when shorter) — duplicates retained, unlike hashedShingles."""
    ws = text.split(" ")
    if len(ws) < n:
        return [" ".join(ws)]
    return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]


def winnow(hs, w=4):
    """WinnowSelect: windows at every start 0..max(len-w, 0) (slice-clamped
    tail), per-window min, dedup keeping first occurrence."""
    if not hs:
        return [None]
    out = []
    for i in range(max(len(hs) - w, 0) + 1):
        b = min(hs[i:i + w])
        if b not in out:
            out.append(b)
    return out


def tx_fp(text, n=3, w=4):
    """tx_fingerprint row: (n_fps, doc_fp). Null text pins the live
    operator's convention (probed): n_fps NULL, doc_fp md5('')."""
    if text is None:
        return None, hashlib.md5(b"").hexdigest()
    hs = [sk.xx_str(s) for s in shingle_list(text, n)]
    fps = winnow(hs, w)
    joined = ",".join(str(x) for x in sorted(fps))
    return len(fps), hashlib.md5(joined.encode()).hexdigest()


def want_fingerprint(docs):
    return {d: tx_fp(t) for d, t in docs}


def tx_comp(text):
    """tx_compress row: (n_bytes, n_deflate, ratio). Level 1 =
    Deflater.BEST_SPEED; wbits 15 = the default zlib wrapper Java uses."""
    import zlib
    raw = text.encode("utf-8")
    co = zlib.compressobj(1, zlib.DEFLATED, 15)
    n = len(co.compress(raw) + co.flush())
    return (len(raw), n, 1.0 if not raw else n / len(raw))


def want_compress(docs):
    """Null text is excluded by the operator (the dedup-family guard)."""
    return {d: tx_comp(t) for d, t in docs if t is not None}


def want_cluster(docs, threshold=0.5, k=32):
    """dd_cluster: signature-group reps, banded candidates filtered at
    est >= threshold, min-label components; members inherit the rep's
    component; output ONLY docs whose rep is a pair-graph node (an edge
    or a multi-member group's self-node)."""
    sigs = {d: sk.minhash_sig(t) for d, t in docs if t is not None}
    groups = sk.group_by(sigs)  # rep -> sorted members
    rep_sig = {r: sigs[r] for r in groups}
    reps = sorted(groups)
    parent = {r: r for r in reps}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set(r for r in reps if len(groups[r]) > 1)
    for i, a in enumerate(reps):
        for b in reps[i + 1:]:
            if (sk.aligned_bands(rep_sig[a], rep_sig[b])
                    and sk.sig_agree(rep_sig[a], rep_sig[b]) / k >= threshold):
                nodes.update((a, b))
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp_min = {}
    for r in nodes:
        root = find(r)
        comp_min[root] = min(comp_min.get(root, root), r)
    return {m: comp_min[find(r)]
            for r in nodes for m in groups[r]}


# ---------------------------------------------------------------- plants
# W8's last word searched offline: xx_str of the final shingle is the
# global minimum, so the tail window's min is brand-new (see module doc)
TAIL_TEXT = " ".join(["fw%d" % i for i in range(9)] + ["ft5"])

# C1's mutations searched offline against the replica (the sketch gate's
# _mh machinery over MH_BASE): A agrees 17/32 with B through band 5 only,
# C agrees 19/32 through band 1 only, A-C agree 11/32 with NO aligned band
CH_A = sk._mh(0, [0, 4, 5, 10, 11, 20, 21, 35])
CH_C = sk._mh(4, [0, 5, 14, 19, 24, 26, 34, 39])


def winnow_docs():
    return [
        (301, "a b c"),                    # W1
        (302, "a b c d e f"),              # W2
        (303, "a b c d e f g"),            # W3
        (304, "w w w w w w"),              # W4
        (305, "p q p q p q p q p q"),      # W5
        (306, ""),                         # W6
        (307, None),                       # W7
        (308, TAIL_TEXT),                  # W8
        (309, " ".join("gw%d" % i for i in range(12))),  # generic
        (310, ("za zb zc " * 60).strip()), # Z2: long repetitive text
    ]


def cluster_docs():
    return [
        (401, sk.MH_BASE),                 # B — the chain's hub
        (402, CH_A),                       # A — candidate with B only
        (403, CH_C),                       # C — candidate with B only
        (404, sk.MH_M2),                   # agreement 15: edge dropped
        (405, "dupx dupy dupz dupw"),      # C3 exact-dup pair
        (406, "dupx dupy dupz dupw"),
        (407, "iso1 iso2 iso3 iso4 iso5"),  # C4 isolated singleton
        (408, None),                       # C5 null text
    ]


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    for q in ("tx_fingerprint", "dd_cluster", "tx_compress"):
        if not os.path.isdir(os.path.join(out_dir, q)):
            sys.exit(f"check_winnow_adversarial: no {q}/ in {out_dir} — "
                     "re-run Verify first (tools/run.sh graft.Verify "
                     f"/root/testdata/sf0.01 {out_dir})")
    failures = 0
    wdocs, cdocs = winnow_docs(), cluster_docs()

    # 1. plant engagement: the boundary properties, re-derived from the
    #    replica so a primitive drift fails HERE, not as a silent non-plant
    eng_ok = True

    def chk(cond, msg):
        nonlocal eng_ok
        print(("✓" if cond else "✗") + " engagement: " + msg)
        if not cond:
            eng_ok = False

    def hs_of(t):
        return [sk.xx_str(s) for s in shingle_list(t)]

    chk(len(hs_of("a b c")) == 1 and len(winnow(hs_of("a b c"))) == 1,
        "W1: 3-word doc is one shingle, one clamped window")
    h2 = hs_of("a b c d e f")
    chk(len(h2) == 4 and max(len(h2) - 4, 0) + 1 == 1,
        "W2: 4 shingles = exactly one full-width window")
    h3 = hs_of("a b c d e f g")
    w3 = [min(h3[i:i + 4]) for i in range(2)]
    chk(len(h3) == 5 and w3[0] != w3[1],
        "W3: 5 shingles, two windows with DISTINCT minima")
    chk(len(set(hs_of("w w w w w w"))) == 1,
        "W4: repeated-word shingles all hash equal (in-window ties)")
    h5 = hs_of("p q p q p q p q p q")
    m5 = [min(h5[i:i + 4]) for i in range(len(h5) - 3)]
    chk(len(h5) == 8 and len(set(h5)) == 2 and len(set(m5)) == 1,
        "W5: period-2 shingles, 5 windows, ONE distinct min")
    h8 = hs_of(TAIL_TEXT)
    m8 = [min(h8[i:i + 4]) for i in range(len(h8) - 3)]
    chk(h8[-1] == min(h8) and m8[-1] not in m8[:-1],
        "W8: the tail window introduces a brand-new minimum")
    sb = sk.minhash_sig(sk.MH_BASE)
    sa, scv = sk.minhash_sig(CH_A), sk.minhash_sig(CH_C)
    chk(sk.sig_agree(sa, sb) == 17 and sk.aligned_bands(sa, sb) == [5],
        "C1: A-B agreement 17/32 through band 5 only")
    chk(sk.sig_agree(scv, sb) == 19 and sk.aligned_bands(scv, sb) == [1],
        "C1: C-B agreement 19/32 through band 1 only")
    chk(sk.sig_agree(sa, scv) == 11 and not sk.aligned_bands(sa, scv),
        "C1: A-C agree 11/32 with NO aligned band (merge only through B)")
    sm2 = sk.minhash_sig(sk.MH_M2)
    chk(sk.sig_agree(sm2, sb) == 15 and bool(sk.aligned_bands(sm2, sb)),
        "C2: the 15/32 doc IS banded but fails the threshold filter")
    if not eng_ok:
        failures += 1
    print(f"{'✓' if eng_ok else '✗'} plant engagement")

    want_w = want_fingerprint(wdocs)
    want_c = want_cluster(cdocs)
    want_z = want_compress(wdocs)
    gt_ok = True
    for cond, msg in (
            (want_w[302][0] == 1, "W2 one window -> n_fps=1"),
            (want_w[303][0] == 2, "W3 two windows -> n_fps=2"),
            (want_w[304][0] == 1 and want_w[305][0] == 1,
             "W4/W5 tie collapse -> n_fps=1"),
            (want_w[306][0] == 1, "W6 empty text -> one fingerprint"),
            (want_w[307][0] is None, "W7 null text -> NULL n_fps"),
            (want_w[308][0] == len(set(
                min(hs_of(TAIL_TEXT)[i:i + 4])
                for i in range(len(hs_of(TAIL_TEXT)) - 3))),
             "W8 count includes the tail window's new min"),
            (want_c.get(401) == 401 and want_c.get(402) == 401
             and want_c.get(403) == 401,
             "C1 chain A-B-C collapses to one cluster rooted at 401"),
            (404 not in want_c, "C2 threshold-dropped doc absent"),
            (want_c.get(405) == 405 and want_c.get(406) == 405,
             "C3 exact-dup pair clusters via the self-node"),
            (407 not in want_c and 408 not in want_c,
             "C4/C5 singleton and null absent"),
            (want_z[306][2] == 1.0, "Z1 empty text pins ratio exactly 1.0"),
            (want_z[310][2] < 0.5, "Z2 repetitive text compresses below 0.5"),
            (want_z[301][2] > 1.0, "Z3 short distinct text sits above 1"),
            (307 not in want_z, "null text excluded from tx_compress")):
        if not cond:
            gt_ok = False
            print(f"   ground truth: {msg} VIOLATED")
    print(f"{'✓' if gt_ok else '✗'} replica ground truth carries every "
          f"planted verdict ({len(want_w)}/{len(want_c)} "
          "fingerprint/cluster rows)")
    if not gt_ok:
        failures += 1

    # 2+3. the REAL Spark operators on the planted corpora
    with tempfile.TemporaryDirectory(prefix="winnow_adv_") as tmp:
        wc = os.path.join(tmp, "winnow_corpus")
        cc = os.path.join(tmp, "cluster_corpus")
        os.makedirs(wc)
        os.makedirs(cc)
        sk.write_corpus(wdocs, wc)
        sk.write_corpus(cdocs, cc)
        wout = os.path.join(tmp, "wout")
        cout = os.path.join(tmp, "cout")
        sk.run_spark(wc, wout, "tx_fingerprint,tx_compress")
        sk.run_spark(cc, cout, "dd_cluster")
        con = duckdb.connect()

        rows = con.sql(f"SELECT doc_id, n_fps, doc_fp FROM "
                       f"'{wout}/tx_fingerprint/*.parquet' "
                       "ORDER BY doc_id").fetchall()
        got_w = {int(r[0]): (None if r[1] is None else int(r[1]), r[2])
                 for r in rows}
        fp_ok = got_w == want_w
        if not fp_ok:
            for d in sorted(set(got_w) | set(want_w)):
                if got_w.get(d) != want_w.get(d):
                    print(f"   tx_fingerprint doc {d}: "
                          f"{got_w.get(d)} != {want_w.get(d)}")
        print(f"{'✓' if fp_ok else '✗'} spark tx_fingerprint on planted "
              f"corpus ({len(want_w)} rows, value-for-value)")
        if not fp_ok:
            failures += 1

        rows = con.sql(f"SELECT doc_id, n_bytes, n_deflate, ratio FROM "
                       f"'{wout}/tx_compress/*.parquet' "
                       "ORDER BY doc_id").fetchall()
        got_z = {int(r[0]): (int(r[1]), int(r[2]), float(r[3]))
                 for r in rows}
        z_ok = got_z == want_z
        if not z_ok:
            for d in sorted(set(got_z) | set(want_z)):
                if got_z.get(d) != want_z.get(d):
                    print(f"   tx_compress doc {d}: "
                          f"{got_z.get(d)} != {want_z.get(d)}")
        print(f"{'✓' if z_ok else '✗'} spark tx_compress on planted corpus "
              f"({len(want_z)} rows incl. the empty/repetitive/overhead "
              "ratio boundaries, byte-for-byte)")
        if not z_ok:
            failures += 1

        rows = con.sql(f"SELECT id, cluster FROM "
                       f"'{cout}/dd_cluster/*.parquet' ORDER BY id").fetchall()
        got_c = {int(r[0]): int(r[1]) for r in rows}
        cl_ok = got_c == want_c
        if not cl_ok:
            for d in sorted(set(got_c) | set(want_c)):
                if got_c.get(d) != want_c.get(d):
                    print(f"   dd_cluster doc {d}: "
                          f"{got_c.get(d)} != {want_c.get(d)}")
        print(f"{'✓' if cl_ok else '✗'} spark dd_cluster on planted corpus "
              f"({len(want_c)} member rows incl. the A-B-C merge chain)")
        if not cl_ok:
            failures += 1

    # 4. the REAL corpus, value-for-value: tx_fingerprint is no-oracle,
    #    so the fresh Verify dump vs the replica over every document is
    #    its only corpus-scale certification
    con2 = duckdb.connect()
    corpus = con2.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'").fetchall()
    want_corpus = {int(d): tx_fp(t) for d, t in corpus}
    rows = con2.sql(f"SELECT doc_id, n_fps, doc_fp FROM "
                    f"'{out_dir}/tx_fingerprint/*.parquet'").fetchall()
    got_corpus = {int(r[0]): (None if r[1] is None else int(r[1]), r[2])
                  for r in rows}
    corpus_ok = got_corpus == want_corpus
    if not corpus_ok:
        bad = [d for d in sorted(set(got_corpus) | set(want_corpus))
               if got_corpus.get(d) != want_corpus.get(d)][:5]
        for d in bad:
            print(f"   corpus doc {d}: {got_corpus.get(d)} != "
                  f"{want_corpus.get(d)}")
    print(f"{'✓' if corpus_ok else '✗'} spark tx_fingerprint on the REAL "
          f"corpus ({len(want_corpus)} docs, value-for-value vs the replica)")
    if not corpus_ok:
        failures += 1

    want_zc = want_compress([(int(d), t) for d, t in corpus])
    rows = con2.sql(f"SELECT doc_id, n_bytes, n_deflate, ratio FROM "
                    f"'{out_dir}/tx_compress/*.parquet'").fetchall()
    got_zc = {int(r[0]): (int(r[1]), int(r[2]), float(r[3])) for r in rows}
    zc_ok = got_zc == want_zc
    if not zc_ok:
        bad = [d for d in sorted(set(got_zc) | set(want_zc))
               if got_zc.get(d) != want_zc.get(d)][:5]
        for d in bad:
            print(f"   corpus tx_compress doc {d}: {got_zc.get(d)} != "
                  f"{want_zc.get(d)}")
    print(f"{'✓' if zc_ok else '✗'} spark tx_compress on the REAL corpus "
          f"({len(want_zc)} docs, byte-for-byte vs CPython zlib)")
    if not zc_ok:
        failures += 1

    print(f"== {7 - min(failures, 7)} pass, {min(failures, 7)} fail")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
