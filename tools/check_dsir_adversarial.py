#!/usr/bin/env python3
"""Adversarial check for samp_dsir's FIXED-POINT, LATTICE, and TIE
boundaries on both engines.

samp_dsir keeps published-form DSIR inside the hash oracle with exact
integers: log2Fp weights (the 20-round square-and-shift recurrence,
in-plan via log2FpSql on the Spark side, the generic keyed recursive
CTE run TWICE in the DuckDB twin) and base-2 Gumbel top-k keys from an
md5-derived 2^20-point lattice. On the shipped corpora none of the
seams sit on a boundary, so a hash match cannot certify:

  D1  the u=1 LATTICE POINT: a doc_id whose md5('{id}|dsir42') 5-hex
      prefix is fffff has h+1 = 2^20, so -log2(u) = 0 and the true
      Gumbel key is +inf; the documented max(1,.) clamp caps it at
      exactly gumbel_fp = 20<<20. No shipped doc_id hits the point
      (p = 2^-20 per doc). Also pins the h+1 (not h) lattice origin:
      an off-by-one variant changes every Gumbel key and flips the
      selection order.
  D2  the ROUND COUNT in the twin's generic recurrence: planted texts
      whose bucket weights carry an ODD last fractional bit — a
      19-round (or >>1) regression flips lambda, and with it the
      top-k order.
  D3  the <2-word SHINGLE FALLBACK: a one-word doc's gram list is
      [whole text], not empty — a strict-bigram variant silently DROPS
      the doc from the output.
  D4  the KEY TIE: two doc_ids with EQUAL md5 5-hex prefixes (a
      birthday pair in the 2^20 lattice) carrying IDENTICAL text have
      bit-equal lambda AND gumbel, so key_fp ties exactly; doc_id ASC
      decides the emitted order.

The tool plants that corpus, proves each boundary ENGAGES (a python
replay with the broken variant changes the output), then runs the REAL
Spark operator (tools/run.sh graft.Verify) and the DuckDB twin from
the verify export on the same rows, comparing both against the
independent integer reference — exact equality, no tolerance.

Usage: python3 tools/check_dsir_adversarial.py <verify_out_dir>
"""
import hashlib
import json
import os
import subprocess
import sys
import tempfile

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# mirrored Curation.dsir* constants (drift-checked against the twin SQL)
TARGET, HEX, TOPK = "en", 3, 50
B_DOM = 16 ** HEX


def log2fp(v, rounds=20):
    assert 1 <= v < (1 << 33)
    e = v.bit_length() - 1
    r = (v << 30) // (1 << e)
    frac = 0
    for _ in range(rounds):
        r = (r * r) >> 30
        frac <<= 1
        if r >= (1 << 31):
            r >>= 1
            frac |= 1
    return (e << 20) | (frac << (20 - rounds))


def md5hex(s):
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def grams(text):
    w = text.split(" ")
    if len(w) < 2:
        return [" ".join(w)]
    return [" ".join(w[i:i + 2]) for i in range(len(w) - 1)]


def ref(docs, rounds=20, lattice_off_by_one=False, no_fallback=False,
        tie_doc_desc=False):
    """Reference replay; docs = [(doc_id, text, lang)]."""
    live = [(d, t, l) for d, t, l in docs if t is not None]
    gs = {d: ([g for g in grams(t)] if not no_fallback else
              [g for g in grams(t) if " " in g]) for d, t, _ in live}
    buckets = {d: [md5hex(g)[:HEX] for g in g_list]
               for d, g_list in gs.items()}
    n_raw, n_tgt = {}, {}
    for d, t, l in live:
        for b in buckets[d]:
            n_raw[b] = n_raw.get(b, 0) + 1
            if l == TARGET:
                n_tgt[b] = n_tgt.get(b, 0) + 1
    t_raw, t_tgt = sum(n_raw.values()), sum(n_tgt.values())
    const = log2fp(t_raw + B_DOM, rounds) - log2fp(t_tgt + B_DOM, rounds)
    wt = {b: log2fp(n_tgt.get(b, 0) + 1, rounds) - log2fp(c + 1, rounds)
          for b, c in n_raw.items()}
    rows = []
    for d, t, _ in live:
        bs = buckets[d]
        if not bs:
            continue
        lam = sum(wt[b] for b in bs) + len(bs) * const
        h1 = int(md5hex(f"{d}|dsir42")[:5], 16) + (0 if lattice_off_by_one
                                                   else 1)
        h1 = max(1, h1)  # the off-by-one variant can reach 0
        a = max(1, (20 << 20) - log2fp(h1, rounds))
        g = (20 << 20) - log2fp(a, rounds)
        rows.append((d, lam, g, lam + g))
    rows.sort(key=lambda r: (-r[3], -r[0] if tie_doc_desc else r[0]))
    return rows[:TOPK], wt, const


def find_plants():
    """Deterministic searches over the doc_id lattice: the fffff clamp id
    and the smallest equal-prefix birthday pair."""
    clamp_id = None
    seen, pair = {}, None
    i = 0
    while clamp_id is None or pair is None:
        p = md5hex(f"{i}|dsir42")[:5]
        if clamp_id is None and p == "fffff":
            clamp_id = i
        if pair is None:
            if p in seen:
                pair = (seen[p], i)
            else:
                seen[p] = i
        i += 1
        if i > 5_000_000:
            sys.exit("check_dsir_adversarial: plant search exhausted")
    return clamp_id, pair


def build_docs(clamp_id, pair):
    docs = [
        # base mass: target and non-target vocabularies (t_tgt > 0)
        (1, "alpha beta alpha beta gamma", "en"),
        (2, "alpha gamma beta alpha", "en"),
        (3, "delta epsilon delta epsilon", "de"),
        (4, "epsilon zeta delta", "de"),
        # D3: one-word doc — the shingle fallback gram is the word itself
        (5, "solo", "en"),
        (6, None, "en"),  # null text: dropped on both engines
        # D1: the u=1 lattice doc
        (clamp_id, "alpha beta gamma", "en"),
    ]
    # D4: the birthday pair with IDENTICAL text -> identical lambda and
    # gumbel -> exact key tie, doc_id ASC decides emitted order
    for d in pair:
        docs.append((d, "zeta eta theta zeta", "de"))
    assert len({d for d, _, _ in docs}) == len(docs), "doc_id collision"
    return docs


def write_corpus(docs, dirpath):
    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
        "text": pa.array([t for _, t, _ in docs], pa.string()),
        "lang": pa.array([l for _, _, l in docs], pa.string()),
        "source": pa.array(["s"] * len(docs), pa.string()),
        "n_chars": pa.array([len(t) if t else 0 for _, t, _ in docs],
                            pa.int64()),
    })
    pq.write_table(tbl, os.path.join(dirpath, "documents.parquet"))


def run_spark(corpus_dir, out_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [os.path.join(REPO, "tools", "run.sh"), "graft.Verify", corpus_dir,
         out_dir, "samp_dsir"],
        capture_output=True, text=True, env=env, timeout=600)
    failed = [ln for ln in r.stderr.splitlines() if "failed:" in ln]
    if r.returncode != 0 or failed:
        sys.exit("check_dsir_adversarial: Spark run failed:\n"
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
        sys.exit(f"check_dsir_adversarial: no oracle_sql.json in {out_dir} "
                 "— re-run Verify first")
    if "samp_dsir" not in export:
        sys.exit("check_dsir_adversarial: oracle_sql.json has no 'samp_dsir'"
                 " — stale export; re-run Verify first")
    twin = export["samp_dsir"]
    # config drift check: the tool's mirrored constants must appear in the
    # twin's SQL text, else the plant certifies a config that no longer runs
    for tok in ("|dsir42", f"LIMIT {TOPK}", f"substr(md5(gram), 1, {HEX})",
                f"lang = '{TARGET}'", f"t_tgt + {B_DOM}", "greatest("):
        if tok not in twin:
            sys.exit(f"check_dsir_adversarial: samp_dsir twin lost {tok!r} "
                     "— update the tool's mirrored constants")

    clamp_id, pair = find_plants()
    docs = build_docs(clamp_id, pair)
    want, wt, const = ref(docs)
    failures = 0

    # 1. plant-engagement proofs: each broken variant changes the output
    eng_ok = True
    by_id = {r[0]: r for r in want}
    checks = [
        (f"D1 clamp: doc {clamp_id} hits u=1 (md5 prefix fffff) and its "
         "gumbel_fp is exactly 20<<20",
         by_id[clamp_id][2] == (20 << 20)),
        ("D1 lattice origin: the h-not-h+1 variant changes the output",
         ref(docs, lattice_off_by_one=True)[0] != want),
        ("D2 odd weights: some bucket weight has an odd last bit and the "
         "19-round variant changes the output",
         any(w & 1 for w in wt.values()) and ref(docs, rounds=19)[0] != want),
        ("D3 shingle fallback: the one-word doc is scored; the "
         "strict-bigram variant drops it",
         5 in by_id and
         all(r[0] != 5 for r in ref(docs, no_fallback=True)[0])),
        (f"D4 key tie: the birthday pair {pair} ties exactly on key_fp "
         "and doc_id DESC changes the emitted order",
         by_id[pair[0]][3] == by_id[pair[1]][3] and
         by_id[pair[0]][1] == by_id[pair[1]][1] and
         ref(docs, tie_doc_desc=True)[0] != want),
    ]
    for name, ok in checks:
        print(("✓ " if ok else "✗ ") + name)
        eng_ok &= ok
    if not eng_ok:
        failures += 1
    print(f"{'✓' if eng_ok else '✗'} plant engagement ({len(want)} rows, "
          f"clamp id {clamp_id}, pair {pair})")

    with tempfile.TemporaryDirectory(prefix="dsir_adv_") as tmp:
        corpus = os.path.join(tmp, "corpus")
        os.makedirs(corpus)
        write_corpus(docs, corpus)
        sout = os.path.join(tmp, "vout")
        run_spark(corpus, sout)
        con = duckdb.connect()
        # 2. the REAL Spark operator on the planted corpus
        spark_ok = compare(
            "spark samp_dsir",
            con.sql(f"SELECT doc_id, lambda_fp, gumbel_fp, key_fp FROM "
                    f"'{sout}/samp_dsir/*.parquet' "
                    "ORDER BY key_fp DESC, doc_id").fetchall(), want)
        print(f"{'✓' if spark_ok else '✗'} spark operator on planted corpus")
        if not spark_ok:
            failures += 1
        # 3. the DuckDB twin on the same rows
        view = " UNION ALL ".join(
            "SELECT {} AS doc_id, {} AS text, '{}' AS lang, 's' AS source, "
            "{} AS n_chars".format(
                d, "NULL" if t is None else "'" + t + "'", l,
                len(t) if t else 0)
            for d, t, l in docs)
        con.sql(f"CREATE VIEW documents AS {view}")
        twin_ok = compare("twin samp_dsir", con.sql(twin).fetchall(), want)
        print(f"{'✓' if twin_ok else '✗'} duckdb twin on planted corpus")
        if not twin_ok:
            failures += 1

    print(f"== {3 - failures} pass, {failures} fail")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
