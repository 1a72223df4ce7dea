#!/usr/bin/env python3
"""Adversarial check for the persisted-store incremental dedup path
(Dedup.writeCorpusSignatures / dd_incremental_stored) — the last
certified-by-shipped-corpus family.

The operator's scaladoc makes two claims the shipped corpora never
exercise:

  1. "Bloom filters have no false negatives, and every positive is still
     CONFIRMED by the join, so the output is bit-identical with the
     screen on or off."  The shipped SFs put a handful of delta probes
     through a filter sized for >=1024 digests at 1 % fpp — the false-
     positive confirm path has a ~0 % chance of ever running, and a
     regression that trusted the screen's positives (skipping the join)
     would stay green at every SF.
  2. The near-dup path's epsilon-guarded pruning (`na - ceil(na*t - 1e-9)
     + 1` prefix, `nb >= na*t - 1e-9` length filter) is never placed AT
     its IEEE boundary by shipped data — an over-ceiling regression (the
     round-10 bug class) silently drops true near-dups.

This tool plants both:

  - A PRIOR-snapshot store: 1100 unique catalog docs (so the Bloom is
    sized at its 1 % working point) plus boundary/control/short base docs.
  - A LATER-snapshot delta with: exact re-crawls (the no-false-negative
    pin), ~5000 fresh unique docs (deterministically forcing dozens of
    Bloom false positives through the screen — every one must be
    join-rejected, never verdicted exact_dup), a near-dup at EXACTLY
    J = 22/55 = t = 0.4 with its shared-shingle block at the LAST guarded
    prefix slot (the prefix-formula off-by-one pin), a second near-dup at
    EXACTLY J = 55/100 = 0.55 where the IEEE product 100*0.55 =
    55.00000000000001 over-rounds — without the 1e-9 guards both the
    prefix and the length filter drop it (the drive classifies the same
    delta against the SAME store at both thresholds), a
    just-below-threshold control (21/55), identical-pair delta groups
    (fan-out), whole-text-shingle short docs, and a null-text row.
    The near-dup's digest is a definite Bloom negative, pinning that the
    screen gates ONLY the exact path (a screen accidentally applied to
    the near path would verdict it unique).

It then runs the REAL operators via graft.IncrementalDrive (store build
from snapshot A + bloom-on/off classification of snapshot B's delta),
compares both runs against an independent brute-force reference, and
requires the reported screen stats to prove engagement:
passed > #true-exact (false positives ran the confirm path) and
passed < total (the screen actually screened).

The stored path has no DuckDB twin (xxhash64 signatures are genuinely
inexpressible there) — this gate IS its adversarial certification,
beside the store-parity ScalaTest specs.

Usage: python3 tools/check_incremental_adversarial.py <verify_out_dir>
"""
import json
import math
import os
import subprocess
import sys
import tempfile

import duckdb

# T is the operator default; T_X is the extra threshold the drive also
# classifies at — 0.4 never sits on an IEEE ceiling boundary at plantable
# shingle counts (n*0.4 rounds exactly for every multiple of 5 up to
# thousands), while 20*0.55 = 11.000000000000002 over-ceils, so the
# epsilon-guard pin lives at T_X and the prefix last-slot pin at T.
T, T_X, NGRAM = 0.4, 0.55, 3
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- corpora
def build_snapshots():
    """Returns (snapA_docs, snapB_docs) as [(doc_id, text-or-None)].
    Snapshot A ids are residue 0 (all in the store's base split); snapshot
    B ids are residue 4 (all in the stored path's delta split)."""
    a = []
    # 1100 unique catalog docs: sizes the Bloom at its 1 % working point
    # and supplies exact-re-crawl targets
    for i in range(1100):
        a.append((5 * i, " ".join(f"cat{i}w{j}" for j in range(10))))
    # boundary base doc: 24 words -> 22 distinct shingles (all shared
    # with the J=0.4 delta plant below)
    a.append((5500, " ".join(f"bw{j}" for j in range(24))))
    # control base doc: 23 words -> 21 shingles (shared with the 21/55
    # below-threshold control)
    a.append((5505, " ".join(f"cw{j}" for j in range(23))))
    # plain near-dup target
    a.append((5510, "spark catalyst rewrites logical plans into physical plans with codegen"))
    # short doc: whole text is the single shingle
    a.append((5515, "shorty pair"))
    # T_X boundary base doc: 57 words -> 55 distinct shingles, all shared
    # with the J = 55/100 = 0.55 delta plant below
    a.append((5520, " ".join(f"t55s{j}" for j in range(57))))

    b = []
    nid = [4]

    def add(text):
        b.append((nid[0], text))
        nid[0] += 5

    # 30 exact re-crawls of catalog docs (true positives: the Bloom must
    # pass every one — no false negatives — and the join must confirm)
    for i in range(30):
        add(" ".join(f"cat{i}w{j}" for j in range(10)))
    # LAST-SLOT PLANT (default t): 33 absent words + the 24 shared words
    # -> 55 distinct shingles, 22 shared, J = 22/(55+22-22) = 22/55 = 0.4
    # exactly. Rarest-first ordering puts the 33 absent shingles (base
    # df 0) before every shared one (df 1), so the first shared shingle
    # sits at rank 33 — the LAST slot of the guarded prefix
    # 55 - ceil(55*0.4 - 1e-9) + 1 = 34; any prefix off-by-one (a dropped
    # +1, a mis-ceiling) leaves only absent shingles and drops the pair.
    # (55*0.4 itself rounds to exactly 22.0 in IEEE, so this plant pins
    # the formula's shape at the default threshold; the epsilon guard is
    # pinned by the T_X plant below, where the product DOES over-round.)
    add(" ".join(f"xa{j}" for j in range(33)) + " "
        + " ".join(f"bw{j}" for j in range(24)))
    # EPSILON PLANT (t = T_X = 0.55): 45 absent words + the 57 shared words
    # -> 100 distinct shingles, 55 shared, J = 55/(100+55-55) = 55/100 =
    # 0.55 exactly. 100*0.55 = 55.00000000000001 in IEEE: unguarded,
    # ceil() = 56 shrinks the prefix from 46 to 45 (absent-only) AND the
    # length filter 55 >= 55.00000000000001 fails — either regression
    # drops the pair; the 1e-9 guards keep both. The first shared shingle
    # sits at rank 45, the last guarded slot, by the same df-0/df-1 split.
    add(" ".join(f"t55a{j}" for j in range(45)) + " "
        + " ".join(f"t55s{j}" for j in range(57)))
    # below-threshold control: 34 absent + 23 shared words -> 55 shingles,
    # 21 shared, J = 21/55 < 0.4 — must stay unique
    add(" ".join(f"ya{j}" for j in range(34)) + " "
        + " ".join(f"cw{j}" for j in range(23)))
    # plain near-dup of 5510 (mid-range J, digest a definite negative)
    add("spark catalyst rewrites logical plans into physical plans with codegen enabled everywhere")
    # identical delta PAIR, both near-dups of 5510: one group, fanned out
    twin = "spark catalyst rewrites logical plans into physical plans with whole stage codegen"
    add(twin)
    add(twin)
    # identical delta pair that is an exact re-crawl (group via digest)
    add(" ".join(f"cat77w{j}" for j in range(10)))
    add(" ".join(f"cat77w{j}" for j in range(10)))
    # short docs: exact dup of the base short doc; and a disjoint short
    add("shorty pair")
    add("shorty lone")
    # null text rides the screen's definite-negative branch -> unique
    b.append((nid[0], None))
    nid[0] += 5
    # ~5000 fresh unique docs: deterministically force Bloom false
    # positives through the screen (expected ~1 % of 5000; the exact count
    # is FIXED for this fixed corpus — engagement asserts it is >= 1)
    for i in range(5000):
        add(" ".join(f"fp{i}u{j}" for j in range(6)))
    return a, b


def shingle_set(text):
    if text is None:
        return None
    w = text.split(" ")
    if len(w) < NGRAM:
        return frozenset({" ".join(w)})
    return frozenset(" ".join(w[i:i + NGRAM]) for i in range(len(w) - NGRAM + 1))


# ---------------------------------------------------------- reference
def reference(snap_a, snap_b, thr=T):
    """Independent replay of the stored-path classification contract:
    exact = digest match against the store (min base doc), near = best
    base representative at J >= T by (j desc, b asc) over DISTINCT
    shingle sets, fanned back to every delta group member; else unique.
    Returns rows (doc_id, verdict, match_id-or-None, jaccard-or-None)
    ordered by doc_id, plus the store's digest set and base reps."""
    import hashlib

    def md5(t):
        return hashlib.md5(t.encode()).hexdigest()

    base = [(d, t) for d, t in snap_a if d % 5 != 4 and t is not None]
    digests = {}
    for d, t in base:
        dig = md5(t)
        digests[dig] = min(digests.get(dig, d), d)
    base_groups = {}
    for d, t in base:
        base_groups.setdefault(shingle_set(t), []).append(d)
    base_reps = {min(ds): set(k) for k, ds in base_groups.items()}

    delta = [(d, t) for d, t in snap_b if d % 5 == 4]
    rows = []
    exact_ids = set()
    for d, t in delta:
        if t is not None and md5(t) in digests:
            rows.append((d, "exact_dup", digests[md5(t)], 1.0))
            exact_ids.add(d)
    # near path over the exact-excluded remainder, grouped by shingle set
    near_groups = {}
    for d, t in delta:
        if d in exact_ids:
            continue
        near_groups.setdefault(shingle_set(t), []).append(d)
    for sset, members in near_groups.items():
        best = None
        if sset is not None:
            na = len(sset)
            for b in sorted(base_reps):
                sb = base_reps[b]
                inter = len(sset & sb)
                if inter == 0:
                    continue
                j = inter / (na + len(sb) - inter)
                if j >= thr and (best is None or j > best[1]
                                 or (j == best[1] and b < best[0])):
                    best = (b, j)
        for d in members:
            if best is None:
                rows.append((d, "unique", None, None))
            else:
                rows.append((d, "near_dup", best[0], best[1]))
    rows.sort(key=lambda r: r[0])
    n_exact = len(exact_ids)
    return rows, digests, base_reps, n_exact


# ------------------------------------------------- engagement simulation
def sim_near(delta_sets, base_reps, guarded, probe_shrink=0, t=T):
    """Replay of incrementalCore's near-path pruning (prefix bound +
    length filter) with/without the 1e-9 epsilons. The rarest-first
    tie-break within one df class uses the string instead of the 64-bit
    hash — immaterial here: the boundary plant's prefix edge separates
    df-0 (absent) from df-1 (shared) shingles, never two shingles of the
    same df."""
    eps = 1e-9 if guarded else 0.0
    df = {}
    for sb in base_reps.values():
        for sh in sb:
            df[sh] = df.get(sh, 0) + 1
    posting = {}
    for bid, sb in base_reps.items():
        for sh in sb:
            posting.setdefault(sh, []).append(bid)
    out = {}
    for aid, sa in delta_sets.items():
        if sa is None:
            continue
        na = len(sa)
        pref = na - math.ceil(na * t - eps) + 1 - probe_shrink
        ranked = sorted(sa, key=lambda sh: (df.get(sh, 0), sh))
        cands = set()
        for sh in ranked[:pref]:
            for bid in posting.get(sh, []):
                nb = len(base_reps[bid])
                if nb >= na * t - eps and nb <= na / t + eps:
                    cands.add(bid)
        best = None
        for bid in sorted(cands):
            sb = base_reps[bid]
            inter = len(sa & sb)
            j = inter / (na + len(sb) - inter)
            if j >= t and (best is None or j > best[1]
                           or (j == best[1] and bid < best[0])):
                best = (bid, j)
        if best is not None:
            out[aid] = best
    return out


# ----------------------------------------------------------------- drive
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


def run_drive(snap_a_dir, snap_b_dir, out_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [os.path.join(REPO, "tools", "run.sh"), "graft.IncrementalDrive",
         snap_a_dir, snap_b_dir, out_dir, str(T_X)],
        capture_output=True, text=True, env=env, timeout=900)
    if r.returncode != 0:
        sys.exit("check_incremental_adversarial: drive failed:\n"
                 + r.stderr[-3000:])
    stats = None
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith('{"probes_total"'):
            stats = json.loads(ln)
    if stats is None:
        sys.exit("check_incremental_adversarial: drive printed no stats line:\n"
                 + r.stdout[-2000:])
    return stats


def read_verdicts(path):
    con = duckdb.connect()
    return con.sql(
        f"SELECT doc_id, verdict, match_id, jaccard FROM '{path}/*.parquet' "
        "ORDER BY doc_id").fetchall()


def rows_equal(got, want):
    if len(got) != len(want):
        print(f"   row count {len(got)} != {len(want)}")
        return False
    ok = True
    for g, w in zip(got, want):
        gid, gv, gm, gj = int(g[0]), g[1], g[2], g[3]
        wid, wv, wm, wj = w
        bad = (gid != wid or gv != wv
               or (gm is None) != (wm is None)
               or (gm is not None and int(gm) != wm)
               or (gj is None) != (wj is None)
               or (gj is not None and abs(float(gj) - wj) > 1e-12))
        if bad:
            print(f"   mismatch at doc {wid}: got {g}, want {w}")
            ok = False
    return ok


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
    try:
        export = json.load(open(f"{out_dir}/oracle_sql.json"))
    except FileNotFoundError:
        sys.exit(f"check_incremental_adversarial: no oracle_sql.json in "
                 f"{out_dir} — re-run Verify first (tools/run.sh graft.Verify "
                 f"/root/testdata/sf0.01 {out_dir})")
    if "dd_incremental" not in export:
        sys.exit("check_incremental_adversarial: oracle_sql.json has no "
                 "'dd_incremental' — stale export; re-run Verify first")

    snap_a, snap_b = build_snapshots()
    want, digests, base_reps, n_exact = reference(snap_a, snap_b)
    want_x = reference(snap_a, snap_b, thr=T_X)[0]
    delta_sets = {d: shingle_set(t) for d, t in snap_b
                  if d % 5 == 4 and d not in
                  {r[0] for r in want if r[1] == "exact_dup"}}
    failures = 0

    # 1. plant-engagement proofs
    eng_ok = True
    # the IEEE epsilon boundary is real at T_X: the product over-rounds
    if not (math.ceil(100 * T_X) == 56 and not (55 >= 100 * T_X)):
        eng_ok = False
        print(f"✗ engagement: 100*{T_X} no longer over-rounds in IEEE — the "
              "epsilon plant is dead")
    g = sim_near(delta_sets, base_reps, guarded=True)
    want_near = {r[0]: (r[2], r[3]) for r in want if r[1] == "near_dup"}
    if g != want_near:
        eng_ok = False
        print(f"   engagement: guarded simulation != brute force "
              f"({sorted(set(g) ^ set(want_near))})")
    g_x = sim_near(delta_sets, base_reps, guarded=True, t=T_X)
    want_near_x = {r[0]: (r[2], r[3]) for r in want_x if r[1] == "near_dup"}
    if g_x != want_near_x:
        eng_ok = False
        print(f"   engagement (t={T_X}): guarded simulation != brute force "
              f"({sorted(set(g_x) ^ set(want_near_x))})")
    eps_id = next(d for d, t in snap_b
                  if t is not None and t.startswith("t55a0 "))
    u_x = sim_near(delta_sets, base_reps, guarded=False, t=T_X)
    if eps_id in g_x and eps_id not in u_x:
        print(f"✓ engagement: unguarded pruning at t={T_X} drops doc "
              f"{eps_id} (prefix + length-filter over-ceiling)")
    else:
        eng_ok = False
        print(f"✗ engagement: doc {eps_id} SURVIVES unguarded pruning at "
              f"t={T_X} — the plant no longer sits on the boundary")
    boundary_id = next(d for d, t in snap_b
                       if t is not None and t.startswith("xa0 "))
    s = sim_near(delta_sets, base_reps, guarded=True, probe_shrink=1)
    if boundary_id in g and boundary_id not in s:
        print(f"✓ engagement: prefix one-short drops doc {boundary_id} "
              "(default-t last-slot pin)")
    else:
        eng_ok = False
        print(f"✗ engagement: doc {boundary_id} not pinned to the last "
              "prefix slot")
    s_x = sim_near(delta_sets, base_reps, guarded=True, probe_shrink=1, t=T_X)
    if eps_id in g_x and eps_id not in s_x:
        print(f"✓ engagement: prefix one-short drops doc {eps_id} "
              f"(t={T_X} last-slot pin)")
    else:
        eng_ok = False
        print(f"✗ engagement: doc {eps_id} not pinned to the last prefix "
              f"slot at t={T_X}")
    control_id = next(d for d, t in snap_b
                      if t is not None and t.startswith("ya0 "))
    if any(r[0] == control_id and r[1] == "unique" for r in want):
        print(f"✓ engagement: below-threshold control {control_id} stays "
              "unique (21/55)")
    else:
        eng_ok = False
        print(f"✗ engagement: control {control_id} is not unique in the "
              "reference — plant drifted")
    # at T_X the default-t boundary pair (J = 0.4) is itself a control
    if any(r[0] == boundary_id and r[1] == "unique" for r in want_x):
        print(f"✓ engagement: J=0.4 pair {boundary_id} stays unique at "
              f"t={T_X}")
    else:
        eng_ok = False
        print(f"✗ engagement: J=0.4 pair {boundary_id} not unique at t={T_X}")
    if not eng_ok:
        failures += 1
    print(f"{'✓' if eng_ok else '✗'} plant engagement "
          f"({n_exact} exact / {len(want_near)} near of {len(want)} delta "
          f"rows; {len(want_near_x)} near at t={T_X})")

    # 2. the REAL operators: store from snapshot A, delta from snapshot B
    with tempfile.TemporaryDirectory(prefix="incr_adv_") as tmp:
        da, db, dout = (os.path.join(tmp, x) for x in ("a", "b", "out"))
        os.makedirs(da)
        os.makedirs(db)
        write_corpus(snap_a, da)
        write_corpus(snap_b, db)
        stats = run_drive(da, db, dout)
        on = read_verdicts(os.path.join(dout, "on"))
        off = read_verdicts(os.path.join(dout, "off"))
        on_x = read_verdicts(os.path.join(dout, "on_x"))
        off_x = read_verdicts(os.path.join(dout, "off_x"))

        spark_ok = rows_equal(on, want)
        if not rows_equal(on_x, want_x):
            spark_ok = False
        if on_x != off_x:
            spark_ok = False
            print(f"   bloom on/off outputs differ at t={T_X}")
        print(f"{'✓' if spark_ok else '✗'} spark verdicts match the "
              f"brute-force reference at t={T} and t={T_X} (same store)")
        if not spark_ok:
            failures += 1

        # bloom on/off bit-identical + the screen stats prove BOTH halves
        # of the contract ran: false positives reached the confirm join
        # (passed > n_exact) and definite negatives were screened
        # (passed < total)
        par_ok = True
        if on != off:
            par_ok = False
            print("   bloom-on and bloom-off outputs differ")
        total, passed = stats["probes_total"], stats["probes_passed"]
        n_delta = len(want)
        if total != n_delta:
            par_ok = False
            print(f"   screen saw {total} probes, expected {n_delta}")
        if not (n_exact < passed < total):
            par_ok = False
            print(f"   screen stats passed={passed} (exact={n_exact}, "
                  f"total={total}) — no false positive reached the confirm "
                  "join, or the screen screened nothing")
        else:
            print(f"✓ screen engagement: {passed - n_exact} Bloom false "
                  f"positives join-rejected; {total - passed} definite "
                  "negatives skipped the store join")
        print(f"{'✓' if par_ok else '✗'} bloom on/off parity + screen "
              "engagement")
        if not par_ok:
            failures += 1

    print(f"== {3 - failures} pass, {failures} fail")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
