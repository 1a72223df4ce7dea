#!/usr/bin/env python3
"""Adversarial check for the SKETCH-DEDUP family's banding/threshold
boundaries on the SPARK side: dd_simhash, dd_minhash, mm_phash.

These are the no-oracle operators (data-dependent xxhash64 / byte-pooled
fingerprints are DuckDB-inexpressible in the general case), so a corpus
hash match cannot exist; their shipped certification is planted specs on
the shipped corpora — which, like every shipped corpus, never places a
pair EXACTLY on the operators' decision boundaries:

  dd_simhash (maxHamming=3, four 16-bit bands over the vote fingerprint)
    S1  a pair at Hamming EXACTLY 3, flips spread over 3 distinct bands
        (exactly one intact band carries the candidate) — must be KEPT
        with hamming=3 (the <= boundary).
    S2a a pair at Hamming 4 whose flips touch all 4 bands — never a
        candidate (the pigeonhole bound's first miss) — must be ABSENT.
    S2b a pair at Hamming 4 whose flips spare a band — IS a candidate,
        the verify filter must drop it (4 > 3, the boundary's far side).
    S3  tie semantics: the 2-word doc's mask bits are all VOTE TIES
        (2·ones == n -> bit unset); S1/S2 are computed against it, so a
        tie-breaking regression (>= for >) moves the planted Hammings.
    S4  occurrence weighting: fp("q q r") == fp("q") (majority of 3 with
        a doubled word collapses to the doubled word's hash) — the two
        different texts must group and emit an intra pair at hamming 0.
  dd_minhash (k=32, bands=8x4, threshold=0.5 -> agreement >= 16)
    M1  signature agreement EXACTLY 16/32 with one aligned band — KEPT
        with est_jaccard exactly 0.5.
    M2  agreement 15/32 with an aligned band — candidate generated, the
        threshold filter must drop it (15/32 < 0.5).
    M3  agreement 16/32 with NO aligned 4-wide band — est clears the
        threshold but banding never surfaces the pair: must be ABSENT
        (the documented recall trade; proves candidates really come from
        aligned-slice equality, not an all-pairs scan).
  mm_phash (DHash64, maxHamming=10, four 16-bit bands, stride-25 plants)
    The 65-byte payload trick: with exactly one byte per pooling span,
    bit i of DHash64 is [byte[i+1] > byte[i]] — so a payload can be
    CONSTRUCTED for any target fingerprint (+1 step = bit set, repeat =
    bit unset; equality is NOT a gradient). Plants:
    F1  pair differing in exactly 10 bits inside band 0 — kept, h=10.
    F2  pair differing in 11 bits inside band 0 — candidate via bands
        1-3, verify must drop it (11 > 10).
    F3  pair differing at bits {0,16,32,48} — each band's LOW edge; all
        four bands touched, must be ABSENT (a banding shifted right by
        one would leave a band intact and surface it).
    F4  pair differing at bits {15,31,47,63} — each band's HIGH edge
        including the sign bit; must be ABSENT (catches a left-shifted
        banding and sign-extension mistakes symmetrically).
    F5  both fingerprints NEGATIVE (bit 63 set, shared band 3), 10 flips
        across bands 0-2 — kept h=10 THROUGH the negative band key
        (pins the arithmetic-shiftright + mask band extraction).
    F6  pair differing at the band-0/band-1 seam bits {15,16} — kept
        h=2 via intact bands 2,3.
    F7  byte-DIFFERENT payloads with IDENTICAL fingerprints — must
        collapse to one group and emit an intra pair at hamming 0
        (grouping is by fingerprint, not by digest).
    F8  identical payloads SHORTER than 65 bytes — the sub-span filter
        must exclude them entirely.
    ST  one doc at id 50 (stride 25) whose three 'e' sites each flip
        exactly one gradient bit under translate(e->d,o->n): the planted
        re-encode pair (-51, 50) must be kept at hamming EXACTLY 3.

Ground truth is an independent Python replica of the full pipelines —
Spark's XXH64 (validated value-for-value against catalyst XxHash64 for
every per-type framing the operators use), the word/shingle/vote/banding
semantics, DHash64's span pooling, fingerprint-group collapse and member
expansion. The plants were searched offline against this replica; their
boundary properties are re-asserted here first (plant engagement), so a
hash/primitive drift fails loudly instead of silently degrading the
plants to ordinary inputs.

Beyond the plants, the gate replays all three replicas over the WHOLE
verify corpus (every real document, pair-for-pair against the fresh
Verify dump) — these are no-oracle operators, so this is their only
corpus-scale certification; the plants alone cover boundaries, not
distributional behavior.

Usage: python3 tools/check_sketch_adversarial.py <verify_out_dir> [sf_dir]
"""
import os
import subprocess
import sys
import tempfile

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ---------------------------------------------------------------- xxh64
M64 = (1 << 64) - 1
P1, P2, P3, P4, P5 = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x85EBCA77C2B2AE63,
                      0x27D4EB2F165667C5)


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix(h):
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def _hash_long(l, seed):
    h = (seed + P5 + 8) & M64
    h ^= (_rotl((l & M64) * P2 & M64, 31) * P1) & M64
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)


def _hash_int(i, seed):
    h = (seed + P5 + 4) & M64
    h ^= ((i & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)


def _hash_bytes(b, seed):
    n, off = len(b), 0
    if n >= 32:
        v = [(seed + P1 + P2) & M64, (seed + P2) & M64, seed & M64,
             (seed - P1) & M64]
        while off + 32 <= n:
            for k in range(4):
                w = int.from_bytes(b[off + 8 * k:off + 8 * k + 8], "little")
                v[k] = (_rotl((v[k] + w * P2) & M64, 31) * P1) & M64
            off += 32
        h = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12)
             + _rotl(v[3], 18)) & M64
        for vk in v:
            h ^= (_rotl((vk * P2) & M64, 31) * P1) & M64
            h = (h * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while off + 8 <= n:
        k1 = int.from_bytes(b[off:off + 8], "little")
        h ^= (_rotl((k1 * P2) & M64, 31) * P1) & M64
        h = (_rotl(h, 27) * P1 + P4) & M64
        off += 8
    if off + 4 <= n:
        h ^= (int.from_bytes(b[off:off + 4], "little") * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        off += 4
    while off < n:
        h ^= (b[off] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        off += 1
    return _fmix(h)


def _signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def xx_str(s, seed=42):
    """Spark xxhash64(string) — signed."""
    return _signed(_hash_bytes(s.encode("utf-8"), seed & M64))


def xx_long_int(l, i, seed=42):
    """Spark xxhash64(long, int_literal) — the minhash family rehash."""
    return _signed(_hash_int(i, _hash_long(l, seed & M64)))


# ------------------------------------------------------------- replicas
def popcount(x):
    return bin(x).count("1")


def bands16(fp):
    return tuple((fp >> (16 * b)) & 0xFFFF for b in range(4))


def band_spread(mask):
    return {j // 16 for j in range(64) if (mask >> j) & 1}


def simhash_fp(text):
    """SimHash64 / Dedup.simhashFingerprints: per-occurrence bit votes,
    bit set iff 2*ones > n (ties unset)."""
    ws = text.split(" ")
    ones = [0] * 64
    for w in ws:
        h = xx_str(w) & M64
        for j in range(64):
            if (h >> j) & 1:
                ones[j] += 1
    return sum(1 << j for j in range(64) if 2 * ones[j] > len(ws))


def shingle_hashes(text):
    """hashedShingles(text, 3): distinct xxhash64 of 3-word windows
    (whole text when shorter)."""
    ws = text.split(" ")
    sh = ([" ".join(ws)] if len(ws) < 3
          else [" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)])
    return set(xx_str(s) for s in sh)


def minhash_sig(text, k=32):
    hs = shingle_hashes(text)
    return tuple(min(xx_long_int(h, i) for h in hs) for i in range(k))


def sig_agree(sa, sb):
    return sum(1 for a, b in zip(sa, sb) if a == b)


def aligned_bands(sa, sb, rows=4):
    return [b for b in range(len(sa) // rows)
            if sa[rows * b:rows * b + rows] == sb[rows * b:rows * b + rows]]


def dhash(bs):
    """graft.functions.DHash64: 65-span average pooling, gradient signs."""
    n = len(bs)
    if n == 0:
        return 0
    means = []
    for b in range(65):
        lo, hi = b * n // 65, (b + 1) * n // 65
        means.append(sum(bs[lo:hi]) / (hi - lo) if hi > lo else 0.0)
    return sum(1 << i for i in range(64) if means[i + 1] > means[i])


def expand(rep_pairs, groups, self_score=0):
    """expandPairs: cross pairs inherit the rep score, intra pairs get
    self_score; groups: {rep: sorted members}."""
    out = {}
    for (a, b), sc in rep_pairs.items():
        for x in groups[a]:
            for y in groups[b]:
                out[(min(x, y), max(x, y))] = sc
    for g in groups.values():
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                out[(g[i], g[j])] = self_score
    return out


def group_by(fps):
    """{doc: key} -> {rep: sorted members} with rep = min doc id."""
    gs = {}
    for d in sorted(fps):
        gs.setdefault(fps[d], []).append(d)
    return {min(g): g for g in gs.values()}


def want_simhash(docs, max_hamming=3):
    fps = {d: simhash_fp(t) for d, t in docs if t is not None}
    groups = group_by(fps)
    rep_fp = {r: fps[r] for r in groups}
    rl = sorted(groups)
    pairs = {}
    for i, a in enumerate(rl):
        for b in rl[i + 1:]:
            h = popcount(rep_fp[a] ^ rep_fp[b])
            if h <= max_hamming and any(
                    x == y for x, y in zip(bands16(rep_fp[a]), bands16(rep_fp[b]))):
                pairs[(a, b)] = h
    return expand(pairs, groups, self_score=0)


def want_minhash(docs, threshold=0.5, k=32):
    sigs = {d: minhash_sig(t) for d, t in docs if t is not None}
    groups = group_by(sigs)
    rep_sig = {r: sigs[r] for r in groups}
    rl = sorted(groups)
    pairs = {}
    for i, a in enumerate(rl):
        for b in rl[i + 1:]:
            if aligned_bands(rep_sig[a], rep_sig[b]):
                est = sig_agree(rep_sig[a], rep_sig[b]) / k
                if est >= threshold:
                    pairs[(a, b)] = est
    return expand(pairs, groups, self_score=1.0)


def want_phash(docs, max_hamming=10, stride=25):
    """mm_phash_reenc: text bytes as payload, stride plants under the
    mirrored id, >= 65-byte filter, fingerprint-group banding."""
    media = {d: t.encode("utf-8") for d, t in docs if t is not None}
    for d, t in docs:
        if t is not None and d % stride == 0:
            media[-(d + 1)] = (t.translate(str.maketrans("eo", "dn"))
                               .encode("utf-8"))
    fps = {d: dhash(p) for d, p in media.items() if len(p) >= 65}
    groups = group_by(fps)
    rep_fp = {r: fps[r] for r in groups}
    rl = sorted(groups)
    pairs = {}
    for i, a in enumerate(rl):
        for b in rl[i + 1:]:
            h = popcount(rep_fp[a] ^ rep_fp[b])
            if h <= max_hamming and any(
                    x == y for x, y in zip(bands16(rep_fp[a]), bands16(rep_fp[b]))):
                pairs[(a, b)] = h
    return expand(pairs, groups, self_score=0)


# ---------------------------------------------------------------- plants
# offline-searched words (see module doc): U/V span a 13-bit xor mask over
# all 4 bands; X3 flips 3 mask bits in 3 bands, YA 4 bits in 4 bands,
# YB 4 bits in <= 3 bands.
U, V, X3, YA, YB = "w174", "w891", "w11", "w109", "w7"

MH_BASE = " ".join(f"mh{i}" for i in range(40))


def _mh(trial, idxs):
    ws = MH_BASE.split(" ")
    for ix in idxs:
        ws[ix] = f"mx{trial}_{ix}"
    return " ".join(ws)


# offline-searched mutations: M1 agree 16 + aligned band, M2 agree 15 +
# aligned band, M3 agree 16 + NO aligned band
MH_M1 = _mh(3395, [0, 4, 5, 10, 11, 20, 21, 35])
MH_M2 = _mh(121, [0, 5, 14, 19, 24, 26, 34, 39])
MH_M3 = _mh(611, [0, 2, 4, 13, 14, 19, 21, 39])


def text_docs():
    return [
        (101, f"{U} {V} {X3}"),   # S1: h=3 vs 102
        (102, f"{U} {V}"),        # S3: the all-ties doc
        (103, f"{U} {V} {YA}"),   # S2a: h=4, 4 bands
        (104, f"{U} {V} {YB}"),   # S2b: h=4, <=3 bands
        (105, "mq0 mq0 mr0"),     # S4: fp == fp("mq0")
        (106, "mq0"),
        (107, "dupa dupb dupc dupd"),   # exact-dup clique
        (108, "dupa dupb dupc dupd"),
        (109, ""),                # degenerate empty text
        (110, None),              # null text: excluded everywhere
        (111, "iso1 iso2 iso3 iso4"),   # isolated filler
        (121, MH_BASE),
        (122, MH_M1),
        (123, MH_M2),
        (124, MH_M3),
    ]


def _payload_fp(fp, base=33):
    bs = [base]
    for i in range(64):
        bs.append(bs[-1] + 1 if (fp >> i) & 1 else bs[-1])
    return bytes(bs).decode("ascii")


def _bits(*xs):
    m = 0
    for x in xs:
        m |= 1 << x
    return m


F1M = _bits(17, 18, 19, 33, 34, 35, 49, 50, 51)
F1D = _bits(*range(10))
F2M = _bits(20, 21, 22, 36, 37, 38, 52, 53, 54)
F2D = _bits(*range(11))
F3M = _bits(23, 24, 25, 39, 40, 41, 55, 56, 57)
F3D = _bits(0, 16, 32, 48)
F4M = _bits(26, 27, 28, 42, 43, 44, 58, 59)
F4D = _bits(15, 31, 47, 63)
F5M = _bits(60, 61, 62, 63)
F5D = _bits(0, 1, 2, 3, 16, 17, 18, 32, 33, 34)
F6M = _bits(29, 30, 45, 46)
F6D = _bits(15, 16)
F7 = _bits(5, 6, 21, 37, 53)


def _stride_text():
    # three 'e' sites, each flipping exactly one gradient bit under
    # translate(e->d): [.., 100, 101, 97, ..] — bit p-1 flips set->unset,
    # bit p stays unset (97 beats neither 101 nor 100)
    bs = [90] * 65
    for p in (10, 30, 55):
        bs[p - 1], bs[p], bs[p + 1] = 100, 101, 97
    return bytes(bs).decode("ascii")


def media_docs():
    return [
        (201, _payload_fp(F1M)), (202, _payload_fp(F1M ^ F1D)),
        (203, _payload_fp(F2M)), (204, _payload_fp(F2M ^ F2D)),
        (206, _payload_fp(F3M)), (207, _payload_fp(F3M ^ F3D)),
        (208, _payload_fp(F4M)), (209, _payload_fp(F4M ^ F4D)),
        (211, _payload_fp(F5M)), (212, _payload_fp(F5M ^ F5D)),
        (213, _payload_fp(F6M)), (214, _payload_fp(F6M ^ F6D)),
        (216, _payload_fp(F7, base=33)), (217, _payload_fp(F7, base=50)),
        (218, "!" * 30), (219, "!" * 30),   # F8: under the 65-byte floor
        # null text at a STRIDE-ELIGIBLE id: the re-encode plant must skip
        # it (a mirrored -226 entry would mean a null payload got
        # fingerprinted)
        (225, None),
        (50, _stride_text()),               # ST: the one content stride id
    ]


# -------------------------------------------------------------- plumbing
def write_corpus(docs, dirpath):
    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array(["plant"] * len(docs), pa.string()),
        "n_chars": pa.array([len(t) if t else 0 for _, t in docs],
                            pa.int64()),
    })
    pq.write_table(tbl, os.path.join(dirpath, "documents.parquet"))


def run_spark(corpus_dir, out_dir, queries):
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [os.path.join(REPO, "tools", "run.sh"), "graft.Verify", corpus_dir,
         out_dir, queries],
        capture_output=True, text=True, env=env, timeout=600)
    failed = [ln for ln in r.stderr.splitlines() if "failed:" in ln]
    if r.returncode != 0 or failed:
        sys.exit("check_sketch_adversarial: Spark run failed:\n"
                 + "\n".join(failed or [r.stderr[-2000:]]))


def compare(name, got_rows, want, tol=1e-12):
    ok = True
    got = {(int(r[0]), int(r[1])): float(r[2]) for r in got_rows}
    if set(got) != set(want):
        ok = False
        print(f"   {name}: pair sets differ — missing "
              f"{sorted(set(want) - set(got))}, extra "
              f"{sorted(set(got) - set(want))}")
    else:
        for k in want:
            if abs(got[k] - want[k]) > tol:
                ok = False
                print(f"   {name}: score mismatch at {k}: "
                      f"{got[k]} != {want[k]}")
    return ok


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    for q in ("dd_simhash", "dd_minhash", "mm_phash"):
        if not os.path.isdir(os.path.join(out_dir, q)):
            sys.exit(f"check_sketch_adversarial: no {q}/ in {out_dir} — "
                     "re-run Verify first (tools/run.sh graft.Verify "
                     f"/root/testdata/sf0.01 {out_dir})")
    failures = 0
    tdocs, mdocs = text_docs(), media_docs()

    # 1. plant engagement: every boundary property the plants exist for,
    #    re-derived from the replica (so a primitive drift fails HERE)
    eng_ok = True

    def chk(cond, msg):
        nonlocal eng_ok
        print(("✓" if cond else "✗") + " engagement: " + msg)
        if not cond:
            eng_ok = False

    hu, hv = xx_str(U) & M64, xx_str(V) & M64
    mask = hu ^ hv
    chk(popcount(mask) == 13 and band_spread(mask) == {0, 1, 2, 3},
        f"simhash core mask: 13 bits over 4 bands (got {popcount(mask)})")
    fA, fB = simhash_fp(f"{U} {V} {X3}"), simhash_fp(f"{U} {V}")
    fA2, fA3 = simhash_fp(f"{U} {V} {YA}"), simhash_fp(f"{U} {V} {YB}")
    chk(fB == hu & hv,
        "2-word doc: every mask bit is a vote tie -> unset (fp = hu & hv)")
    chk(popcount(fA ^ fB) == 3 and len(band_spread(fA ^ fB)) == 3,
        "S1 at Hamming exactly 3, flips in 3 distinct bands")
    d2a = fA2 ^ fB
    chk(popcount(d2a) == 4 and len(band_spread(d2a)) == 4,
        "S2a at Hamming 4 touching all 4 bands (never a candidate)")
    d2b = fA3 ^ fB
    chk(popcount(d2b) == 4 and len(band_spread(d2b)) <= 3,
        "S2b at Hamming 4 sparing a band (candidate, verify must drop)")
    chk(simhash_fp("mq0 mq0 mr0") == simhash_fp("mq0"),
        "S4: doubled-word majority collapses to the doubled word's hash")
    s_base = minhash_sig(MH_BASE)
    for name, txt, ag, banded in (("M1", MH_M1, 16, True),
                                  ("M2", MH_M2, 15, True),
                                  ("M3", MH_M3, 16, False)):
        sb = minhash_sig(txt)
        a = sig_agree(s_base, sb)
        ab = aligned_bands(s_base, sb)
        chk(a == ag and bool(ab) == banded,
            f"{name}: agreement {a}/32 (want {ag}), aligned bands {ab} "
            f"(want {'some' if banded else 'none'})")
    f1a, f1b = dhash(_payload_fp(F1M).encode()), dhash(_payload_fp(F1M ^ F1D).encode())
    chk(f1a == F1M and f1b == F1M ^ F1D,
        "payload construction round-trips the target fingerprints")
    chk(popcount(f1a ^ f1b) == 10 and band_spread(f1a ^ f1b) == {0},
        "F1 at Hamming exactly 10 inside band 0")
    chk(popcount(F2D) == 11 and band_spread(F2D) == {0},
        "F2 at Hamming 11 inside band 0 (candidate, verify must drop)")
    chk(band_spread(F3D) == {0, 1, 2, 3} and band_spread(F4D) == {0, 1, 2, 3},
        "F3/F4 touch all four bands at their low/high edges")
    f5a = dhash(_payload_fp(F5M).encode())
    chk((f5a >> 63) & 1 == 1
        and bands16(f5a)[3] == bands16(dhash(_payload_fp(F5M ^ F5D).encode()))[3],
        "F5 fingerprints share the NEGATIVE band 3 (bit 63 set)")
    chk(dhash(_payload_fp(F7, base=33).encode())
        == dhash(_payload_fp(F7, base=50).encode()),
        "F7: byte-different payloads, identical fingerprints")
    st = _stride_text()
    tr = st.translate(str.maketrans("eo", "dn"))
    dd = dhash(st.encode()) ^ dhash(tr.encode())
    chk(popcount(dd) == 3 and band_spread(dd) == {0, 1, 3},
        "ST: translate flips exactly 3 bits sparing band 2")
    if not eng_ok:
        failures += 1
    print(f"{'✓' if eng_ok else '✗'} plant engagement")

    want_s = want_simhash(tdocs)
    want_m = want_minhash(tdocs)
    want_p = want_phash(mdocs)
    # the headline pairs must be exactly where the plants put them —
    # a replica bug that shifted ground truth would otherwise hide a
    # matching Spark shift
    gt_ok = True
    for cond, msg in (
            (want_s.get((101, 102)) == 3, "S1 (101,102) kept at h=3"),
            ((102, 103) not in want_s and (102, 104) not in want_s,
             "S2a/S2b absent"),
            (want_s.get((105, 106)) == 0, "S4 intra pair at h=0"),
            (want_m.get((121, 122)) == 0.5, "M1 kept at est exactly 0.5"),
            ((121, 123) not in want_m and (121, 124) not in want_m,
             "M2/M3 absent"),
            (want_p.get((201, 202)) == 10, "F1 kept at h=10"),
            ((203, 204) not in want_p, "F2 absent"),
            ((206, 207) not in want_p and (208, 209) not in want_p,
             "F3/F4 absent"),
            (want_p.get((211, 212)) == 10, "F5 kept through the negative band"),
            (want_p.get((213, 214)) == 2, "F6 seam pair kept at h=2"),
            (want_p.get((216, 217)) == 0, "F7 intra pair at h=0"),
            (all(218 not in k and 219 not in k for k in want_p),
             "F8 short payloads excluded"),
            (want_p.get((-51, 50)) == 3, "ST re-encode pair kept at h=3"),
            (all(110 not in k for k in list(want_s) + list(want_m))
             and all(225 not in k and -226 not in k for k in want_p),
             "null-text docs pair with nothing; the stride plant skips "
             "the null at id 225 (no -226 mirror)")):
        if not cond:
            gt_ok = False
            print(f"   ground truth: {msg} VIOLATED")
    print(f"{'✓' if gt_ok else '✗'} replica ground truth carries every "
          f"planted verdict ({len(want_s)}/{len(want_m)}/{len(want_p)} "
          "simhash/minhash/phash true pairs)")
    if not gt_ok:
        failures += 1

    # 2+3. the REAL Spark operators on the planted corpora
    with tempfile.TemporaryDirectory(prefix="sketch_adv_") as tmp:
        tc = os.path.join(tmp, "text_corpus")
        mc = os.path.join(tmp, "media_corpus")
        os.makedirs(tc)
        os.makedirs(mc)
        write_corpus(tdocs, tc)
        write_corpus(mdocs, mc)
        tout = os.path.join(tmp, "tout")
        mout = os.path.join(tmp, "mout")
        run_spark(tc, tout, "dd_simhash,dd_minhash")
        run_spark(mc, mout, "mm_phash")
        con = duckdb.connect()
        text_ok = True
        for qname, want, scol, out in (
                ("dd_simhash", want_s, "hamming", tout),
                ("dd_minhash", want_m, "est_jaccard", tout)):
            rows = con.sql(f"SELECT a, b, {scol} FROM "
                           f"'{out}/{qname}/*.parquet' ORDER BY a, b").fetchall()
            if not compare(f"spark {qname}", rows, want):
                text_ok = False
        print(f"{'✓' if text_ok else '✗'} spark dd_simhash/dd_minhash on "
              f"planted corpus ({len(want_s)}/{len(want_m)} true pairs)")
        if not text_ok:
            failures += 1
        rows = con.sql(f"SELECT a, b, hamming FROM "
                       f"'{mout}/mm_phash/*.parquet' ORDER BY a, b").fetchall()
        phash_ok = compare("spark mm_phash", rows, want_p)
        print(f"{'✓' if phash_ok else '✗'} spark mm_phash on planted corpus "
              f"({len(want_p)} true pairs)")
        if not phash_ok:
            failures += 1

    # 4. the REAL corpus, pair-for-pair: the sketch family is no-oracle,
    #    so the fresh Verify dump vs the replicas over every document is
    #    its only corpus-scale certification
    con2 = duckdb.connect()
    corpus = [(int(d), t) for d, t in con2.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'").fetchall()]
    corpus_ok = True
    for q, want, scol in (("dd_simhash", want_simhash(corpus), "hamming"),
                          ("dd_minhash", want_minhash(corpus), "est_jaccard"),
                          ("mm_phash", want_phash(corpus), "hamming")):
        rows = con2.sql(f"SELECT a, b, {scol} FROM "
                        f"'{out_dir}/{q}/*.parquet' ORDER BY a, b").fetchall()
        if not compare(f"corpus {q}", rows, want):
            corpus_ok = False
    print(f"{'✓' if corpus_ok else '✗'} spark sketch family on the REAL "
          f"corpus ({len(corpus)} docs, pair-for-pair vs the replicas)")
    if not corpus_ok:
        failures += 1

    print(f"== {5 - min(failures, 5)} pass, {min(failures, 5)} fail")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
