package graft

/** DuckDB oracle twins for [[SparkEntry.queries]].
  *
  * Written against the same parquet files the Spark side reads; the driver
  * substitutes table names for parquet paths (tables are referenced by bare
  * name). Column names and final types are kept bit-identical with the Spark
  * results: decimal casts mirror the Spark side exactly, so distributed
  * summation order can never change a value.
  */
object OracleSql {

  private val rev = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"

  /** The fixed-point ⌊2²⁰·log₂⌋ recurrence ([[graft.operators.TextAnalysis.log2Fp]])
    * as CTE text: reads `dfreq(term, df)` and `stats(n, …)` from the
    * enclosing query, yields `idf(term, idf_fp)`. ONE definition shared by
    * the tx_bm25 and decon_bm25 twins — the recurrence is the part of
    * those oracles most likely to be retuned (round count, shift width,
    * DECIMAL widening), and two hand-copied blocks would let a fix to one
    * silently desynchronize the other.
    */
  private val log2FpIdfCtes: String =
    s"""ib AS (
       |  SELECT term,
       |    CAST(2*n + 2 AS BIGINT) AS num, CAST(2*df + 1 AS BIGINT) AS den,
       |    CAST(length(bin(CAST((2*n + 2) // (2*df + 1) AS BIGINT))) - 1
       |         AS BIGINT) AS e
       |  FROM dfreq, stats),
       |it AS (
       |  SELECT term, e, 0 AS i,
       |    (num * CAST(1073741824 AS BIGINT))
       |      // (den * (CAST(1 AS BIGINT) << e)) AS r,
       |    CAST(0 AS BIGINT) AS frac
       |  FROM ib
       |  UNION ALL
       |  SELECT term, e, i + 1,
       |    CASE WHEN ((r*r) >> 30) >= CAST(2147483648 AS BIGINT)
       |         THEN ((r*r) >> 30) >> 1 ELSE (r*r) >> 30 END,
       |    CASE WHEN ((r*r) >> 30) >= CAST(2147483648 AS BIGINT)
       |         THEN (frac << 1) | 1 ELSE frac << 1 END
       |  FROM it WHERE i < 20),
       |idf AS (SELECT term, (e << 20) | frac AS idf_fp FROM it WHERE i = 20)""".stripMargin

  /** The same log2Fp recurrence in its GENERIC keyed form (den = 1 —
    * the [[graft.operators.TextAnalysis.log2FpSql]] twin): reads
    * `lin$sfx(key, v)` from the enclosing query, yields
    * `lg$sfx(key, fp)`. Parameterized by suffix because a consumer may
    * need the recurrence TWICE in one query (samp_dsir's Gumbel key is a
    * log of a log — the second pass reads the first's output); `lg` is
    * MATERIALIZED because consumers join it repeatedly and a recursive
    * CTE inlined per reference re-runs all 20 rounds per join side.
    */
  private def log2FpValCtes(sfx: String): String =
    s"""lb$sfx AS (
       |  SELECT key, CAST(v AS BIGINT) AS num,
       |    CAST(length(bin(CAST(v AS BIGINT))) - 1 AS BIGINT) AS e
       |  FROM lin$sfx),
       |lt$sfx AS (
       |  SELECT key, e, 0 AS i,
       |    (num * CAST(1073741824 AS BIGINT)) // (CAST(1 AS BIGINT) << e) AS r,
       |    CAST(0 AS BIGINT) AS frac
       |  FROM lb$sfx
       |  UNION ALL
       |  SELECT key, e, i + 1,
       |    CASE WHEN ((r*r) >> 30) >= CAST(2147483648 AS BIGINT)
       |         THEN ((r*r) >> 30) >> 1 ELSE (r*r) >> 30 END,
       |    CASE WHEN ((r*r) >> 30) >= CAST(2147483648 AS BIGINT)
       |         THEN (frac << 1) | 1 ELSE frac << 1 END
       |  FROM lt$sfx WHERE i < 20),
       |lg$sfx AS MATERIALIZED (
       |  SELECT key, (e << 20) | frac AS fp FROM lt$sfx WHERE i = 20)""".stripMargin

  /** `floor(value·100)` as BIGINT — the ONE cents quantization of the
    * events value column; the twin of `Relational.centsCol`, shared by
    * every value-quantizing oracle so the definition cannot drift per
    * query.
    */
  private val centsSql = "CAST(floor(value * 100) AS BIGINT)"

  /** [[centsSql]] with multiples of `mod` blanked to NULL —
    * `Relational.synthCents`' twin (LOCF / interpolation / null-ordering).
    */
  private def synthCentsSql(mod: Int): String =
    s"CASE WHEN $centsSql % $mod = 0 THEN NULL ELSE $centsSql END"

  /** The int8 quantize subquery — `Similarity.int8Codes`' twin, the ONE
    * SQL spelling of the scheme (per-vector max-abs scale, floor, zero
    * vector → all-zero codes). Yields (vec_id, q); shared by ann_sq,
    * embed_quantize (which also needs maxabs and so keeps its own
    * maxabs-projecting copy of the inner scan), and embed_rp, so the
    * quantization definition cannot drift per query.
    */
  private val int8CodesSql: String =
    """SELECT vec_id,
      |    CASE WHEN maxabs = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
      |         ELSE list_transform(embedding,
      |                x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / maxabs)) AS BIGINT)) END AS q
      |  FROM (SELECT vec_id, embedding,
      |          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
      |        FROM embeddings)""".stripMargin

  /** `Clustering.embed_rp`'s twin: the int8 codes are [[int8CodesSql]]
    * (embed_quantize's exact scheme), and each projection inlines the SAME
    * [[graft.operators.Clustering.rpSigns]] row as a list literal — the
    * mixtureWeights shared-constant device, so operator and oracle derive
    * one sign matrix. Dims are pinned to the testdata's 64: a generator
    * change to MORE dims surfaces here (the Spark side probes dims and
    * would emit wider sums); a shrink below 64 passes benignly — q[j]
    * beyond the list is NULL and list_sum skips NULLs, so both engines
    * compute the same shorter sums. All arithmetic is 64-bit integer.
    */
  private val embedRpSql: String = {
    val projCols = graft.operators.Clustering.rpSigns(8, 64).zipWithIndex
      .map { case (row, i) =>
        s"CAST(list_sum(list_transform(generate_series(1, 64), " +
          s"j -> q[j] * ([${row.mkString(",")}])[j])) AS BIGINT) AS p$i"
      }.mkString(",\n  ")
    s"""SELECT vec_id,
       |  $projCols
       |FROM ($int8CodesSql)
       |ORDER BY vec_id""".stripMargin
  }

  /** `Graph.plantedEdges`' twin: the deterministic citation edges, the
    * same three congruences, self-loops dropped, duplicates collapsed.
    * Spelled with the dd_lines struct-unnest device — a bare
    * `unnest(...) AS dst` under DISTINCT/GROUP BY trips a DuckDB internal
    * binder error ("Failed to bind column reference"), while unnesting a
    * struct list and projecting its fields binds fine.
    */
  private val graphEdgesSql: String =
    """SELECT DISTINCT p.src AS src, p.dst AS dst FROM (
      |    SELECT unnest([
      |      {'src': doc_id, 'dst': doc_id % 10},
      |      {'src': doc_id, 'dst': doc_id // 2},
      |      {'src': doc_id, 'dst': (doc_id*31+7) % n}]) AS p
      |    FROM documents, (SELECT count(*) AS n FROM documents)) raw
      |  WHERE p.src <> p.dst""".stripMargin

  /** `Graph.graph_pagerank`'s twin — the 3 fixed-point iterations unrolled
    * programmatically (one template, so the rounds cannot drift from each
    * other); both integer-division sites (`// outdeg`, damping `// 1000`)
    * mirror the Spark `div` exactly.
    */
  /** The shared PageRank CTE chain (edges / od / pr0 / it1..it3) — the
    * WITH body the rank twin, the domain twin, and the release funnel all
    * prepend, so the iteration algebra lives exactly once in SQL as it
    * does in Scala ([[graft.operators.Graph.pagerankRanks]]).
    */
  private val pagerankCoreCtes: String = {
    val iters = 3
    def round(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT d.doc_id AS v,
         |    CAST(150000 + (850 * COALESCE(sc, 0)) // 1000 AS BIGINT) AS pr
         |  FROM documents d LEFT JOIN (
         |    SELECT dst AS v, sum(pr // outdeg) AS sc
         |    FROM edges JOIN od USING (src) JOIN $prev p ON p.v = edges.src
         |    GROUP BY dst) c ON c.v = d.doc_id)""".stripMargin
    val rounds = (1 to iters)
      .map(i => round(if (i == 1) "pr0" else s"it${i - 1}", s"it$i"))
      .mkString(",\n")
    s"""edges AS (
       |  $graphEdgesSql),
       |od AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |pr0 AS (SELECT doc_id AS v, CAST(1000000 AS BIGINT) AS pr FROM documents),
       |$rounds""".stripMargin
  }

  private val graphPagerankSql: String =
    s"""WITH $pagerankCoreCtes
       |SELECT v AS doc_id, pr, CAST(COALESCE(outdeg, 0) AS BIGINT) AS outdeg
       |FROM it3 LEFT JOIN od ON od.src = it3.v
       |ORDER BY pr DESC, doc_id LIMIT 20""".stripMargin

  /** `Graph.graph_hits`' twin — the HITS rounds unrolled from one
    * template (the [[pagerankCoreCtes]] device); both max-normalization
    * floors mirror the Spark `div`, and every sum/max is cast back to
    * BIGINT (DuckDB widens BIGINT aggregates to HUGEINT — dtype drift in
    * the compare otherwise).
    */
  private val hitsCoreCtes: String = {
    val iters = 3
    def round(prev: String, i: Int): String =
      s"""hraw$i AS (
         |  SELECT src AS v, CAST(sum(a) AS BIGINT) AS hr
         |  FROM edges JOIN $prev p ON p.v = edges.dst GROUP BY src),
         |hmax$i AS (SELECT CAST(max(hr) AS BIGINT) AS hm FROM hraw$i),
         |h$i AS (
         |  SELECT d.doc_id AS v,
         |    CAST((1000000 * COALESCE(hr, 0)) // hm AS BIGINT) AS h
         |  FROM documents d LEFT JOIN hraw$i ON hraw$i.v = d.doc_id, hmax$i),
         |araw$i AS (
         |  SELECT dst AS v, CAST(sum(h) AS BIGINT) AS ar
         |  FROM edges JOIN h$i p ON p.v = edges.src GROUP BY dst),
         |amax$i AS (SELECT CAST(max(ar) AS BIGINT) AS am FROM araw$i),
         |a$i AS (
         |  SELECT d.doc_id AS v,
         |    CAST((1000000 * COALESCE(ar, 0)) // am AS BIGINT) AS a
         |  FROM documents d LEFT JOIN araw$i ON araw$i.v = d.doc_id, amax$i)""".stripMargin
    val rounds = (1 to iters)
      .map(i => round(if (i == 1) "a0" else s"a${i - 1}", i)).mkString(",\n")
    s"""edges AS (
       |  $graphEdgesSql),
       |a0 AS (SELECT doc_id AS v, CAST(1000000 AS BIGINT) AS a FROM documents),
       |$rounds""".stripMargin
  }

  private val graphHitsSql: String =
    s"""WITH $hitsCoreCtes
       |SELECT a3.v AS doc_id, a3.a AS auth, h3.h AS hub
       |FROM a3 JOIN h3 ON h3.v = a3.v
       |ORDER BY auth DESC, doc_id LIMIT 20""".stripMargin

  /** `Similarity.ann_ivfpq`'s full chain, ending at `ivfpqrk` (q_id,
    * vec_id, dist, rank) — shared by the plain and refined twins. Coarse
    * quantizer = the 32 lowest-vec_id vectors; corpus residuals re-cast
    * to FLOAT exactly like `ivfpqIndex`'s encode path; the PQ training is
    * [[pqCoreCtes]] pointed at `resid`; query residuals stay DOUBLE (the
    * adcSearch driver path never float-casts them). Every fold is the
    * positional list_sum = left-to-right double device.
    */
  private def ivfpqChainCtes: String = {
    val (nlist, nprobe, m, sub, nQueries) = (32, 3, 8, 8, 8)
    val iters = 2 // pq rounds; every codebook reference below uses b$iters
    def sq(a: String, b: String) =
      s"""list_sum(list_transform(list_zip($a, $b),
         |      z -> (CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2])))""".stripMargin
    val adc = (0 until m)
      .map(sx => s"tabs[${sx + 1}][codes[${sx + 1}] + 1]").mkString(" + ")
    s"""cvec AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS c,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
       |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $nlist)),
       |casg AS MATERIALIZED (
       |  SELECT e.vec_id,
       |    CAST((min({'d': ${sq("e.embedding", "t.ce")}, 'c': t.c})).c AS INTEGER) AS cid
       |  FROM embeddings e, cvec t GROUP BY e.vec_id),
       |resid AS MATERIALIZED (
       |  SELECT e.vec_id,
       |    list_transform(list_zip(e.embedding, t.ce),
       |      z -> CAST(CAST(z[1] AS DOUBLE) - z[2] AS FLOAT)) AS embedding
       |  FROM embeddings e JOIN casg USING (vec_id) JOIN cvec t ON t.c = casg.cid),
       |${pqCoreCtes(m, 16, iters, sub, "resid")},
       |enc AS (
       |  SELECT v.vec_id, v.sp,
       |    (min({'d': list_sum(list_transform(list_zip(v.sv, b.ce),
       |          z -> (z[1] - z[2]) * (z[1] - z[2]))), 'c': b.c})).c AS code
       |  FROM sv v JOIN b$iters b ON b.sp = v.sp GROUP BY v.vec_id, v.sp),
       |cds AS MATERIALIZED (
       |  SELECT enc.vec_id, casg.cid, list(code ORDER BY sp) AS codes
       |  FROM enc JOIN casg ON casg.vec_id = enc.vec_id GROUP BY enc.vec_id, casg.cid),
       |qn AS (SELECT vec_id AS q_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qd
       |       FROM embeddings WHERE vec_id < $nQueries),
       |qprobe AS (
       |  SELECT q_id, qd, c AS cid FROM (
       |    SELECT q_id, qd, t.c AS c,
       |      row_number() OVER (PARTITION BY q_id ORDER BY
       |        list_sum(list_transform(list_zip(qd, t.ce),
       |          z -> (z[1] - z[2]) * (z[1] - z[2]))), t.c) AS rn
       |    FROM qn, cvec t)
       |  WHERE rn <= $nprobe),
       |qresid AS (
       |  SELECT q_id, cid, list_transform(list_zip(qd, t.ce), z -> z[1] - z[2]) AS rq
       |  FROM qprobe JOIN cvec t ON t.c = qprobe.cid),
       |qtabs AS MATERIALIZED (
       |  SELECT q_id, cid, list(tab ORDER BY sp) AS tabs FROM (
       |    SELECT qr.q_id, qr.cid, b.sp,
       |      list(list_sum(list_transform(list_zip(
       |          list_transform(generate_series(1, $sub), j -> qr.rq[b.sp * $sub + j]), b.ce),
       |        z -> (z[1] - z[2]) * (z[1] - z[2]))) ORDER BY b.c) AS tab
       |    FROM qresid qr, b$iters b GROUP BY qr.q_id, qr.cid, b.sp)
       |  GROUP BY q_id, cid),
       |ivfpqsc AS (
       |  SELECT q_id, c2.vec_id AS vec_id, $adc AS dist
       |  FROM cds c2 JOIN qtabs USING (cid)
       |  WHERE c2.vec_id <> q_id),
       |ivfpqrk AS (SELECT q_id, vec_id, dist,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS BIGINT)
       |    AS rank FROM ivfpqsc)""".stripMargin
  }

  /** `TextAnalysis.bpeTrain`'s merge loop unrolled — the LAST member of
    * the "sequentially iterative but deterministic" family to get a full
    * oracle, previously written off as inexpressible. The key: the
    * leftmost-greedy merge (Spark's `mergeFold` — fuse when the
    * accumulator's last symbol is `l` and the current is `r`) is exactly
    * "merge at candidate i unless candidate i−1 merged", whose closed
    * form is island parity: candidates at consecutive positions (only
    * possible when l = r) alternate starting true, so
    * `row_number() % 2 = 1` within each gaps-and-islands run of
    * consecutive candidates replays the recursion without one. Per round:
    * adjacent-pair histogram → argmax (n DESC, l, r — the Spark orderBy)
    * → positional rewrite (merge starts emit l||r, the consumed right
    * neighbor drops, everything else passes) → re-collect. Early stop is
    * the NULL-rule sentinel: an empty pair table yields a NULL rule whose
    * rewrite is the identity, matching the Scala loop's `done` flag.
    * Ends at `h<merges>` (the final vocabulary) and `top1..top<merges>`
    * (the rule table).
    */
  private def bpeCoreCtes(merges: Int): String = {
    val head =
      """h0 AS MATERIALIZED (
        |  SELECT w, cnt,
        |    list_append(CASE WHEN length(w) = 0 THEN ['']
        |      ELSE list_transform(generate_series(1, length(w)), i -> w[i]) END,
        |      '</w>') AS syms
        |  FROM (
        |    SELECT w, CAST(count(*) AS BIGINT) AS cnt
        |    FROM (SELECT unnest(string_split(text, ' ')) AS w
        |          FROM documents WHERE text IS NOT NULL)
        |    GROUP BY w))""".stripMargin
    val rounds = (1 to merges).map { i =>
      s"""p$i AS (
         |  SELECT l, r, CAST(sum(cnt) AS BIGINT) AS n FROM (
         |    SELECT cnt, syms[j] AS l, syms[j+1] AS r
         |    FROM h${i - 1}, UNNEST(generate_series(1, len(syms) - 1)) AS t(j)
         |    WHERE len(syms) >= 2)
         |  GROUP BY l, r),
         |top$i AS MATERIALIZED (
         |  SELECT l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1),
         |rule$i AS MATERIALIZED (
         |  SELECT * FROM top$i
         |  UNION ALL SELECT NULL, NULL, NULL WHERE (SELECT count(*) FROM top$i) = 0),
         |e$i AS (
         |  SELECT h.w, h.cnt, t.pos, h.syms[t.pos] AS sym, ru.l AS rl, ru.r AS rr,
         |    (h.syms[t.pos] = ru.l AND h.syms[t.pos + 1] = ru.r
         |     AND t.pos < len(h.syms)) AS cand
         |  FROM h${i - 1} h, rule$i ru,
         |    UNNEST(generate_series(1, len(h.syms))) AS t(pos)),
         |m$i AS (
         |  SELECT w, cnt, pos, sym, rl, rr, cand,
         |    CASE WHEN cand THEN
         |      (row_number() OVER (PARTITION BY w, cand, island ORDER BY pos)) % 2 = 1
         |    ELSE false END AS mstart
         |  FROM (
         |    SELECT *, pos - row_number() OVER (PARTITION BY w, cand ORDER BY pos) AS island
         |    FROM e$i)),
         |h$i AS MATERIALIZED (
         |  SELECT w, cnt, list(tok ORDER BY pos) AS syms FROM (
         |    SELECT w, cnt, pos,
         |      CASE WHEN mstart THEN rl || rr ELSE sym END AS tok,
         |      COALESCE(lag(mstart) OVER (PARTITION BY w ORDER BY pos), false) AS consumed
         |    FROM m$i)
         |  WHERE NOT consumed
         |  GROUP BY w, cnt)""".stripMargin
    }.mkString(",\n")
    head + ",\n" + rounds
  }

  /** The DoReMi training chain (requires [[perplexityPdCtes]] earlier in
    * the WITH body): per-domain loss table `dl`, domain count `nd`,
    * uniform `w0`, then one (avg, raw, w) CTE trio per round ending at
    * `w<iters>`. Eta and the smoothing constant interpolate from the SAME
    * Curation constants the operator uses; greatest() mirrors both Scala
    * max clamps, which also keep every division operand non-negative so
    * `//` == the driver loop's truncating `/` throughout. Every round CTE
    * is MATERIALIZED: each references its predecessor more than once, and
    * DuckDB's default CTE inlining would otherwise expand the chain
    * exponentially in iters (observed as a hung oracle run); the frames
    * are domain-cardinality, so forcing them is free.
    */
  private def mixtureTrainCtes: String = {
    val eta = graft.operators.Curation.mixtureTrainEta
    val c = graft.operators.Curation.mixtureTrainSmooth
    val iters = graft.operators.Curation.mixtureTrainIters
    val rounds = (1 to iters).map { r =>
      s"""avg$r AS MATERIALIZED (
         |  SELECT CAST(sum(flu * w) // sum(w) AS BIGINT) AS wavg FROM w${r - 1}),
         |raw$r AS MATERIALIZED (
         |  SELECT source, flu, CAST(wavg - flu AS BIGINT) AS excess,
         |    greatest(1, (w * greatest(1, 1000000 + (wavg - flu) * $eta)) // 1000000) AS rw
         |  FROM w${r - 1}, avg$r),
         |w$r AS MATERIALIZED (
         |  SELECT source, flu, excess,
         |    CAST(greatest(1, ((1000000 - $c) * ((rw * 1000000) // (SELECT sum(rw) FROM raw$r))
         |          + $c * (1000000 // nd.nd)) // 1000000) AS BIGINT) AS w
         |  FROM raw$r, nd)""".stripMargin
    }.mkString(",\n")
    s"""dl AS MATERIALIZED (
       |  SELECT d.source, CAST(sum(pd.sb_sum) // sum(pd.n_bigrams) AS BIGINT) AS flu
       |  FROM pd JOIN documents d USING (doc_id) GROUP BY d.source),
       |nd AS MATERIALIZED (SELECT count(*) AS nd FROM dl),
       |w0 AS MATERIALIZED (
       |  SELECT source, flu, CAST(1000000 // nd AS BIGINT) AS w FROM dl, nd),
       |$rounds""".stripMargin
  }

  /** `Curation.samp_mixture_train_excess`'s twin — the published-form
    * DoReMi chain: λ = max(0, ref_flu − flu) frozen with the planted
    * reference table (ref_flu = base + step · first-md5-hex-digit of the
    * source name, the SAME constants the Scala plant uses), rounds =
    * multiplicative update on λ + renormalize + uniform re-mix. All
    * operands non-negative, so `//` floor division equals Scala's
    * truncating `/` everywhere.
    */
  private def mixtureTrainExcessCtes: String = {
    val eta = graft.operators.Curation.mixtureTrainEta
    val c = graft.operators.Curation.mixtureTrainSmooth
    val iters = graft.operators.Curation.mixtureTrainIters
    val base = graft.operators.Curation.mixtureRefBase
    val step = graft.operators.Curation.mixtureRefStep
    val rounds = (1 to iters).map { r =>
      s"""xraw$r AS MATERIALIZED (
         |  SELECT source, flu, ref_flu, lam,
         |    greatest(1, (w * (1000000 + lam * $eta)) // 1000000) AS rw
         |  FROM xw${r - 1}),
         |xw$r AS MATERIALIZED (
         |  SELECT source, flu, ref_flu, lam,
         |    CAST(greatest(1, ((1000000 - $c) * ((rw * 1000000) // (SELECT sum(rw) FROM xraw$r))
         |          + $c * (1000000 // ndx.nd)) // 1000000) AS BIGINT) AS w
         |  FROM xraw$r, ndx)""".stripMargin
    }.mkString(",\n")
    s"""dlx AS MATERIALIZED (
       |  SELECT d.source,
       |    CAST(sum(pd.sb_sum) // sum(pd.n_bigrams) AS BIGINT) AS flu,
       |    CAST($base + $step *
       |      (strpos('0123456789abcdef', substr(md5(d.source), 1, 1)) - 1)
       |      AS BIGINT) AS ref_flu
       |  FROM pd JOIN documents d USING (doc_id) GROUP BY d.source),
       |ndx AS MATERIALIZED (SELECT count(*) AS nd FROM dlx),
       |xw0 AS MATERIALIZED (
       |  SELECT source, flu, ref_flu,
       |    CAST(greatest(0, ref_flu - flu) AS BIGINT) AS lam,
       |    CAST(1000000 // nd AS BIGINT) AS w
       |  FROM dlx, ndx),
       |$rounds""".stripMargin
  }

  /** The samp_kcenter / samp_kcenter_fast twin (both spellings emit the
    * identical frame): the k−1 greedy farthest-point rounds unrolled
    * programmatically, argmax over min-squared-distance, ties to the
    * smaller vec_id, radius floor(d·2^20) AFTER selection.
    */
  private val kcenterTwin: String = {
    val k = graft.operators.Clustering.kcenterK
    s"""WITH $kcenterCtes
       |SELECT round, vec_id, radius_fp FROM cen$k ORDER BY round""".stripMargin
  }

  /** The nearest-selected-center CTE shared by [[kcenterAssignTwin]] and
    * [[kcenterCurriculumTwin]]: one min(struct(d, round)) per vector —
    * ties to the EARLIEST round, the VecNearest lowest-index contract
    * (NOT min-by-center-id).
    */
  private lazy val kcenterAsgCte: String = {
    val k = graft.operators.Clustering.kcenterK
    s"""asg AS (
       |  SELECT e.vec_id,
       |    min({'d': list_sum(list_transform(list_zip(e.embedding, c.embedding),
       |          p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
       |             * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
       |         'r': c.round}) AS best
       |  FROM embeddings e, cen$k c
       |  WHERE e.embedding IS NOT NULL GROUP BY e.vec_id)""".stripMargin
  }

  /** samp_kcenter_assign's twin: the selection CTEs verbatim, then the
    * shared per-vector assignment CTE.
    */
  private val kcenterAssignTwin: String = {
    val k = graft.operators.Clustering.kcenterK
    s"""WITH $kcenterCtes,
       |$kcenterAsgCte
       |SELECT a.vec_id, c.vec_id AS center_id,
       |  (a.best).r AS center_round,
       |  CAST(floor((a.best).d * 1048576.0) AS BIGINT) AS d2_fp
       |FROM asg a JOIN cen$k c ON c.round = (a.best).r
       |ORDER BY a.vec_id""".stripMargin
  }

  /** samp_curriculum_coverage's twin: the selection + assignment CTEs,
    * then exact d2_fp quartile phases (quantile_cont — the q30 /
    * samp_curriculum precedent, phase 0 = FARTHEST quartile) and the
    * samp_shuffle shard/pos device per (phase, shard) keyed on vec_id.
    */
  private val kcenterCurriculumTwin: String =
    s"""WITH $kcenterCtes,
       |$kcenterAsgCte,
       |d2 AS (SELECT a.vec_id,
       |    CAST(floor((a.best).d * 1048576.0) AS BIGINT) AS d2_fp FROM asg a),
       |cu AS (SELECT quantile_cont(d2_fp, 0.25) AS p25,
       |         quantile_cont(d2_fp, 0.5) AS p50,
       |         quantile_cont(d2_fp, 0.75) AS p75 FROM d2),
       |ph AS (SELECT vec_id,
       |         CAST(CASE WHEN d2_fp >= p75 THEN 0 WHEN d2_fp >= p50 THEN 1
       |              WHEN d2_fp >= p25 THEN 2 ELSE 3 END AS BIGINT) AS phase,
       |         md5(CAST(vec_id AS VARCHAR) || '|shuffle42') AS h
       |       FROM d2, cu),
       |sh AS (SELECT vec_id, phase, h,
       |         CAST(concat('0x', substr(h, 1, 6)) AS BIGINT) % 8 AS shard
       |       FROM ph)
       |SELECT vec_id, phase, shard,
       |  CAST(row_number() OVER (PARTITION BY phase, shard ORDER BY h, vec_id)
       |       AS BIGINT) - 1 AS pos
       |FROM sh ORDER BY phase, shard, pos""".stripMargin

  /** samp_curriculum_mixed's twin: BOTH parents' phase derivations
    * verbatim — the kcenter d2_fp quartiles (kcenterCurriculumTwin's
    * CTEs) and samp_curriculum's quality-score quartiles — crossed
    * lexicographically (cov·4 + qual) over the inner id join, then the
    * shared samp_shuffle shard/pos device keyed on vec_id.
    */
  private lazy val kcenterMixedTwin: String =
    s"""WITH $kcenterCtes,
       |$kcenterAsgCte,
       |d2 AS (SELECT a.vec_id,
       |    CAST(floor((a.best).d * 1048576.0) AS BIGINT) AS d2_fp FROM asg a),
       |cu AS (SELECT quantile_cont(d2_fp, 0.25) AS p25,
       |         quantile_cont(d2_fp, 0.5) AS p50,
       |         quantile_cont(d2_fp, 0.75) AS p75 FROM d2),
       |covph AS (SELECT vec_id,
       |         CAST(CASE WHEN d2_fp >= p75 THEN 0 WHEN d2_fp >= p50 THEN 1
       |              WHEN d2_fp >= p25 THEN 2 ELSE 3 END AS BIGINT) AS cov_phase
       |       FROM d2, cu),
       |qg AS (
       |  SELECT doc_id, ($bigramListSql) AS gs
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS w
       |        FROM documents WHERE text IS NOT NULL)),
       |qsc AS (SELECT doc_id,
       |         CAST(${scoreRawSql("gs")} AS DOUBLE) / len(gs) AS score
       |       FROM qg),
       |qc AS (SELECT quantile_cont(score, 0.25) AS p25,
       |        quantile_cont(score, 0.5) AS p50,
       |        quantile_cont(score, 0.75) AS p75 FROM qsc),
       |qph AS (SELECT doc_id,
       |         CAST(CASE WHEN score >= p75 THEN 0 WHEN score >= p50 THEN 1
       |              WHEN score >= p25 THEN 2 ELSE 3 END AS BIGINT) AS qual_phase
       |       FROM qsc, qc),
       |mix AS (SELECT c.vec_id, c.cov_phase * 4 + q.qual_phase AS phase,
       |         md5(CAST(c.vec_id AS VARCHAR) || '|shuffle42') AS h
       |       FROM covph c JOIN qph q ON q.doc_id = c.vec_id),
       |sh AS (SELECT vec_id, phase, h,
       |         CAST(concat('0x', substr(h, 1, 6)) AS BIGINT) % 8 AS shard
       |       FROM mix)
       |SELECT vec_id, phase, shard,
       |  CAST(row_number() OVER (PARTITION BY phase, shard ORDER BY h, vec_id)
       |       AS BIGINT) - 1 AS pos
       |FROM sh ORDER BY phase, shard, pos""".stripMargin

  /** The shared selection CTE chain behind [[kcenterTwin]] and
    * [[kcenterAssignTwin]] (sel/cen round unrolls, ending at cen$k).
    */
  private lazy val kcenterCtes: String = {
    val k = graft.operators.Clustering.kcenterK
    val distSql =
      """list_sum(list_transform(list_zip(e.embedding, c.embedding),
        |        p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
        |           * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))""".stripMargin
    val rounds = (2 to k).map { r =>
      s"""sel$r AS MATERIALIZED (
         |  SELECT CAST($r AS BIGINT) AS round, vec_id, embedding,
         |    CAST(floor(mind * 1048576.0) AS BIGINT) AS radius_fp
         |  FROM (
         |    SELECT e.vec_id, e.embedding,
         |      min($distSql) AS mind
         |    FROM embeddings e, cen${r - 1} c
         |    WHERE e.embedding IS NOT NULL
         |      AND e.vec_id NOT IN (SELECT vec_id FROM cen${r - 1})
         |    GROUP BY e.vec_id, e.embedding)
         |  ORDER BY mind DESC, vec_id LIMIT 1),
         |cen$r AS (SELECT * FROM cen${r - 1} UNION ALL SELECT * FROM sel$r)""".stripMargin
    }.mkString(",\n")
    s"""sel1 AS MATERIALIZED (
       |  SELECT CAST(1 AS BIGINT) AS round, vec_id, embedding,
       |    CAST(NULL AS BIGINT) AS radius_fp
       |  FROM embeddings WHERE embedding IS NOT NULL
       |  ORDER BY vec_id LIMIT 1),
       |cen1 AS (SELECT * FROM sel1),
       |$rounds""".stripMargin
  }

  /** The shared CC round unroll behind the `graph_cc` census twin and the
    * `graph_cc_labels` per-doc twin: the 12 alternating large-star /
    * small-star rounds unrolled programmatically (the pagerankCoreCtes
    * device) over the permutation-family edge base (canonicalized a < b),
    * ending at the `lblmap` (v, c) label map. Every intermediate is
    * MATERIALIZED: each round reads its predecessor through both
    * adjacency orientations and both star phases, so inlined CTEs would
    * expand multiplicatively (the same reason the Spark side cuts lineage
    * every round).
    */
  private lazy val ccCtes: String = {
    val iters = 12
    val rounds = (1 to iters).map { r =>
      val p = r - 1
      s"""adjl$r AS (SELECT a AS u, b AS v FROM er$p
         |           UNION ALL SELECT b, a FROM er$p),
         |minl$r AS MATERIALIZED (
         |  SELECT u, least(u, min(v)) AS m FROM adjl$r GROUP BY u),
         |lse$r AS MATERIALIZED (
         |  SELECT DISTINCT least(v, m) AS a, greatest(v, m) AS b
         |  FROM adjl$r JOIN minl$r USING (u)
         |  WHERE v > u AND least(v, m) <> greatest(v, m)),
         |adjs$r AS (SELECT a AS u, b AS v FROM lse$r
         |           UNION ALL SELECT b, a FROM lse$r),
         |smn$r AS (SELECT u, v FROM adjs$r WHERE v < u),
         |mins$r AS MATERIALIZED (SELECT u, min(v) AS m FROM smn$r GROUP BY u),
         |er$r AS MATERIALIZED (
         |  SELECT DISTINCT a, b FROM (
         |    SELECT s.m AS a, n.v AS b FROM smn$r n JOIN mins$r s USING (u)
         |      WHERE n.v <> s.m
         |    UNION ALL SELECT m, u FROM mins$r)
         |  WHERE a <> b)""".stripMargin
    }.mkString(",\n")
    s"""er0 AS MATERIALIZED (
       |  SELECT DISTINCT least(doc_id, (doc_id*31+7) % n) AS a,
       |                  greatest(doc_id, (doc_id*31+7) % n) AS b
       |  FROM documents, (SELECT count(*) AS n FROM documents)
       |  WHERE doc_id <> (doc_id*31+7) % n),
       |$rounds,
       |lblmap AS (SELECT b AS v, min(a) AS c FROM er$iters GROUP BY b)""".stripMargin
  }

  /** The samp_kcenter_sharded twin — BOTH phases unrolled: the per-shard
    * greedy rounds (argmax per shard via a row_number window ordered
    * dmin DESC, vec_id — the (d, −vec_id) struct max; exhausted shards
    * survive each round through the LEFT JOIN's keep-dmin branch), then
    * the exact greedy over the coreset CTE (the [[kcenterTwin]] device).
    * Sharding mirrors Spark's pmod as ((vec_id % P) + P) % P.
    */
  private val kcenterShardedTwin: String = {
    val k = graft.operators.Clustering.kcenterK
    val kp = graft.operators.Clustering.kcenterKPrime
    val p = graft.operators.Clustering.kcenterShards
    def dist(a: String, b: String): String =
      s"""list_sum(list_transform(list_zip($a, $b),
         |        z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))
         |           * (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))))""".stripMargin
    val shardRounds = (2 to kp).map { r =>
      // the LAST round needs no state update (the Spark loop's r < kPrime
      // skip) — emitting it would be a dead corpus-sized MATERIALIZED join
      val stateCte = if (r < kp)
        s"""
           |state$r AS MATERIALIZED (
           |  SELECT t.vec_id, t.shard, t.embedding,
           |    CASE WHEN s.vec_id IS NULL THEN t.dmin
           |         ELSE least(t.dmin, ${dist("t.embedding", "s.embedding")})
           |    END AS dmin
           |  FROM state${r - 1} t LEFT JOIN sel$r s ON s.shard = t.shard
           |  WHERE s.vec_id IS NULL OR t.vec_id <> s.vec_id),""".stripMargin
      else "" // the sel template's own `),` already separates the CTEs
      s"""sel$r AS MATERIALIZED (
         |  SELECT shard, vec_id, embedding FROM (
         |    SELECT shard, vec_id, embedding,
         |      row_number() OVER (PARTITION BY shard
         |                         ORDER BY dmin DESC, vec_id) AS rn
         |    FROM state${r - 1}) WHERE rn = 1),$stateCte
         |cor$r AS (SELECT * FROM cor${r - 1}
         |          UNION ALL SELECT shard, vec_id, embedding FROM sel$r)""".stripMargin
    }.mkString(",\n")
    // kPrime = 1 is seeds-only on the Spark side — state1 and the round
    // CTEs would be dead SQL (and a dangling comma); emit them only when
    // a round will consume them
    val phase1 =
      if (kp >= 2)
        s"""state1 AS MATERIALIZED (
           |  SELECT t.vec_id, t.shard, t.embedding,
           |    ${dist("t.embedding", "c.embedding")} AS dmin
           |  FROM st0 t JOIN cor1 c ON c.shard = t.shard
           |  WHERE t.vec_id <> c.vec_id),
           |$shardRounds""".stripMargin
      else "ph1_unused AS (SELECT 1 AS one)" // cor1 IS the coreset then
    val finalRounds = (2 to k).map { r =>
      s"""fsel$r AS MATERIALIZED (
         |  SELECT CAST($r AS BIGINT) AS round, vec_id, embedding,
         |    CAST(floor(mind * 1048576.0) AS BIGINT) AS radius_fp
         |  FROM (
         |    SELECT e.vec_id, e.embedding,
         |      min(${dist("e.embedding", "c.embedding")}) AS mind
         |    FROM coreset e, fcen${r - 1} c
         |    WHERE e.vec_id NOT IN (SELECT vec_id FROM fcen${r - 1})
         |    GROUP BY e.vec_id, e.embedding)
         |  ORDER BY mind DESC, vec_id LIMIT 1),
         |fcen$r AS (SELECT * FROM fcen${r - 1} UNION ALL SELECT * FROM fsel$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH st0 AS MATERIALIZED (
       |  SELECT vec_id, ((vec_id % $p) + $p) % $p AS shard, embedding
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |cor1 AS MATERIALIZED (
       |  SELECT t.shard, t.vec_id, t.embedding
       |  FROM st0 t JOIN (SELECT shard, min(vec_id) AS vec_id
       |                   FROM st0 GROUP BY shard) m
       |    ON m.shard = t.shard AND m.vec_id = t.vec_id),
       |$phase1,
       |coreset AS MATERIALIZED (SELECT vec_id, embedding FROM cor$kp),
       |fsel1 AS MATERIALIZED (
       |  SELECT CAST(1 AS BIGINT) AS round, vec_id, embedding,
       |    CAST(NULL AS BIGINT) AS radius_fp
       |  FROM coreset ORDER BY vec_id LIMIT 1),
       |fcen1 AS (SELECT * FROM fsel1),
       |$finalRounds
       |SELECT round, vec_id, radius_fp FROM fcen$k ORDER BY round""".stripMargin
  }

  /** `Clustering.kmeansRounds` unrolled: c0 = the k lowest-vec_id vectors
    * (RNG-free init, floats cast exactly to DOUBLE); round i assigns
    * against c(i-1) (struct-min = min distance, ties to the lowest cluster
    * — the VecNearest contract) and, for i < iters, rebuilds c(i) from the
    * fixed-point integer component sums. `eu` is the per-(vec, pos)
    * quantized component table every update round joins.
    */
  private def kmeansCoreCtes(k: Int, iters: Int): String = {
    val head =
      s"""c0 AS MATERIALIZED (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS c,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
         |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $k)),
         |eu AS MATERIALIZED (
         |  SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
         |         CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT) AS qx
         |  FROM (SELECT vec_id, unnest(embedding) AS x,
         |               generate_subscripts(embedding, 1) AS i FROM embeddings))""".stripMargin
    val rounds = (1 to iters).map { i =>
      val asg =
        s"""asg$i AS (
           |  SELECT e.vec_id,
           |    (min({'d': list_sum(list_transform(list_zip(e.embedding, t.ce),
           |            z -> (CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2]))),
           |          'c': t.c})).c AS cluster
           |  FROM embeddings e, c${i - 1} t GROUP BY e.vec_id)""".stripMargin
      if (i == iters) asg else asg + ",\n" +
        s"""sums$i AS (
           |  SELECT a.cluster, eu.pos, CAST(sum(eu.qx) AS BIGINT) AS qs, count(*) AS n
           |  FROM asg$i a JOIN eu USING (vec_id) GROUP BY a.cluster, eu.pos),
           |cv$i AS (
           |  SELECT pc.c, pc.pos,
           |    CASE WHEN s.qs IS NULL THEN pc.val
           |         ELSE CAST(s.qs AS DOUBLE) / CAST(s.n * 1048576 AS DOUBLE) END AS val
           |  FROM (SELECT c, unnest(ce) AS val,
           |               CAST(generate_subscripts(ce, 1) - 1 AS INTEGER) AS pos
           |        FROM c${i - 1}) pc
           |  LEFT JOIN sums$i s ON s.cluster = pc.c AND s.pos = pc.pos),
           |c$i AS MATERIALIZED (
           |  SELECT c, list(val ORDER BY pos) AS ce FROM cv$i GROUP BY c)""".stripMargin
    }.mkString(",\n")
    head + ",\n" + rounds
  }

  /** `Clustering.pqTrain`'s rounds with the subspace as a plain dimension:
    * `sv` = per-(vector, subspace) DOUBLE subvector, `b0` = the k
    * lowest-vec_id seeds' subvectors, then per round one assignment and
    * one per-(subspace, code, pos) fixed-point update — empty cells keep
    * their previous centroid exactly as the Scala `else prev`.
    */
  private def pqCoreCtes(m: Int, k: Int, iters: Int, sub: Int,
      src: String = "embeddings"): String = {
    val head =
      s"""sd AS (SELECT CAST(range AS INTEGER) AS sp FROM range(0, $m)),
         |sv AS MATERIALIZED (
         |  SELECT e.vec_id, sd.sp,
         |    list_transform(generate_series(1, $sub),
         |      j -> CAST(e.embedding[sd.sp * $sub + j] AS DOUBLE)) AS sv
         |  FROM $src e, sd),
         |b0 AS MATERIALIZED (
         |  SELECT sd.sp, seed.c,
         |    list_transform(generate_series(1, $sub),
         |      j -> CAST(seed.embedding[sd.sp * $sub + j] AS DOUBLE)) AS ce
         |  FROM (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS c,
         |               embedding
         |        FROM (SELECT vec_id, embedding FROM $src ORDER BY vec_id LIMIT $k)) seed, sd),
         |svu AS MATERIALIZED (
         |  SELECT vec_id, sp, CAST(i - 1 AS INTEGER) AS pos,
         |         CAST(floor(x * 1048576.0) AS BIGINT) AS qx
         |  FROM (SELECT vec_id, sp, unnest(sv) AS x, generate_subscripts(sv, 1) AS i FROM sv))""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""pasg$i AS (
         |  SELECT v.vec_id, v.sp,
         |    (min({'d': list_sum(list_transform(list_zip(v.sv, b.ce),
         |            z -> (z[1] - z[2]) * (z[1] - z[2]))), 'c': b.c})).c AS code
         |  FROM sv v JOIN b${i - 1} b ON b.sp = v.sp GROUP BY v.vec_id, v.sp),
         |psum$i AS (
         |  SELECT a.sp, a.code, u.pos, CAST(sum(u.qx) AS BIGINT) AS qs, count(*) AS n
         |  FROM pasg$i a JOIN svu u ON u.vec_id = a.vec_id AND u.sp = a.sp
         |  GROUP BY a.sp, a.code, u.pos),
         |pcv$i AS (
         |  SELECT pb.sp, pb.c, pb.pos,
         |    CASE WHEN s2.qs IS NULL THEN pb.val
         |         ELSE CAST(s2.qs AS DOUBLE) / CAST(s2.n * 1048576 AS DOUBLE) END AS val
         |  FROM (SELECT sp, c, unnest(ce) AS val,
         |               CAST(generate_subscripts(ce, 1) - 1 AS INTEGER) AS pos FROM b${i - 1}) pb
         |  LEFT JOIN psum$i s2 ON s2.sp = pb.sp AND s2.code = pb.c AND s2.pos = pb.pos),
         |b$i AS MATERIALIZED (
         |  SELECT sp, c, list(val ORDER BY pos) AS ce FROM pcv$i GROUP BY sp, c)""".stripMargin
    }.mkString(",\n")
    head + ",\n" + rounds
  }


  /** `TextAnalysis.urlPlant`'s twin, built congruence-for-congruence from
    * the SAME host pool constant.
    */
  private val urlPlantSql: String = {
    val hostCase = graft.operators.TextAnalysis.urlHosts.zipWithIndex
      .map { case (h, i) => s"WHEN doc_id % 7 = $i THEN '$h'" }.mkString(" ")
    s"""(CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END || '://' ||
       | CASE $hostCase END ||
       | CASE WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END ||
       | '/p/' || CAST(doc_id % 20 AS VARCHAR) ||
       | CASE WHEN doc_id % 5 = 0 THEN '?q=' || CAST(doc_id % 3 AS VARCHAR)
       |      ELSE '' END)""".stripMargin.replace("\n", " ")
  }

  /** The domain blocklist as a SQL IN-list — `TextAnalysis.urlBlocklist`. */
  private val urlBlockSql: String =
    graft.operators.TextAnalysis.urlBlocklist.map(d => s"'$d'").mkString(", ")

  /** Host-of-planted-URL expression and registered-domain-of-`host`
    * expression — the ONE SQL spelling of the `urlDomain(urlPlant(...))`
    * parse, shared by the tx_url_hosts and graph_domains twins (the
    * authority key and the host-census key cannot drift).
    */
  private val hostFromUrlSql: String =
    s"string_split(string_split(string_split($urlPlantSql, '://')[2], '/')[1], ':')[1]"
  private val domainOfHostSql: String =
    "string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]"

  /** Domain census over the final ranks (requires [[pagerankCoreCtes]]
    * earlier in the WITH chain): the shared host/domain parse on the
    * planted URL, then the per-domain aggregate — `pr_mean` is the same
    * integer division as the Spark `div`.
    */
  private val domainCensusCtes: String =
    s"""dom AS (
       |  SELECT doc_id, $domainOfHostSql AS domain
       |  FROM (SELECT doc_id, $hostFromUrlSql AS host FROM documents)),
       |da AS (
       |  SELECT domain, count(*) AS n_docs,
       |    CAST(sum(pr) AS BIGINT) AS pr_sum,
       |    CAST(sum(pr) // count(*) AS BIGINT) AS pr_mean,
       |    domain IN ($urlBlockSql) AS blocked
       |  FROM it3 JOIN dom ON dom.doc_id = it3.v GROUP BY domain)""".stripMargin

  /** The authorized-domain set (`Graph.domainAuthority`): unblocked
    * domains, top ⌈n/2⌉ by mean rank, ties to the smaller domain.
    */
  private val domainAuthCtes: String =
    s"""ar AS (
       |  SELECT domain, row_number() OVER (ORDER BY pr_mean DESC, domain) AS rk,
       |    count(*) OVER () AS nd
       |  FROM da WHERE NOT blocked),
       |auth AS (SELECT domain FROM ar WHERE rk <= (nd + 1) // 2)""".stripMargin

  /** The deterministic second-snapshot plant shared by the rel_diff and
    * profile_drift twins — one SQL spelling of `Curation.driftV2`, so the
    * two diff angles can never disagree about what "v2" is.
    */
  private val driftV2Sql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 10 = 1 THEN text || ' [v2]' ELSE text END AS text,
      |  lang
      |FROM documents WHERE doc_id % 10 <> 0
      |UNION ALL
      |SELECT doc_id + 1000000000, text, lang FROM documents WHERE doc_id % 10 = 2""".stripMargin

  /** Word bigrams as a list expression over a staged `w` word array — the
    * shingle spelling of the samp_importance twin, shared by the scorer
    * twins.
    */
  private val bigramListSql: String =
    """CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
      |     ELSE list_transform(generate_series(0, len(w) - 2),
      |                         i -> array_to_string(w[i+1:i+2], ' ')) END""".stripMargin.replace("\n", " ")

  /** `TextAnalysis.perplexityScored`'s twin — the CTE chain ending at
    * `pd` (doc_id, n_bigrams, sb_sum, sb_mean) — shared by the
    * tx_perplexity twin (quartile buckets) and the pipeline_curate twin
    * (the fluency stage's tail cut), so the LM algebra lives exactly
    * once in SQL as it does in Scala. Integer `//` == Spark's truncating
    * `div` here because every operand is non-negative.
    */
  private val perplexityPdCtes: String =
    s"""pplxd AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
       |pplxev AS (SELECT doc_id, unnest($bigramListSql) AS g FROM pplxd),
       |pplxc1 AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(w) AS tok FROM pplxd
       |        WHERE doc_id % ${graft.operators.TextAnalysis.perplexityRefMod} = 0)
       |  GROUP BY tok),
       |pplxt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM pplxc1),
       |pplxc2 AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS c2 FROM pplxev
       |  WHERE doc_id % ${graft.operators.TextAnalysis.perplexityRefMod} = 0 GROUP BY g),
       |pplxseen AS (
       |  SELECT pplxc2.g, CAST((1000000 * pplxc2.c2) // pplxc1.c AS BIGINT) AS sc_seen
       |  FROM pplxc2 JOIN pplxc1 ON string_split(pplxc2.g, ' ')[1] = pplxc1.tok),
       |pplxj AS (
       |  SELECT pplxev.doc_id,
       |    COALESCE(pplxseen.sc_seen,
       |      CAST((${graft.operators.TextAnalysis.perplexityBackoffMu} * COALESCE(cb.c, 0))
       |           // pplxt.t AS BIGINT)) AS sc
       |  FROM pplxev LEFT JOIN pplxseen ON pplxev.g = pplxseen.g
       |          LEFT JOIN pplxc1 cb ON string_split(pplxev.g, ' ')[2] = cb.tok, pplxt),
       |pd AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(sc) AS BIGINT) AS sb_sum,
       |    CAST(CAST(sum(sc) AS BIGINT) // count(*) AS BIGINT) AS sb_mean
       |  FROM pplxj GROUP BY doc_id)""".stripMargin

  /** `TextAnalysis.scoreRawCol`'s twin: Σ w[first-hex-char bucket] over a
    * bigram list, the CASE built from the SAME scoreWeights constant;
    * COALESCE(…, 0) mirrors the Spark fold's 0 init on an empty list.
    */
  private def scoreRawSql(grams: String): String = {
    val branches = "0123456789abcdef".zipWithIndex
      .map { case (c, i) =>
        s"WHEN '$c' THEN ${graft.operators.TextAnalysis.scoreWeights(i)}"
      }.mkString(" ")
    s"COALESCE(CAST(list_sum(list_transform($grams, x -> CASE substr(md5(x), 1, 1) $branches END)) AS BIGINT), 0)"
  }

  /** Cosine in explicit double arithmetic, matching the op order of
    * [[graft.functions.TextFunctions.cosine]] term-for-term so Spark and
    * DuckDB produce bit-identical doubles (DuckDB's builtin
    * list_cosine_similarity accumulates in float32 and does NOT match).
    */
  private def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |   * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))""".stripMargin.replace("\n", " ")

  /** [[cosSql]] with the zero-norm guard — `Dedup.guardedCos`' twin: a
    * degenerate all-zero vector scores -1 instead of 0/0 = NaN (which
    * compares greater than any threshold on both engines and would pair
    * the failed embedding with everything in reach).
    */
  private def cosGuardSql(a: String, b: String): String =
    s"""(CASE WHEN list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) = 0
       |   OR list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) = 0
       | THEN -1.0 ELSE ${cosSql(a, b)} END)""".stripMargin.replace("\n", " ")

  /** `max(struct(hits, lang)).lang` in DuckDB terms: sort the per-language
    * score structs ascending and take the last (struct comparison is
    * field-order lexicographic on both engines). Built from the SAME profile
    * map the Spark operator uses, so the two can never drift.
    */
  private val langidPickSql: String = {
    val structs = graft.operators.TextAnalysis.profiles.toSeq.sortBy(_._1).map {
      case (lang, stops) =>
        val lst = stops.map(w => s"'$w'").mkString("[", ", ", "]")
        s"{'hits': len(list_intersect(w, $lst)), 'lang': '$lang'}"
    }
    s"list_sort([${structs.mkString(", ")}])[${structs.size}].lang"
  }

  /** Gopher stopword list as a DuckDB list literal — built from the SAME
    * Seq the Spark operator uses ([[graft.operators.TextAnalysis.gopherStops]])
    * so the two can never drift.
    */
  private val gopherListSql: String =
    graft.operators.TextAnalysis.gopherStops.map(w => s"'$w'").mkString("[", ",", "]")

  /** Shared SQL fragments for the curation twins — one definition per rule,
    * interpolated everywhere it appears (tx_norm / tx_gopher / samp_split /
    * pipeline_curate), mirroring the shared Columns on the Spark side
    * (`TextFunctions.normalize`, `TextAnalysis.gopherCriteria`,
    * `Curation.splitOf`).
    */
  private val normSql: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
  /** The format-round-trip certificate (src_jsonl / src_orc): per-lang
    * counts + a 60-bit md5-prefix xor digest computed from the parquet
    * ORIGINALS only — matching it proves the converted copy bit-exact.
    */
  // digest keyed by doc_id so duplicate-text pairs cannot xor-cancel —
  // mirrors Jsonl.corpusSummary
  private val srcRoundTripSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |  bit_xor(CAST(concat('0x',
      |    substr(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 15)) AS BIGINT)) AS content_digest
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Mixture-weight CASE generated from [[graft.operators.Curation.mixtureWeights]]. */
  private val mixtureWSql: String =
    graft.operators.Curation.mixtureWeights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"WHEN source = '$s' THEN $w" }
      .mkString("CASE ", " ", s" ELSE ${graft.operators.Curation.mixtureDefaultWeight} END")

  /** 24-bit hex keep threshold from a raw floor(rate·2²⁴) expression — the
    * SQL twin of `Curation.hexThr`: rate ≥ 1 yields the sentinel 'g', which
    * every 6-hex-char md5 prefix compares below (the former 0xffffff clamp
    * dropped prefix-ffffff docs from keep-100 % sources on both engines).
    */
  private def hexThrSql(raw: String): String =
    s"CASE WHEN $raw >= 16777216 THEN 'g' ELSE printf('%06x', CAST($raw AS BIGINT)) END"

  private val wordBandSql = "len(w) >= 20 AND len(w) <= 100000"
  private val meanBandSql = "ml >= 3.0 AND ml <= 10.0"
  private val stopHitsSql = s"len(list_intersect(w, $gopherListSql)) >= 2"
  /** `Curation.splitOf`'s twin over an arbitrary text expression; the
    * split thresholds live HERE and nowhere else ([[splitCaseSql]] is the
    * plain-`text` instantiation).
    */
  private def splitCaseOn(e: String): String =
    s"CASE WHEN substr(md5($e), 1, 3) < 'e66' THEN 'train' " +
      s"WHEN substr(md5($e), 1, 3) < 'f33' THEN 'val' ELSE 'test' END"

  private val splitCaseSql = splitCaseOn("text")

  /** Gaps-and-islands CTE chain over `iv(doc_id, st, e)` ending at
    * `sp(doc_id, isl, ss, se)` — the SQL twin of `Dedup.mergeIslands`; the
    * islands algebra lives exactly once across the dd_spans and
    * decon_spans families (both sides of the drift guarantee).
    */
  private val islandMergeCtes: String =
    """x AS (SELECT doc_id, st, e,
      |        max(e) OVER (PARTITION BY doc_id ORDER BY st
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
      |      FROM iv),
      |y AS (SELECT doc_id, st, e,
      |        CASE WHEN pme IS NULL OR st > pme + 1 THEN 1 ELSE 0 END AS ni FROM x),
      |z AS (SELECT doc_id, st, e,
      |        sum(ni) OVER (PARTITION BY doc_id ORDER BY st
      |                      ROWS UNBOUNDED PRECEDING) AS isl FROM y),
      |sp AS (SELECT doc_id, isl, min(st) AS ss, max(e) AS se FROM z GROUP BY 1, 2)""".stripMargin

  /** The span-removal reassembly (`Dedup.trimBySpans`' twin) over a docs
    * CTE `src(doc_id, w)` and the merged `sp` intervals — shared by
    * dd_spans_trim and decon_spans_trim.
    */
  private def trimReassemblySql(src: String): String =
    s"""w2 AS (SELECT doc_id,
       |         unnest(w) AS word,
       |         unnest(generate_series(0, len(w) - 1)) AS pos
       |       FROM $src),
       |kept AS (SELECT w2.doc_id, w2.word, w2.pos
       |         FROM w2 LEFT JOIN sp ON sp.doc_id = w2.doc_id
       |                             AND w2.pos BETWEEN sp.ss AND sp.se
       |         WHERE sp.doc_id IS NULL),
       |agg AS (SELECT doc_id, count(*) AS kept_words,
       |          coalesce(string_agg(word, ' ' ORDER BY pos), '') AS trimmed
       |        FROM kept GROUP BY 1)
       |SELECT $src.doc_id, CAST(len($src.w) AS BIGINT) AS n_words,
       |  CAST(coalesce(agg.kept_words, 0) AS BIGINT) AS kept_words,
       |  md5(coalesce(agg.trimmed, '')) AS trimmed_digest
       |FROM $src LEFT JOIN agg ON agg.doc_id = $src.doc_id
       |ORDER BY $src.doc_id""".stripMargin

  /** Corpus-vs-corpus duplicated-k-gram intervals (dd_spans family):
    * w/sh/dup → `iv(doc_id, st, e)`.
    */
  private val ddSpanIvCtes: String =
    """w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    unnest(generate_series(0, len(w) - 8)) AS pos,
      |    unnest(list_transform(generate_series(0, len(w) - 8),
      |                          i -> array_to_string(w[i+1:i+8], ' '))) AS sh
      |  FROM w WHERE len(w) >= 8),
      |dup AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) > 1),
      |iv AS (SELECT s.doc_id, s.pos AS st, s.pos + 7 AS e
      |       FROM sh s JOIN dup USING (sh))""".stripMargin

  /** Training-vs-eval shared-k-gram intervals (decon_spans family):
    * w/el/ev/occ → `iv(doc_id, st, e)`; training docs only.
    */
  private val deconSpanIvCtes: String =
    """w AS (SELECT doc_id, string_split(text, ' ') AS w,
      |             doc_id % 3 = 0 AS is_eval
      |           FROM documents WHERE text IS NOT NULL),
      |el AS (SELECT * FROM w WHERE len(w) >= 8),
      |ev AS (SELECT DISTINCT
      |         unnest(list_transform(generate_series(0, len(w) - 8),
      |                               i -> array_to_string(w[i+1:i+8], ' '))) AS sh
      |       FROM el WHERE is_eval),
      |occ AS (
      |  SELECT doc_id,
      |    unnest(generate_series(0, len(w) - 8)) AS pos,
      |    unnest(list_transform(generate_series(0, len(w) - 8),
      |                          i -> array_to_string(w[i+1:i+8], ' '))) AS sh
      |  FROM el WHERE NOT is_eval),
      |iv AS (SELECT o.doc_id, o.pos AS st, o.pos + 7 AS e
      |       FROM occ o JOIN ev USING (sh))""".stripMargin

  /** The normalized-URL + eval-URL-set CTE chain (`TextAnalysis.normUrl`'s
    * split chain + the residue eval slice) shared by the decon_url twin
    * and the pipeline_decon funnel — ends at `n(doc_id, norm_url)` and
    * `e(norm_url, eval_min, n_eval)`.
    */
  private val deconUrlCtes: String =
    s"""u AS (SELECT doc_id, $urlPlantSql AS url FROM documents),
       |r AS (SELECT doc_id, string_split(url, '://')[2] AS rest FROM u),
       |hp AS (SELECT doc_id, rest,
       |         string_split(rest, '/')[1] AS hostport FROM r),
       |n AS (SELECT doc_id,
       |        regexp_replace(string_split(hostport, ':')[1], '^www\\.', '') ||
       |        string_split(substr(rest, length(hostport) + 1), '?')[1] AS norm_url
       |      FROM hp),
       |e AS (SELECT norm_url, CAST(min(doc_id) AS BIGINT) AS eval_min,
       |        count(*) AS n_eval
       |      FROM n WHERE doc_id % 3 = 0 GROUP BY 1)""".stripMargin

  /** The n-gram Jaccard connected-components CTE chain shared by
    * `dd_cluster_jaccard` and `samp_split_leakfree` (needs WITH RECURSIVE;
    * ends at `walk(id, label)`).
    */
  private val ngramClusterCtes: String =
    """sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
      |         ELSE list_transform(generate_series(0, len(w) - 3),
      |                             i -> array_to_string(w[i+1:i+3], ' ')) END)) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
      |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2),
      |good AS (
      |  SELECT a, b
      |  FROM pairs JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
      |  WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.4),
      |edges AS (SELECT a AS src, b AS dst FROM good
      |          UNION SELECT b, a FROM good),
      |walk(id, label) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, w.label FROM edges e JOIN walk w ON w.id = e.dst)""".stripMargin

  /** `TextAnalysis.trainScoreWeights`' twin: the 8 batch-perceptron rounds
    * unrolled programmatically (one template — the pagerank device), every
    * quantity 64-bit integer so the whole training trajectory
    * hash-matches. Labels come from the shared teacherWeights constant;
    * training runs on the centered features zᵢ = 16·xᵢ − n plus n (the
    * conditioning reparameterization documented on the Scala side), and
    * the `weff` CTE folds the 17 learned weights back to the 16 effective
    * per-bucket weights Wᵢ = 16·cᵢ + (c₁₆ − Σⱼcⱼ).
    */
  private val scoreTrainIters = 8
  private val scoreTrainCtes: String = {
    val hex = "0123456789abcdef"
    val xs = 0 until 16
    val teacher = graft.operators.TextAnalysis.teacherWeights
    val xCols = xs.map(i =>
      s"CAST(len(list_filter(bs, b -> b = '${hex(i)}')) AS BIGINT) AS x$i")
      .mkString(", ")
    def z(i: Int) = if (i < 16) s"(16 * x$i - n)" else "n"
    def marginOf(w: String) =
      (0 until 17).map(i => s"$w.c$i * ${z(i)}").mkString(" + ")
    val teacherMargin = xs.map(i => s"${teacher(i)} * x$i").mkString(" + ")
    val rounds = (1 to scoreTrainIters).map { r =>
      val prev = if (r == 1) "w0" else s"it${r - 1}"
      // CAST back to BIGINT: DuckDB's sum(BIGINT) widens to HUGEINT, and
      // the widening would otherwise ride the weight columns forever
      val gsum = (0 until 17).map(i =>
        s"COALESCE(CAST(sum(CASE WHEN y * (${marginOf(prev)}) <= 0 THEN y * ${z(i)} ELSE 0 END) AS BIGINT), 0) AS g$i")
        .mkString(", ")
      val upd = (0 until 17)
        .map(i => s"CAST($prev.c$i + g$i AS BIGINT) AS c$i").mkString(", ")
      s"""gr$r AS (SELECT $gsum FROM feat, $prev),
         |it$r AS (SELECT $upd FROM $prev, gr$r)""".stripMargin
    }.mkString(",\n")
    val fin = s"it$scoreTrainIters"
    val sumW = xs.map(i => s"$fin.c$i").mkString(" + ")
    val weff = xs
      .map(i => s"CAST(16 * $fin.c$i + ($fin.c16 - ($sumW)) AS BIGINT) AS e$i")
      .mkString(", ")
    s"""fb AS (
       |  SELECT doc_id,
       |    list_transform(($bigramListSql), g -> substr(md5(g), 1, 1)) AS bs
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS w
       |        FROM documents WHERE text IS NOT NULL)),
       |fx AS (SELECT doc_id, CAST(len(bs) AS BIGINT) AS n, $xCols FROM fb),
       |feat AS (
       |  SELECT *, CAST(CASE WHEN ($teacherMargin) > 0 THEN 1 ELSE -1 END AS BIGINT) AS y
       |  FROM fx),
       |w0 AS (SELECT ${(0 until 17).map(i => s"CAST(0 AS BIGINT) AS c$i").mkString(", ")}),
       |$rounds,
       |weff AS (SELECT $weff FROM $fin)""".stripMargin
  }
  private def trainedMarginSql: String =
    (0 until 16).map(i => s"weff.e$i * x$i").mkString(" + ")

  /** `TextAnalysis.trainLangidWeights`' twin — the scoreTrainCtes device
    * widened to one-vs-rest: 5 languages × 17 centered-feature weights
    * trained jointly, every round one 85-sum aggregate, all 64-bit
    * integer so the full trajectory hash-matches. Features are hashed
    * CHARACTER trigrams (substr sliding window; the CASE guards sub-3-char
    * texts exactly like the Spark side's descending-sequence guard).
    * Round CTEs are AS MATERIALIZED: each references its predecessor's 85
    * weight columns inside every gradient term, and DuckDB's default CTE
    * inlining expands such chains exponentially in rounds (the round-13
    * kmeans lesson). Ends at `feat` (doc_id, lang, n, x0..x15, y_*) and
    * `lweff` (e_<lang>_<i>, 80 effective bucket weights).
    */
  private val langidTrainCtes: String = {
    val hex = "0123456789abcdef"
    val langs = graft.operators.TextAnalysis.langidLangs
    val iters = graft.operators.TextAnalysis.langidIters
    val xCols = (0 until 16).map(i =>
      s"CAST(len(list_filter(bs, b -> b = '${hex(i)}')) AS BIGINT) AS x$i")
      .mkString(", ")
    def z(i: Int) = if (i < 16) s"(16 * x$i - n)" else "n"
    def marginOf(w: String, l: String) =
      (0 until 17).map(i => s"$w.c_${l}_$i * ${z(i)}").mkString(" + ")
    val yCols = langs.map(l =>
      s"CAST(CASE WHEN lang = '$l' THEN 1 ELSE -1 END AS BIGINT) AS y_$l")
      .mkString(", ")
    val w0 = langs.flatMap(l => (0 until 17).map(i =>
      s"CAST(0 AS BIGINT) AS c_${l}_$i")).mkString(", ")
    val rounds = (1 to iters).map { r =>
      val prev = if (r == 1) "lw0" else s"lit${r - 1}"
      val gsum = langs.flatMap { l =>
        (0 until 17).map(i =>
          s"COALESCE(CAST(sum(CASE WHEN y_$l * (${marginOf(prev, l)}) <= 0 " +
            s"THEN y_$l * ${z(i)} ELSE 0 END) AS BIGINT), 0) AS g_${l}_$i")
      }.mkString(", ")
      val upd = langs.flatMap { l =>
        (0 until 17).map(i => s"CAST($prev.c_${l}_$i + g_${l}_$i AS BIGINT) AS c_${l}_$i")
      }.mkString(", ")
      s"""lgr$r AS MATERIALIZED (SELECT $gsum FROM lfeat, $prev),
         |lit$r AS MATERIALIZED (SELECT $upd FROM $prev, lgr$r)""".stripMargin
    }.mkString(",\n")
    val fin = s"lit$iters"
    val weff = langs.flatMap { l =>
      val sumW = (0 until 16).map(j => s"$fin.c_${l}_$j").mkString(" + ")
      (0 until 16).map(i =>
        s"CAST(16 * $fin.c_${l}_$i + ($fin.c_${l}_16 - ($sumW)) AS BIGINT) AS e_${l}_$i")
    }.mkString(", ")
    s"""lcg AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    CASE WHEN length(text) >= 3
       |         THEN list_transform(generate_series(1, length(text) - 2),
       |                             i -> substr(text, i, 3))
       |         ELSE [] END AS cg
       |  FROM documents WHERE text IS NOT NULL),
       |lfb AS (SELECT doc_id, lang,
       |          list_transform(cg, g -> substr(md5(g), 1, 1)) AS bs
       |        FROM lcg),
       |lfx AS MATERIALIZED (
       |  SELECT doc_id, lang, CAST(len(bs) AS BIGINT) AS n, $xCols FROM lfb),
       |lfeat AS (SELECT *, $yCols FROM lfx),
       |lw0 AS (SELECT $w0),
       |$rounds,
       |lweff AS (SELECT $weff FROM $fin)""".stripMargin
  }

  /** The per-doc prediction tail over `lfeat × lweff`: margins per
    * language, struct-sort argmax (ties to the largest language code — the
    * langidPickSql device). Ends at `lm(doc_id, actual, predicted, margin)`.
    */
  private val langidPredCte: String = {
    val langs = graft.operators.TextAnalysis.langidLangs
    val margins = langs.map { l =>
      val m = (0 until 16).map(i => s"e_${l}_$i * x$i").mkString(" + ")
      s"CAST($m AS BIGINT) AS m_$l"
    }.mkString(", ")
    val structs = langs.map(l => s"{'m': m_$l, 'lang': '$l'}").mkString(", ")
    val pick = s"list_sort([$structs])[${langs.size}]"
    s"""lmm AS (SELECT doc_id, lang AS actual, $margins FROM lfeat, lweff),
       |lm AS (SELECT doc_id, actual, $pick.lang AS predicted, $pick.m AS margin
       |       FROM lmm)""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "q01_scan_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(sum($rev) AS DOUBLE) AS sum_disc_price,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_quantity < 3 AND l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-04-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_agg" ->
      s"""SELECT l_orderkey, o_orderdate, CAST(sum($rev) AS DOUBLE) AS rev
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY rev DESC, l_orderkey
         |LIMIT 10""".stripMargin,

    "q04_join5_agg" ->
      s"""SELECT n_name, CAST(sum($rev) AS DOUBLE) AS rev, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin,

    "q05_topk" ->
      """SELECT o_orderkey, o_custkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
        |FROM orders
        |ORDER BY price DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q06_distinct_on" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,

    "q07_window" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS seq,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders
        |ORDER BY o_custkey, seq""".stripMargin,

    "q08_union" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q09_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q10_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q11_overlay" ->
      """SELECT c_custkey,
        |  CAST(COALESCE(f.total, CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS bal
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
        |  ON f.o_custkey = c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q12_spine_merge" ->
      """WITH u AS (
        |  SELECT 0 AS ord, c_custkey AS k FROM customer
        |  UNION ALL
        |  SELECT 1 AS ord, s_suppkey AS k FROM supplier)
        |SELECT row_number() OVER (ORDER BY ord, k) AS id,
        |  CASE WHEN ord = 0 THEN k END AS customer_key,
        |  CASE WHEN ord = 1 THEN k END AS supplier_key
        |FROM u ORDER BY id""".stripMargin,

    "q13_fk_remap" ->
      """WITH cm AS (SELECT row_number() OVER (ORDER BY c_custkey) AS id, c_custkey FROM customer),
        |     om AS (SELECT row_number() OVER (ORDER BY o_orderkey) AS id, o_orderkey FROM orders)
        |SELECT om.id AS id, cm.id AS cust_sid
        |FROM om JOIN orders ON orders.o_orderkey = om.o_orderkey
        |LEFT JOIN cm ON cm.c_custkey = orders.o_custkey
        |ORDER BY id""".stripMargin,

    "q14_constants" ->
      """SELECT c_custkey, 'alpha' AS tag, CAST(1 AS INT) AS flag, CAST(2.5 AS DOUBLE) AS score
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q15_values_cast" ->
      """SELECT x.id, x.alpha, CAST(x.id AS INT) + 1 AS id2, r_name
        |FROM (VALUES (0, 'a1'), (2, 'b1'), (4, 'c1')) AS x(id, alpha)
        |JOIN region ON r_regionkey = x.id
        |ORDER BY x.id""".stripMargin,

    "q16_range_join" ->
      """SELECT band, count(*) AS n,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM part
        |JOIN (VALUES ('low', 0, 930), ('mid', 930, 970), ('high', 970, 100000)) b(band, lo, hi)
        |  ON CAST(p_retailprice AS DECIMAL(12,2)) >= b.lo AND CAST(p_retailprice AS DECIMAL(12,2)) < b.hi
        |GROUP BY band ORDER BY band""".stripMargin,

    "q27_count_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q26_asof_join" ->
      """SELECT p.user_id, p.event_id, CAST(p.ts AS TIMESTAMP) AS ts,
        |  CAST(v.ts AS TIMESTAMP) AS last_view_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND p.ts > v.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    "q17_string_funcs" ->
      """SELECT p_partkey, substring(p_name, 1, 5) AS name5,
        |  CAST(position('a' in p_name) AS INT) AS pos_a,
        |  CAST(length(p_name) AS INT) AS len,
        |  p_brand || '#' || p_type AS tag
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q18_case_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN CAST(l_discount AS DECIMAL(12,2)) > CAST(l_tax AS DECIMAL(12,2))
        |       THEN 'D' ELSE 'T' END AS flag,
        |  CAST(greatest(CAST(l_discount AS DECIMAL(12,2)), CAST(l_tax AS DECIMAL(12,2))) AS DOUBLE) AS max_rate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q19_date_extract" ->
      """SELECT CAST(extract(year FROM o_orderdate) AS INT) AS yr, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,

    "q20_in_subquery" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,

    "q21_agg_having" ->
      """SELECT p_brand, count(*) AS n, CAST(sum(CAST(p_size AS BIGINT)) AS BIGINT) AS sum_size
        |FROM part GROUP BY p_brand HAVING count(*) > 10 ORDER BY p_brand""".stripMargin,

    "q22_scalar_subquery" ->
      """SELECT p_brand, count(*) AS n, (SELECT count(*) FROM part) AS total
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q23_events_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
        |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin,

    "q24_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM g)
        |SELECT user_id, CAST(sess AS BIGINT) AS sess, count(*) AS n_events,
        |  CAST(min(ts) AS TIMESTAMP) AS t0, CAST(max(ts) AS TIMESTAMP) AS t1
        |FROM s GROUP BY user_id, sess ORDER BY user_id, sess""".stripMargin,

    "q25_theta_join" ->
      """SELECT p_partkey, p_size, CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price
        |FROM part
        |JOIN (SELECT p_size AS sz, CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_price,
        |             count(*) AS n
        |      FROM part GROUP BY p_size) a
        |  ON p_size = a.sz AND CAST(p_retailprice AS DECIMAL(12,2)) * a.n > a.sum_price
        |ORDER BY p_partkey""".stripMargin,

    // --- data-pipeline operators (oracles where DuckDB can express the exact
    // same arithmetic; hash-family ops (minhash/simhash/LSH) have no DuckDB
    // xxhash64 and get the rows-only check) ---

    "dd_exact" ->
      """SELECT md5(text) AS digest, min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents WHERE text IS NOT NULL GROUP BY 1 ORDER BY digest""".stripMargin,

    "dd_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
        |  min(doc_id) AS keeper, count(*) AS n_docs
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY 1 HAVING count(*) > 1 ORDER BY fp""".stripMargin,

    "dd_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(generate_series(0, len(w) - 3),
        |                             i -> array_to_string(w[i+1:i+3], ' ')) END)) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT a, b, CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
        |FROM pairs JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
        |WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.4
        |ORDER BY a, b""".stripMargin,

    // dd_cluster_jaccard: same pair extraction as dd_ngram_jaccard, then
    // min-label connected components as a recursive transitive-closure walk
    // (edges both directions; min reachable id per node = component minimum)
    "dd_cluster_jaccard" ->
      s"""WITH RECURSIVE $ngramClusterCtes
         |SELECT id, min(label) AS cluster FROM walk GROUP BY id ORDER BY id""".stripMargin,

    // samp_split_leakfree: the dd_cluster_jaccard component chain, then
    // every clustered doc splits by its anchor (min-label member)'s text
    "samp_split_leakfree" ->
      s"""WITH RECURSIVE $ngramClusterCtes,
         |comp AS (SELECT id, min(label) AS cluster FROM walk GROUP BY id),
         |anch AS (SELECT c.id AS doc_id, d.text AS atext
         |         FROM comp c JOIN documents d ON d.doc_id = c.cluster),
         |eff AS (
         |  SELECT d.source,
         |    ${splitCaseOn("coalesce(a.atext, d.text)")} AS split,
         |    ${splitCaseOn("coalesce(a.atext, d.text)")} <>
         |      ${splitCaseOn("d.text")} AS moved
         |  FROM documents d LEFT JOIN anch a ON a.doc_id = d.doc_id
         |  WHERE d.text IS NOT NULL)
         |SELECT source, split, count(*) AS n,
         |  CAST(sum(CASE WHEN moved THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
         |FROM eff GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // samp_split_leakfree_graph: the ccLabels component chain, then every
    // doc splits by its component anchor (min member)'s text — the same
    // eff/census tail as the jaccard variant
    "samp_split_leakfree_graph" ->
      s"""WITH $ccCtes,
         |lb AS (SELECT d.doc_id, d.source, d.text,
         |         coalesce(l.c, d.doc_id) AS comp
         |       FROM documents d LEFT JOIN lblmap l ON l.v = d.doc_id
         |       WHERE d.text IS NOT NULL),
         |anch AS (SELECT b.doc_id, a.text AS atext
         |         FROM lb b JOIN documents a ON a.doc_id = b.comp
         |         WHERE a.text IS NOT NULL),
         |eff AS (
         |  SELECT b.source,
         |    ${splitCaseOn("coalesce(a.atext, b.text)")} AS split,
         |    ${splitCaseOn("coalesce(a.atext, b.text)")} <>
         |      ${splitCaseOn("b.text")} AS moved
         |  FROM lb b LEFT JOIN anch a ON a.doc_id = b.doc_id)
         |SELECT source, split, count(*) AS n,
         |  CAST(sum(CASE WHEN moved THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
         |FROM eff GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "tx_stats" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS avg_word_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "tx_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |       x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    // ann_ivfpq: a FULL oracle for the flagship ANN — 32-lowest-vec_id
    // coarse quantizer, sqdist min-struct list assignment, residuals
    // re-cast to FLOAT exactly like the encode path, the shared
    // pqCoreCtes chain trained over `resid`, then per-query probe lists
    // (sqdist, ties to the smaller cid), DOUBLE query residuals, per-list
    // ADC tables in codeword order, and the left-assoc m-term ADC sum.
    // Validated bit-exact (dist doubles included) before wiring.
    "ann_ivfpq" ->
      s"""WITH $ivfpqChainCtes
         |SELECT q_id, rank, vec_id, dist FROM ivfpqrk WHERE rank <= 10
         |ORDER BY q_id, rank""".stripMargin,

    // ann_ivfpq_refined: the same chain retrieves refine=40 ADC
    // candidates, then the exact guarded cosine re-ranks their true
    // vectors — the exactCosineRefine stage in SQL.
    "ann_ivfpq_refined" ->
      s"""WITH $ivfpqChainCtes,
         |cand AS (SELECT q_id, vec_id FROM ivfpqrk WHERE rank <= 40),
         |qe AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
         |       WHERE vec_id < 8
         |         AND sqrt(list_sum(list_transform(embedding,
         |               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0),
         |rsc AS (
         |  SELECT cand.q_id, e.vec_id AS vec_id,
         |    ${cosGuardSql("q_emb", "e.embedding")} AS cos
         |  FROM cand JOIN embeddings e USING (vec_id) JOIN qe ON qe.q_id = cand.q_id),
         |rrk AS (SELECT q_id, vec_id, cos,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT)
         |    AS rank FROM rsc)
         |SELECT q_id, rank, vec_id, cos FROM rrk WHERE rank <= 10
         |ORDER BY q_id, rank""".stripMargin,

    // ann_pq: a FULL oracle — training is the shared pqCoreCtes chain
    // (deterministic Lloyd on raw subvectors), encode is the min-struct
    // assignment against b2, and the per-query ADC tables are exact
    // double folds against the SAME codewords, listed in codeword order;
    // the ADC distance is the left-assoc m-term sum the Spark reduce
    // spells. Validated bit-exact (dist included) before wiring.
    "ann_pq" -> {
      val m = 8; val iters = 2; val nQueries = 8; val k = 10
      val adc = (0 until m)
        .map(sx => s"tabs[${sx + 1}][codes[${sx + 1}] + 1]").mkString(" + ")
      s"""WITH ${pqCoreCtes(m, 16, iters, 8)},
         |enc AS (
         |  SELECT v.vec_id, v.sp,
         |    (min({'d': list_sum(list_transform(list_zip(v.sv, b.ce),
         |          z -> (z[1] - z[2]) * (z[1] - z[2]))), 'c': b.c})).c AS code
         |  FROM sv v JOIN b$iters b ON b.sp = v.sp GROUP BY v.vec_id, v.sp),
         |cds AS MATERIALIZED (
         |  SELECT vec_id, list(code ORDER BY sp) AS codes FROM enc GROUP BY vec_id),
         |qt AS (
         |  SELECT v.vec_id AS q_id, v.sp,
         |    list(list_sum(list_transform(list_zip(v.sv, b.ce),
         |         z -> (z[1] - z[2]) * (z[1] - z[2]))) ORDER BY b.c) AS tab
         |  FROM sv v JOIN b$iters b ON b.sp = v.sp
         |  WHERE v.vec_id < $nQueries GROUP BY v.vec_id, v.sp),
         |qtabs AS MATERIALIZED (
         |  SELECT q_id, list(tab ORDER BY sp) AS tabs FROM qt GROUP BY q_id),
         |sc AS (
         |  SELECT q_id, c.vec_id AS vec_id, $adc AS dist
         |  FROM cds c, qtabs WHERE c.vec_id <> q_id),
         |rk AS (SELECT q_id, vec_id, dist,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS BIGINT)
         |    AS rank FROM sc)
         |SELECT q_id, rank, vec_id, dist FROM rk WHERE rank <= $k
         |ORDER BY q_id, rank""".stripMargin
    },

    // ann_ivf: a FULL oracle — the coarse quantizer is the k-lowest-vec_id
    // init (no RNG), list assignment is the struct-max argmax-cosine
    // (lexicographic on both engines, ties to the smallest cid via -cid),
    // probe lists rank by (ccos DESC, cid), and the within-list scan is
    // the exact guarded cosine. Validated bit-exact before wiring.
    "ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS MATERIALIZED (SELECT vec_id AS cid, embedding AS c_emb FROM e WHERE vec_id < 16),
         |asg AS MATERIALIZED (
         |  SELECT e.vec_id, e.embedding,
         |    CAST(-((max({'ccos': ${cosGuardSql("c_emb", "e.embedding")},
         |                 'nc': -cid})).nc) AS BIGINT) AS cid
         |  FROM e, c GROUP BY e.vec_id, e.embedding),
         |qs AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e
         |       WHERE vec_id < 8
         |         AND sqrt(list_sum(list_transform(embedding,
         |               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0),
         |ql AS (
         |  SELECT q_id, q_emb, cid FROM (
         |    SELECT q_id, q_emb, cid,
         |      row_number() OVER (PARTITION BY q_id ORDER BY ccos DESC, cid) AS rn
         |    FROM (SELECT q_id, q_emb, cid, ${cosGuardSql("c_emb", "q_emb")} AS ccos
         |          FROM qs, c))
         |  WHERE rn <= 6),
         |sc AS (
         |  SELECT q_id, a.vec_id AS vec_id, ${cosGuardSql("q_emb", "a.embedding")} AS cos
         |  FROM asg a JOIN ql USING (cid)
         |  WHERE a.vec_id <> q_id),
         |rk AS (SELECT q_id, vec_id, cos,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT)
         |    AS rank FROM sc)
         |SELECT q_id, rank, vec_id, cos FROM rk WHERE rank <= 10
         |ORDER BY q_id, rank""".stripMargin,

    // ann_lsh: a FULL oracle for the multi-probe LSH search — the
    // hyperplanes inline as literals like dd_embed_lsh's, and the Lv et
    // al. probe sequence is pure arithmetic over them: per query, all
    // 2^planes flip masks costed by the summed |margin| of their set bits
    // (list_sum positional = the Spark aggregate's left-to-right double
    // fold, 0.0 terms in the same positions), struct-sorted on
    // (cost, mask) — lexicographic on both engines — sliced to nProbes,
    // XORed onto the home bucket. Validated bit-exact (cos included)
    // against the operator before wiring.
    "ann_lsh" -> {
      val planes = 8; val nProbes = 16; val nQueries = 8; val k = 10
      val mat = graft.functions.VecMatDots.planeMatrix(planes, 64)
      val dotDefs = (0 until planes).map { p =>
        s"""list_sum(list_transform(list_zip(embedding, ${mat(p).mkString("[", ", ", "]")}),
           |      z -> CAST(z[1] AS DOUBLE) * z[2])) AS d$p""".stripMargin
      }.mkString(",\n    ")
      val bucketExpr = (0 until planes)
        .map(p => s"(CASE WHEN d$p >= 0 THEN ${1L << p} ELSE 0 END)")
        .mkString(" + ")
      val dList = (0 until planes).map(p => s"d$p").mkString("[", ", ", "]")
      s"""WITH dims_ok AS (
         |  SELECT vec_id, CASE WHEN len(embedding) = 64 THEN embedding
         |    ELSE error('ann_lsh oracle: dims <> 64 - the inlined plane literals were resolved for 64-dim embeddings') END AS embedding
         |  FROM embeddings),
         |dts AS (
         |  SELECT vec_id, embedding,
         |    $dotDefs
         |  FROM dims_ok),
         |bk AS MATERIALIZED (
         |  SELECT vec_id, embedding, $dList AS dl,
         |    CAST($bucketExpr AS BIGINT) AS bucket
         |  FROM dts),
         |qs AS (
         |  SELECT vec_id AS q_id, embedding AS q_emb, dl, bucket AS home
         |  FROM bk
         |  WHERE vec_id < $nQueries
         |    AND sqrt(list_sum(list_transform(embedding,
         |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0),
         |qp AS (
         |  SELECT q_id, q_emb, UNNEST(list_transform(
         |    (list_sort(list_transform(generate_series(0, ${(1 << planes) - 1}),
         |       m -> {'cost': list_sum(list_transform(generate_series(0, ${planes - 1}),
         |                p -> CASE WHEN (m >> p) & 1 = 1 THEN abs(dl[p + 1]) ELSE 0.0 END)),
         |             'mask': m})))[1:$nProbes],
         |    s2 -> xor(home, CAST(s2.mask AS BIGINT)))) AS bucket
         |  FROM qs),
         |sc AS (
         |  SELECT q_id, e.vec_id AS vec_id,
         |    ${cosGuardSql("q_emb", "e.embedding")} AS cos
         |  FROM bk e JOIN qp USING (bucket)
         |  WHERE e.vec_id <> q_id),
         |rk AS (SELECT q_id, vec_id, cos,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT)
         |    AS rank FROM sc)
         |SELECT q_id, rank, vec_id, cos FROM rk WHERE rank <= $k
         |ORDER BY q_id, rank""".stripMargin
    },

    // mm_pipeline: a FULL oracle on the ASCII corpus (char == byte, the
    // mm_phash_fp device — verified length == octet_length corpus-wide):
    // the fake-decode byte histogram's bin 0 recomputed per char via
    // ord()%16, the FLOAT division replayed as FLOAT before the double
    // round (the decoder divides float counts), frame counts from the
    // integer stride algebra, metadata from the shared doc_id plant.
    "mm_pipeline" ->
      """WITH med AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) = octet_length(CAST(text AS BLOB)) THEN text
        |         ELSE error('mm_pipeline oracle: non-ASCII payload - the char-as-byte replay is only valid on an ASCII corpus')
        |         END AS text,
        |    ['png','jpeg','wav'][CAST(doc_id % 3 AS INTEGER) + 1] AS format,
        |    CAST((doc_id * 37) % 512 + 16 AS INTEGER) AS width,
        |    CAST((doc_id * 91) % 512 + 16 AS INTEGER) AS height
        |  FROM documents WHERE text IS NOT NULL),
        |feats AS (
        |  SELECT doc_id, format,
        |    CAST(length(text) AS BIGINT) AS n_bytes,
        |    list_sum(list_transform(generate_series(1, length(text)),
        |      i -> CASE WHEN ord(text[i]) % 16 = 0 THEN 1 ELSE 0 END)) AS h0,
        |    CAST(width // 4 AS INTEGER) AS thumb_w,
        |    CAST(height // 4 AS INTEGER) AS thumb_h
        |  FROM med),
        |fr AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) // 32 >= 1
        |         THEN (length(text) // 32 - 1) // 4 + 1 ELSE 0 END AS n_frames
        |  FROM med)
        |SELECT f.doc_id, format, n_bytes,
        |  round(CAST(CAST(COALESCE(h0, 0) AS FLOAT)
        |        / CAST(greatest(n_bytes, 1) AS FLOAT) AS DOUBLE), 6) AS f0,
        |  thumb_w, thumb_h, CAST(fr.n_frames AS BIGINT) AS n_frames
        |FROM feats f JOIN fr USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // dd_embed_lsh: a FULL oracle despite the xxhash64-derived hyperplanes
    // — the plane matrix is a pure function of (plane, dim) CONSTANTS, so
    // the twin inlines VecMatDots.planeMatrix's resolved doubles as list
    // literals (the embed_rp rpSigns device; shortest-decimal repr
    // round-trips exactly) instead of computing the hash. Margins fold
    // left-to-right like the expression; sign-bit bucket, within-bucket
    // rep pairs, exact-dup clique expansion (inter via the two member
    // lists, intra via the self-cosine rule) mirror Dedup.expandPairs.
    "dd_embed_lsh" -> {
      val planes = 4
      val mat = graft.functions.VecMatDots.planeMatrix(planes, 64)
      val dotDefs = (0 until planes).map { p =>
        val lits = mat(p).mkString("[", ", ", "]")
        s"""list_sum(list_transform(list_zip(embedding, $lits),
           |      z -> CAST(z[1] AS DOUBLE) * z[2])) AS d$p""".stripMargin
      }.mkString(",\n    ")
      val bucketExpr = (0 until planes)
        .map(p => s"(CASE WHEN d$p >= 0 THEN ${1L << p} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH grp AS MATERIALIZED (
         |  SELECT CASE WHEN len(embedding) = 64 THEN embedding
         |    ELSE error('dd_embed_lsh oracle: dims <> 64 - the inlined plane literals were resolved for 64-dim embeddings') END AS embedding,
         |    min(vec_id) AS rep, list(vec_id) AS members
         |  FROM embeddings GROUP BY embedding),
         |dts AS (
         |  SELECT rep, embedding,
         |    $dotDefs
         |  FROM grp),
         |bk AS MATERIALIZED (
         |  SELECT rep, embedding, CAST($bucketExpr AS BIGINT) AS bucket FROM dts),
         |rp AS (
         |  SELECT ra, rb, cos FROM (
         |    SELECT x.rep AS ra, y.rep AS rb,
         |      ${cosGuardSql("x.embedding", "y.embedding")} AS cos
         |    FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.rep < y.rep)
         |  WHERE cos >= 0.4),
         |inter AS (
         |  SELECT least(tx.xx, ty.yy) AS a, greatest(tx.xx, ty.yy) AS b, cos
         |  FROM rp
         |  JOIN grp ga ON ga.rep = rp.ra
         |  JOIN grp gb ON gb.rep = rp.rb,
         |  UNNEST(ga.members) AS tx(xx), UNNEST(gb.members) AS ty(yy)),
         |intra AS (
         |  SELECT t1.xx AS a, t2.yy AS b, sc AS cos
         |  FROM (SELECT ${cosGuardSql("embedding", "embedding")} AS sc, members
         |        FROM grp WHERE len(members) > 1) g,
         |  UNNEST(g.members) AS t1(xx), UNNEST(g.members) AS t2(yy)
         |  WHERE t1.xx < t2.yy AND sc >= 0.4)
         |SELECT a, b, cos FROM (SELECT * FROM inter UNION ALL SELECT * FROM intra)
         |ORDER BY a, b""".stripMargin
    },

    "dd_embed_cosine" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings)
         |SELECT a.vec_id AS a, b.vec_id AS b, ${cosGuardSql("a.embedding", "b.embedding")} AS cos
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE ${cosGuardSql("a.embedding", "b.embedding")} >= 0.4
         |ORDER BY a, b""".stripMargin,

    // dd_containment: same pair-intersection CTE as dd_ngram_jaccard,
    // min-normalized (Broder's containment coefficient)
    "dd_containment" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(generate_series(0, len(w) - 3),
        |                             i -> array_to_string(w[i+1:i+3], ' ')) END)) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT a, b, CAST(inter AS DOUBLE) / least(sa.n_sh, sb.n_sh) AS containment
        |FROM pairs JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
        |WHERE CAST(inter AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= 0.8
        |ORDER BY a, b""".stripMargin,

    // decon_embed: broadcast-eval semantic decontamination; argmax via the
    // sorted-struct device (field-order lexicographic on both engines)
    "decon_embed" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |    sqrt(list_sum(list_transform(embedding,
         |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         |  FROM embeddings),
         |ev AS (SELECT vec_id AS e_id, embedding AS e_emb
         |       FROM e WHERE vec_id < 64 AND nrm > 0),
         |sc AS (
         |  SELECT t.vec_id,
         |    max({'cos': CASE WHEN t.nrm = 0 THEN -1.0
         |                     ELSE ${cosSql("t.embedding", "e_emb")} END,
         |         'ne': -e_id}) AS m
         |  FROM e t, ev WHERE t.vec_id >= 64 GROUP BY t.vec_id)
         |SELECT vec_id, CAST(-(m.ne) AS BIGINT) AS best_eval, m.cos AS max_cos,
         |  m.cos >= 0.8 AS contaminated
         |FROM sc ORDER BY vec_id""".stripMargin,

    // ann_sq: int8 scalar-quantized search — embed_quantize's exact scheme;
    // ranking by code cosine (integer dot and norms²; the per-vector scales
    // cancel), so the whole ANN query is oracle-exact
    "ann_sq" ->
      s"""WITH q8 AS (
        |  $int8CodesSql),
        |n2 AS (
        |  SELECT vec_id, q,
        |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
        |  FROM q8),
        |qq AS (SELECT vec_id AS q_id, q AS qv, n2 AS qn2 FROM n2
        |       WHERE vec_id < 8 AND n2 > 0),
        |scored AS (
        |  SELECT q_id, vec_id,
        |    CAST(list_sum(list_transform(list_zip(q, qv),
        |      p -> CAST(p[1] AS BIGINT) * CAST(p[2] AS BIGINT))) AS BIGINT) AS dot,
        |    CAST(n2 AS DOUBLE) AS n2d, CAST(qn2 AS DOUBLE) AS qn2d
        |  FROM n2, qq WHERE vec_id <> q_id),
        |rk AS (
        |  SELECT q_id, vec_id, dot,
        |    CASE WHEN n2d = 0 THEN -1.0
        |         ELSE CAST(dot AS DOUBLE) / (sqrt(n2d) * sqrt(qn2d)) END AS cos_q8,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY CASE WHEN n2d = 0 THEN -1.0
        |                    ELSE CAST(dot AS DOUBLE) / (sqrt(n2d) * sqrt(qn2d)) END DESC,
        |        vec_id) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT q_id, rank, vec_id, dot, cos_q8 FROM rk WHERE rank <= 10
        |ORDER BY q_id, rank""".stripMargin,

    // SemDeDup: the one-step Lloyd assignment (same CTE shape as
    // embed_kmeans_assign's oracle) + within-cluster defined-order cosine —
    // both halves already bit-match, so the composition does too.
    "dd_semdedup" ->
      s"""WITH c AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS c,
         |         embedding AS ce
         |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 10)),
         |asg AS (
         |  SELECT e.vec_id,
         |    (min({'d': list_sum(list_transform(list_zip(e.embedding, c.ce),
         |            p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         |               * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
         |          'c': c.c})).c AS cluster
         |  FROM embeddings e, c GROUP BY e.vec_id),
         |e AS (SELECT em.vec_id, em.embedding, asg.cluster
         |      FROM embeddings em JOIN asg USING (vec_id)),
         |p AS (
         |  SELECT x.cluster AS cluster, y.vec_id AS b
         |  FROM e x JOIN e y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
         |  WHERE ${cosGuardSql("x.embedding", "y.embedding")} >= 0.4
         |  GROUP BY 1, 2),
         |d AS (SELECT cluster, count(*) AS n_dups, min(b) AS first_dup
         |      FROM p GROUP BY cluster)
         |SELECT e.cluster, count(*) AS n_members,
         |  COALESCE(max(d.n_dups), 0) AS n_dups,
         |  count(*) - COALESCE(max(d.n_dups), 0) AS n_keep,
         |  max(d.first_dup) AS first_dup
         |FROM e LEFT JOIN d USING (cluster)
         |GROUP BY e.cluster
         |ORDER BY cluster""".stripMargin,

    // mm_semdedup: dd_semdedup's twin over the media-asset frame — the
    // base embeddings plus the planted re-encodes (mirrored ids, the
    // float-exact 2^-10 shift; constants interpolate from Multimodal so
    // plant and twin cannot drift). Same one-step assignment and
    // defined-order cosine as the dd_semdedup twin, threshold 0.9.
    "mm_semdedup" -> {
      val shift = graft.operators.Multimodal.mmReencShift
      val stride = graft.operators.Multimodal.mmReencStride
      val thr = graft.operators.Multimodal.mmSemThreshold
      s"""WITH masset AS MATERIALIZED (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT -(vec_id + 1) AS vec_id,
         |    list_transform(embedding,
         |      x -> CAST(CAST(x AS DOUBLE) + $shift AS FLOAT)) AS embedding
         |  FROM embeddings WHERE vec_id % $stride = 0),
         |c AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS c,
         |         embedding AS ce
         |  FROM (SELECT vec_id, embedding FROM masset ORDER BY vec_id LIMIT 10)),
         |asg AS (
         |  SELECT e.vec_id,
         |    (min({'d': list_sum(list_transform(list_zip(e.embedding, c.ce),
         |            p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         |               * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
         |          'c': c.c})).c AS cluster
         |  FROM masset e, c GROUP BY e.vec_id),
         |e AS (SELECT em.vec_id, em.embedding, asg.cluster
         |      FROM masset em JOIN asg USING (vec_id)),
         |p AS (
         |  SELECT x.cluster AS cluster, y.vec_id AS b
         |  FROM e x JOIN e y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
         |  WHERE ${cosGuardSql("x.embedding", "y.embedding")} >= $thr
         |  GROUP BY 1, 2),
         |d AS (SELECT cluster, count(*) AS n_dups, min(b) AS first_dup
         |      FROM p GROUP BY cluster)
         |SELECT e.cluster, count(*) AS n_members,
         |  COALESCE(max(d.n_dups), 0) AS n_dups,
         |  count(*) - COALESCE(max(d.n_dups), 0) AS n_keep,
         |  max(d.first_dup) AS first_dup
         |FROM e LEFT JOIN d USING (cluster)
         |GROUP BY e.cluster
         |ORDER BY cluster""".stripMargin
    },

    "ann_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e
         |      WHERE vec_id < 8
         |        AND list_sum(list_transform(embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0),
         |scored AS (
         |  SELECT q_id, vec_id, ${cosGuardSql("q_emb", "embedding")} AS cos
         |  FROM e JOIN q ON vec_id <> q_id),
         |ranked AS (SELECT q_id, vec_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank FROM scored)
         |SELECT q_id, rank, vec_id, cos FROM ranked WHERE rank <= 10
         |ORDER BY q_id, rank""".stripMargin,

    // ann_radius: the threshold twin of ann_bruteforce — same query
    // selection and cosGuardSql, filter instead of rank
    "ann_radius" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e
         |      WHERE vec_id < 8
         |        AND list_sum(list_transform(embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0)
         |SELECT q_id, vec_id, cos FROM (
         |  SELECT q_id, vec_id, ${cosGuardSql("q_emb", "embedding")} AS cos
         |  FROM e JOIN q ON vec_id <> q_id)
         |WHERE cos >= ${graft.operators.Similarity.annRadiusThreshold}
         |ORDER BY q_id, cos DESC, vec_id""".stripMargin,

    // tx_bpe / tx_bpe_encode: the Sennrich training loop unrolled via
    // [[bpeCoreCtes]] — full hash oracles for the sequential merge
    // rewriting previously classed inexpressible. Validated bit-exact
    // (all 30 rules + all 500 encode rows) before wiring.
    "tx_bpe" -> {
      val merges = graft.operators.TextAnalysis.bpeDefaultMerges
      val emit = (1 to merges).map { i =>
        s"""SELECT CAST(${i - 1} AS BIGINT) AS rank, l AS "left", r AS "right",
           |  n AS pair_count FROM top$i""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""WITH ${bpeCoreCtes(merges)}
         |$emit
         |ORDER BY rank""".stripMargin
    },

    "tx_bpe_encode" -> {
      val merges = graft.operators.TextAnalysis.bpeDefaultMerges
      s"""WITH ${bpeCoreCtes(merges)},
         |subs AS (SELECT w, CAST(len(syms) AS BIGINT) AS n_sub FROM h$merges),
         |dw AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS k
         |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |             FROM documents WHERE text IS NOT NULL)
         |       GROUP BY doc_id, w)
         |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_words,
         |  CAST(sum(k * COALESCE(n_sub, length(w) + 1)) AS BIGINT) AS n_bpe_tokens
         |FROM dw LEFT JOIN subs USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "tx_ngrams" ->
      """WITH g AS (
        |  SELECT unnest(CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |                ELSE list_transform(generate_series(0, len(w) - 2),
        |                                    i -> array_to_string(w[i+1:i+2], ' ')) END) AS gram
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents))
        |SELECT gram, count(*) AS n FROM g GROUP BY gram
        |ORDER BY n DESC, gram LIMIT 20""".stripMargin,

    "embed_centroids" ->
      """SELECT label, CAST(i - 1 AS INT) AS pos,
        |  CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS BIGINT) AS comp_qsum,
        |  count(*) AS n
        |FROM (SELECT label, unnest(embedding) AS x,
        |             generate_subscripts(embedding, 1) AS i FROM embeddings)
        |GROUP BY label, i ORDER BY label, pos""".stripMargin,

    // argmax twin of TextAnalysis.tx_langid: Spark's array_max over
    // struct(hits, lang) is lexicographic (max hits, tie → max lang code) —
    // DuckDB's struct comparison is the same, so a sorted-list-last pick
    // reproduces the argmax bit-for-bit. list_intersect dedups like Spark's
    // array_intersect.
    "tx_langid" ->
      s"""SELECT doc_id, lang AS actual, ${langidPickSql} AS predicted
         |FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "tx_langid_eval" ->
      s"""WITH p AS (
         |  SELECT lang AS actual, ${langidPickSql} AS predicted
         |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents))
         |SELECT actual, count(*) AS n,
         |  CAST(sum(CASE WHEN predicted = actual THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
         |FROM p GROUP BY actual ORDER BY actual""".stripMargin,

    "tx_langid2" ->
      s"""WITH $langidTrainCtes,
         |$langidPredCte
         |SELECT doc_id, actual, predicted, margin FROM lm ORDER BY doc_id""".stripMargin,

    "tx_langid2_eval" ->
      s"""WITH $langidTrainCtes,
         |$langidPredCte
         |SELECT actual, count(*) AS n,
         |  CAST(sum(CASE WHEN predicted = actual THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
         |FROM lm GROUP BY actual ORDER BY actual""".stripMargin,

    "tx_quality" ->
      """SELECT doc_id,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS distinct_ratio,
        |  CASE WHEN length(text) < 100 THEN 'short'
        |       WHEN CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |              / len(string_split(text, ' ')) < 0.3 THEN 'repetitive'
        |       ELSE 'ok' END AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    // --- grouping sets / pivot / percentiles / outer joins ------------------

    "q28_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "q42_locf" ->
      s"""WITH ev AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    ${synthCentsSql(10)} AS cents
        |  FROM events)
        |SELECT event_id, user_id, cents,
        |  last_value(cents IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_filled
        |FROM ev
        |ORDER BY event_id""".stripMargin,

    "q43_interp" ->
      s"""WITH ev AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    ${synthCentsSql(10)} AS cents
        |  FROM events),
        |seq AS (
        |  SELECT event_id, user_id, ts, cents,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |         AS BIGINT) AS rn
        |  FROM ev),
        |win AS (
        |  SELECT event_id, user_id, cents, rn,
        |    last_value(cents IGNORE NULLS) OVER
        |      (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    first_value(cents IGNORE NULLS) OVER
        |      (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    last_value(CASE WHEN cents IS NOT NULL THEN rn END IGNORE NULLS)
        |      OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
        |    first_value(CASE WHEN cents IS NOT NULL THEN rn END IGNORE NULLS)
        |      OVER (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS np
        |  FROM seq
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id, cents,
        |  CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
        |       WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
        |       WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
        |       ELSE CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE) *
        |            (CAST(rn - pp AS DOUBLE) / CAST(np - pp AS DOUBLE))
        |  END AS cents_interp
        |FROM win
        |ORDER BY event_id""".stripMargin,

    "q41_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "q29_pivot" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_a,
        |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_n,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_r
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    // exact interpolated percentile: both engines use pos = p*(n-1); the
    // interpolation combine differs in form, so parity is verified
    // empirically by this gate per corpus (see q30's Scaladoc)
    "q30_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50_qty,
        |  quantile_cont(l_quantity, 0.95) AS p95_qty,
        |  quantile_cont(l_extendedprice, 0.5) AS p50_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q31_full_outer" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000),
        |ords AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        |  FROM orders GROUP BY o_custkey)
        |SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_name, n_orders, total_price
        |FROM cust FULL OUTER JOIN ords ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "q32_lead_lag" ->
      """SELECT user_id, event_id,
        |  lag(event_type, 1) OVER w AS prev_type,
        |  lead(event_type, 1) OVER w AS next_type,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  first_value(event_type) OVER w AS first_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q33_intersect_except" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
        |     b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
        |UNION ALL
        |SELECT 'only_1995' AS tag, o_custkey FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
        |ORDER BY tag, o_custkey""".stripMargin,

    "q34_listagg" ->
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  count(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q35_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q37_lateral" ->
      """SELECT c_custkey, o.o_orderkey, o.price
        |FROM customer,
        |LATERAL (SELECT o_orderkey,
        |           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
        |         FROM orders WHERE o_custkey = c_custkey
        |         ORDER BY price DESC, o_orderkey LIMIT 2) o
        |WHERE c_acctbal > 9000
        |ORDER BY c_custkey, price DESC, o_orderkey""".stripMargin,

    "q38_range_frame" ->
      """SELECT o_orderkey, o_custkey, day, cents,
        |  CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY day
        |                        RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |       AS BIGINT) AS spend_30d
        |FROM (SELECT o_orderkey, o_custkey,
        |        datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
        |        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |      FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q39_unpivot" ->
      """SELECT p_partkey, 'retailprice' AS metric,
        |       CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS value
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
        |ORDER BY p_partkey, metric""".stripMargin,

    "q40_recursive" ->
      """WITH RECURSIVE months(m) AS (
        |  SELECT CAST('1995-01-01' AS DATE)
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE)
        |  FROM months WHERE m < CAST('2001-08-01' AS DATE)
        |),
        |agg AS (
        |  SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS m,
        |         count(*) AS n
        |  FROM orders GROUP BY 1
        |)
        |SELECT strftime(m, '%Y-%m') AS month,
        |       CAST(coalesce(n, 0) AS BIGINT) AS n_orders
        |FROM months LEFT JOIN agg USING (m)
        |ORDER BY 1""".stripMargin,

    "ev_anomaly" ->
      s"""WITH ev AS (
        |  SELECT event_id, event_type, $centsSql AS cents
        |  FROM events),
        |st AS (
        |  SELECT event_type, count(*) AS n, sum(cents) AS s1, sum(cents * cents) AS s2
        |  FROM ev GROUP BY 1)
        |SELECT event_id, event_type, cents
        |FROM ev JOIN st USING (event_type)
        |WHERE (CAST(n AS DOUBLE) * CAST(cents AS DOUBLE) - CAST(s1 AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(cents AS DOUBLE) - CAST(s1 AS DOUBLE))
        |      > 4.0 * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
        |               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |ORDER BY event_id""".stripMargin,

    "q36_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    // --- curation / normalization / repetition ------------------------------

    "tx_norm" ->
      s"""SELECT doc_id,
         |  CAST(length(n) AS BIGINT) AS norm_len, md5(n) AS norm_digest
         |FROM (SELECT doc_id, $normSql AS n FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "tx_repetition" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(generate_series(0, len(w) - 2),
        |                             i -> array_to_string(w[i+1:i+2], ' ')) END) AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |pg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
        |agg AS (SELECT doc_id, max(c) AS top_gram_n, sum(c) AS n_grams FROM pg GROUP BY 1),
        |d AS (SELECT doc_id,
        |        1.0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |          / len(string_split(text, ' ')) AS dup_word_frac
        |      FROM documents)
        |SELECT d.doc_id, dup_word_frac,
        |  CAST(top_gram_n AS DOUBLE) / n_grams AS top_bigram_frac,
        |  CAST(top_gram_n AS DOUBLE) / n_grams > 0.18 AS repetitive
        |FROM d JOIN agg ON d.doc_id = agg.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "dd_para" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(0, (len(w) - 1) // 16),
        |    i -> array_to_string(w[i*16+1:i*16+16], ' '))) AS chunk
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
        |SELECT md5(chunk) AS digest, count(*) AS n_occ,
        |  count(DISTINCT doc_id) AS n_docs, min(doc_id) AS keeper
        |FROM ch GROUP BY 1 HAVING count(DISTINCT doc_id) > 1
        |ORDER BY digest""".stripMargin,

    "samp_stratified" ->
      """SELECT lang, count(*) AS n_total,
        |  CAST(sum(CASE WHEN substr(md5(text), 1, 2) < '40' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN substr(md5(text), 1, 2) < '40' THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS rate
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "samp_reservoir" ->
      """SELECT source, doc_id, rk FROM (
        |  SELECT source, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS BIGINT) AS rk
        |  FROM documents WHERE text IS NOT NULL)
        |WHERE rk <= 20 ORDER BY source, rk""".stripMargin,

    "samp_balanced" ->
      """WITH ranked AS (
        |  SELECT lang, md5(text) AS h,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS BIGINT) AS rk
        |  FROM documents WHERE text IS NOT NULL),
        |cap AS (
        |  SELECT CAST(min(n) AS BIGINT) AS cap FROM (
        |    SELECT count(*) AS n FROM documents WHERE text IS NOT NULL GROUP BY lang))
        |SELECT lang, count(*) AS n_kept, min(h) AS first_h
        |FROM ranked, cap WHERE rk <= cap
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "samp_split" ->
      s"""SELECT source, $splitCaseSql AS split, count(*) AS n
         |FROM documents WHERE text IS NOT NULL
         |GROUP BY 1, 2 ORDER BY source, split""".stripMargin,

    "tx_gopher" ->
      s"""SELECT doc_id,
         |  $wordBandSql AS ok_word_count,
         |  $meanBandSql AS ok_mean_word_len,
         |  $stopHitsSql AS ok_stopwords,
         |  ($wordBandSql AND $meanBandSql AND $stopHitsSql) AS keep
         |FROM (SELECT doc_id, w,
         |        CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w) AS ml
         |      FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents))
         |ORDER BY doc_id""".stripMargin,

    "embed_quantize" ->
      """SELECT vec_id, maxabs,
        |  CAST(list_min(q) AS BIGINT) AS q_min,
        |  CAST(list_max(q) AS BIGINT) AS q_max,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  md5(array_to_string(q, ',')) AS q_digest
        |FROM (
        |  SELECT vec_id, maxabs,
        |    CASE WHEN maxabs = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |         ELSE list_transform(embedding,
        |                x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / maxabs)) AS BIGINT)) END AS q
        |  FROM (SELECT vec_id, embedding,
        |          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        |        FROM embeddings))
        |ORDER BY vec_id""".stripMargin,

    "pipeline_curate" ->
      s"""WITH $perplexityPdCtes,
         |cut AS (SELECT quantile_cont(sb_mean, 0.25) AS p25 FROM pd),
         |base AS (
         |  SELECT doc_id, text, $normSql AS norm, string_split(text, ' ') AS w,
         |    CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS ml
         |  FROM documents),
         |q AS (
         |  SELECT * FROM base
         |  WHERE $wordBandSql AND $meanBandSql AND $stopHitsSql),
         |fl AS (
         |  SELECT q.* FROM q JOIN pd USING (doc_id), cut
         |  WHERE pd.sb_mean >= cut.p25),
         |k AS (
         |  SELECT *, row_number() OVER (PARTITION BY md5(norm) ORDER BY doc_id) AS rn FROM fl),
         |keep AS (SELECT * FROM k WHERE rn = 1)
         |SELECT '0_raw' AS stage, count(*) AS n FROM base
         |UNION ALL SELECT '1_quality', count(*) FROM q
         |UNION ALL SELECT '2_fluency', count(*) FROM fl
         |UNION ALL SELECT '3_dedup', count(*) FROM keep
         |UNION ALL
         |SELECT '4_split_' || $splitCaseSql AS stage, count(*) AS n
         |FROM keep GROUP BY 1
         |ORDER BY stage""".stripMargin,

    "tx_salient" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT doc_id, term, CAST(tf AS DOUBLE) / df AS score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY CAST(tf AS DOUBLE) / df DESC, term) AS BIGINT) AS rk
        |  FROM tf JOIN df USING (term))
        |SELECT doc_id, rk, term, score FROM scored WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,

    "decon_ngram" ->
      """WITH g AS (
        |  SELECT doc_id, source, unnest(list_distinct(
        |    CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(generate_series(0, len(w) - 8),
        |                             i -> array_to_string(w[i+1:i+8], ' ')) END)) AS sh
        |  FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)),
        |ev AS (SELECT DISTINCT md5(sh) AS gh FROM g WHERE source = 'src0'),
        |tr AS (SELECT doc_id, md5(sh) AS gh FROM g WHERE source <> 'src0')
        |SELECT doc_id, count(*) AS n_overlap
        |FROM tr JOIN ev USING (gh)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // With capacity (64) ≥ the corpus vocabulary the Misra–Gries sketch is
    // in its exact regime, so the plain group-by twin matches exactly; the
    // lossy regime is bound-tested in HeavyHittersSpec instead.
    "tx_heavy" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 15""".stripMargin,

    "tx_blocklist" -> {
      // SQL-escape each term (' -> '') — the Spark side takes arbitrary
      // terms safely via isInCollection; the oracle literal list must too
      val lst = graft.operators.TextAnalysis.blockTerms
        .map(t => s"'${t.replace("'", "''")}'").mkString(", ")
      s"""SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  CAST(sum(hits) AS BIGINT) AS n_hits,
         |  min(scrub_digest) AS scrub_probe
         |FROM (
         |  SELECT source,
         |    len(list_filter(string_split(text, ' '), t -> t IN ($lst))) AS hits,
         |    md5(array_to_string(
         |      list_filter(string_split(text, ' '), t -> t NOT IN ($lst)), ' ')) AS scrub_digest
         |  FROM documents)
         |GROUP BY source ORDER BY source""".stripMargin
    },

    // The plant CASEs mirror TextAnalysis.piiPlant congruence-for-congruence
    // and the patterns are the SAME Scala constants the Spark operator
    // compiles — ASCII-only classes, identical in Java regex and RE2.
    // DuckDB regexp_replace needs the explicit 'g' flag (Spark's is global
    // by default); redaction order matches piiRedact: email → phone → IP.
    "tx_pii" -> {
      import graft.operators.TextAnalysis.{emailRe, ibanRe, ipRe, phoneRe, ssnRe}
      val plant =
        """text ||
          |    CASE WHEN doc_id % 3 = 0
          |         THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com now'
          |         ELSE '' END ||
          |    CASE WHEN doc_id % 4 = 1
          |         THEN ' call 555-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
          |         ELSE '' END ||
          |    CASE WHEN doc_id % 5 = 2
          |         THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
          |              || '.' || CAST(doc_id % 97 AS VARCHAR)
          |              || '.' || CAST(doc_id % 250 AS VARCHAR) || ' logged'
          |         ELSE '' END ||
          |    CASE WHEN doc_id % 6 = 3
          |         THEN ' ssn ' || CAST(doc_id % 900 + 100 AS VARCHAR)
          |              || '-' || CAST(doc_id % 90 + 10 AS VARCHAR)
          |              || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) || ' filed'
          |         ELSE '' END ||
          |    CASE WHEN doc_id % 7 = 5
          |         THEN ' acct GB' || CAST(doc_id % 90 + 10 AS VARCHAR) || 'TEST'
          |              || lpad(CAST(doc_id % 100000000 AS VARCHAR), 10, '0') || ' ref'
          |         ELSE '' END""".stripMargin
          // one line: the outer stripMargin below must never see these
          // lines, or a leading '||' loses a bar and turns into bitwise-or
          .replaceAll("\\s+", " ")
      // redaction chain mirrors TextAnalysis.piiClasses ORDER exactly:
      // email → iban → ssn → phone → ip ('g' flag: Spark's replace is
      // global by default, DuckDB's is first-match-only without it)
      s"""WITH aug AS (SELECT doc_id, $plant AS t FROM documents),
         |c AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$emailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '$phoneRe')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(t, '$ipRe')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(t, '$ssnRe')) AS BIGINT) AS n_ssns,
         |  CAST(len(regexp_extract_all(t, '$ibanRe')) AS BIGINT) AS n_ibans,
         |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
         |    '$emailRe', '<EMAIL>', 'g'),
         |    '$ibanRe', '<IBAN>', 'g'),
         |    '$ssnRe', '<SSN>', 'g'),
         |    '$phoneRe', '<PHONE>', 'g'),
         |    '$ipRe', '<IP>', 'g')) AS redact_digest
         |FROM aug)
         |SELECT doc_id, n_emails, n_phones, n_ips, n_ssns, n_ibans,
         |  n_emails + n_phones + n_ips + n_ssns + n_ibans > 0 AS has_pii, redact_digest
         |FROM c ORDER BY doc_id""".stripMargin
    },

    "q44_regex" ->
      """SELECT lang,
        |  CAST(sum(CASE WHEN regexp_matches(text, '\bdup\b') THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  max(regexp_extract(text, '([a-z]+) dup', 1)) AS before_dup,
        |  min(md5(regexp_replace(text, '[aeiou]', '', 'g'))) AS vowel_probe
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // One Lloyd assignment step from the deterministic init (k lowest
    // vec_ids): exact double distances with the same fold order as the Spark
    // side, ties to the lowest cluster, fixed-point content sums — the
    // oracle anchor the full iterative twins below ([[kmeansCoreCtes]])
    // build on.
    "embed_kmeans_assign" ->
      """WITH c AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS c,
        |         embedding AS ce
        |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 10)),
        |a AS (
        |  SELECT e.vec_id,
        |    (min({'d': list_sum(list_transform(list_zip(e.embedding, c.ce),
        |            p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
        |               * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
        |          'c': c.c})).c AS cluster
        |  FROM embeddings e, c GROUP BY e.vec_id),
        |q AS (
        |  SELECT vec_id, CAST(list_sum(list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))) AS BIGINT) AS q
        |  FROM embeddings)
        |SELECT cluster, count(*) AS n, min(a.vec_id) AS first_vec,
        |  CAST(sum(q) AS BIGINT) AS qsum
        |FROM a JOIN q USING (vec_id)
        |GROUP BY cluster ORDER BY cluster""".stripMargin,

    // `Clustering.embed_kmeans`'s twin — the 5 deterministic Lloyd rounds
    // unrolled programmatically from one template (the pagerankCoreCtes
    // device, so rounds cannot drift from each other). The driver-side
    // centroid update collect is replayed in SQL: per-(cluster, pos)
    // fixed-point integer sums (order-independent BIGINTs), divided in
    // DOUBLE exactly as the Scala `qs.toDouble / (n·2²⁰).toDouble`; empty
    // clusters keep their previous centroid through the per-(cluster, pos)
    // LEFT JOIN, mirroring the `case None => prev` carry. list_sum over a
    // positional list mirrors the left-to-right double distance fold (the
    // embed_kmeans_assign anchor's device).
    "embed_kmeans" ->
      s"""WITH ${kmeansCoreCtes(10, 5)},
         |q AS (SELECT vec_id, CAST(list_sum(list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))) AS BIGINT) AS q
         |    FROM embeddings)
         |SELECT cluster, count(*) AS n, min(a.vec_id) AS first_vec,
         |  CAST(sum(q) AS BIGINT) AS qsum
         |FROM asg5 a JOIN q USING (vec_id)
         |GROUP BY cluster ORDER BY cluster""".stripMargin,

    // `Clustering.samp_kcenter`'s twin — the k−1 greedy farthest-point
    // rounds unrolled programmatically (the kmeansCoreCtes device): each
    // round takes the argmax over min-squared-distance to the selected
    // set (the same list_zip/list_sum left-to-right double fold as the
    // kmeans twins — VecNearest's order), ties to the smaller vec_id,
    // radius quantized AFTER selection exactly like the Scala
    // floor(d·2^20). Selected rows are excluded from later argmaxes, and
    // the seed (lowest vec_id, the initCentroids convention) carries a
    // NULL radius.
    "samp_kcenter" -> kcenterTwin,

    // `Clustering.samp_kcenter_fast` emits the identical frame (the
    // running-min spelling is bit-parity by construction), so it shares
    // the twin verbatim
    "samp_kcenter_fast" -> kcenterTwin,

    "samp_kcenter_sharded" -> kcenterShardedTwin,

    "samp_kcenter_assign" -> kcenterAssignTwin,
    "samp_curriculum_coverage" -> kcenterCurriculumTwin,
    "samp_curriculum_mixed" -> kcenterMixedTwin,

    // `Clustering.embed_pq`'s twin — per-subspace Lloyd with the SAME
    // round template, the subspace as a plain dimension (one assignment /
    // update CTE trio per ROUND, not per subspace — mirroring the Spark
    // side's one-aggregate-per-round shape). Final codes digest through
    // the same stringified-int join as Spark's concat_ws; the encode
    // error sums the m per-subspace doubles in subspace order via a
    // positional list (list_sum = the reduce(_ + _) fold order).
    "embed_pq" ->
      s"""WITH ${pqCoreCtes(8, 16, 2, 8)},
         |enc AS (
         |  SELECT v.vec_id, v.sp,
         |    min({'d': list_sum(list_transform(list_zip(v.sv, b.ce),
         |          z -> (z[1] - z[2]) * (z[1] - z[2]))), 'c': b.c}) AS best
         |  FROM sv v JOIN b2 b ON b.sp = v.sp GROUP BY v.vec_id, v.sp),
         |pe AS (
         |  SELECT vec_id,
         |    list((best).c ORDER BY sp) AS codes,
         |    list_sum(list((best).d ORDER BY sp)) AS err
         |  FROM enc GROUP BY vec_id)
         |SELECT vec_id,
         |  md5(array_to_string(list_transform(codes, c -> CAST(c AS VARCHAR)), ',')) AS code_digest,
         |  CAST(floor(err * 1048576.0) AS BIGINT) AS err_q
         |FROM pe ORDER BY vec_id""".stripMargin,

    "q47_corr_subquery" ->
      s"""SELECT user_id, count(*) AS n_above
        |FROM events e
        |WHERE $centsSql *
        |      (SELECT count(*) FROM events e2 WHERE e2.user_id = e.user_id)
        |    > (SELECT sum($centsSql)
        |       FROM events e3 WHERE e3.user_id = e.user_id)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // DHash64 recomputed in SQL: payload bytes come back via ord() on the
    // ASCII-only slice (strlen = length ⟺ every char one byte), span
    // membership inverts the Scala reader's integer span bounds
    // (b = ceil(65·(i+1)/n) − 1, integer-exact), span means are exact
    // integer sums divided in double (bit-identical to the expression's
    // double accumulation), and bit 63 lands as the signed value so the
    // summed fingerprint equals the JVM's long. Validated fp-for-fp
    // against the native expression on the full sf0.01 corpus.
    "mm_phash_fp" ->
      """WITH d AS (
        |  SELECT doc_id, text, strlen(text) AS n FROM documents
        |  WHERE strlen(text) = length(text)),
        |pos AS (
        |  SELECT doc_id, text, n, unnest(range(n)) AS i FROM d),
        |bytes AS (
        |  SELECT doc_id, n,
        |    ord(substr(text, CAST(i + 1 AS INTEGER), 1)) AS byte,
        |    (65 * (i + 1) + n - 1) // n - 1 AS b
        |  FROM pos),
        |spans AS (
        |  SELECT doc_id, b, CAST(sum(byte) AS DOUBLE) / count(*) AS mean
        |  FROM bytes GROUP BY doc_id, b),
        |allspans AS (
        |  SELECT d.doc_id, sp.b, coalesce(s.mean, 0.0) AS mean
        |  FROM d CROSS JOIN (SELECT unnest(range(65)) AS b) sp
        |  LEFT JOIN spans s ON s.doc_id = d.doc_id AND s.b = sp.b),
        |bits AS (
        |  SELECT doc_id, b,
        |    CASE WHEN lead(mean) OVER (PARTITION BY doc_id ORDER BY b) > mean
        |         THEN CASE WHEN b = 63 THEN -9223372036854775808
        |              ELSE 1::BIGINT << CAST(b AS INTEGER) END
        |         ELSE 0 END AS bit
        |  FROM allspans)
        |SELECT doc_id, CAST(sum(bit) AS BIGINT) AS fp
        |FROM bits WHERE b < 64 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the payload column is the text bytes (stand-in corpus), so the digest
    // twin is md5(text); format derives from doc_id exactly as mediaTable's
    // null filter mirrors mediaTable's: without it DuckDB would emit one
    // digest-NULL group for null-text docs that Spark never produces
    "mm_dedup" ->
      """SELECT md5(text) AS digest, count(*) AS n_copies, min(doc_id) AS keeper,
        |  count(DISTINCT ['png','jpeg','wav'][CAST(doc_id % 3 AS INTEGER) + 1]) AS n_formats
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY 1 ORDER BY digest""".stripMargin,

    "q46_session_native" ->
      """WITH s1 AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s2 AS (
        |  SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM s1)
        |SELECT user_id, min(ts) AS t0, max(ts) AS t1, count(*) AS n_events
        |FROM s2 GROUP BY user_id, sess ORDER BY user_id, t0""".stripMargin,

    "ev_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS mv
        |  FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= mv THEN ts END)
        |    OVER (PARTITION BY user_id) AS mc
        |  FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= mc THEN ts END)
        |    OVER (PARTITION BY user_id) AS mp
        |  FROM s2),
        |u AS (SELECT DISTINCT user_id, mv, mc, mp FROM s3)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN mv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
        |  CAST(sum(CASE WHEN mc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked,
        |  CAST(sum(CASE WHEN mp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased,
        |  CAST(sum(CASE WHEN mp IS NOT NULL THEN epoch_us(mp) - epoch_us(mv)
        |                ELSE 0 END) AS BIGINT) AS lag_micros_sum
        |FROM u""".stripMargin,

    "ev_retention" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week,
        |    min(CAST(date_trunc('week', ts) AS DATE))
        |      OVER (PARTITION BY user_id) AS cohort
        |  FROM events)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
        |  CAST(datediff('day', cohort, week) // 7 AS BIGINT) AS "offset",
        |  count(*) AS n_users
        |FROM wk GROUP BY 1, 2 ORDER BY cohort, "offset"""".stripMargin,

    "tx_surprisal" ->
      """WITH v AS (
        |  SELECT token, CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS BIGINT) AS id
        |  FROM (SELECT token, count(*) AS n
        |        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |        GROUP BY token)),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(id) AS BIGINT) AS rank_sum, CAST(max(id) AS BIGINT) AS rank_max
        |FROM tok JOIN v USING (token)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // tx_perplexity: bigram stupid-backoff LM counted on the doc_id-residue
    // reference slice (the shared perplexityPdCtes chain), quartile
    // head/middle/tail buckets.
    "tx_perplexity" ->
      s"""WITH $perplexityPdCtes,
         |cuts AS (SELECT quantile_cont(sb_mean, 0.25) AS p25,
         |                quantile_cont(sb_mean, 0.75) AS p75 FROM pd)
         |SELECT doc_id, n_bigrams, sb_sum, sb_mean,
         |  CASE WHEN sb_mean >= p75 THEN 'head'
         |       WHEN sb_mean >= p25 THEN 'middle' ELSE 'tail' END AS bucket
         |FROM pd, cuts ORDER BY doc_id""".stripMargin,

    // tx_colloc: integer-exact PMI lift over the same >=2-token corpus
    // rule as tx_perplexity; the two floors (conditional, then prior)
    // mirror the Spark div pair; ties to the smaller gram.
    "tx_colloc" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
         |c1 AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(w) AS tok FROM d) GROUP BY tok),
         |t AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c1),
         |c2 AS (
         |  SELECT g, CAST(count(*) AS BIGINT) AS c2
         |  FROM (SELECT unnest($bigramListSql) AS g FROM d) GROUP BY g
         |  HAVING count(*) >= ${graft.operators.TextAnalysis.collocMinCount})
         |SELECT c2.g, c2.c2, a.c AS c_w1, b.c AS c_w2,
         |  CAST((CAST((1000000 * c2.c2) // a.c AS BIGINT) * t.t) // b.c
         |       AS BIGINT) AS lift
         |FROM c2 JOIN c1 a ON string_split(c2.g, ' ')[1] = a.tok
         |        JOIN c1 b ON string_split(c2.g, ' ')[2] = b.tok, t
         |ORDER BY lift DESC, g
         |LIMIT ${graft.operators.TextAnalysis.collocTopK}""".stripMargin,

    // tx_bm25: exact integer BM25 — the twin recomputes N/S/df in SQL and
    // replays the SAME fixed-point log2 recurrence (20 square-and-shift
    // rounds) as TextAnalysis.log2Fp via a recursive CTE, then the same
    // millionths tf-normalization; every constant is shared with the
    // operator object so the two sides cannot drift.
    "tx_bm25" -> {
      import graft.operators.TextAnalysis.{bm25Query, bm25TopK, bm25K1n, bm25K1d, bm25Bn, bm25Bd}
      val termsValues = bm25Query.map(t => s"('$t')").mkString(", ")
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, string_split(text, ' ') AS w
         |  FROM documents WHERE text IS NOT NULL),
         |stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(len(w)) AS BIGINT) AS s FROM d),
         |qt AS (SELECT term FROM (VALUES $termsValues) AS q(term)),
         |dfreq AS (
         |  SELECT qt.term, CAST(count(d.doc_id) AS BIGINT) AS df
         |  FROM qt LEFT JOIN d ON list_contains(d.w, qt.term)
         |  GROUP BY qt.term),
         |$log2FpIdfCtes,
         |tfs AS (
         |  SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS dl, qt.term,
         |    CAST(len(list_filter(d.w, x -> x = qt.term)) AS BIGINT) AS tf
         |  FROM d CROSS JOIN qt),
         |scored AS (
         |  SELECT t.doc_id, t.dl,
         |    CAST(sum(CASE WHEN t.tf > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms,
         |    CAST(sum(i.idf_fp *
         |      ((1000000 * ${bm25Bd * (bm25K1n + bm25K1d)} * s * t.tf)
         |       // (${bm25K1d * bm25Bd} * s * t.tf
         |           + ${bm25K1n * (bm25Bd - bm25Bn)} * s
         |           + ${bm25K1n * bm25Bn} * t.dl * n))) AS BIGINT) AS score_fp
         |  FROM tfs t JOIN idf i ON t.term = i.term, stats
         |  GROUP BY t.doc_id, t.dl)
         |SELECT doc_id, dl, n_terms, score_fp FROM scored
         |WHERE n_terms > 0
         |ORDER BY score_fp DESC, doc_id
         |LIMIT $bm25TopK""".stripMargin
    },

    // decon_bm25: retrieval decontamination — per eval doc, the top-k
    // training docs under exact-integer BM25 with the eval doc's top-m
    // IDF terms as the query. Same log2Fp recurrence and millionths tf
    // lift as the tx_bm25 twin, but the IDF table covers the whole
    // eval vocabulary (keyed recurrence) instead of four literal terms.
    "decon_bm25" -> {
      import graft.operators.TextAnalysis.{bm25K1n, bm25K1d, bm25Bn, bm25Bd}
      import graft.operators.Curation.{deconBm25EvalSource, deconBm25M, deconBm25K}
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS w
         |  FROM documents WHERE text IS NOT NULL),
         |train AS (SELECT doc_id, w FROM d WHERE source <> '$deconBm25EvalSource'),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |                 CAST(sum(len(w)) AS BIGINT) AS s FROM train),
         |et AS (SELECT doc_id AS eval_id, unnest(list_distinct(w)) AS term
         |       FROM d WHERE source = '$deconBm25EvalSource'),
         |dfreq AS (
         |  SELECT tt.term, CAST(count(*) AS BIGINT) AS df
         |  FROM (SELECT doc_id, unnest(list_distinct(w)) AS term FROM train) tt
         |  JOIN (SELECT DISTINCT term FROM et) v ON tt.term = v.term
         |  GROUP BY tt.term),
         |$log2FpIdfCtes,
         |q AS (
         |  SELECT eval_id, term, idf_fp FROM (
         |    SELECT et.eval_id, et.term, idf.idf_fp,
         |      row_number() OVER (PARTITION BY et.eval_id
         |        ORDER BY idf.idf_fp DESC, et.term) AS rk
         |    FROM et JOIN idf ON et.term = idf.term)
         |  WHERE rk <= $deconBm25M),
         |post AS (
         |  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
         |          unnest(w) AS term FROM train)
         |  WHERE term IN (SELECT DISTINCT term FROM q)
         |  GROUP BY doc_id, dl, term),
         |scored AS (
         |  SELECT q.eval_id, p.doc_id, p.dl,
         |    CAST(count(*) AS BIGINT) AS n_terms,
         |    CAST(sum(q.idf_fp *
         |      ((1000000 * ${bm25Bd * (bm25K1n + bm25K1d)} * s * p.tf)
         |       // (${bm25K1d * bm25Bd} * s * p.tf
         |           + ${bm25K1n * (bm25Bd - bm25Bn)} * s
         |           + ${bm25K1n * bm25Bn} * p.dl * n))) AS BIGINT) AS score_fp
         |  FROM post p JOIN q ON p.term = q.term, stats
         |  GROUP BY q.eval_id, p.doc_id, p.dl)
         |SELECT eval_id, doc_id, dl, n_terms, score_fp, "rank" FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY eval_id
         |    ORDER BY score_fp DESC, doc_id) AS BIGINT) AS "rank"
         |  FROM scored)
         |WHERE "rank" <= $deconBm25K
         |ORDER BY eval_id, "rank"""".stripMargin
    },

    "q45_nulls" ->
      s"""SELECT event_id, user_id, cents,
        |  CAST(row_number() OVER (PARTITION BY user_id
        |    ORDER BY cents ASC NULLS LAST, event_id) AS BIGINT) AS rk_nulls_last,
        |  CAST(row_number() OVER (PARTITION BY user_id
        |    ORDER BY cents ASC NULLS FIRST, event_id) AS BIGINT) AS rk_nulls_first,
        |  cents IS NOT DISTINCT FROM lag(cents) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS same_as_prev
        |FROM (SELECT event_id, user_id, ts,
        |        ${synthCentsSql(7)} AS cents
        |      FROM events)
        |ORDER BY event_id""".stripMargin,

    // the full funnel: every stage reuses the standalone operator's fragment
    "pipeline_train" ->
      s"""WITH base AS (
         |  SELECT doc_id, source, lang, text,
         |    ($wordBandSql AND $meanBandSql AND $stopHitsSql) AS keep,
         |    md5($normSql) AS digest
         |  FROM (SELECT doc_id, source, lang, text, string_split(text, ' ') AS w,
         |          CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |            / len(string_split(text, ' ')) AS ml
         |        FROM documents)),
         |train AS (SELECT * FROM base WHERE source <> 'src0'),
         |dd AS (SELECT digest, min(doc_id) AS doc_id FROM train WHERE keep GROUP BY digest),
         |dedup AS (SELECT t.doc_id, t.lang, t.text FROM train t JOIN dd ON t.doc_id = dd.doc_id),
         |g AS (
         |  SELECT doc_id, source, unnest(list_distinct(
         |    CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
         |         ELSE list_transform(generate_series(0, len(w) - 8),
         |                             i -> array_to_string(w[i+1:i+8], ' ')) END)) AS sh
         |  FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)),
         |ev AS (SELECT DISTINCT md5(sh) AS gh FROM g WHERE source = 'src0'),
         |flagged AS (
         |  SELECT DISTINCT d.doc_id
         |  FROM (SELECT doc_id, md5(sh) AS gh FROM g
         |        WHERE doc_id IN (SELECT doc_id FROM dedup)) d
         |  JOIN ev USING (gh)),
         |clean AS (SELECT * FROM dedup WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
         |caps AS (
         |  SELECT lang, ${hexThrSql(
      "floor(sqrt(CAST((SELECT min(n) FROM (SELECT count(*) AS n FROM clean GROUP BY lang)) AS DOUBLE)" +
        " / CAST(count(*) AS DOUBLE)) * 16777216.0)")} AS thr
         |  FROM clean GROUP BY lang),
         |sampled AS (
         |  SELECT c.* FROM clean c JOIN caps USING (lang)
         |  WHERE substr(md5(text), 1, 6) < thr),
         |pk AS (
         |  SELECT substr(md5(text), 1, 2) AS shard, md5(text) AS h, doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
         |  FROM sampled),
         |cums AS (
         |  SELECT shard, toks, sum(toks) OVER (PARTITION BY shard ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM pk),
         |seqs AS (
         |  SELECT DISTINCT shard, CAST(floor(CAST(cum - toks AS DOUBLE) / 256) AS BIGINT) AS seq_id
         |  FROM cums)
         |SELECT '0_raw' AS stage, count(*) AS n FROM train
         |UNION ALL SELECT '1_quality', count(*) FROM train WHERE keep
         |UNION ALL SELECT '2_dedup', count(*) FROM dedup
         |UNION ALL SELECT '3_decon', count(*) FROM clean
         |UNION ALL SELECT '4_sample', count(*) FROM sampled
         |UNION ALL SELECT '5_sequences', count(*) FROM seqs
         |ORDER BY stage""".stripMargin,

    // one divide + one sqrt + one multiply + one floor, all IEEE
    // correctly-rounded with a fixed order — bit-identical thresholds
    // samp_mixture: the weight CASE is generated from the SAME map the
    // operator uses (Curation.mixtureWeights) — no drift possible
    "samp_mixture" ->
      s"""WITH c AS (
         |  SELECT source, count(*) AS n FROM documents GROUP BY source),
         |r AS (
         |  SELECT source, n, ($mixtureWSql) / CAST(n AS DOUBLE) AS r FROM c),
         |t AS (
         |  SELECT source, n,
         |    ${hexThrSql("floor(r / (SELECT max(r) FROM r) * 16777216.0)")} AS thr
         |  FROM r)
         |SELECT d.source, count(*) AS n_total,
         |  CAST(sum(CASE WHEN substr(md5(text), 1, 6) < thr THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  min(thr) AS thr
         |FROM documents d JOIN t ON d.source = t.source
         |GROUP BY d.source ORDER BY d.source""".stripMargin,

    // samp_mixture_train: the DoReMi trajectory unrolled round-from-round
    // (the tx_score_train / pagerankCoreCtes device) over the shared
    // mixtureTrainCtes chain (also consumed by the samp_mixture_trained
    // twin, so trainer and consumer cannot drift).
    "samp_mixture_train" -> {
      val iters = graft.operators.Curation.mixtureTrainIters
      val emit = (1 to iters).map { r =>
        s"UNION ALL SELECT CAST($r AS BIGINT), source, flu, excess, w FROM w$r"
      }.mkString("\n")
      s"""WITH $perplexityPdCtes,
         |$mixtureTrainCtes
         |SELECT CAST(0 AS BIGINT) AS round, source, flu, CAST(0 AS BIGINT) AS excess,
         |  w AS weight FROM w0
         |$emit
         |ORDER BY round, source""".stripMargin
    },

    // samp_mixture_train_excess: the published-form trajectory (frozen
    // clipped excess vs the planted reference table) over its own chain.
    "samp_mixture_train_excess" -> {
      val iters = graft.operators.Curation.mixtureTrainIters
      val emit = (1 to iters).map { r =>
        s"UNION ALL SELECT CAST($r AS BIGINT), source, flu, ref_flu, lam, w FROM xw$r"
      }.mkString("\n")
      s"""WITH $perplexityPdCtes,
         |$mixtureTrainExcessCtes
         |SELECT CAST(0 AS BIGINT) AS round, source, flu, ref_flu,
         |  lam AS excess, w AS weight FROM xw0
         |$emit
         |ORDER BY round, source""".stripMargin
    },

    // samp_mixture_trained_excess: the published-form loop as one query --
    // the excess chain's LAST round joined into samp_mixture's
    // threshold/census algebra (identical tail to samp_mixture_trained).
    "samp_mixture_trained_excess" -> {
      val iters = graft.operators.Curation.mixtureTrainIters
      s"""WITH $perplexityPdCtes,
         |$mixtureTrainExcessCtes,
         |cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         |rr AS MATERIALIZED (
         |  SELECT cnt.source, cnt.n,
         |    CAST(COALESCE(xw$iters.w, 1000000 // ndx.nd) AS DOUBLE)
         |      / CAST(cnt.n AS DOUBLE) AS r
         |  FROM cnt LEFT JOIN xw$iters USING (source), ndx),
         |t AS (
         |  SELECT source, n,
         |    ${hexThrSql("floor(r / (SELECT max(r) FROM rr) * 16777216.0)")} AS thr
         |  FROM rr)
         |SELECT d.source, count(*) AS n_total,
         |  CAST(sum(CASE WHEN substr(md5(text), 1, 6) < thr THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  min(thr) AS thr
         |FROM documents d JOIN t ON d.source = t.source
         |GROUP BY d.source ORDER BY d.source""".stripMargin
    },

    // samp_mixture_trained: the full DoReMi loop as one query -- the
    // shared training chain's LAST round joined into samp_mixture's
    // threshold/census algebra (the same hexThrSql and IEEE op order as
    // the fixed-weight twin); unfitted sources fall to the uniform share
    // 10^6 // nd, mirroring the Spark default.
    "samp_mixture_trained" -> {
      val iters = graft.operators.Curation.mixtureTrainIters
      s"""WITH $perplexityPdCtes,
         |$mixtureTrainCtes,
         |cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         |rr AS MATERIALIZED (
         |  SELECT cnt.source, cnt.n,
         |    CAST(COALESCE(w$iters.w, 1000000 // nd.nd) AS DOUBLE)
         |      / CAST(cnt.n AS DOUBLE) AS r
         |  FROM cnt LEFT JOIN w$iters USING (source), nd),
         |t AS (
         |  SELECT source, n,
         |    ${hexThrSql("floor(r / (SELECT max(r) FROM rr) * 16777216.0)")} AS thr
         |  FROM rr)
         |SELECT d.source, count(*) AS n_total,
         |  CAST(sum(CASE WHEN substr(md5(text), 1, 6) < thr THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  min(thr) AS thr
         |FROM documents d JOIN t ON d.source = t.source
         |GROUP BY d.source ORDER BY d.source""".stripMargin
    },

    // src_jsonl / src_orc: the oracle reads only the parquet ORIGINALS — a
    // hash match certifies the Spark-side format round trip bit-exactly
    "src_jsonl" -> srcRoundTripSql,
    "src_orc" -> srcRoundTripSql,

    "q54_filtered_agg" ->
      """SELECT l_returnflag,
        |  count(*) AS n_all,
        |  count(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) FILTER (WHERE l_discount > 0.05)
        |       AS BIGINT) AS qty_discounted,
        |  count(*) FILTER (WHERE l_returnflag = 'R' AND l_tax > 0.04) AS n_taxed_returns
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q52_rank_stats" ->
      """SELECT doc_id, lang, n_chars,
        |  CAST(rank() OVER w AS BIGINT) AS rk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drk,
        |  percent_rank() OVER w AS prk,
        |  cume_dist() OVER w AS cd
        |FROM documents
        |WINDOW w AS (PARTITION BY lang ORDER BY n_chars)
        |ORDER BY lang, n_chars, doc_id""".stripMargin,

    // q51_histogram: DuckDB has no width_bucket — the twin spells the same
    // exact floor arithmetic (bounds are powers of two, so no FP fuzz)
    "q51_histogram" ->
      """WITH b AS (
        |  SELECT lang,
        |    CAST(CASE WHEN n_chars < 0 THEN 0 WHEN n_chars >= 512 THEN 17
        |         ELSE floor(CAST(n_chars AS DOUBLE) / 32.0) + 1 END AS BIGINT) AS bucket
        |  FROM documents)
        |SELECT lang, bucket,
        |  CASE WHEN bucket = 0 THEN NULL ELSE (bucket - 1) * 32 END AS lo,
        |  CASE WHEN bucket = 17 THEN NULL ELSE bucket * 32 END AS hi,
        |  count(*) AS n_docs
        |FROM b GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,

    // pipeline_release: per-source funnel — gopher gate, best-copy dedup
    // (row_number twin of max_by), mixture thresholds on the deduped census
    "pipeline_release" ->
      s"""WITH $pagerankCoreCtes,
         |$domainCensusCtes,
         |$domainAuthCtes,
         |base0 AS (
         |  SELECT doc_id, source, text, CAST(length(text) AS BIGINT) AS len,
         |    md5(text) AS digest,
         |    ($wordBandSql AND $meanBandSql AND $stopHitsSql) AS keep,
         |    ${scoreRawSql(s"($bigramListSql)")} > 0 AS sc_ok
         |  FROM (SELECT doc_id, source, text, string_split(text, ' ') AS w,
         |          CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |            / len(string_split(text, ' ')) AS ml
         |        FROM documents)),
         |base AS (
         |  SELECT base0.*,
         |    dom.domain IN (SELECT domain FROM auth) AS auth_ok
         |  FROM base0 JOIN dom ON dom.doc_id = base0.doc_id),
         |q AS (SELECT * FROM base WHERE auth_ok AND keep AND sc_ok),
         |k AS (
         |  SELECT *, row_number() OVER (PARTITION BY digest
         |    ORDER BY len DESC, doc_id ASC) AS rn FROM q),
         |keepers AS (SELECT doc_id, source, text FROM k WHERE rn = 1),
         |c AS (SELECT source, count(*) AS n FROM keepers GROUP BY source),
         |r AS (SELECT source, n, ($mixtureWSql) / CAST(n AS DOUBLE) AS r FROM c),
         |t AS (
         |  SELECT source,
         |    ${hexThrSql("floor(r / (SELECT max(r) FROM r) * 16777216.0)")} AS thr
         |  FROM r),
         |sm AS (
         |  SELECT keepers.source, count(*) AS n_release
         |  FROM keepers JOIN t ON keepers.source = t.source
         |  WHERE substr(md5(text), 1, 6) < thr GROUP BY 1)
         |SELECT b.source, count(*) AS n_raw,
         |  CAST(sum(CASE WHEN auth_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_auth,
         |  CAST(sum(CASE WHEN auth_ok AND keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |  CAST(sum(CASE WHEN auth_ok AND keep AND sc_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
         |  COALESCE(max(d.n_dedup), 0) AS n_dedup,
         |  COALESCE(max(sm.n_release), 0) AS n_release
         |FROM base b
         |LEFT JOIN (SELECT source, count(*) AS n_dedup FROM keepers GROUP BY 1) d
         |  ON b.source = d.source
         |LEFT JOIN sm ON b.source = sm.source
         |GROUP BY b.source ORDER BY b.source""".stripMargin,

    // samp_upsample: per-source epoch schedule; fractional epochs realized
    // by the md5-prefix device (same CASE-generated weights as samp_mixture)
    "samp_upsample" ->
      s"""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
         |r AS (SELECT source, n_docs, ($mixtureWSql) / CAST(n_docs AS DOUBLE) AS r FROM c),
         |e AS (SELECT source, n_docs, r / (SELECT min(r) FROM r) AS epochs FROM r),
         |t AS (
         |  SELECT source, n_docs, epochs,
         |    CAST(floor(epochs) AS BIGINT) AS base,
         |    ${hexThrSql("floor((epochs - floor(epochs)) * 16777216.0)")} AS thr
         |  FROM e)
         |SELECT d.source, min(t.n_docs) AS n_docs, min(t.epochs) AS epochs,
         |  min(t.base) AS base, min(t.thr) AS thr,
         |  CAST(sum(CASE WHEN substr(md5(text), 1, 6) < thr THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_extra,
         |  min(t.base) * min(t.n_docs)
         |    + CAST(sum(CASE WHEN substr(md5(text), 1, 6) < thr THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_total
         |FROM documents d JOIN t ON d.source = t.source
         |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "q53_time_range_frame" ->
      s"""SELECT event_id, user_id, ts,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(sum($centsSql) OVER w AS BIGINT) AS cents_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin,

    "samp_temperature" ->
      s"""WITH c AS (
        |  SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |t AS (
        |  SELECT lang, n,
        |    ${hexThrSql(
          "floor(sqrt(CAST((SELECT min(n) FROM c) AS DOUBLE) / CAST(n AS DOUBLE))" +
            " * 16777216.0)")} AS thr
        |  FROM c)
        |SELECT d.lang, count(*) AS n_total,
        |  CAST(sum(CASE WHEN substr(md5(text), 1, 6) < thr THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  min(thr) AS thr
        |FROM documents d JOIN t ON d.lang = t.lang
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    "samp_pack" ->
      """WITH d AS (
        |  SELECT doc_id, substr(md5(text), 1, 2) AS shard, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (
        |  SELECT *, sum(toks) OVER (PARTITION BY shard ORDER BY h, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT shard, CAST(floor(CAST(cum - toks AS DOUBLE) / 256) AS BIGINT) AS seq_id,
        |  count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc
        |FROM c GROUP BY 1, 2 ORDER BY shard, seq_id""".stripMargin,

    // Integer shingle-set sizes and overlap; one double division at the end
    // with the same operand order as the Spark side — bit-identical.
    "decon_jaccard" ->
      """WITH g AS (
        |  SELECT doc_id, source, unnest(list_distinct(
        |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(generate_series(0, len(w) - 3),
        |                             i -> array_to_string(w[i+1:i+3], ' ')) END)) AS sh
        |  FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)),
        |sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
        |ev AS (SELECT doc_id AS eval_doc, sh FROM g WHERE source = 'src0'),
        |tr AS (SELECT doc_id, sh FROM g WHERE source <> 'src0'),
        |ov AS (SELECT tr.doc_id, ev.eval_doc, count(*) AS o
        |       FROM tr JOIN ev USING (sh) GROUP BY 1, 2)
        |SELECT doc_id, eval_doc, jaccard FROM (
        |  SELECT ov.doc_id, eval_doc,
        |    CAST(o AS DOUBLE) / (nt.n + ne.n - o) AS jaccard
        |  FROM ov JOIN sz nt ON ov.doc_id = nt.doc_id
        |          JOIN sz ne ON ov.eval_doc = ne.doc_id)
        |WHERE jaccard >= 0.5 ORDER BY doc_id, eval_doc""".stripMargin,

    "tx_vocab" ->
      """SELECT CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS BIGINT) AS id,
        |  token, n
        |FROM (SELECT token, count(*) AS n
        |      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |      GROUP BY token)
        |ORDER BY id""".stripMargin,

    // dd_spans: duplicated k-gram (k=8) occurrences → per-doc interval merge
    // (gaps-and-islands with a running max-end) → span audit. Parallel
    // unnest of equal-length lists zips positionally in DuckDB, giving the
    // (pos, shingle) pairs the Spark side builds with posexplode. Integer
    // positions/counts throughout; the one division is the same
    // double-by-bigint IEEE op on both sides.
    "dd_spans" ->
      s"""WITH $ddSpanIvCtes,
         |$islandMergeCtes
         |SELECT sp.doc_id, CAST(len(w.w) AS BIGINT) AS n_words,
         |  count(*) AS n_spans,
         |  CAST(sum(se - ss + 1) AS BIGINT) AS dup_words,
         |  CAST(max(se - ss + 1) AS BIGINT) AS max_span,
         |  CAST(sum(se - ss + 1) AS DOUBLE) / CAST(len(w.w) AS BIGINT) AS dup_frac
         |FROM sp JOIN w ON sp.doc_id = w.doc_id
         |GROUP BY sp.doc_id, len(w.w)
         |ORDER BY sp.doc_id""".stripMargin,

    // dd_incremental: incoming 20 % (doc_id mod 5 = 4) classified against
    // the base 80 % — exact digest match wins, else best n-gram Jaccard
    // >= 0.4 (ties to the smallest base id), else unique. The twin joins
    // the full shared-shingle inverted index (no prefix filter needed for
    // correctness — the Spark side's prefix bound is exact, see scaladoc).
    "dd_incremental" ->
      """WITH inc AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 4),
        |base AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 4),
        |ex AS (SELECT i.doc_id, min(b.doc_id) AS bmatch
        |       FROM inc i JOIN base b ON md5(i.text) = md5(b.text) GROUP BY 1),
        |shi AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(generate_series(0, len(w) - 3),
        |                             i -> array_to_string(w[i+1:i+3], ' ')) END)) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM inc)),
        |shb AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(generate_series(0, len(w) - 3),
        |                             i -> array_to_string(w[i+1:i+3], ' ')) END)) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM base)),
        |szi AS (SELECT doc_id, count(*) AS n FROM shi GROUP BY 1),
        |szb AS (SELECT doc_id, count(*) AS n FROM shb GROUP BY 1),
        |ov AS (SELECT i.doc_id AS a, b.doc_id AS b, count(*) AS o
        |       FROM shi i JOIN shb b USING (sh) GROUP BY 1, 2),
        |sc AS (SELECT a, b, CAST(o AS DOUBLE) / (si.n + sb.n - o) AS j
        |       FROM ov JOIN szi si ON si.doc_id = a JOIN szb sb ON sb.doc_id = b),
        |best AS (SELECT a, b AS nmatch, j FROM (
        |           SELECT a, b, j,
        |             row_number() OVER (PARTITION BY a ORDER BY j DESC, b) AS rn
        |           FROM sc WHERE j >= 0.4)
        |         WHERE rn = 1)
        |SELECT i.doc_id,
        |  CASE WHEN ex.bmatch IS NOT NULL THEN 'exact_dup'
        |       WHEN best.nmatch IS NOT NULL THEN 'near_dup'
        |       ELSE 'unique' END AS verdict,
        |  COALESCE(ex.bmatch, best.nmatch) AS match_id,
        |  CASE WHEN ex.bmatch IS NOT NULL THEN CAST(1.0 AS DOUBLE)
        |       ELSE best.j END AS jaccard
        |FROM inc i LEFT JOIN ex ON ex.doc_id = i.doc_id
        |           LEFT JOIN best ON best.a = i.doc_id
        |ORDER BY i.doc_id""".stripMargin,

    // dd_spans_trim: the removal half — same span CTEs as dd_spans, then
    // words outside every span reassemble in position order; the md5 pins
    // the exact reconstructed text (split-then-join is byte-exact).
    "dd_spans_trim" ->
      s"""WITH $ddSpanIvCtes,
         |$islandMergeCtes,
         |${trimReassemblySql("w")}""".stripMargin,

    // pipeline_incremental: the daily-delta audit — Gopher-gate the
    // incoming split, classify survivors against the base (existence of a
    // J >= t partner suffices for the verdict census; the argmax identity
    // is dd_incremental's concern), count per stage.
    "pipeline_incremental" ->
      s"""WITH all0 AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS w,
         |    CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS ml
         |  FROM documents),
         |inc AS (SELECT * FROM all0 WHERE doc_id % 5 = 4),
         |base AS (SELECT doc_id, text FROM all0 WHERE doc_id % 5 <> 4),
         |q AS (SELECT doc_id, text FROM inc
         |      WHERE $wordBandSql AND $meanBandSql AND $stopHitsSql),
         |ex AS (SELECT DISTINCT i.doc_id
         |       FROM q i JOIN base b ON md5(i.text) = md5(b.text)),
         |shi AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
         |         ELSE list_transform(generate_series(0, len(w) - 3),
         |                             i -> array_to_string(w[i+1:i+3], ' ')) END)) AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM q)),
         |shb AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
         |         ELSE list_transform(generate_series(0, len(w) - 3),
         |                             i -> array_to_string(w[i+1:i+3], ' ')) END)) AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM base)),
         |szi AS (SELECT doc_id, count(*) AS n FROM shi GROUP BY 1),
         |szb AS (SELECT doc_id, count(*) AS n FROM shb GROUP BY 1),
         |ov AS (SELECT i.doc_id AS a, b.doc_id AS b, count(*) AS o
         |       FROM shi i JOIN shb b USING (sh) GROUP BY 1, 2),
         |nearhit AS (SELECT DISTINCT a AS doc_id
         |            FROM ov JOIN szi si ON si.doc_id = a
         |                    JOIN szb sb ON sb.doc_id = b
         |            WHERE CAST(o AS DOUBLE) / (si.n + sb.n - o) >= 0.4),
         |v AS (SELECT q.doc_id,
         |        CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
         |             WHEN nh.doc_id IS NOT NULL THEN 'near_dup'
         |             ELSE 'unique' END AS verdict
         |      FROM q LEFT JOIN ex ON ex.doc_id = q.doc_id
         |             LEFT JOIN nearhit nh ON nh.doc_id = q.doc_id)
         |SELECT '0_delta' AS stage, count(*) AS n FROM inc
         |UNION ALL SELECT '1_quality', count(*) FROM q
         |UNION ALL SELECT '2_' || verdict, count(*) FROM v GROUP BY 1
         |ORDER BY stage""".stripMargin,

    // q48_upsert: latest-wins MERGE over the tagged union — arg_max is
    // DuckDB's max_by; versions are distinct per key so ties are impossible
    "q48_upsert" ->
      """SELECT o_orderkey,
        |  arg_max(o_orderstatus, version) AS o_orderstatus,
        |  arg_max(o_totalprice, version) AS o_totalprice,
        |  CAST(max(version) AS INT) AS version
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS version FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'X', o_totalprice + 10.0, 1 FROM orders
        |  WHERE o_orderkey % 7 = 0)
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    // q49_scd2: SCD2 history via the lag-change-flag / running-sum islands
    // pattern; state is constant within an island so min() is the value
    "q49_scd2" ->
      """WITH flagged AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), islands AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM flagged
        |), periods AS (
        |  SELECT user_id, grp, min(event_type) AS state, min(ts) AS valid_from,
        |    count(*) AS n_events
        |  FROM islands GROUP BY user_id, grp
        |)
        |SELECT user_id, state, valid_from,
        |  lead(valid_from) OVER v AS valid_to,
        |  lead(valid_from) OVER v IS NULL AS is_current,
        |  n_events
        |FROM periods
        |WINDOW v AS (PARTITION BY user_id ORDER BY grp)
        |ORDER BY user_id, grp""".stripMargin,

    "q55_sliding_window" ->
      """SELECT time_bucket(INTERVAL '15 minutes', ts) - INTERVAL (k*15) MINUTE AS w_start,
        |  event_type, count(*) AS n
        |FROM events, range(4) t(k)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "profile_table" ->
      Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  CAST(COALESCE(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct FROM documents""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),

    "ev_transitions" ->
      """WITH e AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type, count(*) AS n,
        |  CAST(count(*) AS DOUBLE) /
        |    CAST(sum(count(*)) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        |FROM e WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,

    "tx_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |h AS (
        |  SELECT doc_id, ch, count(*) AS n FROM c WHERE ch <> '' GROUP BY 1, 2)
        |SELECT d.doc_id,
        |  COALESCE(CAST(sum(h.n) AS BIGINT), 0) AS n_chars,
        |  CAST(count(h.ch) AS BIGINT) AS n_distinct_chars,
        |  COALESCE(CAST(max(h.n) AS BIGINT), 0) AS top_char_n,
        |  COALESCE(CAST(sum(h.n * h.n) AS BIGINT), 0) AS coll_sum
        |FROM documents d LEFT JOIN h USING (doc_id)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q56_mode" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |  arg_max(event_type, lpad(CAST(n AS VARCHAR), 19, '0') || event_type) AS mode_type,
        |  arg_max(n, lpad(CAST(n AS VARCHAR), 19, '0') || event_type) AS mode_n,
        |  count(*) AS n_types
        |FROM c GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "ev_dwell" ->
      """WITH e AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER w AS to_type,
        |    lead(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT from_type, to_type, count(*) AS n,
        |  CAST(sum(gap_us) AS BIGINT) AS gap_us_sum,
        |  CAST(max(gap_us) AS BIGINT) AS gap_us_max,
        |  CAST(sum(gap_us) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS gap_us_mean
        |FROM e WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,

    "ev_reach" ->
      """WITH e AS (
        |  SELECT event_type, user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |f AS (SELECT event_type, user_id, min(day) AS day FROM e GROUP BY 1, 2),
        |d AS (SELECT event_type, day, count(*) AS n_new FROM f GROUP BY 1, 2),
        |a AS (SELECT DISTINCT event_type, day FROM e)
        |SELECT a.event_type, strftime(a.day, '%Y-%m-%d') AS day,
        |  CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
        |  CAST(sum(COALESCE(n_new, 0))
        |    OVER (PARTITION BY a.event_type ORDER BY a.day) AS BIGINT) AS reach
        |FROM a LEFT JOIN d USING (event_type, day)
        |ORDER BY a.event_type, day""".stripMargin,

    "tx_readability" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        |FROM documents ORDER BY doc_id""".stripMargin,

    "samp_importance" ->
      """WITH gr AS (
        |  SELECT doc_id, lang, unnest(
        |    CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(generate_series(0, len(w) - 2),
        |                             i -> array_to_string(w[i+1:i+2], ' ')) END) AS gram
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)),
        |g AS (SELECT doc_id, lang, substr(md5(gram), 1, 3) AS b FROM gr),
        |stats AS (
        |  SELECT b, count(*) AS n_raw,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_target
        |  FROM g GROUP BY b),
        |db AS (SELECT doc_id, b, count(*) AS c FROM g GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(sum(c * n_target) AS BIGINT) AS score_num,
        |  CAST(sum(c * n_raw) AS BIGINT) AS score_den,
        |  CAST(sum(c * n_target) AS DOUBLE) / CAST(sum(c * n_raw) AS DOUBLE) AS score
        |FROM db JOIN stats USING (b)
        |GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,

    // samp_dsir: published-form DSIR — the same hashed-bigram buckets as
    // the samp_importance twin, add-1-smoothed log2Fp ratio weights via
    // the generic keyed recurrence (TWO instantiations: the Gumbel key is
    // a log of a log), exact-integer lambda + base-2 Gumbel top-k. Every
    // constant shared with the operator object.
    "samp_dsir" -> {
      import graft.operators.Curation.{dsirTargetLang, dsirHexChars, dsirTopK}
      val b = math.pow(16, dsirHexChars).toLong
      s"""WITH RECURSIVE gr AS (
         |  SELECT doc_id, lang, unnest(
         |    CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
         |         ELSE list_transform(generate_series(0, len(w) - 2),
         |                             i -> array_to_string(w[i+1:i+2], ' ')) END) AS gram
         |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
         |        WHERE text IS NOT NULL)),
         |g AS (SELECT doc_id, lang, substr(md5(gram), 1, $dsirHexChars) AS b FROM gr),
         |stats AS MATERIALIZED (
         |  SELECT b, CAST(count(*) AS BIGINT) AS n_raw,
         |    CAST(sum(CASE WHEN lang = '$dsirTargetLang' THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_tgt
         |  FROM g GROUP BY b),
         |tot AS (SELECT CAST(sum(n_raw) AS BIGINT) AS t_raw,
         |               CAST(sum(n_tgt) AS BIGINT) AS t_tgt FROM stats),
         |lin AS (
         |  SELECT 't|' || b AS key, n_tgt + 1 AS v FROM stats
         |  UNION ALL SELECT 'r|' || b, n_raw + 1 FROM stats
         |  UNION ALL SELECT 'T', t_tgt + $b FROM tot
         |  UNION ALL SELECT 'R', t_raw + $b FROM tot
         |  UNION ALL SELECT 'h|' || CAST(doc_id AS VARCHAR),
         |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '|dsir42'),
         |                             1, 5)) AS BIGINT) + 1
         |  FROM (SELECT DISTINCT doc_id FROM g)),
         |${log2FpValCtes("")},
         |lin2 AS (SELECT key, greatest(CAST(1 AS BIGINT), 20971520 - fp) AS v
         |         FROM lg WHERE key LIKE 'h|%'),
         |${log2FpValCtes("2")},
         |wt AS (
         |  SELECT s.b, lt2.fp - lr2.fp AS wt
         |  FROM stats s JOIN lg lt2 ON lt2.key = 't|' || s.b
         |               JOIN lg lr2 ON lr2.key = 'r|' || s.b),
         |cons AS (SELECT lR.fp - lT.fp AS c
         |         FROM lg lR, lg lT WHERE lR.key = 'R' AND lT.key = 'T'),
         |db AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY 1, 2),
         |lam AS (
         |  SELECT doc_id,
         |    CAST(sum(c * wt) + sum(c) * (SELECT c FROM cons) AS BIGINT) AS lambda_fp
         |  FROM db JOIN wt USING (b) GROUP BY doc_id),
         |gum AS (SELECT CAST(substr(key, 3) AS BIGINT) AS doc_id,
         |               20971520 - fp AS gumbel_fp FROM lg2)
         |SELECT doc_id, lambda_fp, gumbel_fp,
         |  lambda_fp + gumbel_fp AS key_fp
         |FROM lam JOIN gum USING (doc_id)
         |ORDER BY key_fp DESC, doc_id LIMIT $dsirTopK""".stripMargin
    },

    // pipeline_card: the per-(lang, source) data card; every component
    // reuses the shared SQL fragments so card and operators cannot drift
    "pipeline_card" ->
      s"""WITH d AS (
         |  SELECT lang, source, length(text) AS len, len(w) AS nw,
         |    md5(text) AS digest,
         |    ($wordBandSql AND $meanBandSql AND $stopHitsSql) AS keep
         |  FROM (SELECT lang, source, text, w,
         |          CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w) AS ml
         |        FROM (SELECT lang, source, text,
         |                string_split(text, ' ') AS w FROM documents))
         |)
         |SELECT lang, source,
         |  count(*) AS n_docs,
         |  CAST(sum(len) AS BIGINT) AS n_chars,
         |  CAST(sum(nw) AS BIGINT) AS n_words,
         |  quantile_cont(nw, 0.5) AS p50_words,
         |  count(*) - count(DISTINCT digest) AS n_dup_docs,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok
         |FROM d GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    // q50_gapfill: dense hourly spine per type via generate_series; missing
    // hours surface as n=0 / gap_filled=true
    "q50_gapfill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n_raw
        |  FROM events GROUP BY 1, 2
        |), spine AS (
        |  SELECT event_type, unnest(generate_series(min(h), max(h),
        |    INTERVAL 1 HOUR)) AS h
        |  FROM hourly GROUP BY event_type
        |)
        |SELECT s.event_type, s.h,
        |  CAST(coalesce(hh.n_raw, 0) AS BIGINT) AS n,
        |  hh.n_raw IS NULL AS gap_filled
        |FROM spine s LEFT JOIN hourly hh
        |  ON hh.event_type = s.event_type AND hh.h = s.h
        |ORDER BY s.event_type, s.h""".stripMargin,

    // dd_exact_best: per-digest best copy by (quality, length, -doc_id);
    // the row_number formulation is equivalent to Spark's max_by-over-struct
    // tx_score: hashed-bigram linear scorer; the weight CASE is built from
    // the SAME scoreWeights constant the Spark fold compiles
    "tx_score" ->
      s"""WITH g AS (
         |  SELECT doc_id, $bigramListSql AS gs
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w
         |        FROM documents WHERE text IS NOT NULL))
         |SELECT doc_id,
         |  CAST(len(gs) AS BIGINT) AS n_grams,
         |  ${scoreRawSql("gs")} AS score_raw,
         |  CASE WHEN len(gs) > 0
         |       THEN CAST(${scoreRawSql("gs")} AS DOUBLE) / CAST(len(gs) AS DOUBLE)
         |  END AS score,
         |  ${scoreRawSql("gs")} > 0 AS keep
         |FROM g ORDER BY doc_id""".stripMargin,

    "tx_score_train" ->
      s"""WITH $scoreTrainCtes
         |SELECT unnest(generate_series(0, 15)) AS bucket,
         |  unnest([${(0 until 16).map(i => s"e$i").mkString(", ")}]) AS weight
         |FROM weff ORDER BY bucket""".stripMargin,

    "tx_score_trained" ->
      s"""WITH $scoreTrainCtes
         |SELECT doc_id, n AS n_grams,
         |  CAST($trainedMarginSql AS BIGINT) AS score_raw,
         |  CASE WHEN n > 0
         |       THEN CAST(($trainedMarginSql) AS DOUBLE) / CAST(n AS DOUBLE)
         |  END AS score,
         |  ($trainedMarginSql) > 0 AS keep
         |FROM feat, weff ORDER BY doc_id""".stripMargin,

    // tx_url family: the plant CASEs and the blocklist IN-list are built
    // from the SAME Scala constants the Spark operators compile
    // (TextAnalysis.urlHosts/urlBlocklist — the mixtureWeights device)
    "tx_url" ->
      s"""WITH u AS (SELECT doc_id, $urlPlantSql AS url FROM documents),
         |p AS (SELECT doc_id, url,
         |        string_split(url, '://')[1] AS scheme,
         |        string_split(url, '://')[2] AS rest FROM u),
         |h AS (SELECT doc_id, url, scheme, rest,
         |        string_split(rest, '/')[1] AS hostport FROM p),
         |x AS (SELECT doc_id, url, scheme,
         |        string_split(hostport, ':')[1] AS host,
         |        CASE WHEN len(string_split(hostport, ':')) > 1
         |             THEN CAST(string_split(hostport, ':')[2] AS BIGINT) END AS port,
         |        string_split(substr(rest, length(hostport) + 1), '?')[1] AS path
         |      FROM h),
         |d AS (SELECT *, string_split(host, '.')[-2] || '.' ||
         |        string_split(host, '.')[-1] AS domain FROM x)
         |SELECT doc_id, url, scheme, host, port, path, domain,
         |  domain IN ($urlBlockSql) AS blocked
         |FROM d ORDER BY doc_id""".stripMargin,

    "tx_url_dedup" ->
      s"""WITH u AS (SELECT doc_id, $urlPlantSql AS url FROM documents),
         |r AS (SELECT doc_id, string_split(url, '://')[2] AS rest FROM u),
         |hp AS (SELECT doc_id, rest, string_split(rest, '/')[1] AS hostport FROM r),
         |n AS (SELECT doc_id,
         |        regexp_replace(string_split(hostport, ':')[1], '^www\\.', '') ||
         |        string_split(substr(rest, length(hostport) + 1), '?')[1] AS norm_url
         |      FROM hp)
         |SELECT norm_url, min(doc_id) AS keeper, count(*) AS n_copies
         |FROM n GROUP BY 1 HAVING count(*) > 1 ORDER BY norm_url""".stripMargin,

    "tx_url_hosts" ->
      s"""WITH x AS (SELECT doc_id, $hostFromUrlSql AS host FROM documents),
         |d AS (SELECT doc_id, host, $domainOfHostSql AS domain FROM x)
         |SELECT domain, count(*) AS n_docs,
         |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
         |  domain IN ($urlBlockSql) AS blocked
         |FROM d GROUP BY domain ORDER BY domain""".stripMargin,

    // tx_extract: the plant mirrors TextAnalysis.htmlPlant literal-for-
    // literal (chr(10) = the Scala '\n'); patterns are the same RE2 ∩
    // java.util.regex subset; the link-density test is the exact integer
    // comparison links*2 <= words on both engines.
    "tx_extract" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      '<html><head><title>t' || CAST(doc_id AS VARCHAR) ||
        |      '</title><style>p{margin:0}</style><script>var a=1;</script></head><body>' || chr(10) ||
        |      '<div id="nav"><a href="/home">home</a> <a href="/about">about</a> <a href="/faq">faq</a></div>' || chr(10) ||
        |      '<p>' || text || '</p>' || chr(10) ||
        |      '<div id="foot"><a href="/c">contact</a> <a href="/p">privacy</a> <a href="/t">terms</a> copyright</div>' || chr(10) ||
        |      '</body></html>'
        |    ELSE text END AS t
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (
        |  SELECT doc_id, t,
        |    regexp_replace(regexp_replace(t,
        |      '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        |      '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS clean
        |  FROM p),
        |st AS (
        |  SELECT doc_id, t, lines,
        |    list_transform(lines, x -> {
        |      'links': len(string_split(x, '<a ')) - 1,
        |      's': trim(regexp_replace(regexp_replace(x, '<[^>]*>', '', 'g'), ' +', ' ', 'g'))
        |    }) AS stats
        |  FROM (SELECT doc_id, t, string_split(clean, chr(10)) AS lines FROM c)),
        |k AS (
        |  SELECT doc_id, t, lines, stats,
        |    list_filter(stats, z -> len(string_split(z.s, ' ')) >= 3
        |                        AND z.links * 2 <= len(string_split(z.s, ' '))) AS kept
        |  FROM st),
        |f AS (
        |  SELECT doc_id,
        |    regexp_matches(t, '<[a-z]') AS had_html,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(len(kept) AS BIGINT) AS n_kept,
        |    CAST(list_sum(list_transform(stats, z -> z.links)) AS BIGINT) AS n_links,
        |    array_to_string(list_transform(kept, z -> z.s), ' ') AS cleaned
        |  FROM k)
        |SELECT doc_id, had_html, n_lines, n_kept, n_links,
        |  CAST(length(cleaned) AS BIGINT) AS clean_len,
        |  md5(cleaned) AS clean_digest
        |FROM f ORDER BY doc_id""".stripMargin,

    // dd_lines: dd_para's chunk device + ordinality (struct list), the
    // same first-occurrence total order (doc_id, pos), and an ordered
    // string_agg reassembly — the digest certifies the rewrite itself
    "dd_lines" ->
      """WITH ch AS (
        |  SELECT doc_id, pc.pos AS pos, pc.chunk AS chunk, md5(pc.chunk) AS digest
        |  FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(0, (len(w) - 1) // 16),
        |      i -> {'pos': i, 'chunk': array_to_string(w[i*16+1:i*16+16], ' ')})) AS pc
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w
        |          FROM documents WHERE text IS NOT NULL))),
        |rk AS (
        |  SELECT doc_id, pos, chunk,
        |    row_number() OVER (PARTITION BY digest ORDER BY doc_id, pos) AS rn
        |  FROM ch),
        |reb AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(chunk, ' ' ORDER BY pos) AS t
        |  FROM rk WHERE rn = 1 GROUP BY doc_id),
        |base AS (
        |  SELECT doc_id,
        |    CAST((len(string_split(text, ' ')) - 1) // 16 + 1 AS BIGINT) AS n_chunks
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT base.doc_id, n_chunks,
        |  CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
        |  md5(COALESCE(t, '')) AS text_digest
        |FROM base LEFT JOIN reb ON base.doc_id = reb.doc_id
        |ORDER BY base.doc_id""".stripMargin,

    "ev_paths" ->
      """WITH rk AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, ' > ' ORDER BY rn) AS path
        |  FROM rk WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM p GROUP BY path
        |ORDER BY n_users DESC, path""".stripMargin,

    // rel_diff: presence via explicit flags (not digest nullness — a
    // null-text doc must not read as absent); both-present digests compare
    // null-safely, mirroring the Spark <=> exactly
    "rel_diff" ->
      s"""WITH v1 AS (SELECT doc_id, md5(text) AS d1, true AS in1 FROM documents),
        |v2 AS (
        |  SELECT doc_id, md5(text) AS d2, true AS in2 FROM ($driftV2Sql)),
        |j AS (
        |  SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        |    CASE WHEN in1 IS NULL THEN 'added'
        |         WHEN in2 IS NULL THEN 'removed'
        |         WHEN d1 IS NOT DISTINCT FROM d2 THEN 'unchanged'
        |         ELSE 'changed' END AS status
        |  FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT status, count(*) AS n,
        |  CAST(min(doc_id) AS BIGINT) AS min_id,
        |  CAST(max(doc_id) AS BIGINT) AS max_id
        |FROM j GROUP BY status ORDER BY status""".stripMargin,

    // profile_drift: the UNION-of-two-censuses spelling (one scan per
    // feature is fine for the oracle; the Spark side rides one explode);
    // same driftV2Sql plant as rel_diff, shares in exact integer ppm
    "profile_drift" -> {
      def census(src: String, n: String): String =
        s"""SELECT 'lang' AS feature, COALESCE(lang, '(null)') AS bucket,
           |  CAST(count(*) AS BIGINT) AS $n FROM $src GROUP BY 2
           |UNION ALL
           |SELECT 'len_c', CAST(COALESCE(length(text) // 100, -1) AS VARCHAR),
           |  CAST(count(*) AS BIGINT) FROM $src GROUP BY 2""".stripMargin
      s"""WITH v2 AS ($driftV2Sql),
         |f1 AS (${census("documents", "n1")}),
         |f2 AS (${census("v2", "n2")}),
         |j AS (
         |  SELECT COALESCE(f1.feature, f2.feature) AS feature,
         |    COALESCE(f1.bucket, f2.bucket) AS bucket,
         |    COALESCE(n1, 0) AS n1, COALESCE(n2, 0) AS n2
         |  FROM f1 FULL JOIN f2
         |    ON f1.feature = f2.feature AND f1.bucket = f2.bucket)
         |SELECT feature, bucket, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |  CAST((n1 * 1000000) // sum(n1) OVER (PARTITION BY feature) AS BIGINT)
         |    AS share1_ppm,
         |  CAST((n2 * 1000000) // sum(n2) OVER (PARTITION BY feature) AS BIGINT)
         |    AS share2_ppm,
         |  CAST((n1 * 1000000) // sum(n1) OVER (PARTITION BY feature)
         |     - (n2 * 1000000) // sum(n2) OVER (PARTITION BY feature) AS BIGINT)
         |    AS delta_ppm
         |FROM j ORDER BY feature, bucket""".stripMargin
    },

    "embed_rp" -> embedRpSql,

    "src_csv" -> srcRoundTripSql,

    // samp_curriculum: score → exact quartile phases → the samp_shuffle
    // shard/pos device per (phase, shard)
    "samp_curriculum" ->
      s"""WITH g AS (
         |  SELECT doc_id, ($bigramListSql) AS gs
         |  FROM (SELECT doc_id, text, string_split(text, ' ') AS w
         |        FROM documents WHERE text IS NOT NULL)),
         |sc AS (SELECT doc_id,
         |         CAST(${scoreRawSql("gs")} AS DOUBLE) / len(gs) AS score
         |       FROM g),
         |c AS (SELECT quantile_cont(score, 0.25) AS p25,
         |        quantile_cont(score, 0.5) AS p50,
         |        quantile_cont(score, 0.75) AS p75 FROM sc),
         |ph AS (SELECT doc_id,
         |         CAST(CASE WHEN score >= p75 THEN 0 WHEN score >= p50 THEN 1
         |              WHEN score >= p25 THEN 2 ELSE 3 END AS BIGINT) AS phase,
         |         md5(CAST(doc_id AS VARCHAR) || '|shuffle42') AS h
         |       FROM sc, c),
         |sh AS (SELECT doc_id, phase, h,
         |         CAST(concat('0x', substr(h, 1, 6)) AS BIGINT) % 8 AS shard
         |       FROM ph)
         |SELECT doc_id, phase, shard,
         |  CAST(row_number() OVER (PARTITION BY phase, shard ORDER BY h, doc_id)
         |       AS BIGINT) - 1 AS pos
         |FROM sh ORDER BY phase, shard, pos""".stripMargin,

    "samp_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR) || '|shuffle42') AS h
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, h,
        |    CAST(concat('0x', substr(h, 1, 6)) AS BIGINT) % 8 AS shard
        |  FROM h)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) - 1
        |    AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,

    "profile_embeddings" ->
      """SELECT label,
        |  count(*) AS n_vecs,
        |  CAST(min(len(embedding)) AS BIGINT) AS dims_min,
        |  CAST(max(len(embedding)) AS BIGINT) AS dims_max,
        |  CAST(sum(CASE WHEN list_max(list_transform(embedding,
        |         x -> abs(CAST(x AS DOUBLE)))) = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero_norm,
        |  CAST(sum(list_sum(list_transform(embedding,
        |         x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)))) AS BIGINT)
        |    AS qsum
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    // decon_url: the tx_url_dedup normalization (one shared definition on
    // the Spark side; this twin spells the identical split chain)
    "decon_url" ->
      s"""WITH $deconUrlCtes
         |SELECT doc_id, norm_url, eval_min, n_eval
         |FROM n JOIN e USING (norm_url)
         |WHERE doc_id % 3 <> 0 ORDER BY doc_id""".stripMargin,

    // pipeline_decon: the residue-slice decon screens composed into one
    // per-source funnel census — flags from the SAME url/span CTE chains
    // as the standalone screens
    "pipeline_decon" ->
      s"""WITH $deconUrlCtes,
         |uflag AS (SELECT DISTINCT n.doc_id FROM n JOIN e USING (norm_url)
         |          WHERE doc_id % 3 <> 0),
         |$deconSpanIvCtes,
         |sflag AS (SELECT DISTINCT doc_id FROM iv),
         |train AS (SELECT doc_id, source FROM documents
         |          WHERE text IS NOT NULL AND doc_id % 3 <> 0)
         |SELECT source, count(*) AS n_train,
         |  CAST(sum(CASE WHEN u.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_url,
         |  CAST(sum(CASE WHEN sf.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN u.doc_id IS NOT NULL OR sf.doc_id IS NOT NULL
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  CAST(count(*) - sum(CASE WHEN u.doc_id IS NOT NULL OR sf.doc_id IS NOT NULL
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
         |FROM train t
         |LEFT JOIN uflag u ON u.doc_id = t.doc_id
         |LEFT JOIN sflag sf ON sf.doc_id = t.doc_id
         |GROUP BY source ORDER BY source""".stripMargin,

    // decon_spans: dd_spans' k-gram + islands SQL with the duplicated-gram
    // set replaced by the eval slice's distinct grams (joined as strings —
    // the Spark side joins 64-bit hashes of the same grams)
    "decon_spans" ->
      s"""WITH $deconSpanIvCtes,
         |$islandMergeCtes
         |SELECT sp.doc_id, CAST(len(w.w) AS BIGINT) AS n_words,
         |  count(*) AS n_spans,
         |  CAST(sum(se - ss + 1) AS BIGINT) AS overlap_words,
         |  CAST(max(se - ss + 1) AS BIGINT) AS max_span,
         |  CAST(sum(se - ss + 1) AS DOUBLE) / CAST(len(w.w) AS BIGINT) AS overlap_frac
         |FROM sp JOIN w ON sp.doc_id = w.doc_id
         |GROUP BY sp.doc_id, len(w.w)
         |ORDER BY sp.doc_id""".stripMargin,

    // decon_spans_trim: the shared reassembly over the eval-overlap
    // intervals, training slice only
    "decon_spans_trim" ->
      s"""WITH $deconSpanIvCtes,
         |$islandMergeCtes,
         |tr AS (SELECT doc_id, w FROM w WHERE NOT is_eval),
         |${trimReassemblySql("tr")}""".stripMargin,

    // ev_ewma: the sequential recurrence replayed with list_reduce —
    // acc-first left fold, first element init, matching Spark's
    // aggregate(slice(xs, 2, ...), xs[0], ...) exactly; `//` == `div`
    // because cents are non-negative on this domain
    "ev_ewma" -> {
      val a = graft.operators.Relational.ewmaAlphaMillionths
      s"""WITH ev AS (
         |  SELECT user_id, $centsSql AS cents,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         |  FROM events),
         |xs AS (SELECT user_id, list(cents ORDER BY rn) AS xs FROM ev GROUP BY user_id)
         |SELECT user_id, CAST(len(xs) AS BIGINT) AS n_events,
         |  xs[1] AS first_cents, xs[-1] AS last_cents,
         |  CAST(CASE WHEN len(xs) = 1 THEN xs[1]
         |       ELSE list_reduce(xs, (s, x) -> ($a * x + ${1000000L - a} * s) // 1000000)
         |       END AS BIGINT) AS ewma_cents
         |FROM xs ORDER BY user_id""".stripMargin
    },

    // ev_coverage: the shared islands chain on the time axis
    "ev_coverage" ->
      s"""WITH iv AS (
         |  SELECT user_id AS doc_id, epoch_us(ts) AS st,
         |    epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT) AS e
         |  FROM events),
         |$islandMergeCtes
         |SELECT doc_id AS user_id, count(*) AS n_sessions,
         |  CAST(sum(se - ss) AS BIGINT) AS covered_us,
         |  CAST(max(se - ss) AS BIGINT) AS longest_us
         |FROM sp GROUP BY doc_id ORDER BY user_id""".stripMargin,

    "ev_attribution" ->
      s"""WITH e AS (
         |  SELECT event_type, $centsSql AS cents,
         |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
         |  FROM events)
         |SELECT COALESCE(channel, '(none)') AS channel,
         |  count(*) AS n_purchases,
         |  CAST(sum(cents) AS BIGINT) AS cents_sum
         |FROM e WHERE event_type = 'purchase'
         |GROUP BY 1 ORDER BY channel""".stripMargin,

    "graph_pagerank" -> graphPagerankSql,
    "graph_hits" -> graphHitsSql,

    "graph_domains" ->
      s"""WITH $pagerankCoreCtes,
         |$domainCensusCtes
         |SELECT domain, n_docs, pr_sum, pr_mean, blocked
         |FROM da ORDER BY domain""".stripMargin,

    // `Graph.graph_cc`'s twin — the shared round unroll ([[ccCtes]]),
    // then the component census over the per-doc label map.
    "graph_cc" ->
      s"""WITH $ccCtes
         |SELECT CAST(coalesce(l.c, d.doc_id) AS BIGINT) AS component,
         |  CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(max(d.doc_id) AS BIGINT) AS max_member
         |FROM documents d LEFT JOIN lblmap l ON l.v = d.doc_id
         |GROUP BY coalesce(l.c, d.doc_id)
         |ORDER BY n_members DESC, component""".stripMargin,

    // `Graph.ccLabels`' twin — the SAME rounds, emitted per document
    // instead of aggregated: the census twin derives from this frame by
    // construction, so the two can never disagree on membership.
    "graph_cc_labels" ->
      s"""WITH $ccCtes
         |SELECT d.doc_id,
         |  CAST(coalesce(l.c, d.doc_id) AS BIGINT) AS component
         |FROM documents d LEFT JOIN lblmap l ON l.v = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "graph_degrees" ->
      s"""WITH e AS (
         |  $graphEdgesSql),
         |od AS (SELECT src AS v, count(*) AS outdeg FROM e GROUP BY 1),
         |idg AS (SELECT dst AS v, count(*) AS indeg FROM e GROUP BY 1),
         |nd AS (
         |  SELECT d.doc_id AS v,
         |    CAST(COALESCE(outdeg, 0) AS BIGINT) AS outdeg,
         |    CAST(COALESCE(indeg, 0) AS BIGINT) AS indeg
         |  FROM documents d
         |  LEFT JOIN od ON od.v = d.doc_id
         |  LEFT JOIN idg ON idg.v = d.doc_id)
         |SELECT outdeg, indeg, count(*) AS n_nodes,
         |  CAST(min(v) AS BIGINT) AS first_node
         |FROM nd GROUP BY 1, 2 ORDER BY outdeg, indeg""".stripMargin,

    "dd_exact_best" ->
      s"""WITH d AS (
         |  SELECT doc_id, md5(text) AS digest, length(text) AS len,
         |    ($wordBandSql AND $meanBandSql AND $stopHitsSql) AS keep
         |  FROM (SELECT doc_id, text, w,
         |          CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w) AS ml
         |        FROM (SELECT doc_id, text, string_split(text, ' ') AS w
         |              FROM documents WHERE text IS NOT NULL))
         |), r AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY digest
         |      ORDER BY keep DESC, len DESC, doc_id ASC) AS rn,
         |    count(*) OVER (PARTITION BY digest) AS n_copies
         |  FROM d)
         |SELECT digest, doc_id AS keeper, keep AS keeper_ok,
         |  len AS keeper_len, n_copies
         |FROM r WHERE rn = 1 ORDER BY digest""".stripMargin,
  )
}
