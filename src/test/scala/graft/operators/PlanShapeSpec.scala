package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-quality guards: these assert the *physical plan properties* the
  * 100 TB design depends on, so a refactor that silently loses a broadcast
  * or un-pushes a filter fails CI — not just the wall clock.
  */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.sparkPlan.toString

  test("q01: filter and projection pushed to the parquet scan") {
    val p = plan(Relational.q01_scan_agg(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    // 11-column table read as 6 columns: pruned columns absent from the scan
    assert(p.contains("FileScan parquet [l_quantity"))
    assert(!p.contains("l_orderkey"))
  }

  test("q01: aggregation is map-side partial (two HashAggregates)") {
    val p = plan(Relational.q01_scan_agg(spark, dir))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q04: all dimension joins broadcast — exactly one real shuffle pair") {
    val p = plan(Relational.q04_join5_agg(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "dimension tables must join via broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q05: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan(Relational.q05_topk(spark, dir))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q55: sliding windows Expand map-side — one aggregate shuffle plus the output sort, never 4 passes") {
    // sparkPlan predates EnsureRequirements — count exchanges on the
    // executed plan, where they are actually inserted
    val p = Relational.q55_sliding_window(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("Expand"), "sliding windows must expand in-plan")
    assert("Exchange".r.findAllIn(p).size == 2,
      s"expected the aggregate exchange + the orderBy range exchange only:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "partial + final aggregate")
  }

  test("tx_entropy: per-doc char histogram is MAP-SIDE — the output sort is the only exchange") {
    // the naive spelling (explode chars -> groupBy(doc, char)) shuffles
    // every character of the corpus; the HOF run-length fold shuffles nothing
    // loadParallel's round-robin split of the single small test file is
    // read-parallelism, not a data shuffle — exclude it; the histogram must
    // add NO hashpartitioning exchange (the explode->groupBy spelling would)
    val p = TextAnalysis.tx_entropy(spark, dir).queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning"),
      s"per-doc histogram must not shuffle by any key:\n$p")
    assert("rangepartitioning".r.findAllIn(p).size == 1,
      s"expected only the orderBy range exchange:\n$p")
    assert(!p.contains("Generate"), "no explode in the entropy path")
  }

  test("tx_extract: the whole extraction is MAP-SIDE — the output sort is the only exchange") {
    val p = TextAnalysis.tx_extract(spark, dir).queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning"),
      s"per-doc extraction must not shuffle by any key:\n$p")
    assert("rangepartitioning".r.findAllIn(p).size == 1,
      s"expected only the orderBy range exchange:\n$p")
    assert(!p.contains("Generate"), "no explode in the extraction path")
  }

  test("samp_reservoir: rank limit pushes MAP-SIDE (WindowGroupLimit Partial) — each task ships at most k rows per stratum") {
    // Catalyst's InferWindowGroupLimit only fires for a lone ranking
    // function; adding a second window fn to the same spec would silently
    // drop the pushdown and ship whole strata into the shuffle at 100 TB
    val p = Curation.samp_reservoir(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"expected the partial rank-limit before the stratum shuffle:\n$p")
  }

  test("samp_importance: bucket stats broadcast into the scoring join — the doc side never reshuffles for it") {
    val p = Curation.samp_importance(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"expected the 16^3-row stats side broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"stats join must not sort-merge:\n$p")
  }

  test("q49: SCD2 plans ONE data shuffle — both windows and the islands aggregate reuse hash(user_id)") {
    // sparkPlan predates EnsureRequirements — count exchanges on the
    // executed plan, where they are actually inserted
    val p = Relational.q49_scd2(spark, dir).queryExecution.executedPlan.toString
    // exactly 2 exchanges: the user_id hash partition + the final orderBy's
    // range partition; a third would mean the (user_id, grp) aggregate or
    // period-chain window stopped accepting the user_id clustering
    assert("Exchange".r.findAllIn(p).size == 2, s"expected 2 exchanges:\n$p")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
  }

  test("tx_compress: column pruning survives the typed mapPartitions boundary") {
    val p = plan(TextAnalysis.tx_compress(spark, dir))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"the deflate scan must read 2 of 5 columns:\n$p")
  }

  test("tx_bpe_encode: vocabulary joins broadcast; scan prunes to (doc_id, text)") {
    val p = plan(TextAnalysis.tx_bpe_encode(spark, dir, merges = 2))
    assert(p.contains("BroadcastHashJoin"),
      s"the vocab build side must broadcast, not shuffle the corpus:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("q09/q10: EXISTS/NOT EXISTS plan as semi/anti joins") {
    assert(plan(Relational.q09_semi_join(spark, dir)).contains("LeftSemi"))
    assert(plan(Relational.q10_anti_join(spark, dir)).contains("LeftAnti"))
  }

  test("q16: range join broadcasts the band table (no fact shuffle)") {
    val p = plan(Relational.q16_range_join(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("dd_exact: digest group-by is partially aggregated before the shuffle") {
    val p = plan(Dedup.dd_exact(spark, dir))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("ann_bruteforce: query side broadcast, corpus side stays partitioned") {
    val p = plan(Similarity.ann_bruteforce(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("dd_ngram_jaccard: prefix-filter candidate join is an equi-join, never cartesian") {
    val p = plan(Dedup.dd_ngram_jaccard(spark, dir))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("dd_embed_lsh: bucket join is an equi-join (vs the all-pairs baseline's NL join)") {
    assert(!plan(Dedup.dd_embed_lsh(spark, dir)).contains("NestedLoop"))
    // the exact baseline is, by construction, the nested-loop shape
    assert(plan(Dedup.dd_embed_cosine(spark, dir)).contains("BroadcastNestedLoopJoin"))
  }

  test("ann_lsh: probe set explodes on the broadcast query side; corpus joins by hash") {
    val p = plan(Similarity.ann_lsh(spark, dir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("NestedLoop"))
  }

  test("decon_spans: eval-gram probe is a broadcast hash join — the corpus side never shuffles to find matches") {
    val p = plan(Curation.decon_spans(spark, dir))
    assert(p.contains("BroadcastHashJoin"))
    // the only sort-merge-worthy exchange is the island window's doc_id
    // shuffle; the gram match itself must not plan one
    assert(!p.contains("SortMergeJoin [h"), "gram probe must not shuffle on h")
  }

  test("pipeline_release: the domain-authority gate joins broadcast, left (a flag, not a filter)") {
    val p = plan(Curation.pipeline_release(spark, dir))
    assert(p.contains("BroadcastHashJoin [domain"),
      "authority stage must broadcast the domain-cardinality side")
  }

  test("sweep: no façade query plans CartesianProduct; NL joins only where intended") {
    // intended nested-loop shapes: the explicit all-pairs baselines and the
    // non-equi joins whose predicates Spark cannot hash on
    val allowNL = Set("dd_embed_cosine", "ann_bruteforce", "ann_radius",
      "q16_range_join",
      "q25_theta_join", "q26_asof_join",
      "ann_ivf", // corpus × broadcast codebook: the IVF assignment pass
      "ann_pq", // coded corpus × 8 broadcast ADC probe rows (self-exclusion
                // is the only predicate — the same shape as ann_bruteforce)
      "decon_embed", // corpus × broadcast eval benchmark: every training
                     // vector is scored against every eval vector by design
      "ann_sq", // coded corpus × 8 broadcast query code rows — the
                // ann_bruteforce shape on int8 codes
      "graph_pagerank", "graph_hits", "graph_degrees", "graph_domains",
      "pipeline_release", // node spine × the broadcast 1-row corpus count
                // that parameterizes the edge plant (pipeline_release
                // inherits it through its domainAuthority stage)
      "samp_dsir") // scored docs × the broadcast 1-row smoothing-constant
                // aggregate (the twin's tot CTE shape — in-plan so the
                // stats census is exchange-reused instead of re-scanned
                // for a driver-side first())
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val p = fn(spark, dir).queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      if (!allowNL(name))
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans an NL join")
    }
  }

  test("bucketed join: no exchange on either side") {
    val loc = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = graft.sources.Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
    // at test scale the planner prefers broadcast; disable it so the
    // bucketed sort-merge path (the 100 TB shape) is what gets planned
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ScalePatterns.bucketedJoin(spark, li, "l_orderkey", ord, "o_orderkey", 4, loc)
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(p.contains("SortMergeJoin"))
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted count equals direct count on a skewed key") {
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val direct = ev.groupBy(org.apache.spark.sql.functions.col("event_type").as("key"))
      .count().withColumnRenamed("count", "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = ScalePatterns.saltedCount(ev, org.apache.spark.sql.functions.col("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("engine spine: mapping schema fingerprint matches the reference DDL") {
    import spark.implicits._
    val e = new graft.engine.Engine(spark)
    e.registerSource("cerner", "foo",
      Seq((0, "a"), (1, "b")).toDF("id", "alpha"))
    e.registerSource("cerner", "bar",
      Seq((0, "x")).toDF("id", "alpha"))
    val rule = graft.rules.RuleParser.parse("merge", """
      |name: baz
      |primary_key:
      |  name: id
      |  sources:
      |    foo_pk: {table: foo, columns: {id: integer}}
      |    bar_pk: {table: bar, columns: {id: integer}}
      |columns:
      |  - {name: alpha, tables: [foo], primary_key: foo_pk, expression: foo.alpha}
      |""".stripMargin)
    e.run(Seq(rule))
    // `create table mapping.baz (id serial PRIMARY KEY, foo_id integer null,
    // bar_id integer null)` — golden `tests/test_integration.py:865`
    val m = spark.table("mapping_baz")
    assert(m.columns.toSeq == Seq("id", "foo_id", "bar_id"))
    assert(m.schema("foo_id").dataType == org.apache.spark.sql.types.IntegerType)
  }

  test("q28: rollup plans as ONE Expand + partial aggregate — not a union of per-level scans") {
    val p = plan(Relational.q28_rollup(spark, dir))
    assert("Expand".r.findAllIn(p).size == 1)
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert("FileScan".r.findAllIn(p).size == 1, "each rollup level must reuse the same scan")
  }

  test("q29: pivot compiles to a single-scan conditional aggregate, not one job per value") {
    val p = plan(Relational.q29_pivot(spark, dir))
    assert("FileScan".r.findAllIn(p).size == 1)
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("decon_ngram: eval shingle set broadcast — the training side never shuffles for the probe") {
    val p = plan(Curation.decon_ngram(spark, dir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("NestedLoop"))
  }

  test("dd_para / samp_stratified: map-side partial aggregation before the shuffle") {
    assert("HashAggregate".r.findAllIn(plan(Curation.dd_para(spark, dir))).size >= 2)
    assert("HashAggregate".r.findAllIn(plan(Curation.samp_stratified(spark, dir))).size >= 2)
  }

  test("samp_reservoir: rank limit pushed below the shuffle (WindowGroupLimit, no full-stratum sort)") {
    val p = plan(Curation.samp_reservoir(spark, dir))
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "per-partition top-k must run map-side before the stratum shuffle")
  }

  test("q33: set operations plan as hash semi/anti joins, never cartesian") {
    val p = plan(Relational.q33_intersect_except(spark, dir))
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct"))
  }

  test("tx_norm: scan prunes to (doc_id, text) — normalization reads 2 of 5 columns") {
    val p = plan(TextAnalysis.tx_norm(spark, dir))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("pipeline_curate: scans bounded by the LM build, not by stage count; keeper branches share their exchange") {
    val p = Curation.pipeline_curate(spark, dir).queryExecution.executedPlan.toString
    // head aggregate (1) + fluent's base filter (1) + the fluency LM's
    // unigram/bigram/event passes (3) — six stages must not cost more
    assert("FileScan".r.findAllIn(p).size <= 5,
      s"funnel must not scan once per stage:\n$p")
  }

  test("q37: correlated LATERAL LIMIT decorrelates to a ranked window + single join, not per-row re-scans") {
    val p = plan(Relational.q37_lateral(spark, dir))
    assert(p.contains("WindowGroupLimit"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q38: RANGE frame plans as one custkey exchange + RangeFrame window, pruned scan") {
    val p = plan(Relational.q38_range_frame(spark, dir))
    assert(p.contains("RangeFrame"))
    // one shuffle for the window partition, one for the output sort — no more
    assert("Exchange".r.findAllIn(p).size <= 2, s"unexpected extra shuffle:\n$p")
  }

  test("q39: unpivot plans as Expand — one output row per metric, no shuffle before the sort") {
    val p = plan(Relational.q39_unpivot(spark, dir))
    assert(p.contains("Expand"))
    assert("Exchange".r.findAllIn(p).size <= 1, s"unpivot must not shuffle:\n$p")
  }

  test("q40: recursive spine joins the PRE-AGGREGATED fact side, never the raw table") {
    val p = plan(Relational.q40_recursive(spark, dir))
    assert(p.contains("UnionLoop"))
    // the broadcast/build side must be the per-month aggregate: the join sits
    // ABOVE the aggregate in the tree, so the raw-orders formulation (join
    // below agg) would show the FileScan directly under the broadcast
    val joinIdx = p.indexOf("BroadcastHashJoin")
    val aggIdx = p.indexOf("HashAggregate")
    assert(joinIdx >= 0 && aggIdx > joinIdx,
      s"fact side must aggregate before the spine join:\n$p")
  }

  test("q41: grouping sets is one Expand + one aggregate — not a scan per set") {
    val p = plan(Relational.q41_grouping_sets(spark, dir))
    assert(p.contains("Expand"))
    assert("FileScan".r.findAllIn(p).size == 1, s"one scan only:\n$p")
  }

  test("q42/q43: LOCF and interpolation windows share ONE user_id shuffle each") {
    for (q <- Seq(Relational.q42_locf _, Relational.q43_interp _)) {
      val p = plan(q(spark, dir))
      // single-partition test input can elide the exchange entirely; the
      // invariant is that the window specs never force a SECOND one
      assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
        s"all window specs must reuse the same partitioning:\n$p")
    }
  }

  test("partitioned layout: a filter on the partition column prunes at planning time") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    graft.sources.Tables.loadParallel(spark, dir, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val back = spark.read.parquet(out).filter(org.apache.spark.sql.functions.col("lang") === "en")
    val p = back.queryExecution.sparkPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(lang"), s"expected partition pruning:\n$p")
    assert(back.count() > 0)
  }

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true in the final plan)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of the left side lands on one key — the classic hot-key join
      val left = spark.range(0, 100000).select(
        when($"id" % 20 =!= 0, lit(0L)).otherwise($"id").as("k"), $"id".as("payload"))
      val right = spark.range(0, 100000, 1000).select($"id".as("k"), lit("dim").as("d"))
      val j = left.join(right, "k")
      j.collect() // materialize so the adaptive plan finalizes
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"expected AQE to split the hot partition:\n$p")
    } finally prev.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("runtime bloom filter: a selective dim filter is pushed to the fact scan as might_contain") {
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.sources.Tables.load(spark, dir, "lineitem")
      val ord = graft.sources.Tables.load(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      // at 100 TB this is the difference between shuffling the full fact
      // table and shuffling only rows that can match the filtered dim: the
      // optimizer builds a bloom filter on the dim side and applies it as a
      // semi-filter on the fact scan BEFORE the exchange
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") || p.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter:\n$p")
    } finally prev.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("ev_funnel: three chained stage windows share ONE user-partitioned exchange") {
    val p = Relational.ev_funnel(spark, dir).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"funnel stages must not add per-stage shuffles or self-joins:\n$p")
    assert("Window".r.findAllIn(p).size >= 3)
    assert(!p.contains("Join"))
  }

  test("samp_temperature / samp_pack: threshold frame broadcasts; packing parallel per shard") {
    val pt = plan(Curation.samp_temperature(spark, dir))
    assert(pt.contains("BroadcastHashJoin"), s"per-lang thresholds must broadcast:\n$pt")
    assert(!pt.contains("SortMergeJoin"))
    // executedPlan: exchanges only exist after EnsureRequirements
    val pp = Curation.samp_pack(spark, dir).queryExecution.executedPlan.toString
    assert(pp.contains("hashpartitioning(shard"),
      s"packing windows must partition by shard (parallel), not a global sort:\n$pp")
  }

  test("tx_surprisal: vocabulary joins broadcast — the token stream never shuffles for it") {
    val p = plan(TextAnalysis.tx_surprisal(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"vocab side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("decon_jaccard: eval postings broadcast — the training side joins without shuffling") {
    val p = plan(Curation.decon_jaccard(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"eval side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("dd_semdedup: the within-cell pair join is an equi-join on the cell id, never cartesian") {
    // SemDeDup's whole scale argument is that cells bound the quadratic:
    // the rep-level pair join must shuffle/broadcast on `cluster` (plus
    // the rep inequality as a post-join filter), not cross-join
    val p = plan(Dedup.dd_semdedup(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cell pair join degenerated to a cross join:\n$p")
  }

  test("dd_minhash / dd_simhash: cap-loss observation is IN the plan, not an extra job") {
    // the dropped-bucket metric must ride the query itself (CollectMetrics
    // node on the bucket-size aggregate) so loss reporting costs zero jobs
    // and works at any log level
    for ((name, df) <- Seq(
        "dd_minhash" -> Dedup.dd_minhash(spark, dir),
        "dd_simhash" -> Dedup.dd_simhash(spark, dir))) {
      val p = plan(df)
      assert(p.contains(s"CollectMetrics graft.$name.capBuckets"),
        s"$name must carry its cap-loss observation in-plan:\n$p")
    }
  }

  test("tx_heavy: sketch aggregates via ObjectHashAggregate with a map-side partial") {
    val p = plan(TextAnalysis.tx_heavy(spark, dir))
    // TypedImperativeAggregate must take the hash path (one buffer object per
    // group), not SortAggregate (a sort per aggregation step); two occurrences
    // = partial + final, so each map task ships ONE capacity-bounded summary.
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"Misra-Gries must plan as partial+final ObjectHashAggregate:\n$p")
    assert(!p.contains("SortAggregate"))
  }
}
