package graft

import org.apache.spark.sql.functions._

/** Plan dumper for the kmeans/PQ CENTROID-UPDATE aggregates (measurement
  * tooling, round 20): the Lloyd-round aggregate is executed driver-side at
  * façade BUILD time (`kmeansRounds`/`pqTrain` collect per round), so its
  * plan never appears in `graft.Plans`' façade dumps. This main writes the
  * `.explain("formatted")` of ONE round's centroid-update aggregate in both
  * spellings — `posexplode` (the pre-round-20 reference, a Generate node
  * fanning every vector into dims rows before the hash aggregate) and the
  * flat per-dimension sums that replaced it (no Generate; one hash probe
  * per vector) — so the committed plan evidence shows the structural
  * change the bench numbers ride on.
  *
  * Usage: `tools/run.sh graft.ClusteringPlans <outDir> [sfDir]`.
  */
object ClusteringPlans {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    java.nio.file.Files.createDirectories(outDir)
    val spark = DriverSession.build(defaultCpus = "32")
    val e = graft.sources.Tables.loadParallel(spark, sfDir, "embeddings")
    val dims = e.select(size(col("embedding"))).first().getInt(0)
    val k = 10
    val cents = graft.operators.Clustering.initCentroids(e, k)
    val assigned = e.withColumn("a",
        graft.operators.Clustering.assignTo(cents))
      .select(col("vec_id"), col("embedding"),
        col("a").getField("c").as("cluster"))
    // the pre-r20 posexplode spelling (reference)
    val before = assigned
      .select(col("cluster"), posexplode(col("embedding")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(floor(col("col").cast("double") * (1L << 20))).as("qs"),
        count(lit(1)).as("n"))
    // the r20 flat spelling (what kmeansRounds now runs)
    val after = assigned
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        array((0 until dims).map(p =>
          sum(floor(col("embedding")(p).cast("double") * (1L << 20)))): _*)
          .as("qs"))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), txt)
      println(s"[clustering-plans] wrote $name")
    }
    dump("kmeans_round_agg_before", before)
    dump("kmeans_round_agg_after", after)
    spark.stop()
  }
}
