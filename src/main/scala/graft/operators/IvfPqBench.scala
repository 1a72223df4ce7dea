package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the persisted IVF×PQ index: separates the two costs a
  * production deployment actually pays — the ONE-TIME build (coarse
  * assignment + PQ training + encoding + partitioned write) and the
  * per-query-batch search (tiny sidecar load + pruned scan of the probed
  * lists' code words). The inline [[Similarity.ann_ivfpq]] façade query
  * re-trains per run by contract (the driver times a self-contained query);
  * this main shows the amortized shape: build once, then searches touch
  * ~nprobe/nlist of the codes and none of the raw vectors.
  *
  * Usage: `graft.operators.IvfPqBench [embDir] [indexPath] [searchReps]`;
  * prints one JSON line.
  */
object IvfPqBench {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val path = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("ivfpq-index").toString)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = graft.sources.Tables.loadParallel(spark, dir, "embeddings").count()
    val t0 = System.nanoTime()
    Similarity.writeIvfPqIndex(spark, dir, path)
    val buildSec = (System.nanoTime() - t0) / 1e9

    val queries = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
      .filter(col("vec_id") < 8)
    // first search pays plan/codegen warmup; report min over reps
    val times = (1 to reps).map { _ =>
      val t1 = System.nanoTime()
      val res = Similarity.searchIvfPqIndex(spark, path, queries)
      res.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t1) / 1e9
    }
    println(s"""{"metric":"ivfpq","vectors":$n,"build_sec":$buildSec,""" +
      s""""search_sec":${times.min},"search_all":[${times.mkString(",")}],""" +
      s""""index_path":"$path"}""")
    spark.stop()
  }
}
