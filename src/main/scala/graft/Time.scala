package graft

import org.apache.spark.sql.SparkSession

/** Single-query wall-clock probe: `tools/run.sh graft.Time <query> [sfDir]
  * [reps]` — runs one SparkEntry query to a noop sink (same materialization
  * as [[Bench]]) and prints per-rep seconds. For iterating on one operator
  * without paying the full bench sweep.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq // comma-separated: earlier ones warm the JVM
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = DriverSession.build(defaultCpus = "32")
    for (name <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      DriverSession.runToNoop(SparkEntry.queries(name)(spark, sfDir))
      println(f"$name rep$r%d: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
