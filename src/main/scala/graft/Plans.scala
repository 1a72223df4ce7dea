package graft

/** Batch plan dumper: `tools/run.sh graft.Plans <outDir> [sfDir] [names]` —
  * writes `.explain("formatted")` output for every declared SparkEntry
  * query (or the comma-separated subset) to `<outDir>/<query>.txt`, one
  * shared session, no execution. Measurement tooling for the optimization
  * rounds: the committed `plans/r19/<query>_{before,after}.txt` files are
  * produced with this.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 2) args(2).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    java.nio.file.Files.createDirectories(outDir)
    val spark = DriverSession.build(defaultCpus = "8")
    // quiet by default, but keep the shared SPARK_GRAFT_LOG override usable
    // for plan-dump debugging (DriverSession.build just applied it)
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "ERROR"))
    names.foreach { name =>
      try {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val tBuild = System.nanoTime()
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val tPlan = System.nanoTime()
        java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), txt)
        println(f"[plans] $name build=${(tBuild - t0) / 1e9}%.3f plan=${(tPlan - tBuild) / 1e9}%.3f s")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plans] $name failed: ${e.getMessage}")
          java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"),
            s"PLAN FAILED: ${e.getMessage}\n")
      }
    }
    spark.stop()
  }
}
