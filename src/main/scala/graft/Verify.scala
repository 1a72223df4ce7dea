package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (local iteration only —
    // the driver always passes two args and gets the full dump)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(',').toSet))
      case _ =>
        System.err.println("usage: graft.Verify <sfDir> <outDir> [q1,q2,...]")
        sys.exit(2)
    }
    val spark = DriverSession.build(defaultCpus = "4")
    new java.io.File(outDir).mkdirs()
    // stale-artifact hygiene: the checker compares every subdirectory of
    // outDir, so a query that FAILS this run (or was renamed away) must
    // not leave a previous run's parquet behind to be compared as if
    // fresh — a broken query would silently report PASS. Delete each
    // target before running it, and (on a full dump) sweep dirs that no
    // longer correspond to any registered query.
    // Files.walk/Files.list return open directory streams — close them
    // (Using) or the verify JVM leaks a handle per sweep.
    def rmTree(p: java.nio.file.Path): Unit =
      if (Files.exists(p))
        scala.util.Using.resource(Files.walk(p)) {
          _.sorted(java.util.Comparator.reverseOrder())
            .forEach(x => Files.deleteIfExists(x))
        }
    if (only.isEmpty) {
      val known = SparkEntry.queries.keySet
      val root = Paths.get(outDir)
      scala.util.Using.resource(Files.list(root)) {
        _.filter(Files.isDirectory(_))
          .filter(d => !known.contains(d.getFileName.toString))
          .forEach(rmTree)
      }
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        val target = Paths.get(s"$outDir/$name")
        rmTree(target)
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(target.toString)
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          rmTree(target) // a partial write must not read as a result either
        }
      }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${DriverSession.jsonQuote(k)}: ${DriverSession.jsonQuote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
