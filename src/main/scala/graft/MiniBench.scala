package graft

/** Subset bench for optimization iteration:
  * `tools/run.sh graft.MiniBench <q1,q2,...> [sfDir] [passes]` — the SAME
  * methodology as [[Bench]] (sf0.001 shape warmup for the subset, N full
  * passes in one JVM, per-query minimum, cache cleared between passes, noop
  * sink) so a before/after comparison of a handful of queries does not pay
  * the full 188-query sweep. Measurement tooling only — the driver contract
  * main stays [[Bench]].
  *
  * Failed passes never enter best/all (a query that throws early would
  * otherwise report its time-to-failure as a plausible "min" and corrupt
  * the A/B protocol); a query with zero successful passes prints min=-1
  * with an empty pass list. Unknown names refuse up front, before the
  * warmup would silently swallow the lookup failure.
  */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"MiniBench: unknown queries ${unknown.mkString(", ")} — " +
        "valid names are SparkEntry.queries keys")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = DriverSession.build(defaultCpus = "32")
    def run(df: org.apache.spark.sql.DataFrame): Unit = DriverSession.runToNoop(df)
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      try run(SparkEntry.queries(n)(spark, warmDir)) catch {
        case e: Throwable =>
          System.err.println(s"[minibench] warmup $n failed: ${e.getMessage}")
      }
    }
    val best = scala.collection.mutable.Map[String, Double]()
    val all = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector.empty)
    for (p <- 1 to passes) {
      spark.catalog.clearCache()
      names.foreach { n =>
        val t0 = System.nanoTime()
        val ok =
          try { run(SparkEntry.queries(n)(spark, sfDir)); true }
          catch {
            case e: Throwable =>
              System.err.println(s"[minibench] $n failed: ${e.getMessage}")
              false
          }
        if (ok) {
          val dt = (System.nanoTime() - t0) / 1e9
          all(n) = all(n) :+ dt
          if (best.get(n).forall(dt < _)) best(n) = dt
        }
      }
    }
    names.foreach { n =>
      println(f"$n%-28s min=${best.getOrElse(n, -1.0)}%7.3f passes=" +
        all(n).map(d => f"$d%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
