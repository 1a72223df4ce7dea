package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole forked test JVM.
  *
  * Self-healing (round-20): `spark` is an accessor that rebuilds the
  * session if the context was stopped underneath it. The round-19 driver
  * run lost the context mid-suite (its `sbt test` output truncates at the
  * in-flight test with a shutdown-hook stack and no summary lines — the
  * forked JVM was terminated externally, and the JVM shutdown hook stopped
  * the SparkContext while the last suite was still running). A stopped
  * shared session must not poison every remaining Spark test: suites that
  * have not yet touched `TestSpark.spark` get a fresh session instead of
  * the corpse. Suites pin the reference per-suite (`lazy val spark`), so a
  * rebuild never swaps sessions under a running suite's temp views.
  *
  * The codegen class cache is raised for the same reason as the driver
  * session (DriverSession.build): the suite executes thousands of distinct
  * codegen units and re-runs many shapes (batch/stream parity twins,
  * per-operator replays); at the 100-entry default every replay recompiles
  * byte-identical Janino classes with all tasks blocked on the compile
  * lock. Runtime JVM behavior only — no data or results are cached.
  */
object TestSpark {
  private def build(): SparkSession = {
    val s = SparkSession.builder()
      // 8 cores (round-20, was 4): the box has 32 and the suite is the
      // wall-clock long pole of every verification run; shuffle.partitions
      // stays 4, so only scan/parallelized stages widen. Every spec is
      // partitioning-invariant by the repo's determinism discipline (no
      // test asserts partition counts — checked round-20).
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private var current: SparkSession = null

  def spark: SparkSession = synchronized {
    if (current == null || current.sparkContext.isStopped) current = build()
    current
  }
}
