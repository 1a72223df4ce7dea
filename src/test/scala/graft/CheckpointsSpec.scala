package graft

import java.util.concurrent.CyclicBarrier

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.Checkpoints.DatasetCheckpointOps

/** Concurrency contract of [[Checkpoints.barrier]]: directory registration
  * is atomic per application, so simultaneous first-use barriers must all
  * succeed — none may reach `checkpoint()` before some thread has run
  * `setCheckpointDir` (the pre-compute() race: the losing thread saw the
  * winning thread's map entry, skipped registration, and checkpointed
  * against an unset directory).
  */
class CheckpointsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  test("concurrent first-use reliable barriers all succeed and share the registered dir") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftckpt-conc")
    // a FRESH directory value forces re-registration through compute()
    // even though earlier suites may have registered another dir
    spark.conf.set(Checkpoints.DirKey, dir.toString)
    try {
      val n = 8
      val gate = new CyclicBarrier(n)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to n).map { i =>
        val t = new Thread(() => {
          gate.await() // maximize the collision window on first use
          val out = Seq.tabulate(50)(j => (i.toLong * 1000 + j, s"v$j"))
            .toDF("id", "v").graftCheckpoint().count()
          assert(out == 50)
        })
        t.setDaemon(true)
        t.setUncaughtExceptionHandler((_, e) => errs.add(e))
        t
      }
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      assert(errs.isEmpty, s"concurrent barriers failed: ${errs.toArray.mkString("; ")}")
      val rdds = scala.jdk.CollectionConverters.IteratorHasAsScala(
        java.nio.file.Files.walk(dir).iterator()).asScala
        .count(_.getFileName.toString.startsWith("rdd-"))
      assert(rdds >= n, s"expected >= $n checkpointed RDD dirs under $dir, found $rdds")
    } finally {
      spark.conf.unset(Checkpoints.DirKey)
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }
}
