package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `tools/run.sh graft.Explain <query> [sfDir] [mode]` —
  * prints `.explain(mode)` for one SparkEntry query (default formatted).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = DriverSession.build(defaultCpus = "4")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).explain(mode)
    spark.stop()
  }
}
