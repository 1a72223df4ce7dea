package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale patterns that only pay off beyond one machine, expressed so the
  * plans can be asserted in tests: bucketed co-located joins (no exchange on
  * either side) and salted two-phase aggregation for skewed keys.
  */
object ScalePatterns {

  /** Write both sides bucketed by the join key, then join the bucketed
    * tables: the plan has NO Exchange on either side — at 100 TB this turns
    * the nightly big-fact join into a purely map-side merge. Bucket count
    * would be sized to the cluster (buckets ≈ cores × small multiple).
    */
  def bucketedJoin(
      spark: SparkSession,
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      buckets: Int,
      dbLocation: String): DataFrame = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_buckets LOCATION '$dbLocation'")
    left.write.mode("overwrite")
      .bucketBy(buckets, leftKey).sortBy(leftKey)
      .saveAsTable(s"graft_buckets.bleft")
    right.write.mode("overwrite")
      .bucketBy(buckets, rightKey).sortBy(rightKey)
      .saveAsTable(s"graft_buckets.bright")
    spark.table("graft_buckets.bleft")
      .join(spark.table("graft_buckets.bright"),
        col(leftKey) === col(rightKey))
  }

  /** Two-phase salted count for skewed grouping keys: phase 1 groups by
    * (key, salt) so a hot key spreads over `salt` reducers; phase 2 merges
    * the partials. Identical results to a direct groupBy-count, but no
    * single reducer ever sees a hot key's full row set.
    */
  def saltedCount(df: DataFrame, key: Column, salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy("key")
      .agg(sum(col("__partial")).as("n"))
}
