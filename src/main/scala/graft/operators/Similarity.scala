package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecDot
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the embeddings table.
  *
  * `ann_bruteforce` is the exact baseline: broadcast the (small) query set
  * against the corpus — at cluster scale the corpus side stays partitioned
  * and never shuffles. `ann_lsh` is the scale path: random-hyperplane
  * bucketing bounds the candidate set per query; planes are derived from
  * xxhash64 so the whole pipeline is deterministic and needs no side state.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * uniform in [-0.5, 0.5).
    */
  private def planeComponent(plane: Column, dim: Column): Column =
    (pmod(xxhash64(plane, dim), lit(1000L)).cast("double") / 1000.0) - 0.5

  /** Sign-bit LSH bucket id from `planes` random hyperplanes. */
  def withLshBucket(emb: DataFrame, planes: Int): DataFrame =
    emb.withColumn("bucket",
      aggregate(
        transform(sequence(lit(0), lit(planes - 1)), p => {
          val dot = aggregate(
            zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
              (x, i) => x.cast("double") * planeComponent(p, i)),
            lit(0.0), (acc, x) => acc + x)
          struct(p.as("p"), when(dot >= 0, 1L).otherwise(0L).as("bit"))
        }),
        lit(0L),
        (acc, pb) => acc + pb("bit") * call_function("shiftleft", lit(1L), pb("p"))))

  /** Exact top-k cosine neighbors for the first `nQueries` vectors. Norms
    * are computed once per vector before the pair join; the pair loop is the
    * codegen'd [[VecDot]] dot product only.
    */
  def ann_bruteforce(s: SparkSession, dir: String, nQueries: Int = 8, k: Int = 10): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), VecDot.norm(col("embedding")).as("nrm"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        VecDot.cosineFast(VecDot.dot(col("q_emb"), col("embedding")), col("q_nrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos")
      .orderBy("q_id", "rank")
  }

  /** LSH-bucketed ANN: query vectors probe only their own bucket; exact
    * cosine + top-k within candidates. Recall < 1 by construction — the
    * deterministic trade for candidate sets ~|corpus| / 2^planes.
    */
  def ann_lsh(s: SparkSession, dir: String, nQueries: Int = 8, k: Int = 10,
      planes: Int = 4): DataFrame = {
    val emb = withLshBucket(Tables.load(s, dir, "embeddings"), planes)
      .select(col("vec_id"), col("embedding"), col("bucket"),
        VecDot.norm(col("embedding")).as("nrm"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("bucket"), col("nrm").as("q_nrm"))
    val scored = emb.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        VecDot.cosineFast(VecDot.dot(col("q_emb"), col("embedding")), col("q_nrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos")
      .orderBy("q_id", "rank")
  }
}
