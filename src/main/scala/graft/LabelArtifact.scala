package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted (id, label) MIN-LABEL artifact store — the write/read pair
  * behind [[graft.operators.Graph.writeCcLabels]] and
  * [[graft.operators.Dedup.writeDdCluster]]. Component labels and
  * near-dup cluster assignments are per-corpus-SNAPSHOT artifacts whose
  * builds are multi-round CC iterations; the [[SessionMemo]] caches
  * amortize them within one session, but a production splitter/keeper
  * runs in a LATER process — it reads the parquet artifact the way the
  * langid/DSIR gates read their weight tables. One implementation so the
  * crash-safety and refusal contracts cannot drift between the two
  * component families (the [[AtomicSwap]] argument):
  *
  *  - layout: `path/labels` — the (idCol, labelCol) long pairs as plain
  *    parquet, any engine can audit which assignments a run enforced —
  *    plus `path/meta` ((k, v) strings: kind, column names, exact
  *    row/label counts, the caller's build parameters). Both land in ONE
  *    [[AtomicSwap.writeThenSwap]], so a reader racing a rewrite sees
  *    the old or the new COMPLETE artifact, never a mix.
  *  - the loader REFUSES corrupt, truncated, or foreign artifacts
  *    loudly: a lost part-file shrinks the row count against the meta
  *    stamp; a different artifact kind (or column contract) fails the
  *    meta check; and a frame violating the min-label algebra itself —
  *    a label above its member id, or a label that is not a self-labeled
  *    member of its own group — is not a component labeling at all.
  *    Silent acceptance would mis-assign every downstream consumer (the
  *    readLangidWeights argument: a truncated table is the WORST
  *    failure — it keeps "working").
  */
object LabelArtifact {

  /** Persist `df` (exactly (idCol, labelCol), both long) at `path`.
    * `params` are provenance stamps replayed verbatim into the meta
    * table (build parameters a later audit reads; the loader checks
    * kind/columns/counts, not params — a consumer that pins parameters
    * reads them from [[readMeta]]).
    */
  def write(s: SparkSession, df: DataFrame, path: String, idCol: String,
      labelCol: String, kind: String, who: String,
      params: Seq[(String, String)] = Seq.empty): Unit = {
    import s.implicits._
    require(df.columns.toSeq == Seq(idCol, labelCol),
      s"$who: frame carries columns ${df.columns.mkString(",")} — " +
        s"expected exactly ($idCol, $labelCol)")
    // exact counts stamped BEFORE the write: the loader's truncation
    // check compares the landed row count against these (the frame is a
    // checkpointed per-snapshot artifact, so this pass re-reads blocks)
    val stamp = df.agg(count(lit(1)), countDistinct(col(labelCol))).first()
    val (nRows, nLabels) = (stamp.getLong(0), stamp.getLong(1))
    val metaRows = Seq(
      "kind" -> kind, "id_col" -> idCol, "label_col" -> labelCol,
      "n_rows" -> nRows.toString, "n_labels" -> nLabels.toString
    ) ++ params
    val dest = new org.apache.hadoop.fs.Path(path)
    val fs = dest.getFileSystem(s.sparkContext.hadoopConfiguration)
    AtomicSwap.writeThenSwap(fs, dest, who) { staging =>
      df.write.mode("overwrite").parquet(s"$staging/labels")
      metaRows.toDF("k", "v").coalesce(1)
        .write.mode("overwrite").parquet(s"$staging/meta")
    }
  }

  /** The artifact's meta table as a map — provenance for audits and for
    * consumers that pin build parameters.
    */
  def readMeta(s: SparkSession, path: String, who: String): Map[String, String] = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(metaPath),
      s"$who: $path carries no meta/ table — not a label artifact " +
        "(or one from before the persistence contract)")
    s.read.parquet(metaPath.toString).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
  }

  /** Load and VALIDATE a [[write]] artifact. Every refusal names the
    * failure: foreign kind, renamed columns, null assignments, a row or
    * label count off the meta stamp (truncation — a lost part-file), a
    * label above its member (not min-labeling), or a label value that is
    * not itself a self-labeled row (every component's minimum labels
    * itself — both builders guarantee it, so its absence means the frame
    * was tampered with or cross-spliced from two artifacts).
    */
  def read(s: SparkSession, path: String, idCol: String, labelCol: String,
      kind: String, who: String): DataFrame = {
    val meta = readMeta(s, path, who)
    require(meta.get("kind").contains(kind),
      s"$who: $path is a '${meta.getOrElse("kind", "?")}' artifact — " +
        s"expected '$kind'")
    require(meta.get("id_col").contains(idCol) &&
        meta.get("label_col").contains(labelCol),
      s"$who: $path stamps columns (${meta.getOrElse("id_col", "?")}, " +
        s"${meta.getOrElse("label_col", "?")}) — expected ($idCol, $labelCol)")
    val df = s.read.parquet(s"$path/labels")
    require(df.columns.toSeq == Seq(idCol, labelCol),
      s"$who: $path/labels carries columns ${df.columns.mkString(",")} — " +
        s"expected exactly ($idCol, $labelCol)")
    df.schema.fields.foreach { f =>
      require(f.dataType == org.apache.spark.sql.types.LongType,
        s"$who: $path/labels column '${f.name}' is ${f.dataType.simpleString}" +
          " — expected bigint")
    }
    val a = df.agg(
      count(lit(1)), countDistinct(col(labelCol)),
      sum(when(col(idCol).isNull || col(labelCol).isNull, 1L).otherwise(0L)),
      sum(when(col(labelCol) > col(idCol), 1L).otherwise(0L))).first()
    val nRows = a.getLong(0)
    val nLabels = if (nRows == 0) 0L else a.getLong(1)
    val nNull = if (a.isNullAt(2)) 0L else a.getLong(2)
    val nAbove = if (a.isNullAt(3)) 0L else a.getLong(3)
    require(nNull == 0,
      s"$who: $path/labels carries $nNull null assignment(s) — corrupt")
    require(meta.get("n_rows").map(_.toLong).contains(nRows),
      s"$who: $path/labels holds $nRows rows but the artifact stamps " +
        s"n_rows=${meta.getOrElse("n_rows", "?")} — truncated (lost " +
        "part-file) or tampered; rebuild the artifact")
    require(meta.get("n_labels").map(_.toLong).contains(nLabels),
      s"$who: $path/labels holds $nLabels distinct labels but the " +
        s"artifact stamps n_labels=${meta.getOrElse("n_labels", "?")} — " +
        "truncated or tampered; rebuild the artifact")
    require(nAbove == 0,
      s"$who: $path/labels carries $nAbove row(s) with label > id — not " +
        "a min-label assignment; the artifact is corrupt")
    val orphans = df.select(col(labelCol).as("l")).distinct()
      .join(df.filter(col(idCol) === col(labelCol)).select(col(idCol).as("l")),
        Seq("l"), "left_anti").count()
    require(orphans == 0,
      s"$who: $path/labels carries $orphans label value(s) that are not " +
        "themselves self-labeled members — every component's minimum " +
        "labels itself; the artifact is corrupt or cross-spliced")
    df
  }
}
