package graft

/** Shared planted corpora used by more than one suite — one definition so
  * sibling specs (batch operator vs its stream gate) can never drift onto
  * different corpora while claiming parity with each other.
  */
object TestPlants {

  /** Five languages, eight docs each, EVERY doc avoiding every stopword
    * profile word: the stopword scorer degenerates to the zero-hit
    * tie-break while a char-trigram scorer separates the languages
    * exactly. Docs vary deterministically (rotation + one dropped word)
    * so a model generalizes over word order rather than memorizing one
    * string. Consumed by the tx_langid2 plant spec and the langidGate
    * batch-parity spec.
    */
  val langidTexts: Seq[(String, String)] = Seq(
    "en" -> "quick brown fox jumps over lazy dog while bright morning light shines through tall windows",
    "de" -> "schneller brauner fuchs springt ueber faulen hund waehrend helles morgenlicht durch hohe fenster scheint",
    "es" -> "zorro marron rapido salta sobre perro perezoso mientras brillante luz manana entra por ventanas altas",
    "fr" -> "renard brun rapide saute par dessus chien paresseux pendant que lumiere brillante matin entre fenetres hautes",
    "zh" -> "敏捷 棕色 狐狸 跳过 懒惰 小狗 当 明亮 早晨 光线 穿过 高高 窗户")

  /** The plant as documents-table rows: (doc_id, text, lang, source, n_chars). */
  val langidRows: Seq[(Long, String, String, String, Long)] =
    langidTexts.zipWithIndex.flatMap { case ((l, t), li) =>
      val ws = t.split(" ").toSeq
      (0 until 8).map { d =>
        val rot = ws.drop(d % ws.size) ++ ws.take(d % ws.size)
        val doc = rot.zipWithIndex
          .collect { case (w, i) if i != (3 * d) % rot.size => w }.mkString(" ")
        ((li * 8 + d).toLong, doc, l, "plant", doc.length.toLong)
      }
    }

  /** The plant as a testdata-shaped documents table, written ONCE per JVM
    * and shared by every consuming suite: a fresh dir per call would
    * defeat the trainers' (dir, iters) memos and re-run the same
    * perceptron training once per test. */
  private var langidDirCache: Option[String] = None
  def langidDir(spark: org.apache.spark.sql.SparkSession): String =
    synchronized {
      langidDirCache.getOrElse {
        import spark.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graftlangidplant").toString
        langidRows.toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        langidDirCache = Some(dir)
        dir
      }
    }
}
