package graft

import org.apache.hadoop.fs.{FileSystem, Path}

/** The write-then-swap discipline shared by every "replace the live
  * artifact" sink ([[graft.sources.Csv]] exports, the langid weight
  * table): write the new copy into a sibling staging directory, delete
  * the destination, rename staging in. One implementation so the subtle
  * crash-safety contract cannot drift between call sites:
  *
  *  - staging is cleaned ONLY when the write itself failed (guard abort,
  *    task failure) — at that point the destination is untouched and the
  *    partial staging dir is garbage;
  *  - after a successful write, staging holds the only complete copy of
  *    the new artifact: if the rename fails (after the destination was
  *    already deleted) staging is PRESERVED, so the error message's
  *    "intact in the staging directory" stays true;
  *  - staging is a SIBLING of the NORMALIZED destination, built from
  *    `Path(parent, name + "._staging")` — never by string concatenation
  *    on the raw caller path: a trailing slash there would nest staging
  *    INSIDE the destination, and the destination delete would then
  *    destroy both the old artifact and the new copy at once.
  */
object AtomicSwap {

  def writeThenSwap(fs: FileSystem, dest: Path, who: String)(
      write: Path => Unit): Unit = {
    val staging = new Path(dest.getParent, dest.getName + "._staging")
    try write(staging)
    catch {
      case e: Throwable =>
        // the cleanup itself can throw (e.g. the same filesystem outage
        // that failed the write) — never let it REPLACE the original
        // failure as the surfaced cause; attach it as suppressed instead
        try { if (fs.exists(staging)) fs.delete(staging, true) }
        catch { case cleanup: Throwable => e.addSuppressed(cleanup) }
        throw e
    }
    if (fs.exists(dest)) fs.delete(dest, true)
    require(fs.rename(staging, dest),
      s"$who: rename $staging -> $dest failed; the new copy is intact " +
        "in the staging directory")
  }
}
