package graft.load

import java.io.File

/** Committed-snapshot directory scaffolding shared by the versioned
  * stores (TripletStore `v=N`, DedupIndex `b=N`): a directory is visible
  * only once Spark's `_SUCCESS` marker exists — its last act of a parquet
  * job — so a crash mid-write can never surface a torn snapshot.
  * Non-numeric suffixes are skipped rather than thrown on. */
object CommittedDirs {
  def list(root: File, prefix: String): Seq[Int] =
    Option(root.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix) &&
        new File(f, "_SUCCESS").exists())
      .flatMap(_.getName.drop(prefix.length).toIntOption)
      .sorted
}
