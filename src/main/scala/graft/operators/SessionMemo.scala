package graft.operators

import org.apache.spark.sql.SparkSession

/** Session-scoped memoization for expensive per-(session, dir) artifacts
  * (a decoded corpus checkpoint, a built fixture store): keyed on the
  * SparkSession OBJECT — identity, not `System.identityHashCode`, whose
  * values are reusable after GC and let a NEW session collide with a
  * dead one's hash and be handed an artifact bound to the stopped
  * session. Entries of STOPPED sessions are pruned on every access, so
  * retention is bounded by the next memo touch instead of process
  * lifetime (weak keys cannot do this: the cached values — DataFrames,
  * stores — strongly reference their session, which would pin a weak
  * key forever). `valid` re-checks a hit before handing it out (a
  * swept checkpoint, a deleted scratch dir), and callers should include
  * `artifact.sparkSession eq s`-style identity in it where the value
  * carries a session.
  *
  * The lock is held across `compute` — by design: the point of the memo
  * is that the expensive build runs ONCE even when the bench harness
  * fires the family's queries back to back. */
final class SessionMemo[V] {

  private val entries =
    new java.util.IdentityHashMap[SparkSession, scala.collection.mutable.Map[String, V]]()

  def getOrCompute(s: SparkSession, key: String)(valid: V => Boolean)
                  (compute: => V): V = synchronized {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getKey.sparkContext.isStopped) it.remove()
    }
    val m = entries.computeIfAbsent(s,
      _ => scala.collection.mutable.Map.empty[String, V])
    m.get(key).filter(valid).getOrElse {
      val v = compute
      m.update(key, v)
      v
    }
  }
}
