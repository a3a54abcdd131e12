package graft.functions

import org.apache.spark.sql.DataFrame

/** Eager `localCheckpoint` that reports WHICH RDD ids it pinned, so iterative
  * callers can later unpersist exactly their own superseded snapshots.
  *
  * The pre-r5 pattern diffed the context-global persistent-RDD set at
  * unpersist time; anything persisted by unrelated code in between (another
  * query's localCheckpoint under concurrent suites) would be swept up, and a
  * localCheckpointed RDD with dropped blocks is unrecomputable (ADVICE r4).
  * Capturing the diff in the narrow window around the single eager checkpoint
  * call bounds ownership to this caller's own materialization.
  */
object Checkpoints {
  /** Checkpoint eagerly; return the frame plus the RDD ids it persisted. */
  def tracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val cp = df.localCheckpoint(eager = true)
    val ids = sc.getPersistentRDDs.keySet.toSet -- before
    (cp, ids)
  }

  /** Unpersist exactly the given ids (missing ids are already gone: no-op). */
  def release(df: DataFrame, ids: Set[Int], blocking: Boolean = false): Unit = {
    val persisted = df.sparkSession.sparkContext.getPersistentRDDs
    ids.foreach(id => persisted.get(id).foreach(_.unpersist(blocking)))
  }
}
