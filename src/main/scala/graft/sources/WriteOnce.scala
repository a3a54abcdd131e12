package graft.sources

/** Write-once-per-(location, source dir) guard shared by the pre-organized
  * layouts ([[Partitioned]], [[RangeLayout]]). The r5 form ran the Spark
  * write job INSIDE `ConcurrentHashMap.compute`, holding the map's bin lock
  * for the job's duration — unrelated keys hashing to the same bin blocked,
  * and the CHM contract asks remapping functions to be short and
  * non-blocking (ADVICE r5). The map mutation is now a plain put under a
  * per-key lock object: concurrent first calls for the same location still
  * serialize (the second caller sees the recorded dir and skips the write),
  * while different locations never contend.
  */
private[graft] object WriteOnce {
  private val written = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Run `write` unless `key` was already written from `dir`. */
  def ensure(key: String, dir: String)(write: => Unit): Unit = {
    val lock = locks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      if (written.get(key) != dir) {
        write
        written.put(key, dir)
      }
    }
  }
}
