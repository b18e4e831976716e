package graft

/** Per-JVM scratch-directory root for query work dirs.
  *
  * Every self-contained query that materializes intermediate state
  * (CDC state tables, streaming checkpoints, bucketed warehouses)
  * previously used a fixed path under java.io.tmpdir; two concurrent
  * runs on one machine (e.g. `sbt test` next to a bench run) would
  * race on delete-then-write of the same directory. All work dirs now
  * hang off one per-JVM root suffixed with pid + JVM start time, so
  * concurrent JVMs never share a path while a single run (bench or
  * suite) still reuses its own staged caches across queries.
  */
object Work {
  private lazy val nonce: String = {
    val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
    val pid = rt.getName.takeWhile(_ != '@')
    s"${pid}_${rt.getStartTime}"
  }

  lazy val root: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_run_$nonce"

  /** Scratch path for `name`, unique to this JVM but stable within it. */
  def dir(name: String): String = s"$root/$name"

  /** Race-safe SHARED staging cache: ensures `build` has populated
    * `graft_stage/<name>` and returns that path. Unlike [[dir]], the
    * path is deliberately shared ACROSS JVMs — staged warehouses (q30's
    * partitioned fact, etc.) are expensive to rebuild and re-entered by
    * every fresh bench/suite JVM. Concurrency safety comes from building
    * into a nonce-suffixed temp dir and atomically renaming into place:
    * the loser of a concurrent race deletes its copy and reads the
    * winner's; a stale partial (no _SUCCESS) is replaced, never reused.
    */
  def staged(spark: org.apache.spark.sql.SparkSession, name: String)(
      build: String => Unit): String = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_stage/$name"
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def complete(): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(s"$base/_SUCCESS"))
    if (complete()) return base
    val tmp = new org.apache.hadoop.fs.Path(s"$base.${nonce}_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    build(tmp.toString)
    fs.mkdirs(p.getParent)
    if (!fs.rename(tmp, p)) {
      if (!complete()) { // stale partial without _SUCCESS: replace it
        fs.delete(p, true)
        if (!fs.rename(tmp, p)) fs.delete(tmp, true)
      } else fs.delete(tmp, true)
    }
    base
  }
}
