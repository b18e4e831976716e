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
}
