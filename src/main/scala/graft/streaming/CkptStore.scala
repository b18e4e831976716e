package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Feature-compatibility-version gates (reference `common/fcv.go:1-63`
  * and `collector/configure/check.go:14-44`).
  *
  * Two independent version spaces: the persisted checkpoint document
  * carries a `version` field checked against [[Fcv.Checkpoint]] when the
  * manager loads it (`ckpt_manager.go:68-72`), and the configuration
  * carries `conf.version` checked against [[Fcv.Configuration]] at
  * startup (`check.go:37-40`, lower-bound only). Both rejections carry
  * the lowest engine release able to read the input, from the version
  * ledgers below.
  */
object Fcv {
  final case class Matrix(currentVersion: Int, featureCompatibleVersion: Int) {
    /** `fcv.go:48-50` / `fcv.go:61-63`: inside the readable window. */
    def isCompatible(v: Int): Boolean =
      v >= featureCompatibleVersion && v <= currentVersion
  }

  /** Checkpoint documents: current 2, feature-compatible 1. */
  val Checkpoint: Matrix = Matrix(2, 1)

  /** Configuration files: current 10, feature-compatible 10. */
  val Configuration: Matrix = Matrix(10, 10)

  /** Version → lowest engine release that writes it (`fcv.go:13-31`). */
  val LowestCheckpointVersion: Map[Int, String] =
    Map(0 -> "1.0.0", 1 -> "2.4.0", 2 -> "2.4.6")
  val LowestConfigurationVersion: Map[Int, String] = Map(
    0 -> "1.0.0", 1 -> "2.4.0", 2 -> "2.4.1", 3 -> "2.4.3", 4 -> "2.4.6",
    5 -> "2.4.7", 6 -> "2.4.12", 7 -> "2.4.17", 8 -> "2.4.20", 9 -> "2.4.21",
    10 -> "2.6.4")

  /** The manager's stored-checkpoint gate (`ckpt_manager.go:68-72`):
    * window check against [[Checkpoint]], reference-shaped reason.
    */
  def checkCheckpointVersion(v: Int): Either[String, Unit] =
    if (Checkpoint.isCompatible(v)) Right(())
    else Left(s"current required checkpoint version[${Checkpoint.currentVersion}] " +
      s"> input[$v], please upgrade to version >= " +
      LowestCheckpointVersion(Checkpoint.currentVersion))

  /** The startup configuration gate (`check.go:37-40`): the reference
    * checks only the LOWER bound here — a config written by a newer
    * release is readable, one below the feature floor is not.
    */
  def checkConfigurationVersion(v: Int): Either[String, Unit] =
    if (v >= Configuration.featureCompatibleVersion) Right(())
    else Left(s"current required configuration version[${Configuration.featureCompatibleVersion}] " +
      s"> input[$v], please upgrade to version >= " +
      LowestConfigurationVersion(Configuration.featureCompatibleVersion))
}

/** The persisted checkpoint document (`ckpt_operation.go:27-35`
  * `CheckpointContext` — same field vocabulary; JSON names below match
  * its json tags so the api-store body is wire-identical).
  */
final case class CkptContext(
    name: String,
    ckpt: Long,
    version: Int,
    fetchMethod: String = "",
    oplogDiskQueue: String = "",
    oplogDiskQueueApplyFinishTs: Long = CkptStore.InitCheckpoint) {

  /** `application/json` body exactly as the reference marshals it
    * (`ckpt_operation.go:37-42` String() / the api POST body).
    */
  def toJson: String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    s"""{"name":"${esc(name)}","ckpt":$ckpt,"version":$version,""" +
      s""""fetch_method":"${esc(fetchMethod)}","oplog_disk_queue":"${esc(oplogDiskQueue)}",""" +
      s""""oplog_disk_queue_apply_finish_ts":$oplogDiskQueueApplyFinishTs}"""
  }
}

object CkptContext {
  import org.json4s._

  def fromJson(body: String): Option[CkptContext] =
    scala.util.Try {
      val j = org.json4s.jackson.JsonMethods.parse(body)
      def str(k: String) = (j \ k) match { case JString(s) => s; case _ => "" }
      def lng(k: String) = (j \ k) match {
        case JInt(i) => i.toLong
        case JLong(l) => l
        case _ => 0L
      }
      CkptContext(str("name"), lng("ckpt"), lng("version").toInt,
        str("fetch_method"), str("oplog_disk_queue"),
        lng("oplog_disk_queue_apply_finish_ts"))
    }.toOption
}

/** Pluggable checkpoint-context storage (`ckpt_operation.go:44-56`
  * `CheckpointOperation`): the same seam the reference switches on
  * `checkpoint.storage` — [[TableCkptStore]] ↔ its MongoCheckpoint
  * ("database"), [[FileApiCkptStore]] ↔ its HttpApiCheckpoint ("api").
  * Load/save run on the driver at checkpoint-commit time (T8), never on
  * the executor path.
  */
trait CkptStore extends Serializable {
  /** The stored context, or None when nothing (valid) is stored — the
    * manager, not the store, fills the default (`ckpt_manager.go:60-78`).
    */
  def load(): Option[CkptContext]

  /** Upsert by name (`MongoCheckpoint.Insert`'s `{upsert: true}`): a
    * replayed commit must overwrite, never duplicate.
    */
  def save(ctx: CkptContext): Unit
}

object CkptStore {
  /** `ckpt_operation.go:21-25`: Timestamp(0,0) would read as "now" on
    * the reference's store, so the initial position is (0,1) — and a
    * stored ts of 0 means "empty", not a real position.
    */
  val InitCheckpoint = 1L
  val EmptyCheckpoint = 0L

  /** `NewCheckpointManager`'s storage switch (`ckpt_manager.go:28-56`),
    * driven by the sanitized config's `checkpointStorage` ∈ {database,
    * api} and `checkpointStorageUrl` (a table path / endpoint path here).
    */
  def forConfig(spark: SparkSession, cfg: GraftConfig, name: String): CkptStore =
    cfg.checkpointStorage match {
      case "api" => FileApiCkptStore(cfg.checkpointStorageUrl)
      case _ => TableCkptStore(spark, cfg.checkpointStorageUrl, name)
    }
}

/** "database" storage: one parquet row per checkpoint name under
  * `tablePath/<name>/` — FindOne-by-name ↔ a keyed subdirectory read,
  * upsert ↔ overwrite of that subdirectory (`ckpt_operation.go:58-141`).
  * All access goes through the Hadoop FileSystem API (HDFS/S3-portable).
  */
final case class TableCkptStore(spark: SparkSession, tablePath: String,
    name: String) extends CkptStore {

  private val schema = StructType(Seq(
    StructField("name", StringType), StructField("ckpt", LongType),
    StructField("version", IntegerType), StructField("fetch_method", StringType),
    StructField("oplog_disk_queue", StringType),
    StructField("oplog_disk_queue_apply_finish_ts", LongType)))

  private def rowDir: String =
    s"$tablePath/${java.net.URLEncoder.encode(name, "UTF-8")}"

  def load(): Option[CkptContext] = {
    val p = new Path(rowDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    spark.read.schema(schema).parquet(rowDir).collect().headOption.map { r =>
      CkptContext(r.getString(0), r.getLong(1), r.getInt(2),
        r.getString(3), r.getString(4), r.getLong(5))
    }
  }

  def save(ctx: CkptContext): Unit =
    spark.createDataFrame(
      java.util.Arrays.asList(Row(ctx.name, ctx.ckpt, ctx.version,
        ctx.fetchMethod, ctx.oplogDiskQueue, ctx.oplogDiskQueueApplyFinishTs)),
      schema).coalesce(1).write.mode(SaveMode.Overwrite).parquet(rowDir)
}

/** "api" storage: the reference GETs/POSTs one JSON `CheckpointContext`
  * body at an HTTP URL (`ckpt_operation.go:144-190`); the sandbox
  * transport is a file at the configured path holding exactly that body
  * (an HTTP endpoint would swap the read/write below for GET/POST —
  * nothing upstream changes). A stored ckpt of 0 reads as "empty", the
  * reference's `value.Timestamp == 0` branch.
  */
final case class FileApiCkptStore(url: String) extends CkptStore {

  private def conf = new org.apache.hadoop.conf.Configuration()

  def load(): Option[CkptContext] = {
    val p = new Path(url)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    CkptContext.fromJson(body).filter(_.ckpt != CkptStore.EmptyCheckpoint)
  }

  def save(ctx: CkptContext): Unit = {
    val p = new Path(url)
    val fs = p.getFileSystem(conf)
    val tmp = new Path(url + ".tmp")
    val out = fs.create(tmp, true)
    try out.write((ctx.toJson + "\n").getBytes("UTF-8")) finally out.close()
    // POST is atomic on the wire; rename-over is the file analogue
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }
}

/** The checkpoint manager over a pluggable store
  * (`ckpt_manager.go:25-140`): load-or-default with the FCV gate on a
  * loaded context, and version-stamped conditional update.
  */
final case class CkptManager(store: CkptStore, name: String,
    startPosition: Long) {

  /** `Get()` (`ckpt_manager.go:60-78`): Right((ctx, existedOnStore)) or
    * Left(fcv reason) when the stored document is from an incompatible
    * version. Absent → a regenerated default at the configured start
    * position (floored to [[CkptStore.InitCheckpoint]]), NOT persisted.
    */
  def get(): Either[String, (CkptContext, Boolean)] = store.load() match {
    case Some(ctx) =>
      Fcv.checkCheckpointVersion(ctx.version).map(_ => (ctx, true))
    case None =>
      val ts = math.max(startPosition, CkptStore.InitCheckpoint)
      Right((CkptContext(name, ts, Fcv.Checkpoint.currentVersion), false))
  }

  /** `Update(ts)` (`ckpt_manager.go:84-110`): persist the new position,
    * always stamped with the current checkpoint version.
    */
  def update(ts: Long): Unit =
    store.save(CkptContext(name, ts, Fcv.Checkpoint.currentVersion))
}
