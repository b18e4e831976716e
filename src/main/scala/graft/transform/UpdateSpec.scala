package graft.transform

import org.json4s._
import org.json4s.jackson.JsonMethods

/** MongoDB-style update-spec normalization and application over dynamic
  * JSON documents (SURVEY.md §2.3 P7 + §2.8 W3 — reference
  * `oplog/oplog.go:281-392` for the v2 diff format and
  * `executor/db_writer_bulk.go:118-232` for application semantics).
  *
  * Documents are dynamic-schema (JSON strings in the engine, SURVEY §1.3),
  * so this is deliberately a JVM-side document algebra used inside typed
  * per-key folds (`Replay.applyOps`) — the one place the engine steps out
  * of pure Catalyst expressions, mirroring the reference's executor.
  */
object UpdateSpec {

  private implicit val formats: Formats = DefaultFormats

  def parse(json: String): JObject =
    JsonMethods.parse(json) match {
      case o: JObject => o
      case other => throw new IllegalArgumentException(s"not a document: $other")
    }

  def render(doc: JObject): String = JsonMethods.compact(JsonMethods.render(doc))

  /** Normalize an oplog-v2 diff (`{$v:2, diff:{d:…, i:…, u:…, s<field>:…}}`)
    * into a classic `{$set:…, $unset:…}` spec with dotted paths:
    *   - `d` → $unset entries, `i`/`u` → $set entries,
    *   - `s<field>` recurses into sub-documents (prefix joined with '.'),
    *   - array resize `l` → $set of a truncated-length marker path.
    */
  def normalizeV2(diff: JObject, prefix: String = ""): (List[(String, JValue)], List[String]) = {
    def path(k: String) = if (prefix.isEmpty) k else s"$prefix.$k"
    var sets = List.empty[(String, JValue)]
    var unsets = List.empty[String]
    diff.obj.foreach {
      case ("d", JObject(fields)) => unsets ++= fields.map { case (k, _) => path(k) }
      case ("i", JObject(fields)) => sets ++= fields.map { case (k, v) => path(k) -> v }
      case ("u", JObject(fields)) => sets ++= fields.map { case (k, v) => path(k) -> v }
      case ("l", v) => sets :+= (if (prefix.isEmpty) "$length" else s"$prefix.$$length") -> v
      case (k, sub: JObject) if k.startsWith("s") =>
        val (s2, u2) = normalizeV2(sub, path(k.drop(1)))
        sets ++= s2; unsets ++= u2
      case _ => ()
    }
    (sets, unsets)
  }

  /** Normalized v2 diff as a classic update-spec document. */
  def normalizeV2Spec(specJson: String): String = {
    val spec = parse(specJson)
    (spec \ "diff") match {
      case d: JObject =>
        val (sets, unsets) = normalizeV2(d)
        val parts =
          (if (sets.nonEmpty) List("$set" -> JObject(sets)) else Nil) ++
          (if (unsets.nonEmpty) List("$unset" -> JObject(unsets.map(_ -> JBool(true)))) else Nil)
        render(JObject(parts))
      case _ => specJson // already classic
    }
  }

  /** Set a dotted path, creating intermediate objects as needed. */
  def setPath(doc: JObject, path: List[String], value: JValue): JObject = path match {
    case last :: Nil =>
      JObject(doc.obj.filterNot(_._1 == last) :+ (last -> value))
    case head :: rest =>
      val child = (doc \ head) match {
        case o: JObject => o
        case _ => JObject(Nil)
      }
      JObject(doc.obj.filterNot(_._1 == head) :+ (head -> setPath(child, rest, value)))
    case Nil => doc
  }

  /** Remove a dotted path (no-op when absent). */
  def unsetPath(doc: JObject, path: List[String]): JObject = path match {
    case last :: Nil => JObject(doc.obj.filterNot(_._1 == last))
    case head :: rest =>
      JObject(doc.obj.map {
        case (k, o: JObject) if k == head => k -> unsetPath(o, rest)
        case kv => kv
      })
    case Nil => doc
  }

  private def asDouble(v: JValue): Double = v match {
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case _ => 0.0
  }

  private def numAdd(a: JValue, b: JValue): JValue = (a, b) match {
    case (JInt(x), JInt(y)) => JInt(x + y)
    case (JLong(x), JLong(y)) => JLong(x + y)
    case (JInt(x), JLong(y)) => JLong(x.toLong + y)
    case (JLong(x), JInt(y)) => JLong(x + y.toLong)
    case _ => JDouble(asDouble(a) + asDouble(b))
  }

  private def getPath(doc: JObject, path: List[String]): JValue =
    path.foldLeft(doc: JValue)((acc, k) => acc \ k)

  /** Apply a classic update spec ({$set, $unset, $inc}) to a document.
    * Unknown top-level keys without a $ prefix mean "replace document"
    * (MongoDB replace-update semantics, as in W3's replace dispatch).
    */
  def applySpec(doc: JObject, spec: JObject): JObject = {
    val isOperatorSpec = spec.obj.forall(_._1.startsWith("$"))
    if (!isOperatorSpec) return spec // replace
    spec.obj.foldLeft(doc) {
      case (d, ("$set", JObject(fields))) =>
        fields.foldLeft(d)((acc, kv) => setPath(acc, kv._1.split('.').toList, kv._2))
      case (d, ("$unset", JObject(fields))) =>
        fields.foldLeft(d)((acc, kv) => unsetPath(acc, kv._1.split('.').toList))
      case (d, ("$inc", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          val path = kv._1.split('.').toList
          val cur = getPath(acc, path) match {
            case JNothing | JNull => JInt(0)
            case v => v
          }
          setPath(acc, path, numAdd(cur, kv._2))
        }
      case (d, _) => d
    }
  }

  def applySpecJson(docJson: String, specJson: String): String =
    render(applySpec(parse(docJson), parse(normalizeV2Spec(specJson))))
}
