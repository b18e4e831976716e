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

  /** An array-resize request found while walking a v2 diff: truncate the
    * array at `path` to its first `len` elements (the reference renders
    * this as an aggregation pipeline `[{$set:{path:{$slice:["$path",len]}}}]`,
    * `oplog/oplog.go:354-369`, and requires it to be the only entry at its
    * nesting level).
    */
  final case class ArrayResize(path: String, len: Long)

  /** Normalize an oplog-v2 diff (`{$v:2, diff:{d:…, i:…, u:…, s<field>:…}}`)
    * into a classic `{$set:…, $unset:…}` spec with dotted paths
    * (reference `oplog/oplog.go:303-392` `BuildUpdateDelteOplog`):
    *   - `d` → $unset entries, `i`/`u` → $set entries,
    *   - `s<field>` recurses into sub-documents/arrays (prefix + '.'),
    *   - `a: true` marks the enclosing prefix as an array (skipped),
    *   - `u<idx>` → $set of `prefix.idx` (array element overwrite),
    *   - `l` → [[ArrayResize]] of the current prefix (must stand alone).
    */
  def normalizeV2(diff: JObject, prefix: String = "")
      : (List[(String, JValue)], List[String], Option[ArrayResize]) = {
    def path(k: String) = if (prefix.isEmpty) k else s"$prefix.$k"
    var sets = List.empty[(String, JValue)]
    var unsets = List.empty[String]
    var resize = Option.empty[ArrayResize]
    diff.obj.foreach {
      case ("d", JObject(fields)) => unsets ++= fields.map { case (k, _) => path(k) }
      case ("i", JObject(fields)) => sets ++= fields.map { case (k, v) => path(k) -> v }
      case ("u", JObject(fields)) => sets ++= fields.map { case (k, v) => path(k) -> v }
      case ("a", JBool(true)) => ()
      case ("l", v) =>
        require(sets.isEmpty && unsets.isEmpty,
          s"v2 diff: 'l' must be the only entry at prefix '$prefix'")
        resize = Some(ArrayResize(prefix, asDouble(v).toLong))
      case (k, sub: JObject) if k.startsWith("s") && k.length > 1 =>
        val (s2, u2, r2) = normalizeV2(sub, path(k.drop(1)))
        sets ++= s2; unsets ++= u2
        resize = resize.orElse(r2)
      case (k, v) if k.startsWith("u") && k.length > 1 =>
        sets :+= path(k.drop(1)) -> v
      case _ => ()
    }
    (sets, unsets, resize)
  }

  /** Normalized v2 diff as a classic update-spec document; a lone array
    * resize renders as the reference's `$slice` pipeline form (a JSON
    * array), which [[applySpecJson]] dispatches on.
    *
    * Reference-parity note: when a resize is present, the reference
    * returns the pipeline IMMEDIATELY, silently discarding any entries at
    * other nesting levels (`oplog.go:330-335` propagates the pipeline up
    * without merging the parent's accumulated result) and erroring only
    * on same-level entries that precede the `l`. We reproduce exactly
    * that, order-dependence included — locked by a golden test.
    */
  def normalizeV2Spec(specJson: String): String = {
    val spec = parse(specJson)
    (spec \ "diff") match {
      case d: JObject =>
        val (sets, unsets, resize) = normalizeV2(d)
        resize match {
          case Some(ArrayResize(p, n)) =>
            render2(JArray(List(JObject(List("$set" -> JObject(List(
              p -> JObject(List("$slice" -> JArray(List(JString("$" + p), JLong(n))))))))))))
          case None =>
            val parts =
              (if (sets.nonEmpty) List("$set" -> JObject(sets)) else Nil) ++
              (if (unsets.nonEmpty) List("$unset" -> JObject(unsets.map(_ -> JBool(true)))) else Nil)
            render(JObject(parts))
        }
      case _ => specJson // already classic
    }
  }

  private def render2(v: JValue): String = JsonMethods.compact(JsonMethods.render(v))

  /** Render any JSON value compactly (array results included). */
  def render2Json(v: JValue): String = render2(v)

  private def isIndex(s: String): Boolean = s.nonEmpty && s.forall(_.isDigit)

  /** Set a dotted path into a JValue tree, creating intermediate objects as
    * needed. Numeric segments index into arrays (padding with nulls past the
    * end, MongoDB semantics); on a non-array they are plain object keys.
    */
  def setIn(node: JValue, path: List[String], value: JValue): JValue = path match {
    case Nil => node
    case seg :: rest =>
      node match {
        case JArray(items) if isIndex(seg) =>
          val i = seg.toInt
          val padded = if (i < items.length) items else items ++ List.fill(i - items.length + 1)(JNull)
          JArray(padded.updated(i,
            if (rest.isEmpty) value else setIn(childFor(padded(i), rest), rest, value)))
        case _ =>
          val obj = node match { case o: JObject => o; case _ => JObject(Nil) }
          val cur = obj.obj.find(_._1 == seg).map(_._2).getOrElse(JNothing)
          val nv = if (rest.isEmpty) value else setIn(childFor(cur, rest), rest, value)
          JObject(obj.obj.filterNot(_._1 == seg) :+ (seg -> nv))
      }
  }

  private def childFor(cur: JValue, rest: List[String]): JValue = cur match {
    case o: JObject => o
    case a: JArray => a
    case _ => if (rest.nonEmpty && isIndex(rest.head)) JArray(Nil) else JObject(Nil)
  }

  /** Set a dotted path, creating intermediate objects as needed. */
  def setPath(doc: JObject, path: List[String], value: JValue): JObject =
    setIn(doc, path, value) match { case o: JObject => o; case _ => doc }

  /** Remove a dotted path (no-op when absent). Unsetting an array element
    * nulls it in place without shrinking the array (MongoDB semantics).
    */
  def unsetIn(node: JValue, path: List[String]): JValue = (node, path) match {
    case (_, Nil) => node
    case (JArray(items), seg :: rest) if isIndex(seg) =>
      val i = seg.toInt
      if (i >= items.length) node
      else if (rest.isEmpty) JArray(items.updated(i, JNull))
      else JArray(items.updated(i, unsetIn(items(i), rest)))
    case (JObject(fields), last :: Nil) => JObject(fields.filterNot(_._1 == last))
    case (JObject(fields), head :: rest) =>
      JObject(fields.map {
        case (k, v) if k == head => k -> unsetIn(v, rest)
        case kv => kv
      })
    case _ => node
  }

  def unsetPath(doc: JObject, path: List[String]): JObject =
    unsetIn(doc, path) match { case o: JObject => o; case _ => doc }

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
    path.foldLeft(doc: JValue) {
      case (JArray(items), k) if isIndex(k) =>
        if (k.toInt < items.length) items(k.toInt) else JNothing
      case (acc, k) => acc \ k
    }

  private def curArray(doc: JObject, path: List[String]): List[JValue] =
    getPath(doc, path) match {
      case JArray(items) => items
      case _ => Nil
    }

  /** `$push` argument: plain value, or `{$each:[…]}` with optional `$slice`
    * modifier (negative keeps the last |n| elements, MongoDB semantics).
    */
  private def pushValues(arg: JValue): (List[JValue], Option[Long]) = arg match {
    case o: JObject if (o \ "$each") != JNothing =>
      val each = (o \ "$each") match { case JArray(xs) => xs; case v => List(v) }
      val slice = (o \ "$slice") match {
        case JNothing | JNull => None
        case v => Some(asDouble(v).toLong)
      }
      (each, slice)
    case v => (List(v), None)
  }

  private def applySlice(items: List[JValue], n: Long): List[JValue] =
    if (n >= 0) items.take(n.toInt) else items.takeRight((-n).toInt)

  /** `$pull` condition: `{$in:[…]}` matches membership, a plain value
    * matches equality (the two forms the reference's replay can produce).
    */
  private def pullMatches(cond: JValue)(x: JValue): Boolean = cond match {
    case o: JObject if (o \ "$in") != JNothing =>
      (o \ "$in") match { case JArray(xs) => xs.contains(x); case v => v == x }
    case v => v == x
  }

  /** Apply a classic update spec ({$set, $unset, $inc, $push, $addToSet,
    * $pull, $pop}) to a document. Unknown top-level keys without a $ prefix
    * mean "replace document" (MongoDB replace-update semantics, W3's
    * replace dispatch — reference `executor/db_writer_bulk.go:118-232`).
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
      case (d, ("$push", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          val path = kv._1.split('.').toList
          val (vals, slice) = pushValues(kv._2)
          val next = curArray(acc, path) ++ vals
          setPath(acc, path, JArray(slice.fold(next)(applySlice(next, _))))
        }
      case (d, ("$addToSet", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          val path = kv._1.split('.').toList
          val (vals, _) = pushValues(kv._2)
          val cur = curArray(acc, path)
          setPath(acc, path, JArray(cur ++ vals.filterNot(cur.contains).distinct))
        }
      case (d, ("$pull", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          val path = kv._1.split('.').toList
          getPath(acc, path) match {
            // MongoDB: $pull on a missing field is a no-op (it never
            // creates the array).
            case JArray(items) =>
              setPath(acc, path, JArray(items.filterNot(pullMatches(kv._2))))
            case _ => acc
          }
        }
      case (d, ("$pop", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          val path = kv._1.split('.').toList
          getPath(acc, path) match {
            case JArray(items) =>
              val next = if (asDouble(kv._2) < 0) items.drop(1) else items.dropRight(1)
              setPath(acc, path, JArray(next))
            case _ => acc // MongoDB: $pop on a missing field is a no-op
          }
        }
      case (d, _) => d
    }
  }

  /** Apply the reference's array-resize pipeline form
    * (`[{$set:{path:{$slice:["$path",n]}}}]`) to a document.
    */
  def applyPipeline(doc: JObject, stages: JArray): JObject =
    stages.arr.foldLeft(doc) {
      case (d, stage: JObject) =>
        (stage \ "$set") match {
          case JObject(fields) =>
            fields.foldLeft(d) {
              case (acc, (pathStr, o: JObject)) =>
                (o \ "$slice") match {
                  case JArray(List(_, n)) =>
                    val path = pathStr.split('.').toList
                    setPath(acc, path,
                      JArray(applySlice(curArray(acc, path), asDouble(n).toLong)))
                  case _ => acc
                }
              case (acc, _) => acc
            }
          case _ => d
        }
      case (d, _) => d
    }

  def applySpecJson(docJson: String, specJson: String): String = {
    val doc = parse(docJson)
    JsonMethods.parse(normalizeV2Spec(specJson)) match {
      case stages: JArray => render(applyPipeline(doc, stages))
      case spec: JObject => render(applySpec(doc, spec))
      case _ => docJson
    }
  }
}
