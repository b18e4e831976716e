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
    diff.obj.foreach {
      case ("d", JObject(fields)) => unsets ++= fields.map { case (k, _) => path(k) }
      case ("i", JObject(fields)) => sets ++= fields.map { case (k, v) => path(k) -> v }
      case ("u", JObject(fields)) => sets ++= fields.map { case (k, v) => path(k) -> v }
      case ("a", JBool(true)) => ()
      case ("l", v) =>
        require(sets.isEmpty && unsets.isEmpty,
          s"v2 diff: 'l' must be the only entry at prefix '$prefix'")
        // The reference returns the pipeline the moment it builds one —
        // nothing scanned after this point contributes (early return,
        // `oplog.go:330-335`).
        return (Nil, Nil, Some(ArrayResize(prefix, asDouble(v).toLong)))
      case (k, sub: JObject) if k.startsWith("s") && k.length > 1 =>
        val (s2, u2, r2) = normalizeV2(sub, path(k.drop(1)))
        // A nested resize propagates up IMMEDIATELY, discarding entries
        // accumulated at this level and skipping the rest of the scan —
        // the reference's early return, order dependence included.
        r2 match {
          case Some(r) => return (Nil, Nil, Some(r))
          case None => sets ++= s2; unsets ++= u2
        }
      case (k, v) if k.startsWith("u") && k.length > 1 =>
        sets :+= path(k.drop(1)) -> v
      case _ => ()
    }
    (sets, unsets, None)
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
    val spec = JsonMethods.parse(specJson) match {
      case o: JObject => o
      case _ => return specJson // already a pipeline (array) — no v2 wrapping
    }
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

  private def asBig(v: JValue): Option[BigDecimal] = v match {
    case JInt(i) => Some(BigDecimal(i))
    case JLong(l) => Some(BigDecimal(l))
    case JDouble(d) => Some(BigDecimal(d))
    case JDecimal(d) => Some(d)
    case _ => None
  }

  /** BSON-style equality: numerics compare by value across types (5 ==
    * 5.0 == 5L, as MongoDB's $pull/$addToSet matching does); everything
    * else falls back to structural equality.
    */
  private def jEq(a: JValue, b: JValue): Boolean = (asBig(a), asBig(b)) match {
    case (Some(x), Some(y)) => x == y // Scala BigDecimal == is scale-insensitive
    case _ => a == b
  }

  /** BSON type-bracket rank for cross-type $min/$max comparison
    * (null < numbers < string < object < array < boolean — the slice of
    * the BSON total order these documents can hold).
    */
  private def typeRank(v: JValue): Int = v match {
    case JNull | JNothing => 0
    case JInt(_) | JLong(_) | JDouble(_) | JDecimal(_) => 1
    case JString(_) => 2
    case JObject(_) => 3
    case JArray(_) => 4
    case JBool(_) => 5
  }

  /** BSON-style total-order comparison for $min/$max: numeric by value,
    * same-type lexicographic/boolean, cross-type by type bracket.
    */
  private def jCompare(a: JValue, b: JValue): Int = (asBig(a), asBig(b)) match {
    case (Some(x), Some(y)) => x.compare(y)
    case _ => (a, b) match {
      case (JString(x), JString(y)) => x.compareTo(y)
      case (JBool(x), JBool(y)) => x.compareTo(y)
      case _ => typeRank(a).compareTo(typeRank(b))
    }
  }

  private def numAdd(a: JValue, b: JValue): JValue = (a, b) match {
    case (JInt(x), JInt(y)) => JInt(x + y)
    case (JLong(x), JLong(y)) => JLong(x + y)
    case (JInt(x), JLong(y)) => JLong(x.toLong + y)
    case (JLong(x), JInt(y)) => JLong(x + y.toLong)
    case _ => JDouble(asDouble(a) + asDouble(b))
  }

  private def numMul(a: JValue, b: JValue): JValue = (a, b) match {
    case (JInt(x), JInt(y)) => JInt(x * y)
    case (JLong(x), JLong(y)) => JLong(x * y)
    case (JInt(x), JLong(y)) => JLong(x.toLong * y)
    case (JLong(x), JInt(y)) => JLong(x * y.toLong)
    case _ => JDouble(asDouble(a) * asDouble(b))
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

  /** A compiled `arrayFilters` entry: per-element predicates for one
    * filtered-positional identifier (`$[ident]`). MongoDB's update
    * command carries these alongside the spec
    * (`[{"e": {"$lt": 3}}, {"x.grade": {"$gte": 85}}]` — conditions may
    * address the element itself (`ident`) or a subfield (`ident.path`),
    * and multiple conditions within one filter document AND together).
    */
  type ElemPred = JValue => Boolean

  private def condMatches(cond: JValue, x: JValue): Boolean = cond match {
    case o: JObject if o.obj.nonEmpty && o.obj.forall(_._1.startsWith("$")) =>
      o.obj.forall {
        case ("$lt", v)  => jCompare(x, v) < 0
        case ("$lte", v) => jCompare(x, v) <= 0
        case ("$gt", v)  => jCompare(x, v) > 0
        case ("$gte", v) => jCompare(x, v) >= 0
        case ("$eq", v)  => jEq(x, v)
        case ("$ne", v)  => !jEq(x, v)
        case ("$in", JArray(vs)) => vs.exists(jEq(_, x))
        case _ => false
      }
    case v => jEq(v, x)
  }

  private def subPath(elem: JValue, path: List[String]): JValue =
    path.foldLeft(elem) {
      case (JArray(items), k) if isIndex(k) =>
        if (k.toInt < items.length) items(k.toInt) else JNothing
      case (acc, k) => acc \ k
    }

  /** Compile `arrayFilters` JSON (an array of filter documents) into a
    * predicate per identifier. Each document's conditions are grouped by
    * the identifier prefix before the first '.'; a document mixing two
    * identifiers is rejected (MongoDB does the same).
    */
  def parseArrayFilters(json: String): Map[String, ElemPred] =
    JsonMethods.parse(json) match {
      case JArray(docs) =>
        docs.map {
          case JObject(conds) if conds.nonEmpty =>
            val idents = conds.map(_._1.split('.').head).distinct
            require(idents.size == 1,
              s"arrayFilters document must use a single identifier, got $idents")
            val compiled = conds.map { case (k, cond) =>
              (k.split('.').toList.tail, cond)
            }
            idents.head -> ((x: JValue) =>
              compiled.forall { case (p, cond) => condMatches(cond, subPath(x, p)) })
          case other =>
            throw new IllegalArgumentException(s"bad arrayFilters entry: $other")
        }.toMap
      case other => throw new IllegalArgumentException(s"bad arrayFilters: $other")
    }

  /** Expand positional segments in a dotted path against the current
    * document: `$[]` fans out to one concrete (numeric-index) path per
    * element of the array at that point; `$[ident]` fans out to the
    * elements matching `filters(ident)` (MongoDB's filtered positional —
    * an unknown identifier is an error, as the server's "No array filter
    * found" is); `$` resolves to the first element (this engine replays
    * without the query predicate the server would use to pick the match,
    * so "first element" is the documented resolution — the reference
    * never sees positional paths at all, the server resolves them before
    * the oplog; a self-contained engine must take a stance). Each form is
    * a no-op when the path up to it does not hold a (non-empty, for `$`)
    * array. Paths with no positional segments pass through untouched as a
    * single concrete path.
    */
  def expandPositional(doc: JObject, path: List[String],
      filters: Map[String, ElemPred] = Map.empty): List[List[String]] = {
    def go(node: JValue, rem: List[String], acc: List[String]): List[List[String]] = rem match {
      case Nil => List(acc.reverse)
      case "$[]" :: rest => node match {
        case JArray(items) =>
          items.indices.toList.flatMap(i => go(items(i), rest, i.toString :: acc))
        case _ => Nil
      }
      case seg :: rest if seg.length > 3 && seg.startsWith("$[") && seg.endsWith("]") =>
        val ident = seg.substring(2, seg.length - 1)
        val pred = filters.getOrElse(ident,
          throw new IllegalArgumentException(s"no array filter found for identifier '$ident'"))
        node match {
          case JArray(items) =>
            items.indices.toList.filter(i => pred(items(i)))
              .flatMap(i => go(items(i), rest, i.toString :: acc))
          case _ => Nil
        }
      case "$" :: rest => node match {
        case JArray(items) if items.nonEmpty => go(items.head, rest, "0" :: acc)
        case _ => Nil
      }
      case seg :: rest =>
        val child = node match {
          case JArray(items) if isIndex(seg) =>
            if (seg.toInt < items.length) items(seg.toInt) else JNothing
          case o: JObject => o \ seg
          case _ => JNothing
        }
        go(child, rest, seg :: acc)
    }
    go(doc, path, Nil)
  }

  private def isPositional(s: String): Boolean =
    s == "$" || (s.startsWith("$[") && s.endsWith("]"))

  /** Concrete paths for one update-spec entry (positional-aware). */
  private def targetPaths(doc: JObject, dotted: String,
      filters: Map[String, ElemPred]): List[List[String]] = {
    val segs = dotted.split('.').toList
    if (segs.exists(isPositional)) expandPositional(doc, segs, filters)
    else List(segs)
  }

  /** Parsed `$push` argument: plain value, or `{$each:[…]}` with the
    * modifier set — `$slice` (negative keeps the last |n| elements),
    * `$position` (insert index; negative counts from the end), `$sort`
    * (1/-1 whole-element, or a `{field: dir}` document sort). Applied in
    * MongoDB's documented order: insert at position → sort → slice.
    */
  private final case class PushArg(each: List[JValue], slice: Option[Long],
      position: Option[Int], sortSpec: Option[JValue])

  private def pushArg(arg: JValue): PushArg = arg match {
    case o: JObject if (o \ "$each") != JNothing =>
      val each = (o \ "$each") match { case JArray(xs) => xs; case v => List(v) }
      def mod(k: String): Option[JValue] = (o \ k) match {
        case JNothing | JNull => None
        case v => Some(v)
      }
      PushArg(each, mod("$slice").map(asDouble(_).toLong),
        mod("$position").map(asDouble(_).toInt), mod("$sort"))
    case v => PushArg(List(v), None, None, None)
  }

  /** `$sort` modifier semantics: a document spec orders elements by its
    * keyed subfields (first key most significant, each ±1); a bare ±1
    * orders whole elements. Stable (List.sortWith is TimSort), matching
    * the server.
    */
  private def applySortSpec(items: List[JValue], spec: JValue): List[JValue] =
    spec match {
      case o: JObject if o.obj.nonEmpty =>
        val keys = o.obj.map { case (k, dir) => (k.split('.').toList, asDouble(dir) >= 0) }
        items.sortWith { (a, b) =>
          var i = 0
          var res = 0
          while (i < keys.length && res == 0) {
            val (p, asc) = keys(i)
            val c = jCompare(subPath(a, p), subPath(b, p))
            res = if (asc) c else -c
            i += 1
          }
          res < 0
        }
      case v =>
        val asc = asDouble(v) >= 0
        items.sortWith((a, b) => if (asc) jCompare(a, b) < 0 else jCompare(a, b) > 0)
    }

  private def applySlice(items: List[JValue], n: Long): List[JValue] =
    if (n >= 0) items.take(n.toInt) else items.takeRight((-n).toInt)

  /** `$pull` condition: `{$in:[…]}` matches membership, a plain value
    * matches equality (the two forms the reference's replay can produce).
    */
  private def pullMatches(cond: JValue)(x: JValue): Boolean = cond match {
    case o: JObject if (o \ "$in") != JNothing =>
      (o \ "$in") match { case JArray(xs) => xs.exists(jEq(_, x)); case v => jEq(v, x) }
    case v => jEq(v, x)
  }

  /** Apply a classic update spec ({$set, $unset, $setOnInsert, $inc, $mul,
    * $min, $max, $rename, $push (with $each/$slice/$position/$sort),
    * $addToSet, $pull, $pullAll, $pop, $bit}, positional `$`/`$[]`/`$[ident]`
    * paths) to a document. Unknown top-level keys
    * without a $ prefix mean "replace document" (MongoDB replace-update
    * semantics, W3's replace dispatch — reference
    * `executor/db_writer_bulk.go:118-232`; the operator vocabulary beyond
    * what the reference ships to the server is implemented here because
    * this engine IS the server).
    *
    * `filters` are the update's compiled `arrayFilters` (for `$[ident]`
    * paths); `isInsert` marks the upsert-insert path, the only one where
    * `$setOnInsert` contributes (on a plain update it is a no-op, per
    * MongoDB upsert semantics).
    */
  def applySpec(doc: JObject, spec: JObject): JObject =
    applySpec(doc, spec, Map.empty, isInsert = false)

  def applySpec(doc: JObject, spec: JObject,
      filters: Map[String, ElemPred], isInsert: Boolean): JObject = {
    def targetPaths(doc: JObject, dotted: String): List[List[String]] =
      UpdateSpec.targetPaths(doc, dotted, filters)
    val isOperatorSpec = spec.obj.forall(_._1.startsWith("$"))
    if (!isOperatorSpec) return spec // replace
    spec.obj.foldLeft(doc) {
      case (d, ("$set", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          targetPaths(acc, kv._1).foldLeft(acc)((a, p) => setPath(a, p, kv._2))
        }
      case (d, ("$setOnInsert", JObject(fields))) =>
        if (!isInsert) d
        else fields.foldLeft(d) { (acc, kv) =>
          targetPaths(acc, kv._1).foldLeft(acc)((a, p) => setPath(a, p, kv._2))
        }
      case (d, ("$unset", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          targetPaths(acc, kv._1).foldLeft(acc)((a, p) => unsetPath(a, p))
        }
      case (d, ("$inc", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          targetPaths(acc, kv._1).foldLeft(acc) { (a, path) =>
            val cur = getPath(a, path) match {
              case JNothing | JNull => JInt(0)
              case v => v
            }
            setPath(a, path, numAdd(cur, kv._2))
          }
        }
      case (d, ("$mul", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          targetPaths(acc, kv._1).foldLeft(acc) { (a, path) =>
            // Missing field: MongoDB creates it as zero of the result
            // type — numMul(0, multiplier) yields exactly that.
            val cur = getPath(a, path) match {
              case JNothing | JNull => JInt(0)
              case v => v
            }
            setPath(a, path, numMul(cur, kv._2))
          }
        }
      case (d, ("$min", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          targetPaths(acc, kv._1).foldLeft(acc) { (a, path) =>
            getPath(a, path) match {
              case JNothing | JNull => setPath(a, path, kv._2)
              case cur => if (jCompare(kv._2, cur) < 0) setPath(a, path, kv._2) else a
            }
          }
        }
      case (d, ("$max", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          targetPaths(acc, kv._1).foldLeft(acc) { (a, path) =>
            getPath(a, path) match {
              case JNothing | JNull => setPath(a, path, kv._2)
              case cur => if (jCompare(kv._2, cur) > 0) setPath(a, path, kv._2) else a
            }
          }
        }
      case (d, ("$rename", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          val from = kv._1.split('.').toList
          getPath(acc, from) match {
            case JNothing => acc // missing source: no-op
            case v =>
              val to = kv._2 match {
                case JString(s) => s.split('.').toList
                case _ => from
              }
              setPath(unsetPath(acc, from), to, v)
          }
        }
      case (d, ("$push", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          targetPaths(acc, kv._1).foldLeft(acc) { (a, path) =>
            val pa = pushArg(kv._2)
            val cur = curArray(a, path)
            val pos = pa.position
              .map(p => if (p < 0) math.max(0, cur.length + p) else math.min(p, cur.length))
              .getOrElse(cur.length)
            val inserted = cur.take(pos) ++ pa.each ++ cur.drop(pos)
            val sorted = pa.sortSpec.fold(inserted)(applySortSpec(inserted, _))
            setPath(a, path, JArray(pa.slice.fold(sorted)(applySlice(sorted, _))))
          }
        }
      case (d, ("$addToSet", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          targetPaths(acc, kv._1).foldLeft(acc) { (a, path) =>
            val vals = pushArg(kv._2).each
            val cur = curArray(a, path)
            val added = vals.foldLeft(List.empty[JValue]) { (out, v) =>
              if (cur.exists(jEq(_, v)) || out.exists(jEq(_, v))) out else out :+ v
            }
            setPath(a, path, JArray(cur ++ added))
          }
        }
      case (d, ("$bit", JObject(fields))) =>
        // int64 bitwise and/or/xor; a missing field starts at 0 (MongoDB
        // creates it with the op applied to zero)
        fields.foldLeft(d) { (acc, kv) =>
          targetPaths(acc, kv._1).foldLeft(acc) { (a, path) =>
            val cur = getPath(a, path) match {
              case JNothing | JNull => 0L
              case v => asBig(v).map(_.toLong).getOrElse(0L)
            }
            val result = kv._2 match {
              case o: JObject => o.obj.foldLeft(cur) {
                case (x, ("and", v)) => x & asDouble(v).toLong
                case (x, ("or", v)) => x | asDouble(v).toLong
                case (x, ("xor", v)) => x ^ asDouble(v).toLong
                case (x, _) => x
              }
              case _ => cur
            }
            setPath(a, path, JLong(result))
          }
        }
      case (d, ("$pull", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          targetPaths(acc, kv._1).foldLeft(acc) { (a, path) =>
            getPath(a, path) match {
              // MongoDB: $pull on a missing field is a no-op (it never
              // creates the array).
              case JArray(items) =>
                setPath(a, path, JArray(items.filterNot(pullMatches(kv._2))))
              case _ => a
            }
          }
        }
      case (d, ("$pullAll", JObject(fields))) =>
        // exact-value batch removal: unlike $pull there is no condition
        // form — each array element equal (jEq, numeric-type-insensitive)
        // to ANY listed value is removed; missing field / non-array arg
        // is a no-op (MongoDB never creates the array here either)
        fields.foldLeft(d) { (acc, kv) =>
          targetPaths(acc, kv._1).foldLeft(acc) { (a, path) =>
            (getPath(a, path), kv._2) match {
              case (JArray(items), JArray(vs)) =>
                setPath(a, path, JArray(items.filterNot(x => vs.exists(jEq(_, x)))))
              case _ => a
            }
          }
        }
      case (d, ("$pop", JObject(fields))) =>
        fields.foldLeft(d) { (acc, kv) =>
          targetPaths(acc, kv._1).foldLeft(acc) { (a, path) =>
            getPath(a, path) match {
              case JArray(items) =>
                val next = if (asDouble(kv._2) < 0) items.drop(1) else items.dropRight(1)
                setPath(a, path, JArray(next))
              case _ => a // MongoDB: $pop on a missing field is a no-op
            }
          }
        }
      case (d, _) => d
    }
  }

  /** Apply an aggregation-pipeline update (MongoDB 4.2+ `u: [stage, …]`)
    * to a document. Stage vocabulary:
    *   - `{$set:{path:{$slice:["$path",n]}}}` — the reference's
    *     array-resize form (`oplog/oplog.go:354-369`), truncate in place;
    *   - `{$set:{path: constant}}` — constant assignment (a leading-`$`
    *     string is a field-path expression this engine does not evaluate
    *     beyond the self-referential $slice form above — rejected rather
    *     than stored as a misleading literal);
    *   - `{$unset: "f"}` / `{$unset: ["a","b"]}` — dotted-path removal;
    *   - `{$replaceWith: doc}` / `{$replaceRoot:{newRoot: doc}}` —
    *     wholesale replacement.
    */
  def applyPipeline(doc: JObject, stages: JArray): JObject =
    stages.arr.foldLeft(doc) {
      case (d, stage: JObject) =>
        stage.obj.foldLeft(d) {
          case (acc, ("$set", JObject(fields))) =>
            fields.foldLeft(acc) {
              case (a, (pathStr, o: JObject)) if (o \ "$slice") != JNothing =>
                (o \ "$slice") match {
                  case JArray(List(_, n)) =>
                    val path = pathStr.split('.').toList
                    setPath(a, path,
                      JArray(applySlice(curArray(a, path), asDouble(n).toLong)))
                  case _ => a
                }
              case (a, (pathStr, v)) =>
                v match {
                  case JString(s) if s.startsWith("$") =>
                    throw new IllegalArgumentException(
                      s"pipeline $$set: unsupported field-path expression '$s'")
                  case _ => setPath(a, pathStr.split('.').toList, v)
                }
            }
          case (acc, ("$unset", JString(f))) =>
            unsetPath(acc, f.split('.').toList)
          case (acc, ("$unset", JArray(fs))) =>
            fs.foldLeft(acc) {
              case (a, JString(f)) => unsetPath(a, f.split('.').toList)
              case (a, _) => a
            }
          case (acc, ("$replaceWith", o: JObject)) => o
          case (acc, ("$replaceRoot", o: JObject)) =>
            (o \ "newRoot") match { case r: JObject => r; case _ => acc }
          case (acc, _) => acc
        }
      case (d, _) => d
    }

  def applySpecJson(docJson: String, specJson: String): String =
    applyUpdateJson(docJson, specJson, arrayFiltersJson = "[]", isInsert = false)

  /** Full update application entry: spec (classic or v2 diff), the
    * update's `arrayFilters` (JSON array of filter documents), and the
    * upsert-insert flag gating `$setOnInsert`.
    */
  def applyUpdateJson(docJson: String, specJson: String,
      arrayFiltersJson: String, isInsert: Boolean): String = {
    val doc = parse(docJson)
    val filters = parseArrayFilters(arrayFiltersJson)
    JsonMethods.parse(normalizeV2Spec(specJson)) match {
      case stages: JArray => render(applyPipeline(doc, stages))
      case spec: JObject => render(applySpec(doc, spec, filters, isInsert))
      case _ => docJson
    }
  }
}
