package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Minimal JSON bridge between Scala values and JSON strings.
  *
  * The engine stores schemaless payloads as JSON text columns (see
  * /root/reference/graphydb.py:96-100 for the reference's `data` column
  * semantics). Values round-trip through the JSON universe: String, Long,
  * Double, Boolean, null, Seq, Map[String, _].
  *
  * Rendering is canonical (object keys sorted) so that equal maps always
  * produce byte-equal JSON — required for deterministic DISTINCT/groupBy on
  * props columns and for stable test hashes.
  */
object Json {

  def parse(s: String): Map[String, Any] =
    if (s == null || s.isEmpty) Map.empty
    else toAny(JsonMethods.parse(s)) match {
      case m: Map[String, Any] @unchecked => m
      case other => throw new IllegalArgumentException(s"expected JSON object, got: $other")
    }

  def render(m: Map[String, Any]): String =
    JsonMethods.compact(JsonMethods.render(toJValue(m)))

  def renderAny(a: Any): String =
    JsonMethods.compact(JsonMethods.render(toJValue(a)))

  def parseAny(s: String): Any = toAny(JsonMethods.parse(s))

  private[graft] def toAny(j: JValue): Any = j match {
    case JString(s)  => s
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JInt(i)     => if (i.isValidLong) i.toLong else i // BigInt beyond Long keeps its numeric type
    case JLong(l)    => l
    case JBool(b)    => b
    case JNull | JNothing => null
    case JArray(xs)  => xs.map(toAny)
    case JObject(fs) => fs.map { case JField(k, v) => k -> toAny(v) }.toMap
    case JSet(xs)    => xs.map(toAny)
  }

  private[graft] def toJValue(a: Any): JValue = a match {
    case null          => JNull
    case s: String     => JString(s)
    case b: Boolean    => JBool(b)
    case i: Int        => JLong(i.toLong)
    case l: Long       => JLong(l)
    case f: Float      => JDouble(f.toDouble)
    case d: Double     => JDouble(d)
    case b: BigInt     => JInt(b)
    case b: BigDecimal => JDecimal(b)
    case m: Map[_, _]  =>
      // canonical: keys sorted
      JObject(m.toSeq.map { case (k, v) => JField(k.toString, toJValue(v)) }.sortBy(_._1).toList)
    case xs: Seq[_]    => JArray(xs.map(toJValue).toList)
    case xs: Array[_]  => JArray(xs.map(toJValue).toList)
    case other         => JString(other.toString)
  }
}
