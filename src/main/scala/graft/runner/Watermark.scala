package graft.runner

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Ingestion watermark with the exact JSON contract and validation of the
  * reference (`elt-common/src/elt_common/extract.py:22-60`): value is a
  * string, integer, double, or datetime; ISO strings auto-parse to datetime
  * on deserialize; missing/invalid column or value raise.
  */
sealed trait WatermarkValue {
  def serialized: JValue
  /** Natural ordering within the same value kind (the runner only compares
    * watermarks of one column, which have one kind). */
  def compareTo(other: WatermarkValue): Int
}
object WatermarkValue {
  final case class S(v: String) extends WatermarkValue {
    def serialized: JValue = JString(v)
    def compareTo(o: WatermarkValue): Int = v.compareTo(o.asInstanceOf[S].v)
  }
  final case class I(v: Long) extends WatermarkValue {
    def serialized: JValue = JInt(v)
    def compareTo(o: WatermarkValue): Int = v.compareTo(o.asInstanceOf[I].v)
  }
  final case class D(v: Double) extends WatermarkValue {
    def serialized: JValue = JDouble(v)
    def compareTo(o: WatermarkValue): Int = v.compareTo(o.asInstanceOf[D].v)
  }
  final case class T(v: LocalDateTime) extends WatermarkValue {
    def serialized: JValue = JString(v.format(DateTimeFormatter.ISO_LOCAL_DATE_TIME))
    def compareTo(o: WatermarkValue): Int = v.compareTo(o.asInstanceOf[T].v)
  }
}

final case class Watermark(column: String, value: WatermarkValue) {
  def serialize: String = JsonMethods.compact(JsonMethods.render(
    JObject("column" -> JString(column), "value" -> value.serialized)))
}

object Watermark {
  def apply(column: String, value: String): Watermark =
    Watermark(column, parseValue(JString(value)))
  def apply(column: String, value: Long): Watermark =
    Watermark(column, WatermarkValue.I(value))
  def apply(column: String, value: Double): Watermark =
    Watermark(column, WatermarkValue.D(value))
  def apply(column: String, value: LocalDateTime): Watermark =
    Watermark(column, WatermarkValue.T(value))

  def deserialize(s: String): Watermark = {
    val j = JsonMethods.parse(s)
    val column = j \ "column" match {
      case JString(c) => c
      case JNothing | JNull => throw new IllegalArgumentException(
        s"Couldn't deserialize $s as a watermark, 'column' was missing")
      case other => throw new IllegalArgumentException(
        s"Watermark 'column' must be a string, '${other.values}' is not valid")
    }
    val value = j \ "value" match {
      case JNothing | JNull => throw new IllegalArgumentException(
        s"Couldn't deserialize $s as a watermark, 'value' was missing")
      case v => parseValue(v)
    }
    Watermark(column, value)
  }

  private def parseValue(v: JValue): WatermarkValue = v match {
    case JString(s) =>
      // ISO strings auto-parse to datetime, like datetime.fromisoformat
      try WatermarkValue.T(LocalDateTime.parse(s))
      catch { case _: java.time.format.DateTimeParseException => WatermarkValue.S(s) }
    case JInt(i) => WatermarkValue.I(i.toLong)
    case JLong(l) => WatermarkValue.I(l)
    case JDouble(d) => WatermarkValue.D(d)
    case JDecimal(d) => WatermarkValue.D(d.toDouble)
    case other => throw new IllegalArgumentException(
      s"Watermark 'value' must be a string, number, or ISO format datetime, " +
        s"'${other.values}' is not valid")
  }
}
