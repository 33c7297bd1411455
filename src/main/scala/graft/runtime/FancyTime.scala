package graft.runtime

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

/** Time formatter with the reference's extended format names.
  *
  * Mirrors the observable contract of the reference's FancyTimeFormatter
  * (nifi-datasynthesizer-generators/.../FancyTimeFormatter.java:50-115):
  * date-pattern formatting plus special names — "s" prints epoch seconds,
  * "Q" prints epoch milliseconds, and "iso" means ISO-8601
  * (yyyy-MM-dd'T'HH:mm:ss'Z'). Parsing falls back across the common
  * formats the reference accepts (full timestamp, date-only, epoch).
  *
  * Built on the immutable, thread-safe java.time.DateTimeFormatter — the
  * formatter is shared safely across executor task threads.
  */
final class FancyTime(format: String) extends Serializable {
  private val pattern: String = format match {
    case "iso" => "yyyy-MM-dd'T'HH:mm:ss'Z'"
    case other => other
  }
  @transient private lazy val df: DateTimeFormatter =
    DateTimeFormatter.ofPattern(pattern).withZone(ZoneOffset.UTC)
  private def hasTimeFields: Boolean =
    pattern.exists(c => c == 'H' || c == 'm' || c == 's' || c == 'S' || c == 'h')

  def formatMillis(ms: Long): String = format match {
    case "s" => (ms / 1000).toString
    case "Q" => ms.toString
    case _   => df.format(Instant.ofEpochMilli(ms))
  }

  def parseMillis(s: String): Long = format match {
    case "s" => s.toLong * 1000
    case "Q" => s.toLong
    case _ =>
      try {
        if (hasTimeFields)
          LocalDateTime.parse(s, df).toInstant(ZoneOffset.UTC).toEpochMilli
        else
          LocalDate.parse(s, df).atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
      } catch {
        case _: Exception => FancyTime.parseFallback(s)
      }
  }
}

object FancyTime {
  def apply(format: String): FancyTime = new FancyTime(format)
  val default = new FancyTime("yyyy-MM-dd")

  /** Multi-format fallback parse, like the reference's
    * FancyTimeFormatter.java:91-115: try full timestamp, then date-only,
    * then raw epoch-millis digits.
    */
  private val fallbacks = Seq(
    new FancyTime("yyyy-MM-dd HH:mm:ss"),
    new FancyTime("yyyy-MM-dd'T'HH:mm:ss'Z'"),
    new FancyTime("yyyy-MM-dd"),
    new FancyTime("yy-MM-dd"),
  )
  def parseFallback(s: String): Long = {
    if (s.forall(_.isDigit) && s.nonEmpty) return s.toLong
    fallbacks.iterator
      .flatMap(f => try Some(f.parseMillis(s)) catch { case _: Exception => None })
      .nextOption()
      .getOrElse(throw new IllegalArgumentException(s"unparseable date: $s"))
  }
}
