package graft.runtime

import java.text.SimpleDateFormat
import java.util.{Date, TimeZone}

/** Time formatter with the reference's extended format names.
  *
  * Mirrors the observable contract of the reference's FancyTimeFormatter
  * (nifi-datasynthesizer-generators/.../FancyTimeFormatter.java:50-100):
  * SimpleDateFormat patterns plus two special names — "s" prints epoch
  * seconds and "Q" prints epoch milliseconds (both as decimal strings).
  */
final class FancyTime(format: String) extends Serializable {
  @transient private lazy val df: SimpleDateFormat = {
    val f = new SimpleDateFormat(format match {
      case "yyyy-MM-dd" | "yy-MM-dd" => format
      case other                     => other
    })
    f.setTimeZone(TimeZone.getTimeZone("UTC"))
    f
  }

  def formatMillis(ms: Long): String = format match {
    case "s" => (ms / 1000).toString
    case "Q" => ms.toString
    case _   => df.format(new Date(ms))
  }

  def parseMillis(s: String): Long = format match {
    case "s" => s.toLong * 1000
    case "Q" => s.toLong
    case _   => df.parse(s).getTime
  }
}

object FancyTime {
  def apply(format: String): FancyTime = new FancyTime(format)
  val default = new FancyTime("yyyy-MM-dd")
}
