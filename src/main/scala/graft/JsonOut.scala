package graft

/** One JSON string-escaper for every measurement main that hand-emits
  * its one-line JSON (Bench detail forensics, SemDedupAudit plan-mode
  * refusals, CkptDrill error legs). The r17 review found three
  * divergent inline replace-chains, each missing a different control
  * character — a message containing e.g. an ANSI escape would have
  * made the very file written for failure forensics unparseable. */
object JsonOut {
  /** `s` as a quoted JSON string literal: backslash, quote, and EVERY
    * control character below 0x20 escaped (\n\r\t named, the rest as
    * \u00XX). */
  def jsonStr(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    b.append('"')
    s.foreach {
      case '\\' => b.append("\\\\")
      case '"' => b.append("\\\"")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"')
    b.toString
  }
}
