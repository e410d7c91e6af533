package graft

/** JSON string escaping shared by every harness main that emits JSON
  * (Verify's oracle_sql.json, Bench's result line, RunJob's result line).
  * Escapes backslash, quote, and ALL control chars (<0x20) — a stray tab,
  * CR, or ESC in builder-authored SQL or an exception message would
  * otherwise make the driver's json.load fail and silently zero a round.
  */
private[graft] object JsonEscape {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
