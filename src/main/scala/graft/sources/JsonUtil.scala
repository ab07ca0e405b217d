package graft.sources

/** The one JSON string-escape every wire-building sink shares (quote,
  * backslash, control chars → \u escapes). A private copy lived in six
  * sinks (plus AdxSink's null-handling variant built on the same rule);
  * an escaping fix applied to one would silently miss the others. */
private[sources] object JsonUtil {
  def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }
}
