package graft.http

import com.fasterxml.jackson.databind.ObjectMapper

/** Shared Jackson mapper (Spark ships jackson-databind on every executor).
  * Used only on the narrow I/O paths (OIDC token parse, stub server, sink
  * batch framing); all row-level JSON work stays in Catalyst
  * (`to_json`/`from_json`).
  */
object Json {
  val mapper = new ObjectMapper()

  /** JSON string-literal escape (RFC 8259): quote, backslash, control chars. */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }
}
