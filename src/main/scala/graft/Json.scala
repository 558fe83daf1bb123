package graft

/** Minimal JSON emission helpers shared by the artifact writers (Bench,
  * Verify). One escaping implementation: backslash, quote, and ALL control
  * chars (<0x20) — a tab or CR in builder-authored SQL would otherwise make
  * the driver's json.load fail and silently zero a round's signal.
  */
object Json {

  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Locale.ROOT: the default locale renders comma decimals (invalid JSON)
    * under e.g. de_DE; NaN/Infinity have no JSON representation → null. */
  def num(d: Double, fmt: String = "%.6f"): String =
    if (d.isNaN || d.isInfinite) "null"
    else String.format(java.util.Locale.ROOT, fmt, Double.box(d))
}
