package graft.util

/** Locale-independent numeric formatting for the bench mains' JSON
  * output lines. The `f"..%.2f"` interpolator uses the JVM default
  * locale, so on a comma-decimal locale (`de_DE`, `fr_FR`, ...) it
  * emits `12,34` — invalid JSON. Always format machine-read numbers
  * with `Locale.ROOT`.
  */
object Fmt {
  def f2(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
  def f3(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
}
