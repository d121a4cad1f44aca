package graft.functions

/** IEC binary formatting/parsing (reference lib/.../util/IECBinary.java):
  * 1024 → "1 KiB", "123 KiB" → 125952. Scalar semantics mirrored exactly
  * (log-1024 exponent, %.0f rounding, case-insensitive unit parse).
  */
object IECBinaryImpl {
  private val Units = Array("B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB")
  private val Pattern = """(\d+)\s*(\w*)""".r

  /** Format with rounded fraction, e.g. 1536 → "2 KiB" (reference
    * IECBinary.java:26-35 uses %.0f → half-even via java format). */
  def format(value: Long): String =
    if (value < 1024) s"$value B"
    else {
      val exp = (math.log(value.toDouble) / math.log(1024d)).toInt
      val pre = s"${"KMGTPE".charAt(exp - 1)}i"
      String.format("%.0f %sB", Double.box(value / math.pow(1024d, exp)), pre)
    }

  /** Parse fraction-less IEC value, e.g. "123 KiB" → 125952 (reference
    * IECBinary.java:43-61). */
  def parse(formatted: String): Long = formatted match {
    case Pattern(num, unit) =>
      val idx = Units.indexWhere(_.equalsIgnoreCase(unit))
      val factor = if (unit.isEmpty || idx < 0) 1L else 1L << (10 * idx)
      num.toLong * factor
    case _ =>
      throw new IllegalArgumentException(
        s"Expected '<number> <IEC unit>' but got <$formatted>")
  }
}
