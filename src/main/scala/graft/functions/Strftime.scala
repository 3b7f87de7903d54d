package graft.functions

/** C-style strftime → JDK DateTimeFormatter pattern translation.
  *
  * The reference formats timestamps with C strftime directives
  * (/root/reference/src/function/scalar/strftime_format.cpp); Spark's
  * `date_format` takes JDK patterns. This translator covers the directive
  * set the reference supports that has a JDK equivalent; unknown
  * directives throw rather than silently produce wrong output.
  */
object Strftime {

  private val directives: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy",
    'm' -> "MM", 'd' -> "dd", 'e' -> "d",
    'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
    'f' -> "SSSSSS", 'g' -> "SSS",
    'j' -> "DDD",
    'a' -> "EEE", 'A' -> "EEEE",
    'b' -> "MMM", 'h' -> "MMM", 'B' -> "MMMM",
    'p' -> "a",
    'Z' -> "zzz")

  def toJava(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val n = fmt(i + 1)
        if (n == '%') sb.append('%')
        else sb.append(directives.getOrElse(n,
          throw new IllegalArgumentException(s"unsupported strftime directive %$n")))
        i += 2
      } else {
        if (c.isLetter) sb.append('\'').append(c).append('\'')
        else if (c == '\'') sb.append("''")
        else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
}
