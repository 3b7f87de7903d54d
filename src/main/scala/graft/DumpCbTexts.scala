package graft

/** Dev-only: dump the ClickBench duck-dialect texts (with `FROM hits`
  * intact) to tools/cb_duck_texts.json for the DuckDB pairing tool —
  * regenerate whenever queries/ClickBench.scala changes so the two
  * sides cannot drift.
  */
object DumpCbTexts {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = queries.ClickBench.texts.map { case (name, _) =>
      s"${q(name)}: ${q(queries.ClickBench.oracleTextFor(name))}"
    }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("tools/cb_duck_texts.json"), json)
    println(s"wrote ${queries.ClickBench.texts.size} texts")
  }
}
