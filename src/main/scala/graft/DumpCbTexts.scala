package graft

/** Dev-only: dump the ClickBench duck-dialect texts (with `FROM hits`
  * intact) to tools/cb_duck_texts.json for the DuckDB pairing tool —
  * regenerate whenever queries/ClickBench.scala changes so the two
  * sides cannot drift.
  */
object DumpCbTexts {
  def main(args: Array[String]): Unit = {
    ToolPaths.writeToolJson("cb_duck_texts.json",
      queries.ClickBench.texts.map { case (name, _) =>
        name -> queries.ClickBench.oracleTextFor(name)
      })
    println(s"wrote ${queries.ClickBench.texts.size} texts")
  }
}
