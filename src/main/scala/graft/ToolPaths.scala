package graft

/** Shared plumbing for the dev bench/dump mains that exchange query
  * texts with the Python pairing tools through JSON files in tools/.
  */
object ToolPaths {

  /** Full JSON string escaping (all control characters, not just the
    * common three) — a hand-rolled concat that missed tabs would emit
    * invalid JSON the pair tool then fails to parse.
    */
  def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def jsonObj(pairs: Seq[(String, String)]): String =
    pairs.map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
      .mkString("{\n", ",\n", "\n}")

  /** The repo's tools/ directory, resolved from the process CWD by
    * walking up — running a main from a subdirectory must not scatter
    * dump files where the pair tools (which read tools/ relative to
    * their own location) never look.
    */
  def toolsDir: java.nio.file.Path = {
    var d = java.nio.file.Paths.get("").toAbsolutePath
    var i = 0
    while (i < 4 && !java.nio.file.Files.isDirectory(d.resolve("tools"))) {
      d = Option(d.getParent).getOrElse(d); i += 1
    }
    val t = d.resolve("tools")
    require(java.nio.file.Files.isDirectory(t),
      s"cannot locate the repo tools/ directory from ${
        java.nio.file.Paths.get("").toAbsolutePath}")
    t
  }

  def writeToolJson(file: String, pairs: Seq[(String, String)]): Unit =
    java.nio.file.Files.writeString(toolsDir.resolve(file), jsonObj(pairs))
}
