package graft

/** Dev tool: emit the SURVEY.md §2 coverage table (COVERAGE.md body).
  * With an output path argument, splices the table + covered-ids footer
  * into that file (everything before the `| query` header is preserved),
  * writing UTF-8 directly — sbt's console mangles non-ASCII, so prefer
  * `runMain graft.Coverage COVERAGE.md`. */
object Coverage {
  def main(args: Array[String]): Unit = {
    val rows =
      Seq("| query | SURVEY §2 operators | check | notes |", "|---|---|---|---|") ++
      SparkEntry.registry.map { q =>
        val check = if (q.oracle.isDefined) "DuckDB oracle (hash)" else "rows-only + ScalaTest"
        s"| `${q.name}` | ${q.covers.mkString(", ")} | $check | ${q.note} |"
      }
    val covered = SparkEntry.registry.flatMap(_.covers).toSet
    val footer = s"covered ids: ${covered.toSeq.sorted.mkString(" ")}"
    args.headOption match {
      case Some(path) =>
        val p = java.nio.file.Paths.get(path)
        val head = java.nio.file.Files.readString(p).linesIterator
          .takeWhile(!_.startsWith("| query")).mkString("\n")
        java.nio.file.Files.writeString(p,
          head + "\n" + rows.mkString("\n") + "\n\n" + footer + "\n")
      case None =>
        rows.foreach(println)
        println("\n" + footer)
    }
  }
}
