package graft

/** Dev tool: emit the SURVEY.md §2 coverage table (COVERAGE.md body). */
object Coverage {
  def main(args: Array[String]): Unit = {
    println("| query | SURVEY §2 operators | check | notes |")
    println("|---|---|---|---|")
    SparkEntry.registry.foreach { q =>
      val check = if (q.oracle.isDefined) "DuckDB oracle (hash)" else "rows-only + ScalaTest"
      println(s"| `${q.name}` | ${q.covers.mkString(", ")} | $check | ${q.note} |")
    }
    val covered = SparkEntry.registry.flatMap(_.covers).toSet
    println(s"\ncovered ids: ${covered.toSeq.sorted.mkString(" ")}")
  }
}
