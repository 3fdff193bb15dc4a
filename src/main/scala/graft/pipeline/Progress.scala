package graft.pipeline

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K9: progress checkpoints — the reference drops a marker file into
  * `Output_check/` every 20 processed rasters (`BiomassAggregate.py:
  * 161-164`: `"{date} is done.npy"`) and every 40 hindcasts
  * (`BiomassHindcasts.py:74-76`), and resets the directory at the end of
  * a full run (`ForecastMain.py:123-127`: rmtree + mkdir).
  *
  * Engine shape: WHICH units get a marker is a query (deterministic from
  * the data, oracle-checkable); the marker files themselves are a bounded
  * driver-side write (one empty file per `every` units — count/20 files,
  * not a per-row sink). A restarted run lists the surviving markers and
  * skips everything at-or-before the last one, the useful generalization
  * of the reference's write-only sentinels.
  */
object Progress {

  /** Number the units in processing order and keep every `every`-th: the
    * checkpoint rows (seq, unit, marker). Single window over one ordered
    * column — at scale the unit table is tiny (dates, not facts). */
  def markers(units: DataFrame, orderCol: String, every: Int): DataFrame = {
    require(every > 0, s"marker interval must be positive, got $every")
    units.select(col(orderCol).cast("string").as("unit")).distinct()
      // boundedWindow: input is the distinct processing-unit list
      // (#dates), never the fact table
      .withColumn("seq", row_number().over(graft.core.Shape.boundedWindow("unit")))
      .where(col("seq") % every === 0)
      .select(col("seq"), col("unit"), concat(col("unit"), lit(" is done")).as("marker"))
  }

  /** Touch one file per marker row (bounded: rows / every). */
  def writeMarkers(ms: DataFrame, dir: String): Unit = {
    new File(dir).mkdirs()
    ms.select("marker").collect().foreach { r =>
      Files.write(Paths.get(dir, r.getString(0) + ".npy"), Array.emptyByteArray)
      ()
    }
  }

  /** Units already covered by surviving markers: everything at-or-before
    * the highest marked unit (processing is ordered, so a marker at seq k
    * proves units 1..k finished). */
  def completedThrough(dir: String): Option[String] = {
    val d = new File(dir)
    if (!d.isDirectory) None
    else d.listFiles().toSeq
      .map(_.getName).filter(_.endsWith(" is done.npy"))
      .map(_.stripSuffix(" is done.npy"))
      .sorted.lastOption
  }

  /** Drop already-checkpointed units from a restarted run's work list. */
  def resume(units: DataFrame, orderCol: String, dir: String): DataFrame =
    completedThrough(dir) match {
      case Some(last) => units.where(col(orderCol).cast("string") > lit(last))
      case None       => units
    }

  /** End-of-run reset (`ForecastMain.py:123-127`): delete and recreate. */
  def reset(dir: String): Unit = {
    val d = new File(dir)
    if (d.isDirectory) d.listFiles().foreach(f => { f.delete(); () })
    d.mkdirs()
    ()
  }
}
