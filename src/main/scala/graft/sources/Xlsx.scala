package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipFile

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1: Excel scan — a minimal pure-JVM OOXML (.xlsx) reader for the
  * reference's grid-points workbook (`data_extraction_v2.py:353`
  * `pd.read_excel(grid_points)`): one sheet, a header row of shared
  * strings, numeric data cells.
  *
  * An .xlsx is a zip of XML parts; this parses `xl/sharedStrings.xml` and
  * the first worksheet with the JDK's DOM — no libraries. Like the
  * Shapefile/GeoTIFF scans it reads the at-rest format the reference
  * actually consumes; anything outside that profile (formulas, dates,
  * multiple sheets) is rejected loudly. At scale the workbook is a tiny
  * dimension input (the reference's is 19k sampling points) — it is read
  * once on the driver and becomes a broadcast-able DataFrame.
  */
object Xlsx {

  final case class Sheet(headers: Seq[String], rows: Seq[Array[Double]])

  def readSheet(path: String): Sheet = {
    val zip = new ZipFile(path)
    try {
      def part(name: String): Array[Byte] = {
        val e = zip.getEntry(name)
        require(e != null, s"$path: missing $name")
        zip.getInputStream(e).readAllBytes()
      }
      def dom(bytes: Array[Byte]) = {
        val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
      }

      // shared strings (header cells reference them by index)
      val sharedStrings: Vector[String] = {
        val e = zip.getEntry("xl/sharedStrings.xml")
        if (e == null) Vector.empty
        else {
          val doc = dom(zip.getInputStream(e).readAllBytes())
          val sis = doc.getElementsByTagName("si")
          Vector.tabulate(sis.getLength)(i => sis.item(i).getTextContent)
        }
      }

      // Resolve the first sheet's part through the workbook relationships
      // instead of assuming "xl/worksheets/sheet1.xml" (writers are free to
      // name parts anything; the rels file is the normative mapping).
      val sheetPart: String = {
        val resolved =
          for {
            wbE <- Option(zip.getEntry("xl/workbook.xml"))
            relsE <- Option(zip.getEntry("xl/_rels/workbook.xml.rels"))
            sheets = dom(zip.getInputStream(wbE).readAllBytes())
              .getElementsByTagName("sheet")
            if sheets.getLength > 0
            rid = sheets.item(0).asInstanceOf[org.w3c.dom.Element].getAttribute("r:id")
            rs = dom(zip.getInputStream(relsE).readAllBytes())
              .getElementsByTagName("Relationship")
            target <- (0 until rs.getLength).iterator
              .map(i => rs.item(i).asInstanceOf[org.w3c.dom.Element])
              .find(_.getAttribute("Id") == rid)
              .map(_.getAttribute("Target"))
          } yield if (target.startsWith("/")) target.drop(1) else s"xl/$target"
        resolved.getOrElse("xl/worksheets/sheet1.xml")
      }
      val doc = dom(part(sheetPart))
      val rowNodes = doc.getElementsByTagName("row")

      // "A2" → 0, "AB7" → 27
      def colIdx(ref: String): Int =
        ref.takeWhile(_.isLetter).foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1

      def cells(rowIdx: Int): Seq[(Int, String, Option[String])] = {
        val row = rowNodes.item(rowIdx).asInstanceOf[org.w3c.dom.Element]
        val cs = row.getElementsByTagName("c")
        // The r= cell reference is OPTIONAL in OOXML: when absent, a cell
        // occupies the column after the previous cell (position 0 if first).
        var nextPos = 0
        (0 until cs.getLength).flatMap { j =>
          val c = cs.item(j).asInstanceOf[org.w3c.dom.Element]
          val ref = c.getAttribute("r")
          val pos = if (ref.nonEmpty && ref.exists(_.isLetter)) colIdx(ref) else nextPos
          nextPos = pos + 1
          val vs = c.getElementsByTagName("v")
          if (vs.getLength == 0) None
          else Some((pos,
                     vs.item(0).getTextContent,
                     Option(c.getAttribute("t")).filter(_.nonEmpty)))
        }
      }

      require(rowNodes.getLength >= 1, s"$path: empty sheet")
      val headers = cells(0).sortBy(_._1).map {
        case (_, v, Some("s")) => sharedStrings(v.toInt)
        case (_, v, _)         => v
      }
      val nCols = headers.length
      val out = ArrayBuffer.empty[Array[Double]]
      var i = 1
      while (i < rowNodes.getLength) {
        val arr = Array.fill(nCols)(Double.NaN)
        cells(i).foreach { case (cIdx, v, t) =>
          require(!t.contains("s"), s"$path: string data cell in row ${i + 1}")
          if (cIdx < nCols) arr(cIdx) = v.toDouble
        }
        out += arr
        i += 1
      }
      Sheet(headers, out.toSeq)
    } finally zip.close()
  }

  /** Sheet → DataFrame with the header names as double columns. */
  def toDF(spark: SparkSession, path: String): DataFrame = {
    val sheet = readSheet(path)
    import org.apache.spark.sql.types._
    val schema = StructType(sheet.headers.map(h => StructField(h, DoubleType, nullable = false)))
    val rows = sheet.rows.map(r => org.apache.spark.sql.Row.fromSeq(r.toSeq))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }
}
