package graft.queries

import graft.Q
import graft.core.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column operators: binary payload plumbing + batch feature
  * extraction via `mapPartitions` (decode stubbed — see
  * graft.multimodal.Multimodal). The oracle recomputes the SQL-expressible
  * metadata (byte length, lead byte, format sniff) from the source text.
  */
object MultimodalQueries {

  def all: Seq[Q] = Seq(

    Q("mm_media_features", Seq("multimodal", "S8", "P9"),
      (s, dir) => {
        val meta = Multimodal.extractFeatures(s, Tables.documents(s, dir))
        meta.toDF()
          .select(col("docId").as("doc_id"), col("nBytes").as("n_bytes"),
                  col("firstByte").as("first_byte"), col("format"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             |  CAST(ascii(text) AS INTEGER) AS first_byte,
             |  CASE WHEN ascii(text) BETWEEN 97 AND 109 THEN 'fmtA'
             |       WHEN ascii(text) BETWEEN 110 AND 122 THEN 'fmtB'
             |       ELSE 'bin' END AS format
             |FROM documents ORDER BY doc_id""".stripMargin),
      note = "binary payload column + mapPartitions batch decode (stubbed)"),

    Q("mm_format_rollup", Seq("multimodal", "A4"),
      (s, dir) => {
        val meta = Multimodal.extractFeatures(s, Tables.documents(s, dir))
        meta.toDF()
          .groupBy("format")
          .agg(count(lit(1)).as("n"), sum(col("nBytes").cast("long")).as("total_bytes"),
               min("checksum").as("min_checksum"))
          .orderBy("format")
      },
      None, // checksum is byte-level (not SQL-expressible over text) — rows-only
      note = "per-format rollup incl. byte-level rolling checksum")
  )
}
