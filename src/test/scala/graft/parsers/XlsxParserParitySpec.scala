package graft.parsers

import graft.SparkSpec
import graft.sources.XlsxTestWriter
import org.apache.spark.sql.DataFrame

/** CCIDB/CEBS through REAL .xlsx containers: the fixture CSV is
  * converted to a genuine xlsx (shared strings, sparse cells, native
  * numbers) and parsed via the Registry's native-xlsx branch; nodes and
  * edges must equal the CSV-export parse exactly — same counts, same
  * rows. Proves the pure-JDK Xlsx reader feeds the parsers the
  * identical frame the CSV reader does (loadCCIDB.py:115 /
  * loadCEBS.py:136 read these sheets with pd.read_excel). */
class XlsxParserParitySpec extends SparkSpec {

  private val res = "src/test/resources/parsers"

  /** Load a fixture CSV as raw rows (header row included) for the
    * xlsx writer, preserving embedded newlines and nulls. */
  private def csvRows(path: String): Seq[Seq[String]] = {
    val df = spark.read.option("header", "false").option("multiLine", "true").csv(path)
    df.collect().toSeq.map(r => (0 until r.length).map(i =>
      if (r.isNullAt(i)) null else r.getString(i)))
  }

  private def sortedRows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols.map(c => s"`$c`"): _*).collect()
      .map(_.toString).toSeq.sorted
  }

  test("CCIDB: native xlsx parse == CSV-export parse, row for row") {
    val dir = java.nio.file.Files.createTempDirectory("ccidb-xlsx-").toString
    XlsxTestWriter.write(s"$dir/CCIDB_Human.xlsx",
      Seq("Sheet1" -> csvRows(s"$res/ccidb/CCIDB_Human.csv")))
    for (m <- Seq("gene_mapping.csv", "term_mapping.csv"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$res/ccidb/$m"), java.nio.file.Paths.get(s"$dir/$m"))
    val fromXlsx = Registry("CCIDB")(spark, dir)
    val fromCsv = Registry("CCIDB")(spark, s"$res/ccidb")
    assert(fromXlsx.edges.count() == 11) // the LongTailParsersSpec pin
    assert(sortedRows(fromXlsx.nodes) == sortedRows(fromCsv.nodes))
    assert(sortedRows(fromXlsx.edges) == sortedRows(fromCsv.edges))
  }

  test("CEBS: native xlsx parse == CSV-export parse, row for row") {
    val dir = java.nio.file.Files.createTempDirectory("cebs-xlsx-").toString
    XlsxTestWriter.write(s"$dir/TR_LOE_latest.xlsx",
      Seq("Data" -> csvRows(s"$res/cebs/TR_LOE_latest.csv")))
    val fromXlsx = Registry("CEBS")(spark, dir)
    val fromCsv = Registry("CEBS")(spark, s"$res/cebs")
    assert(fromXlsx.edges.count() == fromCsv.edges.count() && fromXlsx.edges.count() > 0)
    assert(sortedRows(fromXlsx.nodes) == sortedRows(fromCsv.nodes))
    assert(sortedRows(fromXlsx.edges) == sortedRows(fromCsv.edges))
  }
}
