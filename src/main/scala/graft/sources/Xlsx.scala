package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.w3c.dom.Element

/** Minimal native .xlsx reader — pure JDK (java.util.zip + javax.xml),
  * no POI. An xlsx file is a ZIP of XML parts; this reads exactly the
  * parts a tabular sheet needs:
  *
  *  - `xl/workbook.xml`            sheet name → relationship id
  *  - `xl/_rels/workbook.xml.rels` relationship id → worksheet part
  *  - `xl/sharedStrings.xml`       the shared-string table (`<si>`,
  *                                 including rich-text runs: all
  *                                 descendant `<t>` concatenated)
  *  - `xl/worksheets/sheetN.xml`   `<row>`/`<c>` cells: shared strings
  *                                 (t="s"), inline strings
  *                                 (t="inlineStr"), formula strings
  *                                 (t="str"), booleans (t="b"), and raw
  *                                 numbers; sparse cells resolved via
  *                                 their A1-style `r` references.
  *
  * Matches the reference's `pd.read_excel(path, sheet_name=...)` seam
  * (parsers/CCIDB/src/loadCCIDB.py:115, parsers/CEBS/src/loadCEBS.py:136)
  * for curated-spreadsheet ingestion. Scale posture: curated xlsx inputs
  * are METADATA-scale (the reference's are hand-maintained sheets), so
  * the parse is driver-side like every fetch-seam codec, and the result
  * is distributed immediately via `createDataFrame`; bulk data never
  * ships as xlsx. Empty cells map to null — the same contract as the
  * Spark CSV reader — so a sheet and its CSV export parse identically
  * downstream. XML parsing runs with external entities disabled. */
object Xlsx {

  private def newDocBuilder(): javax.xml.parsers.DocumentBuilder = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // untrusted-content hygiene: no external entity resolution
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder()
  }

  /** Inflated-size cap per ZIP part: curated sheets are metadata-scale,
    * so any part inflating past this is a malformed file or a zip bomb
    * (the entry header's declared size can lie, so the guard counts
    * actual inflated bytes, not `getSize`). */
  private[sources] val MaxPartBytes: Long = 64L << 20

  /** Wraps a part stream and fails loud once more than `cap` bytes
    * inflate out of it — the untrusted-content guard for crafted ZIPs.
    * Counts EVERY consumption path (read and skip). */
  private[sources] final class BoundedStream(in: java.io.InputStream, part: String,
      cap: Long = MaxPartBytes)
      extends java.io.FilterInputStream(in) {
    private var count = 0L
    private def bump(n: Long): Unit = if (n > 0) {
      count += n
      if (count > cap)
        throw new IllegalArgumentException(
          s"$part: inflated size exceeds ${cap} bytes (zip-bomb guard)")
    }
    override def read(): Int = { val b = super.read(); if (b >= 0) bump(1); b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val n = super.read(b, off, len); bump(n.toLong); n
    }
    // skip() must count too: FilterInputStream.skip delegates straight to
    // the inflater stream, so a parser path that skips would otherwise
    // inflate past the cap uncounted
    override def skip(n: Long): Long = { val s = super.skip(n); bump(s); s }
  }

  private def parsePart(zip: java.util.zip.ZipFile, name: String): Option[org.w3c.dom.Document] =
    Option(zip.getEntry(name)).map { e =>
      val in = new BoundedStream(zip.getInputStream(e), s"${zip.getName}!$name")
      try newDocBuilder().parse(in) finally in.close()
    }

  private def elems(doc: org.w3c.dom.Document, local: String): Seq[Element] = {
    val nl = doc.getElementsByTagNameNS("*", local)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  private def childText(e: Element, local: String): String = {
    val nl = e.getElementsByTagNameNS("*", local)
    (0 until nl.getLength).map(nl.item(_).getTextContent).mkString
  }

  /** A1-style reference → 0-based column index ("A"→0, "AB"→27). */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** Sheet names in workbook order. */
  def sheetNames(path: String): Seq[String] = {
    val zip = new java.util.zip.ZipFile(path)
    try parsePart(zip, "xl/workbook.xml").toSeq
      .flatMap(elems(_, "sheet")).map(_.getAttribute("name"))
    finally zip.close()
  }

  /** Raw cell grid of one sheet: rows of equal length, null for cells
    * the sheet leaves empty. Throws IllegalArgumentException for an
    * unknown sheet name. */
  def readRows(path: String, sheetName: String): Seq[Array[String]] = {
    val zip = new java.util.zip.ZipFile(path)
    try {
      val wb = parsePart(zip, "xl/workbook.xml")
        .getOrElse(throw new IllegalArgumentException(s"$path: not an xlsx (no xl/workbook.xml)"))
      val rid = elems(wb, "sheet").find(_.getAttribute("name") == sheetName)
        .map { e =>
          // the r:id attribute lives in the relationships namespace
          val a = e.getAttributes
          (0 until a.getLength).map(a.item(_)).collectFirst {
            case n if n.getLocalName == "id" => n.getNodeValue
          }.getOrElse("")
        }
        .getOrElse(throw new IllegalArgumentException(
          s"$path: no sheet named '$sheetName' (has: ${sheetNames(path).mkString(", ")})"))
      val target = parsePart(zip, "xl/_rels/workbook.xml.rels").toSeq
        .flatMap(elems(_, "Relationship"))
        .find(_.getAttribute("Id") == rid)
        .map(_.getAttribute("Target"))
        .getOrElse(throw new IllegalArgumentException(s"$path: unresolved sheet rel $rid"))
      val partName =
        if (target.startsWith("/")) target.drop(1)
        else "xl/" + target
      val sst: IndexedSeq[String] = parsePart(zip, "xl/sharedStrings.xml").toIndexedSeq
        .flatMap(elems(_, "si")).map(si => childText(si, "t"))
      val sheet = parsePart(zip, partName)
        .getOrElse(throw new IllegalArgumentException(s"$path: missing part $partName"))
      var maxCol = -1
      val rows = elems(sheet, "row").map { r =>
        val cellsNl = r.getElementsByTagNameNS("*", "c")
        val cells = (0 until cellsNl.getLength).map(cellsNl.item(_).asInstanceOf[Element])
        var nextCol = 0
        cells.flatMap { c =>
          val ref = c.getAttribute("r")
          val ci = if (ref != null && ref.nonEmpty) colIndex(ref) else nextCol
          nextCol = ci + 1
          if (ci > maxCol) maxCol = ci
          val t = c.getAttribute("t")
          val raw = t match {
            case "s" =>
              val v = childText(c, "v")
              if (v.isEmpty) null
              else {
                // malformed-input contract: clear error naming part + cell,
                // never a raw NumberFormat/IndexOutOfBounds escape
                val idx = v.trim.toIntOption.getOrElse(throw new IllegalArgumentException(
                  s"$path!$partName cell $ref: non-integer shared-string index '$v'"))
                if (idx < 0 || idx >= sst.length) throw new IllegalArgumentException(
                  s"$path!$partName cell $ref: shared-string index $idx out of range " +
                    s"(xl/sharedStrings.xml has ${sst.length} entries)")
                sst(idx)
              }
            case "inlineStr" => childText(c, "t")
            case "b" =>
              childText(c, "v").trim match {
                case "1" => "true"; case "0" => "false"; case other => other
              }
            case _ => // "str", "n", or untyped numeric
              val v = childText(c, "v")
              if (v.isEmpty) null else v
          }
          if (raw == null || raw.isEmpty) None else Some(ci -> raw)
        }
      }
      rows.map { cells =>
        val arr = new Array[String](maxCol + 1)
        cells.foreach { case (ci, v) => arr(ci) = v }
        arr
      }
    } finally zip.close()
  }

  /** One sheet as a DataFrame: first row = column names (empty header
    * cells become _c<i>, like the CSV reader), every column StringType,
    * empty cells null — byte-for-byte the contract of
    * `spark.read.option("header","true").csv` on the sheet's CSV
    * export, so either container feeds the same parser unchanged. */
  def readSheet(spark: SparkSession, path: String, sheetName: String): DataFrame = {
    val rows = readRows(path, sheetName)
    require(rows.nonEmpty, s"$path!$sheetName: empty sheet")
    val named = rows.head.zipWithIndex.map { case (h, i) =>
      if (h == null || h.isEmpty) s"_c$i" else h
    }
    // duplicate headers get their column index suffixed — ALL occurrences,
    // exactly the Spark CSV reader's makeSafeHeader dedup (case-insensitive,
    // matching spark.sql.caseSensitive's default) — so col() references stay
    // unambiguous and the CSV-export parity contract holds
    val counts = named.groupBy(_.toLowerCase).map { case (k, v) => k -> v.length }
    val header = named.zipWithIndex.map { case (h, i) =>
      if (counts(h.toLowerCase) > 1) s"$h$i" else h
    }
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val data = rows.tail.map(r => Row.fromSeq(r.toSeq))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq, math.max(1, math.min(8, data.size / 1000 + 1))),
      schema)
  }
}
