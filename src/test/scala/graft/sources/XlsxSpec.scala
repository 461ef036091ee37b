package graft.sources

import graft.SparkSpec

/** Test-side minimal xlsx WRITER (zip + XML, shared-strings layout like
  * real producers) + reader unit tests. The writer lives in test scope
  * only — production never emits xlsx — and deliberately exercises the
  * reader's shared-string, numeric, sparse-cell, and multi-sheet paths. */
object XlsxTestWriter {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Write sheets of (name, rows); null cells are OMITTED from the XML
    * (sparse), numeric-looking cells are written as native numbers,
    * everything else through the shared-string table. */
  def write(path: String, sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
    val sst = new scala.collection.mutable.LinkedHashMap[String, Int]()
    def sstIdx(s: String): Int = sst.getOrElseUpdate(s, sst.size)
    val isNum = (s: String) => s.nonEmpty && s.matches("-?\\d+(\\.\\d+)?")

    val sheetXmls = sheets.map { case (_, rows) =>
      val body = rows.zipWithIndex.map { case (row, r) =>
        val cells = row.zipWithIndex.collect {
          case (v, c) if v != null && v.nonEmpty =>
            val ref = s"${colRef(c)}${r + 1}"
            if (isNum(v)) s"""<c r="$ref"><v>${esc(v)}</v></c>"""
            else s"""<c r="$ref" t="s"><v>${sstIdx(v)}</v></c>"""
        }.mkString
        s"""<row r="${r + 1}">$cells</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>"""
    }
    val wb =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>${
        sheets.zipWithIndex.map { case ((n, _), i) =>
          s"""<sheet name="${esc(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString}</sheets></workbook>"""
    val rels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">${
        sheets.indices.map { i =>
          s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
        }.mkString}<Relationship Id="rId${sheets.size + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/></Relationships>"""
    val sstXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sst.size}" uniqueCount="${sst.size}">${
        sst.keys.map(s => s"<si><t>${esc(s)}</t></si>").mkString}</sst>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/></Types>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""

    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    try {
      entry("[Content_Types].xml", contentTypes)
      entry("_rels/.rels", rootRels)
      entry("xl/workbook.xml", wb)
      entry("xl/_rels/workbook.xml.rels", rels)
      entry("xl/sharedStrings.xml", sstXml)
      sheetXmls.zipWithIndex.foreach { case (x, i) => entry(s"xl/worksheets/sheet${i + 1}.xml", x) }
    } finally zos.close()
  }
}

class XlsxSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("xlsx-spec-").resolve(name).toString

  test("colIndex: A1-style references") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA10") == 26)
    assert(Xlsx.colIndex("AB1") == 27)
  }

  test("round-trip: shared strings, numbers, sparse cells, multiple sheets") {
    val p = tmp("multi.xlsx")
    XlsxTestWriter.write(p, Seq(
      "Sheet1" -> Seq(
        Seq("name", "qty", "note"),
        Seq("alpha", "5", null),          // sparse: note omitted
        Seq("beta & <co>", "2.5", "x")),  // XML-escaped content
      "Data" -> Seq(
        Seq("k", "v"),
        Seq("key1", "100"))))
    assert(Xlsx.sheetNames(p) == Seq("Sheet1", "Data"))
    val rows = Xlsx.readRows(p, "Sheet1")
    assert(rows.length == 3)
    assert(rows(0).toSeq == Seq("name", "qty", "note"))
    assert(rows(1).toSeq == Seq("alpha", "5", null)) // empty cell -> null
    assert(rows(2).toSeq == Seq("beta & <co>", "2.5", "x"))
    val data = Xlsx.readRows(p, "Data")
    assert(data(1).toSeq == Seq("key1", "100"))
  }

  test("readSheet: header row + all-string nullable schema, CSV-reader contract") {
    val p = tmp("frame.xlsx")
    XlsxTestWriter.write(p, Seq("Sheet1" -> Seq(
      Seq("a", "b", null),      // empty header -> _c2
      Seq("1", null, "z"),
      Seq("2", "y", null))))
    val df = Xlsx.readSheet(spark, p, "Sheet1")
    assert(df.columns.toSeq == Seq("a", "b", "_c2"))
    assert(df.schema.fields.forall(f =>
      f.dataType == org.apache.spark.sql.types.StringType && f.nullable))
    val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("1", null, "z"), ("2", "y", null)))
  }

  test("rich-text shared strings concatenate their runs") {
    // hand-built workbook: one si with <r><t> runs, as real editors emit
    // after per-character formatting
    val p = tmp("rich.xlsx")
    XlsxTestWriter.write(p, Seq("Sheet1" -> Seq(Seq("placeholder"))))
    // patch the sharedStrings part with a rich-text si
    val fs = java.nio.file.FileSystems.newFileSystem(java.nio.file.Paths.get(p))
    try {
      val sst = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="1" uniqueCount="1"><si><r><t>multi </t></r><r><t>part</t></r></si></sst>"""
      java.nio.file.Files.write(fs.getPath("xl/sharedStrings.xml"), sst.getBytes("UTF-8"))
    } finally fs.close()
    assert(Xlsx.readRows(p, "Sheet1")(0).toSeq == Seq("multi part"))
  }

  /** Replace one part inside a written xlsx (zip filesystem patch). */
  private def patchPart(path: String, part: String, bytes: Array[Byte]): Unit = {
    val fs = java.nio.file.FileSystems.newFileSystem(java.nio.file.Paths.get(path))
    try java.nio.file.Files.write(fs.getPath(part), bytes)
    finally fs.close()
  }

  test("duplicate headers dedup with the column index, like spark.read.csv") {
    val p = tmp("dup.xlsx")
    XlsxTestWriter.write(p, Seq("Sheet1" -> Seq(
      Seq("name", "name", "qty", "Name"), // case-insensitive dup detection
      Seq("a", "b", "1", "c"))))
    val df = Xlsx.readSheet(spark, p, "Sheet1")
    assert(df.columns.toSeq == Seq("name0", "name1", "qty", "Name3"))
    assert(df.select("name1").head().getString(0) == "b")
  }

  test("zip-bomb guard: a part inflating past the cap fails loud, fast") {
    val p = tmp("bomb.xlsx")
    XlsxTestWriter.write(p, Seq("Sheet1" -> Seq(Seq("x"))))
    // 80 MiB of spaces deflate to ~100 KiB — the classic bomb shape; the
    // guard must trip on INFLATED bytes, not the lying entry header
    val huge = new Array[Byte]((Xlsx.MaxPartBytes + (16L << 20)).toInt)
    java.util.Arrays.fill(huge, ' '.toByte)
    "<sst>".getBytes("UTF-8").copyToArray(huge)
    patchPart(p, "xl/sharedStrings.xml", huge)
    val e = intercept[IllegalArgumentException](Xlsx.readRows(p, "Sheet1"))
    assert(e.getMessage.contains("zip-bomb"))
  }

  test("zip-bomb guard counts skip() consumption, not just read()") {
    // FilterInputStream.skip delegates straight to the inflater stream,
    // so an uncounted skip would inflate past the cap invisibly
    def stream(cap: Long) = new Xlsx.BoundedStream(
      new java.io.ByteArrayInputStream(new Array[Byte](100)), "test-part", cap)
    val s = stream(10)
    val e = intercept[IllegalArgumentException](s.skip(50))
    assert(e.getMessage.contains("zip-bomb"))
    // mixed read-then-skip crosses the cap on the skip
    val m = stream(10)
    assert(m.read(new Array[Byte](8), 0, 8) == 8)
    intercept[IllegalArgumentException](m.skip(8))
    // under-cap consumption through either path stays silent
    val u = stream(100)
    assert(u.skip(40) == 40)
    assert(u.read(new Array[Byte](40), 0, 40) == 40)
  }

  test("crafted shared-string cells: non-integer and out-of-range indexes") {
    def sheetWith(cell: String): String =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1">$cell</row></sheetData></worksheet>"""
    val p1 = tmp("badidx.xlsx")
    XlsxTestWriter.write(p1, Seq("Sheet1" -> Seq(Seq("x"))))
    patchPart(p1, "xl/worksheets/sheet1.xml",
      sheetWith("""<c r="A1" t="s"><v>abc</v></c>""").getBytes("UTF-8"))
    val e1 = intercept[IllegalArgumentException](Xlsx.readRows(p1, "Sheet1"))
    assert(e1.getMessage.contains("non-integer shared-string index") &&
      e1.getMessage.contains("A1"))
    val p2 = tmp("oob.xlsx")
    XlsxTestWriter.write(p2, Seq("Sheet1" -> Seq(Seq("x"))))
    patchPart(p2, "xl/worksheets/sheet1.xml",
      sheetWith("""<c r="A1" t="s"><v>99</v></c>""").getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException](Xlsx.readRows(p2, "Sheet1"))
    assert(e2.getMessage.contains("out of range") && e2.getMessage.contains("A1"))
  }

  test("doctype declarations (XXE vector) are rejected outright") {
    val p = tmp("xxe.xlsx")
    XlsxTestWriter.write(p, Seq("Sheet1" -> Seq(Seq("x"))))
    patchPart(p, "xl/sharedStrings.xml",
      """<?xml version="1.0"?><!DOCTYPE sst [<!ENTITY x SYSTEM "file:///etc/passwd">]><sst><si><t>&x;</t></si></sst>"""
        .getBytes("UTF-8"))
    intercept[Exception](Xlsx.readRows(p, "Sheet1")) // SAXParse: doctype disallowed
  }

  test("unknown sheet and non-xlsx input fail with a clear error") {
    val p = tmp("one.xlsx")
    XlsxTestWriter.write(p, Seq("Sheet1" -> Seq(Seq("x"))))
    val e = intercept[IllegalArgumentException](Xlsx.readRows(p, "Nope"))
    assert(e.getMessage.contains("no sheet named"))
    val zipButNotXlsx = tmp("not.xlsx")
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zipButNotXlsx))
    zos.putNextEntry(new java.util.zip.ZipEntry("other.txt")); zos.write(1); zos.closeEntry(); zos.close()
    val e2 = intercept[IllegalArgumentException](Xlsx.readRows(zipButNotXlsx, "Sheet1"))
    assert(e2.getMessage.contains("not an xlsx"))
  }
}
