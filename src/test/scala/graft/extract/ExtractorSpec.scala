package graft.extract

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.extract.Extractor._

/** Mirrors the reference parser-loader test style (per-parser fixture →
  * exact node/edge counts, e.g. tests/test_loaders.py:33-47), with an
  * HGNC-shaped TSV fixture (parsers/hgnc/src/loadHGNC.py:64-115). */
class ExtractorSpec extends SparkSpec {

  private lazy val fixturePath = {
    val dir = java.nio.file.Files.createTempDirectory("hgnc_fixture")
    val f = dir.resolve("hgnc.tsv")
    java.nio.file.Files.writeString(f,
      Seq(
        "hgnc_id\tsymbol\tname\tgene_group\tgene_group_id\tpubmed_id",
        "HGNC:5\tA1BG\talpha-1-B glycoprotein\tImmunoglobulin like\t594\t2591067",
        "HGNC:37133\tA1BG-AS1\tA1BG antisense RNA 1\tAntisense RNAs\t1987\t",
        "HGNC:24086\tA1CF\tAPOBEC1 complementation factor\tRNA binding\t725\t11072063|11344197",
        "# a comment line",
        "HGNC:7\tA2M\talpha-2-macroglobulin\t\t\t2408344"
      ).mkString("\n"))
    f.toString
  }

  test("S3 delimited scan honors header + comment") {
    val df = readDelimited(spark, fixturePath)
    assert(df.count() == 4)
    assert(df.columns.contains("hgnc_id"))
  }

  test("extraction: gene→family edges, nodes from both sides, null-object rows skipped") {
    val df = readDelimited(spark, fixturePath)
    val g = Extractor.extract(df, Extraction(
      subjectId = col("hgnc_id"),
      subjectName = col("name"),
      subjectCategories = Seq("biolink:Gene"),
      objectId = when(col("gene_group_id").isNotNull,
        concat(lit("HGNC.FAMILY:"), col("gene_group_id"))),
      objectName = col("gene_group"),
      objectCategories = Seq("biolink:GeneFamily"),
      edges = Seq(EdgeRule(lit("biolink:member_of"),
        properties = Map("publications" ->
          when(col("pubmed_id").isNotNull,
            transform(split(col("pubmed_id").cast("string"), "\\|"),
              p => concat(lit("PMID:"), p)))))),
      primaryKnowledgeSource = "infores:hgnc"))
    // HGNC:7 has no gene_group_id → its row drops (objectId null)
    assert(g.edges.count() == 3)
    assert(g.nodes.count() == 6) // 3 genes + 3 families
    val pubs = g.edges.filter(col("subject") === "HGNC:24086")
      .select(col("publications")).head().getSeq[String](0)
    assert(pubs == Seq("PMID:11072063", "PMID:11344197"))
    assert(g.edges.select("primary_knowledge_source").distinct().head().getString(0) == "infores:hgnc")
  }

  test("multi-predicate fan-out with per-rule filters (extractor.py:113-147)") {
    val df = readDelimited(spark, fixturePath)
    val g = Extractor.extract(df, Extraction(
      subjectId = col("hgnc_id"),
      objectId = lit("UNIVERSE:1"),
      edges = Seq(
        EdgeRule(lit("biolink:related_to")),
        EdgeRule(lit("biolink:has_publication"), rowFilter = col("pubmed_id").isNotNull))))
    // 4 rows × rule1 + 3 rows with pubmed × rule2
    assert(g.edges.count() == 7)
    assert(g.edges.filter(col("predicate") === "biolink:has_publication").count() == 3)
  }

  test("heterogeneous per-rule properties fan out via union path") {
    val df = readDelimited(spark, fixturePath)
    val g = Extractor.extract(df, Extraction(
      subjectId = col("hgnc_id"),
      objectId = lit("UNIVERSE:1"),
      edges = Seq(
        EdgeRule(lit("biolink:related_to"),
          properties = Map("symbol" -> col("symbol"))),
        EdgeRule(lit("biolink:has_publication"),
          rowFilter = col("pubmed_id").isNotNull,
          properties = Map("publications" ->
            transform(split(col("pubmed_id").cast("string"), "\\|"),
              p => concat(lit("PMID:"), p)))))))
    assert(g.edges.count() == 7)
    val pub = g.edges.filter(col("predicate") === "biolink:has_publication" &&
      col("subject") === "HGNC:5").head()
    assert(pub.getSeq[String](pub.fieldIndex("publications")) == Seq("PMID:2591067"))
    assert(pub.isNullAt(pub.fieldIndex("symbol"))) // other rule's prop null
  }

  test("filterBySet keeps only allowed ids (P3)") {
    val df = readDelimited(spark, fixturePath)
    val kept = filterBySet(df, col("hgnc_id"), Set("HGNC:5", "HGNC:7"))
    assert(kept.count() == 2)
  }
}
