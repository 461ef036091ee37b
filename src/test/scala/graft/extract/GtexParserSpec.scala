package graft.extract

import graft.SparkSpec
import graft.functions.Hgvs
import org.apache.spark.sql.functions._

/** GTEx-shaped parser: variant_id → HGVS subject, slope-signed predicate
  * (refs parsers/GTEx/src/loadGTEx.py:180-251, SURVEY P6/P7). */
class GtexParserSpec extends SparkSpec {

  private lazy val fixture = {
    val dir = java.nio.file.Files.createTempDirectory("gtex")
    val f = dir.resolve("Whole_Blood.v8.signif_variant_gene_pairs.txt")
    java.nio.file.Files.writeString(f, Seq(
      "variant_id\tgene_id\ttss_distance\tma_samples\tma_count\tmaf\tpval_nominal\tslope\tslope_se\tpval_nominal_threshold\tmin_pval_nominal\tpval_beta",
      "chr1_1413898_T_C_b38\tENSG00000224969.1\t5\t10\t12\t0.1\t0.0000021\t0.52\t0.1\t0.001\t0.0001\t0.001",
      "chr2_55000_A_G_b38\tENSG00000230092.7\t-10\t11\t13\t0.2\t0.0000042\t-0.31\t0.1\t0.001\t0.0001\t0.001",
      "chrX_999_G_T_b38\tENSG00000240361.2\t3\t9\t10\t0.1\t0.0000031\t0.11\t0.1\t0.001\t0.0001\t0.001"
    ).mkString("\n"))
    f.toString
  }

  test("variant→gene edges with HGVS ids and slope-signed predicates") {
    val raw = Extractor.readDelimited(spark, fixture)
    val parsed = raw
      .withColumn("_p", split(col("variant_id"), "_"))
      .withColumn("hgvs", Hgvs.hgvsUdf(
        regexp_replace(col("_p").getItem(0), "^chr", ""),
        col("_p").getItem(1).cast("long"),
        col("_p").getItem(2), col("_p").getItem(3), col("_p").getItem(4)))
      .filter(col("hgvs") =!= "")
    val g = Extractor.extract(parsed, Extractor.Extraction(
      subjectId = concat(lit("HGVS:"), col("hgvs")),
      subjectCategories = Seq("biolink:SequenceVariant"),
      objectId = concat(lit("ENSEMBL:"), regexp_replace(col("gene_id"), "\\..*$", "")),
      objectCategories = Seq("biolink:Gene"),
      edges = Seq(Extractor.EdgeRule(
        when(col("slope") > 0, "CTD:increases_expression_of")
          .otherwise("CTD:decreases_expression_of"),
        properties = Map(
          "expressed_in" -> lit("blood"),
          "p_value" -> col("pval_nominal"),
          "slope" -> col("slope")))),
      primaryKnowledgeSource = "infores:gtex"))

    assert(g.edges.count() == 3)
    val e1 = g.edges.filter(col("object") === "ENSEMBL:ENSG00000224969").head()
    assert(e1.getAs[String]("subject") == "HGVS:NC_000001.11:g.1413898T>C")
    assert(e1.getAs[String]("predicate") == "CTD:increases_expression_of")
    val e2 = g.edges.filter(col("object") === "ENSEMBL:ENSG00000230092").head()
    assert(e2.getAs[String]("predicate") == "CTD:decreases_expression_of")
    val eX = g.edges.filter(col("object") === "ENSEMBL:ENSG00000240361").head()
    assert(eX.getAs[String]("subject") == "HGVS:NC_000023.11:g.999G>T")
    assert(g.nodes.filter(array_contains(col("category"), "biolink:SequenceVariant")).count() == 3)
  }
}
