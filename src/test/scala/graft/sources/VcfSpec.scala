package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VcfSpec extends SparkSpec {

  test("variant nodes → VCF rows with N-padding (supplementation.py:227-262)") {
    import spark.implicits._
    val nodes = spark.read.json(Seq(
      """{"id":"CAID:CA1","category":["biolink:SequenceVariant"],"robokop_variant_id":"HGVS:x|1|100|b38|T|C"}""",
      """{"id":"CAID:CA2","category":["biolink:SequenceVariant"],"robokop_variant_id":"HGVS:x|2|200|b38||G"}""",
      """{"id":"CAID:CA3","category":["biolink:SequenceVariant"],"robokop_variant_id":"HGVS:x|3|300|b38|A|"}""",
      """{"id":"GENE:1","category":["biolink:Gene"]}""").toDS())
    val vcf = Vcf.variantNodesToVcf(nodes).collect()
      .map(r => r.getAs[String]("ID") -> (r.getAs[String]("POS"), r.getAs[String]("REF"), r.getAs[String]("ALT"))).toMap
    assert(vcf.size == 3)
    assert(vcf("CAID:CA1") == (("101", "T", "C")))  // both alleles → pos+1
    assert(vcf("CAID:CA2") == (("200", "N", "NG"))) // empty ref
    assert(vcf("CAID:CA3") == (("300", "NA", "N"))) // empty alt
  }

  test("annotated VCF → variant-gene edges with SO predicate map (S9)") {
    import spark.implicits._
    val vcf = Seq(
      ("1", "100", "CAID:CA1", "T", "C", "", "PASS",
        "DP=5;ANN=C|missense_variant&synonymous_variant|MODERATE|G1|ENSG001-ENSG002|t|T1|pc|1/1|c.1A>G|||||456|,C|intron_variant|LOW|G2|ENSG003|t|T2|pc|1/1|c.2A>G|||||notanum|"),
      ("2", "200", "CAID:CA2", "A", "G", "", "PASS", "DP=3") // no ANN → dropped
    ).toDF("CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO")
    val (nodes, edges) = Vcf.annotatedVcfToKgx(vcf)
    // 2 effects × 2 genes + 1 effect × 1 gene = 5 edges
    assert(edges.count() == 5)
    val missense = edges.filter(col("snpeff_effect") === "missense_variant" &&
      col("object") === "ENSEMBL:ENSG001").head()
    assert(missense.getAs[String]("predicate") == "SO:0001583")
    assert(missense.getAs[Long]("distance_to_feature") == 456L)
    val intron = edges.filter(col("snpeff_effect") === "intron_variant").head()
    assert(intron.getAs[String]("predicate") == "biolink:is_non_coding_variant_of")
    assert(intron.isNullAt(intron.fieldIndex("distance_to_feature")))
    assert(nodes.count() == 3) // ENSG001/2/3
  }

  test("full supplementation loop with stubbed SnpEff (D5)") {
    import spark.implicits._
    val nodes = spark.read.json(Seq(
      """{"id":"CAID:CA1","category":["biolink:SequenceVariant"],"robokop_variant_id":"HGVS:x|1|100|b38|T|C"}""").toDS())
    val vcf = Vcf.variantNodesToVcf(nodes)
    val annotated = Vcf.runSnpEffStub(vcf)
    val (geneNodes, edges) = Vcf.annotatedVcfToKgx(annotated)
    assert(edges.count() == 1)
    assert(edges.head().getAs[String]("subject") == "CAID:CA1")
    assert(edges.head().getAs[String]("predicate") == "biolink:is_non_coding_variant_of")
    assert(geneNodes.count() == 1)
  }
}
