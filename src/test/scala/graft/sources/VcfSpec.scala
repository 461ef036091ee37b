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

  test("supplement: write → subprocess → scan composes end-to-end over the CommandRunner seam") {
    import spark.implicits._
    // fake snpEff jar: validates the reference's exact command shape
    // (run_snpeff, supplementation.py:135-154), READS the VCF file the
    // pipeline actually wrote, and emits canned ANN= output on stdout —
    // one annotation per non-header row, gene id derived from the
    // variant id so the loop's data flow is observable in the result
    val ran = new java.util.concurrent.atomic.AtomicReference[Seq[String]]()
    val fake = new graft.io.Neo4jTools.CommandRunner {
      override def run(cmd: Seq[String], cwd: Option[String]): graft.io.Neo4jTools.CommandResult = {
        ran.set(cmd)
        val lines = scala.io.Source.fromFile(cmd.last).getLines().toSeq
        val out = lines.map { l =>
          if (l.startsWith("#")) l
          else {
            val f = l.split("\t", -1)
            val gene = "ENSG" + f(2).replaceAll("[^0-9]", "")
            val eff = if (f(2).endsWith("1")) "missense_variant" else "frameshift_variant"
            f.take(7).mkString("\t") +
              s"\tANN=${f(4)}|$eff|HIGH|G|$gene|transcript|T1|protein_coding|1/1|c.1A>G|||||77|"
          }
        }.mkString("\n")
        graft.io.Neo4jTools.CommandResult(0, stdout = out)
      }
      override def cypher(st: String) = graft.io.Neo4jTools.CommandResult(0)
      override def executableAvailable(name: String) = true
    }
    val nodes = spark.read.json(Seq(
      """{"id":"CAID:CA1","category":["biolink:SequenceVariant"],"robokop_variant_id":"HGVS:x|1|100|b38|T|C"}""",
      """{"id":"CAID:CA2","category":["biolink:SequenceVariant"],"robokop_variant_id":"HGVS:x|2|200|b38||G"}""",
      """{"id":"GENE:1","category":["biolink:Gene"]}""").toDS())
    val dir = java.nio.file.Files.createTempDirectory("snpeff-e2e-").toString
    val (geneNodes, edges) = Vcf.supplement(spark, nodes, dir, fake)
    // command shape: java -Xmx12g -jar snpEff.jar -noStats -ud 100000 GRCh38.99 <vcf>
    assert(ran.get().take(5) == Seq("java", "-Xmx12g", "-jar", "snpEff.jar", "-noStats"))
    assert(ran.get().containsSlice(Seq("-ud", "100000", "GRCh38.99")))
    assert(ran.get().last == s"$dir/variants.vcf")
    // both intermediate files exist on disk (write AND redirect happened)
    assert(new java.io.File(s"$dir/variants.vcf").isFile)
    assert(new java.io.File(s"$dir/variants_ann.vcf").isFile)
    // the parse consumed what the fake jar derived from the REAL file
    val byId = edges.collect().map(r =>
      r.getAs[String]("subject") -> (r.getAs[String]("predicate"), r.getAs[String]("object"))).toMap
    assert(byId("CAID:CA1") == (("SO:0001583", "ENSEMBL:ENSG1")))  // missense
    assert(byId("CAID:CA2") == (("SO:0001589", "ENSEMBL:ENSG2")))  // frameshift
    assert(geneNodes.count() == 2)
    // failure path: non-zero exit surfaces stderr, mirrors SupplementationFailedError
    val broken = new graft.io.Neo4jTools.CommandRunner {
      override def run(cmd: Seq[String], cwd: Option[String]) =
        graft.io.Neo4jTools.CommandResult(3, stderr = "boom")
      override def cypher(st: String) = graft.io.Neo4jTools.CommandResult(0)
      override def executableAvailable(name: String) = true
    }
    val e = intercept[IllegalStateException](
      Vcf.supplement(spark, nodes, dir, broken))
    assert(e.getMessage.contains("ExitCode 3") && e.getMessage.contains("boom"))
  }

  test("writeVcfFile: framing characters in the ID join key fail loud, elsewhere sanitize") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vcf-frames-").toString
    // tab inside a non-key field (INFO) collapses to a space — framing kept
    val ok = Seq(("1", "100", "CAID:CA1", "T", "C", "", "PASS", "note\twith tab"))
      .toDF("CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO")
    Vcf.writeVcfFile(ok, s"$dir/ok.vcf")
    val lines = scala.io.Source.fromFile(s"$dir/ok.vcf").getLines().toSeq
    assert(lines.size == 2 && lines(1).split("\t", -1).length == 8 &&
      lines(1).contains("note with tab"))
    // the same character in the ID would silently mutate the join key
    // matching supplemental edges back to variant nodes — must refuse
    val framed = Seq(("1", "100", "CAID:\tCA1", "T", "C", "", "PASS", ""))
      .toDF("CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO")
    val e = intercept[Exception](Vcf.writeVcfFile(framed, s"$dir/bad.vcf"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("framing")))
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
