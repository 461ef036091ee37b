package graft.extract

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Vote-table parity with loadCTD.get_chemical_label_id (:547-587). */
class CtdRulesSpec extends SparkSpec {

  private def vote(t: Int, m: Int): Option[String] = {
    import spark.implicits._
    val r = Seq((t, m)).toDF("t", "m")
      .select(CtdRules.chemicalDiseaseVote(col("t"), col("m")).as("v")).head()
    Option(r.getString(0))
  }

  test("vote truth table") {
    assert(vote(0, 0).isEmpty)            // equal, < 3 → unusable
    assert(vote(2, 2).isEmpty)
    assert(vote(3, 3).contains("biolink:related_to")) // equal, enough evidence
    assert(vote(5, 0).contains("biolink:treats"))     // no markers
    assert(vote(0, 5).contains("biolink:biomarker_for")) // no therapeutic
    assert(vote(1, 4).contains("biolink:biomarker_for")) // t==1, m>1
    assert(vote(4, 1).contains("biolink:treats"))        // m==1, t>1
    assert(vote(2, 5).contains("biolink:biomarker_for")) // ratio > 2
    assert(vote(7, 3).contains("biolink:treats"))        // ratio > 2
    assert(vote(3, 5).contains("biolink:related_to"))    // no dominance
  }

  test("predicate cleaning with conversion map (:528-545)") {
    import spark.implicits._
    val out = Seq("CTD:ameliorates", "CTD:increases_molecular interaction_with",
      "affects binding", "odd/pred^icate")
      .toDF("p").select(CtdRules.cleanPredicate(col("p")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("biolink:treats_or_applied_or_studied_to_treat",
      "CTD:increases_molecular_interaction", "affects_binding", "odd_pred_icate"))
  }

  test("grouped chem-disease edges vote + publication union") {
    import spark.implicits._
    val rows = Seq(
      ("MESH:C1", "MESH:D1", "therapeutic", Seq("PMID:1", "PMID:2")),
      ("MESH:C1", "MESH:D1", "therapeutic", Seq("PMID:2", "PMID:3")),
      ("MESH:C1", "MESH:D1", "therapeutic", Seq("PMID:4")),
      ("MESH:C1", "MESH:D2", "marker/mechanism", Seq("PMID:9")),
      ("MESH:C1", "MESH:D2", "therapeutic", Seq("PMID:9"))
    ).toDF("chemical_id", "disease_id", "direct_evidence", "publications")
    val edges = CtdRules.chemicalDiseaseEdges(rows)
    val d1 = edges.filter(col("object") === "MESH:D1").head()
    assert(d1.getAs[String]("predicate") == "biolink:treats")
    assert(d1.getSeq[String](d1.fieldIndex("publications")) ==
      Seq("PMID:1", "PMID:2", "PMID:3", "PMID:4"))
    // D2: 1 vs 1, below evidence floor → dropped
    assert(edges.filter(col("object") === "MESH:D2").count() == 0)
  }

  test("pmid gate: 3 for weak predicates, 2 otherwise") {
    import spark.implicits._
    val rows = Seq(
      ("weak:p", Seq("PMID:1", "PMID:2")),
      ("weak:p", Seq("PMID:1", "PMID:2", "PMID:3")),
      ("strong:p", Seq("PMID:1", "PMID:2"))
    ).toDF("predicate", "publications")
    val kept = rows.filter(CtdRules.pmidGate(col("predicate"), col("publications"), Seq("weak:p")))
    assert(kept.count() == 2)
  }
}
