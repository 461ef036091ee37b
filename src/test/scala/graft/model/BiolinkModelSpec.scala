package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BiolinkModelSpec extends SparkSpec {

  test("ancestor closure is transitive and self-first") {
    val anc = BiolinkModel.predicateAncestors("biolink:binds")
    assert(anc.head == "biolink:binds")
    assert(anc.contains("biolink:directly_physically_interacts_with"))
    assert(anc.contains("biolink:physically_interacts_with"))
    assert(anc.contains("biolink:interacts_with"))
    assert(anc.last == "biolink:related_to" || anc.contains("biolink:related_to"))
    // coverage: the redundant-KG map now spans well beyond the r1 fragment
    assert(BiolinkModel.predicateAncestors.size >= 50)
    assert(BiolinkModel.categoryAncestors.size >= 40)
  }

  test("find_biolink_leaves drops strict ancestors, keeps unknowns") {
    // SmallMolecule subsumes its whole ancestor chain
    assert(BiolinkModel.findBiolinkLeaves(Set(
      "biolink:SmallMolecule", "biolink:MolecularEntity",
      "biolink:ChemicalEntity", "biolink:NamedThing")) == Set("biolink:SmallMolecule"))
    // two leaves from different branches both survive
    assert(BiolinkModel.findBiolinkLeaves(Set(
      "biolink:Gene", "biolink:SmallMolecule", "biolink:NamedThing")) ==
      Set("biolink:Gene", "biolink:SmallMolecule"))
    // unknown categories are kept (vendored subset, not the full model)
    assert(BiolinkModel.findBiolinkLeaves(Set(
      "biolink:Gene", "custom:Widget")) == Set("biolink:Gene", "custom:Widget"))
  }

  test("leafCategories column matches the driver-side computation") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("biolink:NamedThing", "biolink:Disease", "biolink:DiseaseOrPhenotypicFeature")),
      (2L, Seq("biolink:Gene", "biolink:BiologicalEntity", "biolink:SmallMolecule")),
      (3L, Seq("custom:Widget", "biolink:NamedThing", "biolink:Gene"))
    ).toDF("id", "category")
    val out = df.select(col("id"), BiolinkModel.leafCategories(col("category")).as("leaves"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[String]](1).toSet).toMap
    assert(out(1L) == Set("biolink:Disease"))
    assert(out(2L) == Set("biolink:Gene", "biolink:SmallMolecule"))
    assert(out(3L) == Set("custom:Widget", "biolink:Gene"))
  }

  test("invert_predicate: symmetric → self, paired → inverse, unknown → None") {
    assert(BiolinkModel.invertPredicate("biolink:interacts_with")
      .contains("biolink:interacts_with"))
    assert(BiolinkModel.invertPredicate("biolink:part_of").contains("biolink:has_part"))
    assert(BiolinkModel.invertPredicate("biolink:has_part").contains("biolink:part_of"))
    assert(BiolinkModel.invertPredicate("biolink:not_a_predicate").isEmpty)
  }

  test("MetaKg.nodeTypes uses leaf semantics on unordered categories") {
    import spark.implicits._
    // most-specific-LAST ordering, which category[0] would get wrong
    val nodes = Seq(
      ("MONDO:1", Seq("biolink:NamedThing", "biolink:DiseaseOrPhenotypicFeature", "biolink:Disease")),
      ("CHEBI:2", Seq("biolink:NamedThing", "biolink:SmallMolecule"))
    ).toDF("id", "category")
    val types = graft.derive.MetaKg.nodeTypes(nodes)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(types("MONDO:1") == "biolink:Disease")
    assert(types("CHEBI:2") == "biolink:SmallMolecule")
  }
}
