package graft.parsers

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture specs for the long-tail loaders (SIGNOR, CCIDB, clinical trials
  * KP, Scent, yeast×4) — exact node/edge counts plus the per-parser
  * branching rules. */
class LongTailParsersSpec extends SparkSpec {

  private val res = "src/test/resources/parsers"

  test("SIGNOR: curie fixes, GO resolution, effect fan-out, anatomical split") {
    val g = Registry("SIGNOR")(spark, s"$res/signor")
    assert(g.edges.count() == 8)
    assert(g.nodes.count() == 8)

    // PTM mechanism edge: effect drives the PTM table; AA overrides -PRO_
    val ptm = g.edges.filter(col("publications")(0) === "PMID:222").head()
    assert(ptm.getAs[String]("predicate") == "biolink:affects")
    assert(ptm.getAs[String]("object") == "UniProtKB:P22222") // -PRO_ stripped
    assert(ptm.getAs[String]("object_direction_qualifier") == "increased")
    assert(ptm.getAs[String]("object_aspect_qualifier") == "phosphorylation")
    assert(ptm.getAs[String]("object_part_qualifier") == "Tyr15")
    assert(ptm.getAs[String]("qualified_predicate") == "RO:0003303")

    // unmapped-effect mechanism edge falls back to related_to; the effect
    // edge keeps the -PRO_ part qualifier
    val r1 = g.edges.filter(col("publications")(0) === "PMID:111").collect()
    assert(r1.length == 2)
    assert(r1.map(_.getAs[String]("predicate")).toSet ==
      Set("biolink:related_to", "RO:0002448"))
    val upreg = r1.find(_.getAs[String]("predicate") == "RO:0002448").get
    assert(upreg.getAs[String]("object_direction_qualifier") == "upregulates")
    assert(upreg.getAs[String]("object_aspect_qualifier") == "activity")
    assert(upreg.getAs[String]("object_part_qualifier") == "PRO_0000030310")
    assert(upreg.getAs[String]("species_context_qualifier") == "NCBITaxon:9606")
    assert(upreg.getAs[String]("anatomical_context_qualifier") == "BTO:0000007")

    // SIGNOR phenotype resolves through the GO term in its description,
    // and the ';' cell list splits the edge
    val pheno = g.edges.filter(col("publications")(0) === "PMID:333").collect()
    assert(pheno.length == 2)
    assert(pheno.forall(_.getAs[String]("object") == "GO:0008219"))
    assert(pheno.map(_.getAs[String]("anatomical_context_qualifier")).toSet ==
      Set("BTO:0000007", "BTO:0000018"))

    // unresolvable SIGNOR complex drops the row
    assert(g.edges.filter(col("publications")(0) === "PMID:444").count() == 0)

    // form complex fans out to two edges; PUBCHEM CID: prefix shed
    val fc = g.edges.filter(col("publications")(0) === "PMID:555").collect()
    assert(fc.map(_.getAs[String]("predicate")).toSet ==
      Set("biolink:in_complex_with", "RO:0002436"))
    assert(fc.forall(_.getAs[String]("subject") == "PUBCHEM.COMPOUND:12345"))
    assert(fc.forall(_.getAs[String]("species_context_qualifier") == null)) // -1

    // no mechanism, no effect mapping → bare related_to
    val fb = g.edges.filter(col("publications")(0) === "PMID:666").head()
    assert(fb.getAs[String]("predicate") == "biolink:related_to")
  }

  test("CCIDB: mapping joins, qualifier fan-out, singleton broadcast") {
    val g = Registry("CCIDB")(spark, s"$res/ccidb")
    assert(g.edges.count() == 11) // 6 (full row) + 5 (no effector, 2 phenos)
    assert(g.nodes.count() == 5)

    val r1 = g.edges.filter(col("publications")(0) === "PMID:123")
    assert(r1.count() == 6)
    val dpi = r1.filter(col("predicate") === "biolink:directly_physically_interacts_with").head()
    assert(dpi.getAs[String]("subject") == "NCBIGene:7124")
    assert(dpi.getAs[String]("object") == "NCBIGene:7132")
    // target term context wins when the source term has none
    assert(dpi.getAs[String]("disease_context_qualifier") == "MONDO:0004979")

    val e2 = r1.filter(col("subject") === "NCBIGene:7124" &&
      col("object") === "CL:0000066" && col("causal_mechanism_qualifier").isNotNull).head()
    assert(e2.getAs[String]("object_aspect_qualifier") == "inflammation")
    assert(e2.getAs[String]("subject_context_qualifier") == "NCBIGene:7132")
    assert(e2.getAs[String]("anatomical_context_qualifier") == "CL:0000235")
    assert(e2.getAs[String]("subject_specialization_qualifier") == "m1")
    assert(e2.getAs[String]("object_form_or_variant_qualifier") == "variant x")

    // effector edges: 4 (gene→effector ×2), 6 (effector→term)
    val e4 = r1.filter(col("object") === "NCBIGene:3569").collect()
    assert(e4.length == 2)
    assert(e4.forall(_.getAs[String]("object_aspect_qualifier") == "secretion"))
    val e6 = r1.filter(col("subject") === "NCBIGene:3569").head()
    assert(e6.getAs[String]("object") == "CL:0000066")

    // unmapped source gene drops the row entirely
    assert(g.edges.filter(col("publications")(0) === "PMID:124").count() == 0)

    // two phenotypes × singleton mode broadcast → 2 qualifier pairs per gene
    val r3 = g.edges.filter(col("publications")(0) === "PMID:125")
    assert(r3.count() == 5)
    val aspects = r3.filter(col("predicate") === "biolink:affects")
      .select("object_aspect_qualifier").collect().map(_.getString(0)).toSet
    assert(aspects == Set("inflammation", "fibrosis"))
  }

  test("CTKP: provenance split on treats, study zip with enrollment fallback") {
    val g = Registry("ClinicalTrialsKP")(spark, s"$res/ctkp")
    assert(g.edges.count() == 2 && g.nodes.count() == 3)

    val treats = g.edges.filter(col("predicate") === "biolink:treats").head()
    assert(treats.getAs[String]("primary_knowledge_source") ==
      "infores:biothings-multiomics-clinicaltrials")
    assert(treats.getAs[scala.collection.Seq[String]]("aggregator_knowledge_source") ==
      Seq("infores:aact"))
    assert(treats.getAs[String]("supporting_data_source") == "infores:clinicaltrials")
    assert(treats.getAs[String]("max_research_phase") == "3.0")
    val studies = treats.getAs[scala.collection.Seq[String]]("attributes")
    assert(studies.length == 2)
    assert(studies.head.contains("\"NCT1\"") && studies.head.contains("has_supporting_study_result"))
    assert(studies.head.contains("\"100\"") && studies(1).contains("\"-1\"")) // abc → -1
    assert(studies.forall(_.contains("\"tested_intervention\",\"value\":\"yes\"")))

    val mentioned = g.edges.filter(col("predicate") === "biolink:mentioned_in_trials_for").head()
    assert(mentioned.getAs[String]("primary_knowledge_source") == "infores:clinicaltrials")
    assert(mentioned.getAs[scala.collection.Seq[String]]("aggregator_knowledge_source") ==
      Seq("infores:aact", "infores:biothings-multiomics-clinicaltrials"))
    assert(mentioned.getAs[String]("supporting_data_source") == null)
    assert(mentioned.getAs[scala.collection.Seq[String]]("attributes").head
      .contains("\"tested_intervention\",\"value\":\"unsure\""))
  }

  test("Scent: term lists become nodes, cosine gate filters edges") {
    val g = Registry("Scent")(spark, s"$res/scent")
    assert(g.edges.count() == 2) // cos-dist 1.25 row dropped
    assert(g.nodes.count() == 7)
    val human = g.edges.filter(col("cosine_distance").isNull).head()
    assert(human.getAs[String]("object") == "SCENT:sweet_smell")
    val cos = g.edges.filter(col("cosine_distance").isNotNull).head()
    assert(cos.getAs[String]("object") == "SCENT:fruity_odor")
    assert(cos.getAs[Double]("cosine_distance") == 0.35)
    // bare list-file ids are intentionally unprefixed
    assert(g.nodes.filter(col("id") === "fruity_odor").count() == 1)
    val ifa = g.nodes.filter(col("id") === "woody_odor").head()
    assert(ifa.getAs[scala.collection.Seq[String]]("category") ==
      Seq("verbal_scent_descriptor", "ifa_vsd"))
  }

  test("YeastHistoneMapping: loci nodes, subclass/located_in/GO edges") {
    val g = Registry("YeastHistoneMapping")(spark, s"$res/yeast")
    assert(g.edges.count() == 4) // 2 subclass + 1 gene + 1 GO
    assert(g.nodes.count() == 6)
    val loci = g.nodes.filter(col("id") === "BinHisPTM:chrI(1-150);H3K4me3").head()
    assert(loci.getAs[String]("name") == "H3K4me3 (chrI:1-150)")
    assert(loci.getAs[scala.collection.Seq[String]]("category") ==
      Seq("biolink:NucleosomeModification", "biolink:PosttranslationalModification"))
    assert(loci.getAs[String]("chromosomeLocation") == "chrI(1-150)")
    val go = g.edges.filter(col("object") === "GO:0051568").head()
    assert(go.getAs[String]("predicate") == "CTD:increases_abundance_of")
    assert(go.getAs[String]("subject") == "HisPTM:H3K4me3")
    val gene = g.edges.filter(col("object") === "SGD:S000000001").head()
    assert(gene.getAs[String]("predicate") == "biolink:located_in")
  }

  test("Costanza2016Data: genotype fitness sign + has_part membership") {
    val g = Registry("Costanza2016Data")(spark, s"$res/yeast")
    assert(g.edges.count() == 8) // 2 fitness (unknown method dropped) + 6 has_part
    assert(g.nodes.count() == 8)
    val neg = g.edges.filter(col("predicate") === "biolink:negatively_correlated_with").head()
    assert(neg.getAs[String]("subject") == "SGD:S000000001-S000000002")
    assert(neg.getAs[String]("object") == "APO:0000216")
    assert(neg.getAs[String]("sgaScore") == "-0.3")
    assert(neg.getAs[scala.collection.Seq[String]]("publications") == Seq("PMID:27708008"))
    assert(g.edges.filter(col("predicate") === "biolink:positively_correlated_with").count() == 1)
    val parts = g.edges.filter(col("predicate") === "biolink:has_part" &&
      col("subject") === "SGD:S000000001-S000000002")
      .select("object").collect().map(_.getString(0)).toSet
    assert(parts == Set("SGD:S000000001", "SGD:S000000002"))
    val genotype = g.nodes.filter(col("id") === "SGD:S000000001-S000000002").head()
    assert(genotype.getAs[String]("name") == "tfc3-1-vps8-2")
    assert(genotype.getAs[scala.collection.Seq[String]]("category") == Seq("biolink:Genotype"))
  }

  test("YeastGaschDiamide: mean sign predicate, SGD join drops unknowns") {
    val g = Registry("YeastGaschDiamideGeneExpression")(spark, s"$res/yeast")
    assert(g.edges.count() == 2) // YZZ999W has no SGD match
    assert(g.nodes.count() == 3)
    val up = g.edges.filter(col("object") === "SGD:S000000001").head()
    assert(up.getAs[String]("subject") == "PUBCHEM.COMPOUND:5353800")
    assert(up.getAs[String]("predicate") == "biolink:increases_expression_of")
    assert(math.abs(up.getAs[Double]("MeanExpression") - 0.45) < 1e-9)
    assert(up.getAs[scala.collection.Seq[Double]]("ExpressionTimeSeries").head == 0.1)
    val down = g.edges.filter(col("object") === "SGD:S000000004").head()
    assert(down.getAs[String]("predicate") == "biolink:decreases_expression_of")
  }

  test("HMDB: XML record scan — pathway/disease/protein branches") {
    val g = Registry("HMDB")(spark, s"$res/hmdb")
    assert(g.edges.count() == 4) // 1 pathway + 1 disease + 2 proteins
    assert(g.nodes.count() == 5) // edge-less metabolites drop
    assert(g.nodes.filter(col("id") === "HMDB:HMDB0000002").count() == 0)
    val path = g.edges.filter(col("object") === "SMPDB:SMP0000044").head()
    assert(path.getAs[String]("subject") == "HMDB:HMDB0000001")
    assert(path.getAs[String]("predicate") == "RO:0000056")
    val dis = g.edges.filter(col("object") === "OMIM:222").head()
    assert(dis.getAs[String]("predicate") == "RO:0002610")
    assert(dis.getAs[scala.collection.Seq[String]]("publications") == Seq("PMID:999"))
    // the reference-less OMIM:333 disease is skipped
    assert(g.edges.filter(col("object") === "OMIM:333").count() == 0)
    // Enzyme type: protein → metabolite; Unknown type: metabolite → protein
    val enz = g.edges.filter(col("subject") === "UniProtKB:P11111").head()
    assert(enz.getAs[String]("predicate") == "CTD:affects_abundance_of")
    assert(enz.getAs[String]("object") == "HMDB:HMDB0000001")
    val unk = g.edges.filter(col("object") === "UniProtKB:P22222").head()
    assert(unk.getAs[String]("predicate") == "CTD:related_to")
    assert(g.nodes.filter(col("id") === "UniProtKB:P11111").head()
      .getAs[String]("name") == "Enzyme One")
  }

  test("UniRef: entry scan — taxon filter, rep homology spokes") {
    val g = Registry("UniRef")(spark, s"$res/uniref")
    assert(g.edges.count() == 3) // 2 in-taxon + 1 homology spoke
    assert(g.nodes.count() == 4) // human member filtered; 2nd entry skipped
    val hom = g.edges.filter(col("predicate") === "RO:HOM0000000").head()
    assert(hom.getAs[String]("subject") == "UniProtKB:Q6GZX4")
    assert(hom.getAs[String]("object") == "UniProtKB:A0A0F6NZX8")
    assert(hom.getAs[String]("similarity_bin") == "UniRef50")
    val inTaxon = g.edges.filter(col("predicate") === "RO:0002162" &&
      col("subject") === "UniProtKB:Q6GZX4").head()
    assert(inTaxon.getAs[String]("object") == "NCBITaxon:654924")
    val taxNode = g.nodes.filter(col("id") === "NCBITaxon:10493").head()
    assert(taxNode.getAs[String]("name") == "Orf virus")
    assert(taxNode.getAs[String]("taxon") == "NCBITaxon:10493")
    assert(taxNode.getAs[scala.collection.Seq[String]]("category").head == "biolink:OrganismTaxon")
    val protNode = g.nodes.filter(col("id") === "UniProtKB:A0A0F6NZX8").head()
    assert(protNode.getAs[String]("name") == "Orf virus protein")
  }

  test("CEBS: evidence-level gate, ordered morphology resolution") {
    val g = Registry("CEBS")(spark, s"$res/cebs")
    assert(g.edges.count() == 2) // Equivocal/No Evidence rows dropped
    assert(g.nodes.count() == 4)
    val clear = g.edges.filter(col("subject") === "INCHIKEY:AAAKEY").head()
    assert(clear.getAs[String]("predicate") == "biolink:associated_with_increased_likelihood_of")
    assert(clear.getAs[String]("object") == "MONDO:0005070") // raw MONDO wins
    assert(clear.getAs[String]("knowledge_level") == "knowledge_assertion")
    assert(clear.getAs[scala.collection.Seq[String]]("publications") == Seq("TR:TR123"))
    assert(clear.getAs[String]("anatomical_context_qualifier") == "UBERON:0002107")
    assert(clear.getAs[String]("species_context_qualifier") == "NCBITaxon:10090")
    assert(clear.getAs[String]("sex_qualifier") == "male")
    val some = g.edges.filter(col("subject") === "INCHIKEY:BBBKEY").head()
    assert(some.getAs[String]("predicate") == "biolink:associated_with_likelihood_of")
    assert(some.getAs[String]("object") == "NCIT:C3058") // MPATH passed over
    assert(some.getAs[String]("knowledge_level") == "observation")
  }

  test("LINCS: id fallback, PUBCHEM rewrite, unmappable endpoints drop") {
    val g = Registry("LINCS")(spark, s"$res/cfde_lincs")
    assert(g.nodes.count() == 4) // the id-less node drops
    assert(g.edges.count() == 3) // the edge touching it drops too
    val neg = g.edges.filter(col("predicate") === "RO:0002212").head()
    assert(neg.getAs[String]("subject") == "PUBCHEM.COMPOUND:2244")
    assert(neg.getAs[String]("object") == "HGNC:1100")
    assert(neg.getAs[String]("agent_type") == "data_analysis_pipeline")
    // unmapped relations pass through; secondary id column backfills
    val custom = g.edges.filter(col("predicate") === "custom_relation").head()
    assert(custom.getAs[String]("object") == "OMIM:600185")
    assert(g.edges.filter(col("predicate") === "biolink:chemically_similar_to").count() == 1)
    val g2 = g.nodes.filter(col("id") === "OMIM:600185").head()
    assert(g2.getAs[scala.collection.Seq[String]]("category") == Seq("Gene"))
  }

  test("MetabolomicsWorkbench: same CFDE shape, its own config") {
    val g = Registry("MetabolomicsWorkbench")(spark, s"$res/cfde_mw")
    assert(g.nodes.count() == 4 && g.edges.count() == 2)
    val corr = g.edges.filter(col("predicate") === "biolink:correlated_with").head()
    assert(corr.getAs[String]("subject") == "PUBCHEM.COMPOUND:5793")
    assert(corr.getAs[String]("object") == "CHV:0000012337") // CHV fallback id
    assert(corr.getAs[String]("primary_knowledge_source") == "infores:metabolomics_workbench")
    assert(g.edges.filter(col("predicate") === "biolink:produces").count() == 1)
  }

  test("LitCoin: inline + cached grounding, pred-mapping gate, mention edges") {
    val g = Registry("LitCoin")(spark, s"$res/litcoin")
    assert(g.edges.count() == 6) // 2 assertions + 4 mentions
    assert(g.nodes.count() == 6)
    val treats = g.edges.filter(col("predicate") === "biolink:treats").head()
    assert(treats.getAs[String]("subject") == "RXCUI:861007") // inline bagelized
    assert(treats.getAs[String]("object") == "MONDO:0005148")
    assert(!treats.getAs[Boolean]("negated"))
    assert(treats.getAs[scala.collection.Seq[String]]("publications") == Seq("PMID:1001"))
    assert(treats.getAs[String]("subject_bagel_syn_type") == "exact")
    assert(treats.getAs[String]("abstract_title") == "Metformin and diabetes")
    assert(treats.getAs[String]("llm_relationship") == "treats")
    // cache-grounded row: exact beats narrow, lower rank wins among exacts
    val inhib = g.edges.filter(col("predicate") === "biolink:decreases_activity_of").head()
    assert(inhib.getAs[String]("subject") == "PUBCHEM.COMPOUND:2244")
    assert(inhib.getAs[String]("object") == "NCBIGene:5743")
    // "NA" grounding, missing abstract, missing required field all drop
    assert(g.edges.filter(col("llm_assertion_id").isin("as3", "as4", "as5")).count() == 0)
    val mentions = g.edges.filter(col("predicate") === "IAO:0000142")
    assert(mentions.count() == 4)
    assert(mentions.filter(col("subject") === "PMID:1002").count() == 2)
    val pub = g.nodes.filter(col("id") === "PMID:1001").head()
    assert(pub.getAs[String]("abstract_text") == "Metformin treats type 2 diabetes.")
    assert(pub.getAs[String]("journal") == "J Endo")
    assert(g.nodes.filter(col("id") === "PUBCHEM.COMPOUND:2244").head()
      .getAs[String]("name") == "aspirin")
  }

  test("YeastGSE61888: per-row modification series surfaces in its own column") {
    val g = Registry("YeastGSE61888")(spark, s"$res/yeast")
    assert(g.edges.count() == 2 && g.nodes.count() == 3)
    val k4 = g.edges.filter(col("object") === "BinHisPTM:chrI(1-150);H3K4me3").head()
    assert(k4.getAs[String]("predicate") == "biolink:affects_molecular_modification_of")
    assert(k4.getAs[Double]("coverage") == 12.5)
    assert(k4.getAs[scala.collection.Seq[Double]]("H3K4me3TimeSeries") ==
      Seq(0.12, 0.22, 0.32, 0.42, 0.52, 0.62))
    assert(k4.getAs[scala.collection.Seq[Double]]("HTZ1TimeSeries") == null)
    val htz = g.edges.filter(col("object") === "BinHisPTM:chrI(1-150);HTZ1").head()
    assert(htz.getAs[scala.collection.Seq[Double]]("HTZ1TimeSeries") ==
      Seq(1.25, 1.35, 1.45, 1.55, 1.65, 1.75))
  }
}
