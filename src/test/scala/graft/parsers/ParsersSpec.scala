package graft.parsers

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture-driven parser tests with exact node/edge counts, mirroring the
  * reference's loader tests (tests/test_loaders.py:33-47 asserts exact
  * line counts per source). Fixtures live in
  * src/test/resources/parsers/ as real tar.gz/tgz/zip/gz archives plus
  * their reviewable text sources. */
class ParsersSpec extends SparkSpec {

  private val res = "src/test/resources/parsers"

  test("HGNC: groups fan out, empty gene_group_id skipped, PMID curies") {
    val g = Hgnc.parse(spark, s"$res/hgnc/hgnc_complete_set.txt")
    assert(g.edges.count() == 4) // 1 + 1 + 2 groups; A1BG-AS1 skipped
    assert(g.nodes.count() == 7) // 3 genes + 4 families
    val e5 = g.edges.filter(col("subject") === "HGNC:5").head()
    assert(e5.getAs[String]("predicate") == "RO:0002350")
    assert(e5.getAs[String]("object") == "HGNC.FAMILY:594")
    assert(e5.getAs[scala.collection.Seq[String]]("publications") == Seq("PMID:2591067"))
    assert(e5.getAs[String]("knowledge_level") == "knowledge_assertion")
    val fam = g.nodes.filter(col("id") === "HGNC.FAMILY:1491").head()
    assert(fam.getAs[String]("name") == "Nucleoporins")
    val gene = g.nodes.filter(col("id") === "HGNC:24086").head()
    assert(gene.getAs[String]("symbol") == "A4GALT")
    // no publications on the pubmed-less edge
    assert(g.edges.filter(col("subject") === "HGNC:24086")
      .head().getAs[scala.collection.Seq[String]]("publications") == null)
  }

  test("GOA: aspect defaults, negation dropped, evidence → KL/AT, PMID refs") {
    val g = Goa.parse(spark, s"$res/goa/goa.gaf")
    assert(g.edges.count() == 3) // NOT|enables row dropped from edges
    // ...but its endpoints still become nodes: the reference extractor only
    // drops nodes of predicate-less rows with exclude_unconnected_nodes,
    // off by default (orion/extractor.py:113-124)
    assert(g.nodes.count() == 8)
    val byPred = g.edges.collect().map(r =>
      r.getAs[String]("subject") -> r).toMap
    val r1 = byPred("UniProtKB:P12345")
    assert(r1.getAs[String]("predicate") == "RO:0002327") // enables
    assert(r1.getAs[String]("knowledge_level") == "knowledge_assertion")
    assert(r1.getAs[scala.collection.Seq[String]]("publications") == Seq("PMID:1"))
    val r2 = byPred("MGI:101757")
    assert(r2.getAs[String]("predicate") == "RO:0002331") // aspect P default
    assert(r2.getAs[String]("agent_type") == "automated_agent") // IEA
    assert(r2.getAs[scala.collection.Seq[String]]("publications") == null) // GO_REF only
    val r4 = byPred("UniProtKB:P11111")
    assert(r4.getAs[String]("predicate") == "BFO:0000050") // part_of
    assert(r4.getAs[String]("knowledge_level") == "not_provided") // unknown code
    assert(r4.getAs[scala.collection.Seq[String]]("publications") == Seq("PMID:7"))
    // subject taxon prop, prefixed-id passthrough (MGI:101757 not MGI:MGI:...)
    val mgi = g.nodes.filter(col("id") === "MGI:101757").head()
    assert(mgi.getAs[String]("taxon") == "NCBITaxon:10090")
  }

  test("GOA: taxon filter set (HumanGOA) reads gz and drops other taxa") {
    val g = Goa.parse(spark, s"$res/goa/goa_human.gaf.gz",
      taxonFilter = Some(Set("taxon:9606")))
    assert(g.edges.count() == 2)
    assert(g.edges.filter(col("subject") === "MGI:101757").count() == 0)
  }

  test("UberGraph: tgz members join to curies, unmappable rows skipped") {
    val g = UberGraph.parse(spark, s"$res/ubergraph/nonredundant-graph-table.tgz",
      "nonredundant-graph-table")
    assert(g.edges.count() == 2)
    assert(g.nodes.count() == 3)
    val preds = g.edges.select("predicate").collect().map(_.getString(0)).toSet
    assert(preds == Set("rdfs:subClassOf", "BFO:0000050"))
    val sub = UberGraph.parse(spark, s"$res/ubergraph/nonredundant-graph-table.tgz",
      "nonredundant-graph-table", onlySubclassEdges = true)
    assert(sub.edges.count() == 1)
    val e = sub.edges.head()
    assert(e.getAs[String]("subject") == "UBERON:0000001")
    assert(e.getAs[String]("object") == "CL:0000000")
  }

  test("CTD chem-gene: '?' rows and pub-count gates drop, direction swaps") {
    val g = CtdChemGene.parse(spark, s"$res/ctd/CTD_chem_gene_ixns_structured.tar.gz",
      "CTD_chem_gene_ixns_structured.tsv")
    assert(g.edges.count() == 3)
    assert(g.nodes.count() == 4)
    val rows = g.edges.collect().map(r => r.getAs[String]("description") -> r).toMap
    val incr = rows("increases expression of")
    assert(incr.getAs[String]("subject") == "MESH:C025205")
    assert(incr.getAs[String]("object") == "NCBIGENE:100")
    assert(incr.getAs[String]("predicate") == "CTD:increases_expression_of")
    assert(incr.getAs[scala.collection.Seq[String]]("publications") == Seq("PMID:1", "PMID:2", "PMID:3"))
    // '<-' swaps subject/object; '_with' predicate converts via the map
    val mol = rows("increases molecular interaction with")
    assert(mol.getAs[String]("subject") == "NCBIGENE:100")
    assert(mol.getAs[String]("object") == "MESH:C044445")
    assert(mol.getAs[String]("predicate") == "CTD:increases_molecular_interaction")
    assert(mol.getAs[String]("taxon") == "NCBITaxon:10090")
  }

  test("GTEx eQTL: HGVS conversion, slope sign predicate, tissue anatomy") {
    val g = Gtex.parse(spark, s"$res/gtex/eqtl.tar", isSqtl = false)
    assert(g.edges.count() == 2) // chrZ fails HGVS; UnknownTissue skipped
    assert(g.nodes.count() == 4)
    val byGene = g.edges.collect().map(r => r.getAs[String]("object") -> r).toMap
    val up = byGene("ENSEMBL:ENSG00000237094")
    assert(up.getAs[String]("subject") == "HGVS:NC_000001.11:g.1413898T>C")
    assert(up.getAs[String]("predicate") == "CTD:increases_expression_of")
    assert(up.getAs[scala.collection.Seq[String]]("expressed_in") == Seq("UBERON:0002107"))
    assert(up.getAs[scala.collection.Seq[Double]]("slope") == Seq(0.5))
    val down = byGene("ENSEMBL:ENSG00000111111")
    assert(down.getAs[String]("predicate") == "CTD:decreases_expression_of")
    assert(g.nodes.filter(array_contains(col("category"), "biolink:SequenceVariant")).count() == 2)
  }

  test("GTEx sQTL: gene from phenotype id, affects_splicing_of") {
    val g = Gtex.parse(spark, s"$res/gtex/sqtl.tar", isSqtl = true)
    assert(g.edges.count() == 1)
    val e = g.edges.head()
    assert(e.getAs[String]("predicate") == "CTD:affects_splicing_of")
    assert(e.getAs[String]("object") == "ENSEMBL:ENSG00000237094")
    assert(e.getAs[scala.collection.Seq[String]]("expressed_in") == Seq("UBERON:0002048"))
  }

  test("GenomeAlliance: orthologs, underscore-cleaned ids, gz scan") {
    val g = GenomeAlliance.parse(spark, s"$res/alliance/ORTHOLOGY-ALLIANCE_COMBINED.tsv.gz")
    assert(g.edges.count() == 2)
    assert(g.nodes.count() == 3) // HGNC:7 shared object
    val e = g.edges.orderBy(col("subject")).collect()
    assert(e.forall(_.getAs[String]("predicate") == "biolink:orthologous_to"))
    assert(e.map(_.getAs[String]("subject")).toSeq == Seq("MGI:87853", "RGD61995"))
  }

  test("ClinGen: 6-line metadata skip, moi normalization, unknown moi → null") {
    val g = ClinGenGeneDisease.parse(spark, s"$res/clingen/clingen_gene_disease_validity.tsv")
    assert(g.edges.count() == 3)
    assert(g.nodes.count() == 6)
    val rows = g.edges.collect().map(r => r.getAs[String]("subject") -> r).toMap
    val brca = rows("HGNC:1100")
    assert(brca.getAs[String]("predicate") == "gene_associated_with_condition")
    assert(brca.getAs[String]("object") == "MONDO:0007254")
    assert(brca.getAs[String]("NORMALIZED_MODE_OF_INHERITANCE") == "Autosomal Dominant")
    assert(brca.getAs[String]("HPO_FOR_NORMALIZED_MODE_OF_INHERITANCE") == "0000006")
    assert(brca.getAs[String]("CLINGEN_VALIDITY_CLASSIFICATION") == "Definitive")
    val unknown = rows("HGNC:999")
    assert(unknown.getAs[String]("NORMALIZED_MODE_OF_INHERITANCE") == null)
    assert(unknown.getAs[String]("HPO_FOR_NORMALIZED_MODE_OF_INHERITANCE") == null)
  }

  test("STRING: score gate, per-channel fan-out, KL/AT channel logic") {
    val g = StringDb.parse(spark, s"$res/string/9606.protein.links.full.txt.gz", "9606")
    // row1 fans out to 2 channel edges; rows 2 and 4 fall back; row3 gated
    assert(g.edges.count() == 4)
    assert(g.nodes.count() == 4)
    val byPred = g.edges.filter(col("subject") === "ENSEMBL:ENSP1" && col("object") === "ENSEMBL:ENSP2")
      .collect().map(r => r.getAs[String]("predicate") -> r).toMap
    assert(byPred.keySet == Set("biolink:coexpressed_with", "biolink:physically_interacts_with"))
    // multi-high-conf override: knowledge_assertion + manual (EXPERIMENTS)
    assert(byPred.values.forall(_.getAs[String]("knowledge_level") == "knowledge_assertion"))
    assert(byPred.values.forall(_.getAs[String]("agent_type") == "manual_agent"))
    val textmined = g.edges.filter(col("object") === "ENSEMBL:ENSP3").head()
    assert(textmined.getAs[String]("predicate") == "biolink:physically_interacts_with") // fallback
    assert(textmined.getAs[String]("agent_type") == "text_mining_agent") // best channel TEXTMINING
    val homology = g.edges.filter(col("subject") === "ENSEMBL:ENSP3").head()
    assert(homology.getAs[String]("knowledge_level") == "prediction") // best channel HOMOLOGY
    assert(homology.getAs[String]("agent_type") == "computational_model")
    assert(homology.getAs[String]("species_context_qualifier") == "NCBITaxon:9606")
  }

  test("Hetio: bz2 JSON doc, abbrev predicates, source-based provenance") {
    val g = Hetio.parse(spark, s"$res/hetio/hetionet-test.json.bz2")
    // MEDLINE DpS, Bgee-sourced, and Pathway-target edges all dropped
    assert(g.edges.count() == 2)
    val rows = g.edges.collect().map(r => r.getAs[String]("predicate") -> r).toMap
    val binds = rows("RO:0002436") // CbG
    assert(binds.getAs[String]("subject") == "DRUGBANK:DB01048")
    assert(binds.getAs[String]("object") == "NCBIGene:100")
    assert(binds.getAs[String]("primary_knowledge_source") == "infores:lincs")
    assert(binds.getAs[scala.collection.Seq[String]]("aggregator_knowledge_source") ==
      Seq("infores:hetionet"))
    val treats = rows("RO:0002606") // CtD
    assert(treats.getAs[String]("object") == "DOID:2841") // already a curie
    assert(treats.getAs[String]("primary_knowledge_source") == "infores:hetionet")
    assert(treats.getAs[scala.collection.Seq[String]]("hetio_source") == Seq("some-thesis"))
  }

  test("BindingDB: zip member, measure grouping, -log10 affinity, dead compounds") {
    val g = BindingDb.parse(spark, s"$res/binding/BindingDB_All.tsv.zip", "BindingDB_All.tsv")
    assert(g.edges.count() == 3) // pKi + pIC50 for 123~P1, pKd for 456~P2; zero pEC50 dropped
    val rows = g.edges.collect().map(r =>
      (r.getAs[String]("subject"), r.getAs[String]("affinity_parameter")) -> r).toMap
    val pki = rows(("PUBCHEM.COMPOUND:123", "pKi"))
    assert(pki.getAs[String]("predicate") == "{DGIDB}:inhibitor") // reference's literal
    assert(pki.getAs[String]("object") == "UniProtKB:P1")
    assert(pki.getAs[Double]("affinity") == 7.82) // -log10(mean(10,20) nM)
    assert(pki.getAs[scala.collection.Seq[Double]]("supporting_affinities") == Seq(8.0, 7.7))
    // the '>' row contributes neither affinity nor publication
    assert(pki.getAs[scala.collection.Seq[String]]("publications") == Seq("PMID:111", "PMID:222"))
    val pic50 = rows(("PUBCHEM.COMPOUND:123", "pIC50"))
    assert(pic50.getAs[String]("predicate") == "CTD:decreases_activity_of")
    assert(pic50.getAs[scala.collection.Seq[String]]("publications") == null)
    assert(pic50.getAs[scala.collection.Seq[String]]("patent_ids") == Seq("PATENT:US-1"))
    val pkd = rows(("PUBCHEM.COMPOUND:456", "pKd"))
    assert(pkd.getAs[Double]("affinity") == 5.3) // '<5,000' nM parsed to 5000
  }

  test("MONDOProperties: nquads scan, IC cutoff, superclass flags pivoted") {
    val g = MondoProperties.parse(spark, s"$res/mondo/ubergraph.nq.gz")
    // only MONDO:0005737 gains a flag (its property-mondo parent 0000001);
    // 0009999's only parent is too specific (ic 92)
    assert(g.nodes.count() == 1)
    val n = g.nodes.head()
    assert(n.getAs[String]("id") == "MONDO:0005737")
    // label 'infectious disease, viral' → comma stripped, spaces to _
    assert(n.getAs[Boolean]("MONDO_SUPERCLASS_infectious_disease_viral"))
    assert(g.edges.count() == 0) // nodes-only source
  }

  test("KinAce: qualified phosphorylation edges, source-driven KL/AT, PMIDs") {
    val g = KinAce.parse(spark, s"$res/kinace/ksi_source_full_dataset.csv")
    assert(g.edges.count() == 3)
    assert(g.nodes.count() == 4)
    val rows = g.edges.collect().map(r =>
      (r.getAs[String]("subject"), r.getAs[String]("object")) -> r).toMap
    val psp = rows(("UniProtKB:P00533", "UniProtKB:P04637"))
    assert(psp.getAs[String]("predicate") == "biolink:affects")
    assert(psp.getAs[String]("qualified_predicate") == "biolink:causes")
    assert(psp.getAs[String]("object_aspect_qualifier") == "phosphorylation")
    assert(psp.getAs[String]("primary_knowledge_source") == "infores:psite-plus")
    assert(psp.getAs[String]("knowledge_level") == "knowledge_assertion")
    assert(psp.getAs[scala.collection.Seq[String]]("publications") == Seq("PMID:12345", "PMID:67890"))
    assert(psp.getAs[scala.collection.Seq[String]]("phosphorylation_sites") == Seq("Y220"))
    val iptm = rows(("UniProtKB:P00533", "UniProtKB:P06400"))
    assert(iptm.getAs[String]("agent_type") == "text_mining_agent")
    assert(iptm.getAs[scala.collection.Seq[String]]("publications") == null) // NA
    val epsd = rows(("UniProtKB:Q05397", "UniProtKB:P04637"))
    assert(epsd.getAs[String]("knowledge_level") == "not_provided")
  }

  test("UPheno: OBO stanzas, cross-species pairing on generic parents") {
    val g = UPheno.parse(spark, s"$res/upheno/upheno.obo",
      speciesAPrefixes = Seq("HP"), speciesBPrefixes = Seq("MP"))
    assert(g.edges.count() == 4) // 2 HP × 2 MP under UPHENO:0001001
    assert(g.nodes.count() == 4) // obsolete + ZP terms excluded
    val dual = g.edges
      .filter(col("subject") === "HP:0001646" && col("object") === "MP:0002747").head()
    assert(dual.getAs[scala.collection.Seq[String]]("upheno_generic_parent") ==
      Seq("UPHENO:0001001", "UPHENO:0075222")) // both supporting parents, sorted
    assert(dual.getAs[String]("predicate") == "biolink:homologous_to")
    assert(dual.getAs[String]("knowledge_level") == "logical_entailment")
    val hp = g.nodes.filter(col("id") === "HP:0001627").head()
    assert(hp.getAs[String]("name") == "Abnormal heart morphology")
    assert(hp.getAs[scala.collection.Seq[String]]("category") == Seq("biolink:PhenotypicFeature"))
  }

  test("GWASCatalog: risk alleles, merged rsids, trait curies, edge merge") {
    val g = GwasCatalog.parse(spark,
      s"$res/gwas/gwas-catalog-associations_ontology-annotated.tsv.zip",
      "gwas-catalog-associations_ontology-annotated.tsv")
    assert(g.edges.count() == 6)
    assert(g.nodes.count() == 8)
    val rows = g.edges.collect().map(r =>
      (r.getAs[String]("subject"), r.getAs[String]("object")) -> r).toMap
    // duplicate association merged: distinct pubs, min p-value
    val merged = rows(("DBSNP:rs123-G", "EFO:0001360"))
    assert(merged.getAs[scala.collection.Seq[String]]("publications") ==
      Seq("PMID:11111", "PMID:22222"))
    assert(merged.getAs[Double]("p_value") == 1e-12)
    // merged=1 current rsid wins; p=0 becomes min positive double
    val current = rows(("DBSNP:rs1000", "MONDO:0005148"))
    assert(current.getAs[Double]("p_value") == java.lang.Double.MIN_VALUE)
    // multi-variant x multi-trait fan-out; '?' allele keeps the bare rsid
    assert(rows.contains(("DBSNP:rs55-T", "HP:0000822")))
    assert(rows.contains(("DBSNP:rs77", "ORPHANET:846")))
    assert(!rows.keys.exists(_._1.contains("chr6"))) // non-rs token dropped
    assert(!rows.keys.exists(_._1.contains("HLA")))  // HLA row skipped
  }

  test("MonarchKG: predicate allowlist, source remap + ignore list, prefix drop") {
    val g = MonarchKg.parse(spark, s"$res/monarch/monarch-kg.jsonl.tar.gz")
    assert(g.edges.count() == 2)
    assert(g.nodes.count() == 4)
    val rows = g.edges.collect().map(r => r.getAs[String]("subject") -> r).toMap
    val causes = rows("MONDO:1")
    assert(causes.getAs[String]("primary_knowledge_source") == "infores:agrkb") // remapped
    assert(causes.getAs[scala.collection.Seq[String]]("publications") == Seq("PMID:1"))
    val pheno = rows("MONDO:7")
    assert(pheno.getAs[String]("primary_knowledge_source") == "infores:hgnc") // remapped
    assert(!g.edges.columns.contains("qualifiers"))
    // unfiltered variant keeps the undesired-predicate row too
    val all = MonarchKg.parse(spark, s"$res/monarch/monarch-kg.jsonl.tar.gz", filtered = false)
    assert(all.edges.count() == 5) // only the empty-predicate row drops
  }

  test("DrugMechDB: mechanism paths, qualifier mapping, target_for derivation") {
    val g = DrugMechDb.parse(spark, s"$res/drugmechdb/indication_paths.json")
    assert(g.edges.count() == 4) // 2 mechanism + 2 target_for
    assert(g.nodes.count() == 5)
    val mech = g.edges.filter(col("predicate") === "biolink:affects")
      .collect().map(r => r.getAs[String]("object") -> r).toMap
    val drugTarget = mech("UniProtKB:P00519") // UniProt: prefix fixed
    assert(drugTarget.getAs[String]("qualified_predicate") == "biolink:causes")
    assert(drugTarget.getAs[String]("object_direction_qualifier") == "decreased")
    assert(drugTarget.getAs[String]("object_aspect_qualifier") == "activity")
    // shared link across two paths carries both sorted path ids
    assert(drugTarget.getAs[scala.collection.Seq[String]]("drugmechdb_path_id") ==
      Seq("DB00619_MESH_D015464_1", "DB00619_MESH_D034721_1"))
    assert(mech("GO:0008283").getAs[String]("object_direction_qualifier") == "upregulated")
    // protein target of the drug asserts target_for against each disease
    val tf = g.edges.filter(col("predicate") === "biolink:target_for")
      .collect().map(_.getAs[String]("object")).toSet
    assert(tf == Set("MESH:D015464", "MESH:D034721"))
  }

  test("IntAct: PSI-MI TAB, publication precedence, detection-method union") {
    val g = IntAct.parse(spark, s"$res/intact/intact.zip")
    assert(g.edges.count() == 5) // 2 PPI + 3 distinct in-taxon
    assert(g.nodes.count() == 5) // 3 proteins + 2 taxa
    val ppi = g.edges.filter(col("predicate") === "RO:0002436")
      .collect().map(r => r.getAs[String]("subject") -> r).toMap
    val dup = ppi("UniProtKB:P12345")
    // duplicate rows collapsed; both MI codes joined sorted
    assert(dup.getAs[String]("detection_method") == "MI:0006|MI:0018")
    assert(dup.getAs[String]("publications") == "PMID:11290752")
    val imex = ppi("UniProtKB:P55555")
    assert(imex.getAs[String]("publications") == "IM:12345") // imex '-'->':'
    val taxonEdges = g.edges.filter(col("predicate") === "RO:0002162")
    assert(taxonEdges.count() == 3)
    val mouse = g.nodes.filter(col("id") === "UniProtKB:P55555").head()
    assert(mouse.getAs[String]("name") == "xyz_mouse") // alias until '('
    assert(mouse.getAs[String]("taxon") == "NCBITaxon:10090")
  }

  test("CAM-KP: id sanitization, per-row provenance, qualifier parsing") {
    val g = CamKp.parse(spark, s"$res/camkp/cam-kg.tsv.gz")
    assert(g.edges.count() == 3)
    assert(g.nodes.count() == 4)
    val q = g.edges.filter(col("predicate") === "biolink:regulates").head()
    assert(q.getAs[String]("anatomical_context_qualifier") == "UBERON:0002107")
    assert(q.getAs[String]("primary_knowledge_source") == "infores:go-cam")
    assert(q.getAs[scala.collection.Seq[String]]("aggregator_knowledge_source") ==
      Seq("infores:cam-kp"))
    assert(q.getAs[scala.collection.Seq[String]]("xref") ==
      Seq("http://model.geneontology.org/m1"))
    // quoted doubled-MGI id sanitized
    assert(g.nodes.filter(col("id") === "MGI:87853").count() == 1)
  }

  test("TextMiningKP: qualifier columns, nested JSON sentences, pipe lists") {
    val g = TextMiningKp.parse(spark, s"$res/tmkp/edges.tsv.gz")
    assert(g.edges.count() == 1)
    val e = g.edges.head()
    assert(e.getAs[String]("predicate") == "biolink:affects")
    assert(e.getAs[String]("qualified_predicate") == "biolink:causes")
    assert(e.getAs[String]("object_aspect_qualifier") == "activity")
    assert(e.getAs[String]("object_direction_qualifier") == "increased")
    assert(e.getAs[String]("subject_aspect_qualifier") == null) // empty column
    assert(e.getAs[Double]("tmkp_confidence_score") == 0.99)
    assert(e.getAs[scala.collection.Seq[String]]("publications") == Seq("PMID:100", "PMID:200"))
    assert(e.getAs[scala.collection.Seq[String]]("tmkp_ids") == Seq("tmkp:r1", "tmkp:r2"))
    // sentences interleave supporting_text and document ('NA' when missing)
    assert(e.getAs[String]("sentences") ==
      "BRCA1 regulates TP53.|PMID:100|Second sentence.|NA")
  }

  test("MolePro: KGX-TSV with biolink: headers, list splits, required filters") {
    val g = MolePro.parse(spark, s"$res/molepro/molepro_nodes.tsv",
      s"$res/molepro/molepro_edges.tsv")
    assert(g.nodes.count() == 2) // id-less node dropped
    assert(g.edges.count() == 1) // pks-less edge dropped
    val aspirin = g.nodes.filter(col("id") === "CHEBI:15365").head()
    assert(aspirin.getAs[scala.collection.Seq[String]]("category") ==
      Seq("biolink:SmallMolecule", "biolink:ChemicalEntity"))
    assert(aspirin.getAs[scala.collection.Seq[String]]("synonym") ==
      Seq("acetylsalicylic acid", "ASA"))
    val e = g.edges.head()
    assert(e.getAs[String]("primary_knowledge_source") == "infores:chembl") // first of multi
    assert(e.getAs[scala.collection.Seq[String]]("publications") == Seq("PMID:1", "PMID:2"))
  }

  test("ViralProteome: GOA extraction globbed over per-virus .goa files") {
    val g = Registry("ViralProteome")(spark, s"$res/viralproteome")
    assert(g.edges.count() == 3) // 2 sars-cov-2 + 1 ebola, both files scanned
    val preds = g.edges.select("predicate").collect().map(_.getString(0)).toSet
    assert(preds == Set("RO:0002327", "RO:0002331")) // enables + aspect-P default
    val spike = g.nodes.filter(col("id") === "UniProtKB:P0DTC2").head()
    assert(spike.getAs[String]("taxon") == "NCBITaxon:2697049")
  }

  test("Bgee: expression gates, intersection split, typed anatomy nodes") {
    val g = Bgee.parse(spark, s"$res/bgee/Homo_sapiens_expr_simple.tsv.gz",
      taxonId = "NCBITaxon:9606")
    assert(g.edges.count() == 2) // absent / FDR / score rows gated out
    val rows = g.edges.collect().map(r => r.getAs[String]("object") -> r).toMap
    val liver = rows("UBERON:0002107")
    assert(liver.getAs[String]("predicate") == "biolink:expressed_in")
    assert(liver.getAs[Double]("adjusted_p_value") == 1e-10)
    assert(liver.getAs[String]("anatomical_context_qualifier") == null)
    // CL ∩ UBERON intersection: cell is the object, uberon the qualifier
    val cell = rows("CL:0000182")
    assert(cell.getAs[String]("anatomical_context_qualifier") == "UBERON:0002107")
    assert(cell.getAs[String]("original_object") == "CL:0000182 ∩ UBERON:0002107")
    val cellNode = g.nodes.filter(col("id") === "CL:0000182").head()
    assert(cellNode.getAs[scala.collection.Seq[String]]("category") == Seq("biolink:Cell"))
    assert(cellNode.getAs[String]("name") == "") // intersection blanks the name
    val gene = g.nodes.filter(col("id") === "ENSEMBL:ENSG00000111640").head()
    assert(gene.getAs[String]("taxon") == "NCBITaxon:9606")
  }

  test("SGD: six csv extractions union into one graph") {
    val g = Sgd.parse(spark, s"$res/sgd")
    assert(g.edges.count() == 6) // 2 GO + 1 pathway + 1 phenotype + 1 complex + 1 complex-GO
    val byPred = g.edges.collect().groupBy(_.getAs[String]("predicate"))
    assert(byPred.keySet == Set("biolink:actively_involved_in", "biolink:active_in",
      "biolink:participates_in", "biolink:genetic_association",
      "biolink:in_complex_with", "biolink:enables"))
    val go = byPred("biolink:actively_involved_in").head
    assert(go.getAs[scala.collection.Seq[String]]("publications") == Seq("PMID:11046132"))
    val goUnpub = byPred("biolink:active_in").head
    assert(goUnpub.getAs[scala.collection.Seq[String]]("publications") == Seq()) // '?' guarded
    val cpx = byPred("biolink:in_complex_with").head
    assert(cpx.getAs[String]("object") == "CPX:CPX-1234")
    val pheno = byPred("biolink:genetic_association").head
    assert(pheno.getAs[String]("object") == "APO:0000112_inviable")
    // '?' gene symbol falls back to the secondary id
    val fallback = g.nodes.filter(col("id") === "SGD:S000003424").head()
    assert(fallback.getAs[String]("name") == "YGL123W")
    val gene = g.nodes.filter(col("id") === "SGD:S000002429").head()
    assert(gene.getAs[String]("chromosomeLocation") == "4:210500-205300, strand: -")
  }

  test("PANTHER: family/subfamily classification fan-out") {
    val g = Panther.parse(spark, s"$res/panther/PTHR19.0_human")
    assert(g.edges.count() == 14)
    assert(g.nodes.count() == 9)
    val byPred = g.edges.collect().groupBy(_.getAs[String]("predicate"))
    assert(byPred("RO:0002350").length == 4) // 2 subfam→fam + gene→fam + gene→subfam
    assert(byPred("RO:0002331").length == 4) // 2 bio processes × (fam, subfam)
    assert(byPred("RO:0002327").length == 2) // molecular function
    assert(byPred("RO:0001025").length == 2) // cellular component
    assert(byPred("RO:0000057").length == 2) // pathway has-participant
    // the 'Gene' placeholder id is skipped; the HGNC id is normalized
    val geneSubjects = byPred("RO:0002350").map(_.getAs[String]("subject")).toSet
    assert(geneSubjects.contains("HGNC:11998"))
    assert(!geneSubjects.exists(_.contains("Q9H9Z1")))
    val pathway = g.nodes.filter(col("id") === "PANTHER.PATHWAY:P00059").head()
    assert(pathway.getAs[String]("name") == "p53 pathway")
  }

  test("ChEBI properties: role closure over is_a, abstract roles ignored") {
    val g = ChebiProperties.parse(spark,
      s"$res/chebi/compounds.tsv.gz", s"$res/chebi/relation.tsv.gz")
    assert(g.nodes.count() == 1) // only aspirin carries roles
    val n = g.nodes.head()
    assert(n.getAs[String]("id") == "CHEBI:15365")
    assert(n.getAs[String]("name") == "acetylsalicylic acid")
    assert(n.getAs[Boolean]("CHEBI_ROLE_analgesic")) // direct role
    assert(n.getAs[Boolean]("CHEBI_ROLE_drug"))      // is_a ancestor
    assert(!g.nodes.columns.contains("CHEBI_ROLE_role")) // abstract root ignored
    assert(g.edges.count() == 0)
  }

  test("GtoPdb: interaction predicates, gene-product + has-part edges") {
    val g = GtoPdb.parse(spark, s"$res/gtopdb")
    assert(g.edges.count() == 5) // 2 ligand-gene + 1 gene-product + 2 has-part
    val byPred = g.edges.collect().groupBy(_.getAs[String]("predicate"))
    val inh = byPred("DGIdb:inhibitor").head
    assert(inh.getAs[String]("subject") == "GTOPDB:1234")
    assert(inh.getAs[String]("object") == "ENSEMBL:ENSG00000073756")
    assert(inh.getAs[Boolean]("primaryTarget"))
    assert(inh.getAs[Double]("affinity") == 5.9)
    assert(inh.getAs[scala.collection.Seq[String]]("publications") == Seq("PMID:111", "PMID:222"))
    val gp = byPred("RO:0002205").head // human peptide ligand's gene
    assert(gp.getAs[String]("subject") == "HGNC:11517")
    assert(gp.getAs[String]("object") == "GTOPDB:5678")
    assert(byPred("BFO:0000051").map(_.getAs[String]("object")).toSet ==
      Set("GTOPDB:4445", "GTOPDB:4446")) // mouse peptide skipped
    assert(g.nodes.filter(col("id") === "HGNC:11517").count() == 1)
  }

  test("MGI: gene-marker join gates, phenotype and disease-model edges") {
    val ph = Mgi.parseGenePhenotypes(spark,
      s"$res/mgi/MGI_GenePheno.rpt", s"$res/mgi/MRK_List2.rpt.gz")
    // row1: Pax6; row2: a2m kept, QTL marker dropped; row3: no MP id
    assert(ph.edges.count() == 2)
    val pax = ph.edges.filter(col("subject") === "MGI:97490").head()
    assert(pax.getAs[String]("predicate") == "biolink:has_phenotype")
    assert(pax.getAs[String]("object") == "MP:0001262")
    assert(pax.getAs[scala.collection.Seq[String]]("publications") ==
      Seq("PMID:12345", "PMID:67890")) // comma-separated input
    assert(pax.getAs[scala.collection.Seq[String]]("mgi_genotype_id") == Seq("MGI:2166359"))
    val a2m = ph.edges.filter(col("subject") === "MGI:87853").head()
    assert(a2m.getAs[scala.collection.Seq[String]]("publications") == null)
    assert(ph.nodes.filter(col("id") === "MGI:97490").head()
      .getAs[String]("name") == "Pax6")

    val dz = Mgi.parseGeneDisease(spark,
      s"$res/mgi/MGI_DO.rpt", s"$res/mgi/MRK_List2.rpt.gz")
    assert(dz.edges.count() == 1) // human row + QTL marker row dropped
    val e = dz.edges.head()
    assert(e.getAs[String]("subject") == "NCBIGene:18508")
    assert(e.getAs[String]("predicate") == "biolink:model_of")
    assert(e.getAs[String]("object") == "DOID:12271")
  }

  test("Cord19: four extractions + covid/coronavirus mirror pass") {
    val g = Cord19.parse(spark, s"$res/cord19")
    assert(g.edges.count() == 9) // 5 base + 4 mirrored
    val edges = g.edges.collect()
    // scibite underscores stripped
    assert(edges.exists(_.getAs[String]("subject") == "HP0030828"))
    // covid-disease edge gains a taxon copy (and vice versa)
    val chebi = edges.filter(_.getAs[String]("object") == "CHEBI:15365")
      .map(_.getAs[String]("subject")).toSet
    assert(chebi == Set("MONDO:0100096", "NCBITaxon:2697049"))
    val gene = edges.filter(_.getAs[String]("object") == "NCBIGene:100")
      .map(_.getAs[String]("subject")).toSet
    assert(gene == Set("MONDO:0100096", "NCBITaxon:2697049"))
    // trials edge mirrored on the object side
    val trials = edges.filter(_.getAs[String]("predicate") == "ROBOKOVID:tested_in")
      .map(_.getAs[String]("object")).toSet
    assert(trials == Set("MONDO:0100096", "NCBITaxon:2697049"))
    val phen = edges.filter(_.getAs[String]("predicate") == "RO:0002200")
    assert(phen.forall(_.getAs[String]("notes") == "common symptom"))
  }

  test("COHD: jsonl passthrough with TRAPI sources flattening") {
    val g = Cohd.parse(spark, s"$res/cohd")
    assert(g.nodes.count() == 2 && g.edges.count() == 1)
    val e = g.edges.head()
    assert(e.getAs[String]("primary_knowledge_source") == "infores:cohd")
    assert(e.getAs[String]("supporting_data_source") == "infores:columbia")
    assert(!g.edges.columns.contains("sources"))
  }

  test("EHR may-treat: ignore columns dropped, typed props, JSON CI array") {
    val g = EhrMayTreat.parse(spark, s"$res/ehr/may_treat_edges.csv")
    assert(g.edges.count() == 1 && g.nodes.count() == 2)
    val e = g.edges.head()
    assert(e.getAs[String]("predicate") == "biolink:may_treat")
    assert(e.getAs[Double]("auc_roc") == 0.82)
    assert(e.getAs[Long]("total_sample_size") == 12000L)
    assert(e.getAs[scala.collection.Seq[Double]]("log_odds_ratio_95_ci") == Seq(1.2, 1.8))
    assert(!g.edges.columns.contains("subject_name"))
  }

  test("OHD-Carolina: zip-member clinical stats edges") {
    val g = OhdCarolina.parse(spark, s"$res/ohd/unc_omop_2018_2022_kg.zip",
      "unc_omop_2018_2022_kg.csv")
    assert(g.edges.count() == 1 && g.nodes.count() == 2)
    val e = g.edges.head()
    assert(e.getAs[String]("predicate") == "biolink:correlated_with")
    assert(e.getAs[Double]("p_value") == 1e-30)
    assert(e.getAs[scala.collection.Seq[Double]]("log_odds_ratio_95_ci") == Seq(1.9, 2.3))
    assert(e.getAs[Long]("total_sample_size") == 250000L)
    assert(e.getAs[String]("knowledge_level") == "statistical_association")
    assert(g.nodes.filter(col("id") === "RXCUI:861007").head()
      .getAs[String]("name") == "metformin")
  }

  test("registry drives parsers by source id") {
    val g = Registry("HGNC")(spark, s"$res/hgnc")
    assert(g.edges.count() == 4)
    intercept[IllegalArgumentException] { Registry("NotARealSource") }
  }

  test("MouseGOA: registry variant reads mgi.gaf.gz unfiltered") {
    val g = Registry("MouseGOA")(spark, s"$res/goa")
    assert(g.edges.count() == 3 && g.nodes.count() == 8)
  }

  test("PlantGOA: plant_taxa.txt filter keeps only listed taxa") {
    val g = Registry("PlantGOA")(spark, s"$res/goa")
    assert(g.edges.count() == 2) // 9606 + 10090 rows filtered out
    val subs = g.edges.select("subject").collect().map(_.getString(0)).toSet
    assert(subs == Set("UniProtKB:Q00001", "UniProtKB:Q00002"))
    assert(g.nodes.count() == 4)
  }

  test("STRING-DB-Yeast: taxon parameterization strips 4932 prefix") {
    val g = Registry("STRING-DB-Yeast")(spark, s"$res/string")
    assert(g.edges.count() == 4) // same shape as the human fixture
    val e = g.edges.head()
    assert(e.getAs[String]("species_context_qualifier") == "NCBITaxon:4932")
    assert(g.edges.filter(col("subject").startsWith("ENSEMBL:")).count() == 4)
  }

  test("MGIPhenotypeAnatomy: malformed and id-less rows skipped") {
    val g = Registry("MGIPhenotypeAnatomy")(spark, s"$res/mgi")
    assert(g.edges.count() == 2 && g.nodes.count() == 4)
    val e = g.edges.filter(col("subject") === "MP:0000001").head()
    assert(e.getAs[String]("predicate") == "biolink:affects")
    assert(e.getAs[String]("object") == "EMAPA:16039")
    assert(e.getAs[String]("knowledge_level") == "knowledge_assertion")
    val anat = g.nodes.filter(col("id") === "EMAPA:16039").head()
    assert(anat.getAs[String]("name") == "heart")
    assert(anat.getAs[scala.collection.Seq[String]]("category") == Seq("biolink:AnatomicalEntity"))
  }

  test("EHRClinicalConnections: deploy-file variant parses the same shape") {
    val g = Registry("EHRClinicalConnections")(spark, s"$res/ehr")
    assert(g.edges.count() == 2 && g.nodes.count() == 3)
    assert(g.edges.filter(col("primary_knowledge_source") ===
      "infores:isb-EHRMLA-clinicalconnections").count() == 2)
  }

  test("MonarchKGFull: registry variant skips predicate/source filtering") {
    val g = Registry("MonarchKGFull")(spark, s"$res/monarch")
    assert(g.edges.count() == 5) // only the empty-predicate row drops
  }

  test("UbergraphRedundant + OntologicalHierarchy: redundant tgz slices") {
    val red = Registry("UbergraphRedundant")(spark, s"$res/ubergraph")
    assert(red.edges.count() == 3 && red.nodes.count() == 4)
    val oh = Registry("OntologicalHierarchy")(spark, s"$res/ubergraph")
    assert(oh.edges.count() == 2) // UBERON:1→CL:0 and GO:0003674→GO:0008150
    assert(oh.edges.select("predicate").distinct().head()
      .getAs[String]("predicate") == "rdfs:subClassOf")
  }

  test("ClinGenDosageSensitivity: HI/TS fan-out, score negation, defaults") {
    val g = Registry("ClinGenDosageSensitivity")(spark, s"$res/clingen")
    assert(g.edges.count() == 5) // 4 gene edges + 1 region edge
    assert(g.nodes.count() == 9)
    val hiA = g.edges.filter(col("subject") === "NCBIGene:100").head()
    assert(hiA.getAs[String]("predicate") == "gene associated with condition")
    assert(hiA.getAs[String]("object") == "MONDO:0000001")
    assert(!hiA.getAs[Boolean]("negated"))
    assert(hiA.getAs[String]("HAPLOINSUFFICIENCY_SCORE") == "3")
    val bEdges = g.edges.filter(col("subject") === "NCBIGene:200").collect()
      .map(r => Option(r.getAs[String]("TRIPLOSENSITIVITY_SCORE")) -> r).toMap
    // HI with empty disease id → human-disease default, negated
    val hiB = bEdges(None)
    assert(hiB.getAs[String]("object") == "MONDO:0700096")
    assert(hiB.getAs[Boolean]("negated"))
    val tsB = bEdges(Some("40"))
    assert(tsB.getAs[String]("object") == "MONDO:0000002")
    assert(tsB.getAs[Boolean]("negated"))
    val hiC = g.edges.filter(col("subject") === "NCBIGene:300").head()
    assert(hiC.getAs[String]("Status") == "Not planned to be evaluated")
    assert(hiC.getAs[Boolean]("negated"))
    val region = g.edges.filter(col("subject") === "ISCA:46295").head()
    assert(region.getAs[String]("predicate") == "region associated with condition")
    assert(!region.getAs[Boolean]("negated"))
  }

  test("ClinGenVariantPathogenicity: retracted drop, MOI lookup, assertion map") {
    val g = Registry("ClinGenVariantPathogenicity")(spark, s"$res/clingen")
    assert(g.edges.count() == 2) // retracted row dropped entirely
    assert(g.nodes.count() == 4) // its endpoints dropped too
    val rows = g.edges.collect().map(r => r.getAs[String]("subject") -> r).toMap
    val path = rows("CAID:CA000123")
    assert(path.getAs[String]("predicate") == "causes")
    assert(path.getAs[String]("object") == "MONDO:0005045")
    assert(path.getAs[String]("DIRECTION") == "Supports")
    assert(!path.getAs[Boolean]("negated"))
    assert(path.getAs[scala.collection.Seq[String]]("publications") ==
      Seq("PMID:12345", "PMID:67890"))
    assert(path.getAs[scala.collection.Seq[String]]("HPO_FOR_MODE_OF_INHERITANCE") ==
      Seq("HP:0000006"))
    val vus = rows("CAID:CA000125")
    assert(vus.getAs[String]("DIRECTION") == "Inconclusive")
    assert(vus.getAs[Boolean]("negated"))
    assert(vus.getAs[scala.collection.Seq[String]]("HPO_FOR_MODE_OF_INHERITANCE") ==
      Seq("HP:0000006", "HP:0001442")) // mosaic maps to two terms
    val vNode = g.nodes.filter(col("id") === "CAID:CA000123").head()
    assert(vNode.getAs[scala.collection.Seq[String]]("category") == Seq("biolink:SequenceVariant"))
    assert(vNode.getAs[String]("HGNC_GENE_SYMBOL") == "MYH7")
  }
}
