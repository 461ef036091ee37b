package graft.parsers

import org.apache.spark.sql.SparkSession
import graft.extract.Extractor.ExtractedGraph

/** Parser registry (ref orion/data_sources.py:70-133 — the reference
  * registers 62 loaders by source id; this table registers the graft
  * implementations by the same ids so pipeline specs can name them).
  * Each entry maps (spark, dataDir) → ExtractedGraph where dataDir holds
  * the already-fetched source files under their canonical names. */
object Registry {

  type Parser = (SparkSession, String) => ExtractedGraph

  val parsers: Map[String, Parser] = Map(
    "HGNC" -> ((s, dir) => Hgnc.parse(s, s"$dir/hgnc_complete_set.txt")),
    "HumanGOA" -> ((s, dir) =>
      Goa.parse(s, s"$dir/goa_human.gaf.gz", taxonFilter = Some(Set("taxon:9606")))),
    "GOA" -> ((s, dir) => Goa.parse(s, s"$dir/goa.gaf")),
    "MouseGOA" -> ((s, dir) => Goa.parse(s, s"$dir/mgi.gaf.gz")),
    // PlantGOA filters the full-uniprot GAF by the plant taxa list
    // (parsers/GOA/src/loadGOA.py:260-280)
    "PlantGOA" -> ((s, dir) =>
      Goa.parse(s, s"$dir/filtered_goa_uniprot_all.gaf.gz",
        taxonFilter = Some(Goa.taxaSet(s"$dir/plant_taxa.txt")))),
    "UbergraphNonredundant" -> ((s, dir) =>
      UberGraph.parse(s, s"$dir/nonredundant-graph-table.tgz", "nonredundant-graph-table")),
    // redundant graph: full inference closure; OntologicalHierarchy is its
    // subclass-only slice (parsers/UberGraph/src/loadUG.py:112-156)
    "UbergraphRedundant" -> ((s, dir) =>
      UberGraph.parse(s, s"$dir/redundant-graph-table.tgz", "redundant-graph-table")),
    "OntologicalHierarchy" -> ((s, dir) =>
      UberGraph.parse(s, s"$dir/redundant-graph-table.tgz", "redundant-graph-table",
        onlySubclassEdges = true)),
    "CTD" -> ((s, dir) =>
      CtdChemGene.parse(s, s"$dir/CTD_chem_gene_ixns_structured.tar.gz")),
    "GTEx-eqtl" -> ((s, dir) => Gtex.parse(s, s"$dir/eqtl.tar", isSqtl = false)),
    "GTEx-sqtl" -> ((s, dir) => Gtex.parse(s, s"$dir/sqtl.tar", isSqtl = true)),
    "GenomeAllianceOrthologs" -> ((s, dir) =>
      GenomeAlliance.parse(s, s"$dir/ORTHOLOGY-ALLIANCE_COMBINED.tsv.gz")),
    "ClinGenGeneDiseaseValidity" -> ((s, dir) =>
      ClinGenGeneDisease.parse(s, s"$dir/clingen_gene_disease_validity.tsv")),
    "STRING-DB-Human" -> ((s, dir) =>
      StringDb.parse(s, s"$dir/9606.protein.links.full.txt.gz", taxonId = "9606")),
    "STRING-DB-Yeast" -> ((s, dir) =>
      StringDb.parse(s, s"$dir/4932.protein.links.full.txt.gz", taxonId = "4932")),
    "Hetio" -> ((s, dir) => Hetio.parse(s, s"$dir/hetionet-v1.0.json.bz2")),
    "BINDING-DB" -> ((s, dir) =>
      BindingDb.parse(s, s"$dir/BindingDB_All.tsv.zip", "BindingDB_All.tsv")),
    "MONDOProperties" -> ((s, dir) => MondoProperties.parse(s, s"$dir/ubergraph.nq.gz")),
    "KinAce" -> ((s, dir) => KinAce.parse(s, s"$dir/ksi_source_full_dataset.csv")),
    "UPhenoHumanMousePhenotypeHomology" -> ((s, dir) =>
      UPheno.parse(s, s"$dir/upheno.obo",
        speciesAPrefixes = Seq("HP"), speciesBPrefixes = Seq("MP"))),
    "GWASCatalog" -> ((s, dir) =>
      GwasCatalog.parse(s, s"$dir/gwas-catalog-associations_ontology-annotated.tsv.zip",
        "gwas-catalog-associations_ontology-annotated.tsv")),
    "PHAROS" -> ((s, dir) =>
      Pharos.parse(s, s"jdbc:derby:$dir/tcrd")),
    "DrugCentral" -> ((s, dir) =>
      DrugCentral.parse(s, s"jdbc:derby:$dir/dcdb")),
    "MonarchKG" -> ((s, dir) =>
      MonarchKg.parse(s, s"$dir/monarch-kg.jsonl.tar.gz")),
    "MonarchKGFull" -> ((s, dir) =>
      MonarchKg.parse(s, s"$dir/monarch-kg.jsonl.tar.gz", filtered = false)),
    "DrugMechDB" -> ((s, dir) => DrugMechDb.parse(s, s"$dir/indication_paths.json")),
    "IntAct" -> ((s, dir) => IntAct.parse(s, s"$dir/intact.zip")),
    "CAM-KP" -> ((s, dir) => CamKp.parse(s, s"$dir/cam-kg.tsv.gz")),
    "text-mining-provider-targeted" -> ((s, dir) =>
      TextMiningKp.parse(s, s"$dir/edges.tsv.gz")),
    "MolePro" -> ((s, dir) =>
      MolePro.parse(s, s"$dir/molepro_nodes.tsv", s"$dir/molepro_edges.tsv")),
    // ViralProteome is the GOA extraction over the per-virus .goa files
    // (parsers/ViralProteome/src/loadVP.py:133-162 reuses loadGOA's
    // extractors verbatim) — a glob scan of the same parser here
    "ViralProteome" -> ((s, dir) => Goa.parse(s, s"$dir/*.goa")),
    "BgeeHuman" -> ((s, dir) =>
      Bgee.parse(s, s"$dir/Homo_sapiens_expr_simple.tsv.gz", taxonId = "NCBITaxon:9606")),
    "BgeeMouse" -> ((s, dir) =>
      Bgee.parse(s, s"$dir/Mus_musculus_expr_simple.tsv.gz", taxonId = "NCBITaxon:10090")),
    "SGD" -> ((s, dir) => Sgd.parse(s, dir)),
    "PANTHER" -> ((s, dir) => Panther.parse(s, s"$dir/PTHR*_human")),
    "CHEBIProps" -> ((s, dir) =>
      ChebiProperties.parse(s, s"$dir/compounds.tsv.gz", s"$dir/relation.tsv.gz")),
    "GtoPdb" -> ((s, dir) => GtoPdb.parse(s, dir)),
    "MGIGenePhenotypes" -> ((s, dir) =>
      Mgi.parseGenePhenotypes(s, s"$dir/MGI_GenePheno.rpt", s"$dir/MRK_List2.rpt.gz")),
    "MGIGeneDisease" -> ((s, dir) =>
      Mgi.parseGeneDisease(s, s"$dir/MGI_DO.rpt", s"$dir/MRK_List2.rpt.gz")),
    "MGIPhenotypeAnatomy" -> ((s, dir) =>
      Mgi.parsePhenotypeAnatomy(s, s"$dir/MP_EMAPA.rpt")),
    "Cord19" -> ((s, dir) => Cord19.parse(s, dir)),
    "COHD" -> ((s, dir) => Cohd.parse(s, dir)),
    "EHRMayTreatKP" -> ((s, dir) => EhrMayTreat.parse(s, s"$dir/may_treat_edges.csv")),
    // same CSV shape, different deploy file + provenance
    // (parsers/ehr/src/loadEHR.py:86-105)
    "EHRClinicalConnections" -> ((s, dir) =>
      EhrMayTreat.parse(s, s"$dir/ClinicalConnections_KP_edges_latest_deploy.csv")),
    "ClinGenDosageSensitivity" -> ((s, dir) =>
      ClinGenDosage.parse(s, s"$dir/ClinGen_gene_curation_list_GRCh38.tsv",
        s"$dir/ClinGen_region_curation_list_GRCh38.tsv")),
    "ClinGenVariantPathogenicity" -> ((s, dir) =>
      ClinGenVariantPath.parse(s, s"$dir/clingen_variant_pathogenicity.tsv")),
    "OHD-Carolina" -> ((s, dir) =>
      OhdCarolina.parse(s, s"$dir/unc_omop_2018_2022_kg.zip", "unc_omop_2018_2022_kg.csv")),
    "SIGNOR" -> ((s, dir) => Signor.parse(s, dir)),
    // CCIDB ships as xlsx (loadCCIDB.py:52): read natively via the
    // pure-JDK Xlsx reader when present, else its CSV export; mapping
    // tables ship with the parser
    "CCIDB" -> ((s, dir) =>
      if (new java.io.File(s"$dir/CCIDB_Human.xlsx").isFile)
        Ccidb.parseXlsx(s, s"$dir/CCIDB_Human.xlsx", s"$dir/gene_mapping.csv",
          s"$dir/term_mapping.csv")
      else
        Ccidb.parse(s, s"$dir/CCIDB_Human.csv", s"$dir/gene_mapping.csv",
          s"$dir/term_mapping.csv")),
    "ClinicalTrialsKP" -> ((s, dir) =>
      Ctkp.parse(s, s"$dir/clinical_trials_kg_nodes_v2.2.10.tsv",
        s"$dir/clinical_trials_kg_edges_v2.2.10.tsv")),
    "Scent" -> ((s, dir) => Scent.parse(s, dir)),
    "YeastHistoneMapping" -> ((s, dir) =>
      Yeast.parseHistoneMap(s, s"$dir/HistoneModLoci.csv", s"$dir/HistoneMod2Gene.csv",
        s"$dir/HistonePTM2GO.csv")),
    "Costanza2016Data" -> ((s, dir) =>
      Yeast.parseCostanza(s, s"$dir/Costanza2016GeneticInteractions.csv")),
    "YeastGaschDiamideGeneExpression" -> ((s, dir) =>
      Yeast.parseGasch(s, s"$dir/Gasch_Diamide_Gene_Expression.csv", s"$dir/SGDAllGenes.csv")),
    "YeastGSE61888" -> ((s, dir) =>
      Yeast.parseGse61888(s, s"$dir/HistoneMod2GSE61888.csv")),
    "HMDB" -> ((s, dir) => Hmdb.parse(s, s"$dir/hmdb_metabolites.zip")),
    // one scan over whichever UniRef50/90/100 dumps are present; the
    // similarity bin comes from each entry id, not the file name
    "UniRef" -> ((s, dir) => UniRef.parse(s, s"$dir/UniRef*.xml")),
    "LINCS" -> ((s, dir) => Cfde.parse(s, dir, Cfde.lincs)),
    "MetabolomicsWorkbench" -> ((s, dir) => Cfde.parse(s, dir, Cfde.metabolomicsWorkbench)),
    // CEBS ships as xlsx (loadCEBS.py:41): native Xlsx read when
    // present, else the CSV export (same seam as CCIDB)
    "CEBS" -> ((s, dir) =>
      if (new java.io.File(s"$dir/TR_LOE_latest.xlsx").isFile)
        Cebs.parseXlsx(s, s"$dir/TR_LOE_latest.xlsx")
      else Cebs.parse(s, s"$dir/TR_LOE_latest.csv")),
    // both LitCoin variants parse identically — they differ only in which
    // bagel backend filled the grounding cache (loadLitCoin.py:502-508)
    "LitCoin" -> ((s, dir) => LitCoin.parse(s, dir)),
    "LitCoinBagelService" -> ((s, dir) => LitCoin.parse(s, dir)),
    // Reactome's neo4j dump is consumed as a flat graph export (node +
    // relationship jsonl) materialized at fetch time behind the Neo4jTools
    // seam — the graph database itself is a single-node external tool
    "Reactome" -> ((s, dir) =>
      Reactome.parse(s, s"$dir/reactome_graph_nodes.jsonl", s"$dir/reactome_graph_rels.jsonl")))

  /** Reference source ids that name the same loaders differently
    * (orion/data_sources.py:20-56): the reference's single 'GTEx' id loads
    * both QTL tars in one pass (loadGTEx.py:90-92,140-147); the other three
    * are pure renames. Registered alongside the primary ids so a reference
    * graph spec resolves verbatim. */
  private val referenceAliases: Map[String, Parser] = Map(
    "GTEx" -> ((s, dir) => {
      val eqtl = Gtex.parse(s, s"$dir/eqtl.tar", isSqtl = false)
      val sqtl = Gtex.parse(s, s"$dir/sqtl.tar", isSqtl = true)
      graft.extract.Extractor.ExtractedGraph(
        eqtl.nodes.unionByName(sqtl.nodes).dropDuplicates("id"),
        eqtl.edges.unionByName(sqtl.edges, allowMissingColumns = true))
    }),
    "EHRMayTreat" -> parsers("EHRMayTreatKP"),
    "MONDOProps" -> parsers("MONDOProperties"),
    "textminingkp" -> parsers("text-mining-provider-targeted"))

  val all: Map[String, Parser] = parsers ++ referenceAliases

  def apply(sourceId: String): Parser =
    all.getOrElse(sourceId, throw new IllegalArgumentException(
      s"unknown source id: $sourceId (registered: ${all.keys.toSeq.sorted.mkString(", ")})"))
}
