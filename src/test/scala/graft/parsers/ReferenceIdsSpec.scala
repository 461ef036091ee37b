package graft.parsers

import org.scalatest.funsuite.AnyFunSuite

/** Every ACTIVE source id in the reference's loader table
  * (orion/data_sources.py:70-135 SOURCE_DATA_LOADER_CLASS_IMPORTS — the
  * commented-out LitCoinEntityExtractor excluded) must resolve in the
  * registry verbatim, so a reference graph spec runs without id
  * translation. No Spark session needed — resolution is a map lookup. */
class ReferenceIdsSpec extends AnyFunSuite {

  private val activeReferenceIds = Seq(
    "BINDING-DB", "BgeeHuman", "BgeeMouse", "CAM-KP", "CCIDB", "CEBS",
    "CHEBIProps", "ClinicalTrialsKP", "ClinGenDosageSensitivity",
    "ClinGenGeneDiseaseValidity", "ClinGenVariantPathogenicity", "Cord19",
    "COHD", "CTD", "DrugCentral", "DrugMechDB", "GenomeAllianceOrthologs",
    "GTEx", "GtoPdb", "GWASCatalog", "Hetio", "HGNC", "HMDB", "HumanGOA",
    "MouseGOA", "MGIGenePhenotypes", "MGIGeneDisease", "MGIPhenotypeAnatomy",
    "STRING-DB-Human", "IntAct", "LINCS", "LitCoin", "LitCoinBagelService",
    "KinAce", "EHRMayTreat", "EHRClinicalConnections",
    "MetabolomicsWorkbench", "MolePro", "MonarchKG", "MonarchKGFull",
    "MONDOProps", "OHD-Carolina", "OntologicalHierarchy", "PANTHER",
    "PHAROS", "PlantGOA", "Reactome", "Scent", "SGD", "SIGNOR",
    "textminingkp", "UbergraphNonredundant", "UbergraphRedundant", "UniRef",
    "UPhenoHumanMousePhenotypeHomology", "ViralProteome",
    "YeastHistoneMapping", "Costanza2016Data",
    "YeastGaschDiamideGeneExpression", "YeastGSE61888", "STRING-DB-Yeast")

  test("all active reference source ids resolve verbatim") {
    val missing = activeReferenceIds.filterNot(Registry.all.contains)
    assert(missing.isEmpty, s"unresolvable reference ids: ${missing.mkString(", ")}")
    // resolution returns a parser, not an exception
    activeReferenceIds.foreach(id => Registry(id))
  }

  test("zero absent reference loaders") {
    assert(activeReferenceIds.size === 61)
  }
}
