package graft.model

/** Information-resource (infores) registry validation
  * (ref orion/biolink_utils.py:197-232: BiolinkInformationResources pulls
  * the public infores_catalog.yaml and classifies each knowledge source as
  * valid / deprecated / invalid).
  *
  * Zero-egress engine: the catalog is injectable; the vendored default is
  * a slice of the public registry covering the sources this engine ships
  * parsers for plus common aggregators. An id absent from the catalog is
  * INVALID (exactly the reference's rule — status lookup miss → invalid).
  */
final case class InforesCatalog(status: Map[String, String]) {
  import InforesCatalog._

  def statusOf(inforesId: String): String =
    status.get(inforesId) match {
      case Some(Deprecated) => Deprecated
      case Some(_) => Valid
      case None => Invalid
    }

  def deprecated(ids: Iterable[String]): Seq[String] =
    ids.filter(statusOf(_) == Deprecated).toSeq.sorted
  def invalid(ids: Iterable[String]): Seq[String] =
    ids.filter(statusOf(_) == Invalid).toSeq.sorted
}

object InforesCatalog {
  val Valid = "valid"
  val Deprecated = "deprecated"
  val Invalid = "invalid"

  /** Vendored registry slice (public infores catalog). */
  val vendored: InforesCatalog = InforesCatalog(Map(
    "infores:hgnc" -> Valid,
    "infores:goa" -> Valid,
    "infores:ctd" -> Valid,
    "infores:gtex" -> Valid,
    "infores:ubergraph" -> Valid,
    "infores:mondo" -> Valid,
    "infores:go" -> Valid,
    "infores:uberon" -> Valid,
    "infores:chebi" -> Valid,
    "infores:ncbi-gene" -> Valid,
    "infores:uniprot" -> Valid,
    "infores:reactome" -> Valid,
    "infores:string" -> Valid,
    "infores:intact" -> Valid,
    "infores:gwas-catalog" -> Valid,
    "infores:pharos" -> Valid,
    "infores:drugcentral" -> Valid,
    "infores:hetionet" -> Valid,
    "infores:panther" -> Valid,
    "infores:sgd" -> Valid,
    "infores:mgi" -> Valid,
    "infores:hmdb" -> Valid,
    "infores:biolink" -> Valid,
    "infores:automat-robokop" -> Valid,
    // historically deprecated registry entries (merged/renamed resources)
    "infores:ncbigene" -> Deprecated,
    "infores:gtopdb" -> Valid,
    "infores:kegg" -> Valid))
}
