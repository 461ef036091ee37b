package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Variant → HGVS expression conversion (SURVEY §2.3 P6).
  * Semantics mirror the reference (/root/reference/orion/hgvs_utils.py:36-111):
  * SNV / insertion / deletion cases over chromosome accession lookups for
  * b37/b38/GRCh38 builds; unsupported shapes return "".
  */
object Hgvs {

  private def accessions(prefix: String, v: Seq[(Int, String)]): Map[Int, String] = v.toMap

  private val b37: Map[Int, String] = (1 to 24).zip(Seq(
    "NC_000001.10", "NC_000002.11", "NC_000003.11", "NC_000004.11", "NC_000005.9",
    "NC_000006.11", "NC_000007.13", "NC_000008.10", "NC_000009.11", "NC_000010.10",
    "NC_000011.9", "NC_000012.11", "NC_000013.10", "NC_000014.8", "NC_000015.9",
    "NC_000016.9", "NC_000017.10", "NC_000018.9", "NC_000019.9", "NC_000020.10",
    "NC_000021.8", "NC_000022.10", "NC_000023.10", "NC_000024.9")).toMap

  private val b38: Map[Int, String] = (1 to 24).zip(Seq(
    "NC_000001.11", "NC_000002.12", "NC_000003.12", "NC_000004.12", "NC_000005.10",
    "NC_000006.12", "NC_000007.14", "NC_000008.11", "NC_000009.12", "NC_000010.11",
    "NC_000011.10", "NC_000012.12", "NC_000013.11", "NC_000014.9", "NC_000015.10",
    "NC_000016.10", "NC_000017.11", "NC_000018.10", "NC_000019.10", "NC_000020.11",
    "NC_000021.9", "NC_000022.11", "NC_000023.11", "NC_000024.10")).toMap

  private val builds: Map[String, Map[Int, String]] =
    Map("b37" -> b37, "b38" -> b38, "GRCh38" -> b38)

  /** Pure conversion — "" for unsupported shapes, exactly like the ref. */
  def convert(chromosome: String, position: Long, refAllele: String,
              altAllele: String, referenceGenome: String = "b38"): String = {
    val chromNum = chromosome match {
      case "X" => 23
      case "Y" => 24
      case s => try s.toInt catch { case _: NumberFormatException => return "" }
    }
    val refChrom = builds.get(referenceGenome).flatMap(_.get(chromNum)) match {
      case Some(c) => c
      case None => return ""
    }
    val lenRef = refAllele.length
    val variation: String =
      if (altAllele == ".") {
        if (lenRef == 1) s"${position}del"
        else s"${position}_${position + lenRef - 1}del"
      } else if (altAllele.startsWith("<")) {
        return ""
      } else {
        val lenAlt = altAllele.length
        if (lenRef == 1 && lenAlt == 1) s"$position$refAllele>$altAllele"
        else if (lenAlt > lenRef && altAllele.startsWith(refAllele)) {
          val diff = lenAlt - lenRef
          val offset = lenAlt - diff
          s"${position + offset - 1}_${position + offset}ins${altAllele.substring(offset)}"
        } else if (lenRef > lenAlt && refAllele.startsWith(altAllele)) {
          val diff = lenRef - lenAlt
          val offset = lenRef - diff
          if (diff == 1) s"${position + offset}del"
          else s"${position + offset}_${position + offset + diff - 1}del"
        } else return ""
      }
    s"$refChrom:g.$variation"
  }

  /** DuckDB CASE expression mapping (genomeCol, chromNumCol) → RefSeq
    * accession, generated from the same maps `convert` uses so the q60
    * oracle cannot drift from the Scala tables. NULL for unknown
    * builds/chromosomes (the reject path). */
  def accessionSqlCase(genomeCol: String, chromCol: String): String = {
    def caseFor(m: Map[Int, String]): String =
      s"CASE $chromCol " + m.toSeq.sortBy(_._1)
        .map { case (k, v) => s"WHEN $k THEN '$v'" }.mkString(" ") + " END"
    s"CASE WHEN $genomeCol = 'b37' THEN ${caseFor(b37)} " +
      s"WHEN $genomeCol IN ('b38', 'GRCh38') THEN ${caseFor(b38)} END"
  }

  /** UDF form for parser pipelines (hot-path candidate for a codegen
    * Expression if profiling demands — SURVEY §2.10). */
  val hgvsUdf: UserDefinedFunction =
    udf((c: String, p: Long, r: String, a: String, g: String) => convert(c, p, r, a, g))

  /** Parse a GTEx-style variant id `chr1_1413898_T_C_b38` into its parts. */
  def parseGtexVariantId(id: String): Option[(String, Long, String, String, String)] = {
    val parts = id.split("_")
    if (parts.length != 5) None
    else try Some((parts(0).stripPrefix("chr"), parts(1).toLong, parts(2), parts(3), parts(4)))
    catch { case _: NumberFormatException => None }
  }
}
