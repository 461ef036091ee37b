package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** HGVS conversion parity with the reference case analysis
  * (orion/hgvs_utils.py:36-111). */
class HgvsSpec extends AnyFunSuite {

  test("SNV") {
    assert(Hgvs.convert("1", 1413898, "T", "C") == "NC_000001.11:g.1413898T>C")
    assert(Hgvs.convert("1", 1413898, "T", "C", "b37") == "NC_000001.10:g.1413898T>C")
  }

  test("X/Y chromosome mapping") {
    assert(Hgvs.convert("X", 100, "A", "G") == "NC_000023.11:g.100A>G")
    assert(Hgvs.convert("Y", 100, "A", "G") == "NC_000024.10:g.100A>G")
  }

  test("insertion: alt extends ref") {
    assert(Hgvs.convert("2", 500, "A", "AGT") == "NC_000002.12:g.500_501insGT")
  }

  test("deletion: ref extends alt") {
    assert(Hgvs.convert("3", 500, "AGT", "A") == "NC_000003.12:g.501_502del")
    assert(Hgvs.convert("3", 500, "AG", "A") == "NC_000003.12:g.501del")
  }

  test("dot alt = whole-ref deletion") {
    assert(Hgvs.convert("4", 500, "A", ".") == "NC_000004.12:g.500del")
    assert(Hgvs.convert("4", 500, "ACG", ".") == "NC_000004.12:g.500_502del")
  }

  test("unsupported shapes return empty") {
    assert(Hgvs.convert("1", 100, "A", "<DEL>") == "")
    assert(Hgvs.convert("MT", 100, "A", "G") == "")  // no mito accession
    assert(Hgvs.convert("1", 100, "AC", "GT") == "") // non-prefix delins
  }

  test("GTEx variant id parsing") {
    assert(Hgvs.parseGtexVariantId("chr1_1413898_T_C_b38")
      .contains(("1", 1413898L, "T", "C", "b38")))
    assert(Hgvs.parseGtexVariantId("garbage").isEmpty)
  }
}
