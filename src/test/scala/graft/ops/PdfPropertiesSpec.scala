package graft.ops

import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SparkTestBase

/** Property tests for the PDF codec: writer→reader round trips over
  * randomized page/line shapes and hostile character content (parens,
  * backslashes, PDF delimiters, control-ish chars), both filters —
  * the reader must recover the exact input lines, always.
  */
class PdfPropertiesSpec extends SparkTestBase {

  private val params = Parameters.default.withMinSuccessfulTests(30)

  // printable Latin-1 including the PDF delimiters the escaper must handle
  private val charGen: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '(', ')', '\\', '<', '>', '[', ']', '/', '%', '.', '-'),
    1 -> Gen.choose(0xa1.toChar, 0xfe.toChar)) // Latin-1 high range

  private val lineGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))

  private val pagesGen: Gen[List[List[String]]] = for {
    nPages <- Gen.chooseNum(1, 4)
    pages <- Gen.listOfN(nPages,
      Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, lineGen)))
  } yield pages

  test("encodePdf -> extractText recovers pages, lines and every character") {
    val prop = forAll(pagesGen, Gen.oneOf(true, false)) { (pages, compress) =>
      val info = Pdf.extractText(Pdf.encodePdf(pages, compress))
      // the reader drops empty lines (a Td with no shown text draws
      // nothing), so compare against the non-empty line sequence
      val expected = pages.flatten.filter(_.nonEmpty).mkString("\n")
      info.n_pages == pages.size.toLong && info.text == expected
    }
    val r = org.scalacheck.Test.check(params, prop)
    assert(r.passed, r.status.toString)
  }
}
