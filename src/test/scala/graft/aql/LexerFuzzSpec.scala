package graft.aql

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz: the lexer's error contract is "tokens or LexException" — no
  * input may escape with NumberFormatException / IndexOutOfBounds / etc.
  * The parser's contract on lexable input is "Stmt or ParseException".
  */
class LexerFuzzSpec extends AnyFunSuite {
  private val rng = new scala.util.Random(99)
  private val alphabet =
    "abcXYZ019 _-.'\"[](),?§=<>&!/*\\\n\te" + "±é漢"

  private def randomInput(): String =
    (0 until 1 + rng.nextInt(40)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString

  test("2000 random inputs: lexer throws only LexException") {
    (1 to 2000).foreach { trial =>
      val in = randomInput()
      try Lexer.lex(in)
      catch {
        case _: LexException => // contract
        case e: Throwable =>
          fail(s"trial $trial: ${e.getClass.getName} escaped for input ${in.replace("\n", "\\n")}")
      }
    }
  }

  test("2000 random inputs: parser throws only Lex/ParseException") {
    (1 to 2000).foreach { trial =>
      val in = randomInput()
      try Parser.parse(in)
      catch {
        case _: LexException | _: ParseException => // contract
        case e: Throwable =>
          fail(s"trial $trial: ${e.getClass.getName} escaped for input ${in.replace("\n", "\\n")}")
      }
    }
  }
}
