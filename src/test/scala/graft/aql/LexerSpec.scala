package graft.aql

import org.scalatest.funsuite.AnyFunSuite
import Token._

class LexerSpec extends AnyFunSuite {

  test("keywords are case-insensitive") {
    assert(Lexer.lex("search On WHERE") ==
      List(Keyword("SEARCH"), Keyword("ON"), Keyword("WHERE")))
    // join-extension keywords lex as keywords; quoting demotes to a string
    assert(Lexer.lex("join LEFT 'join'") ==
      List(Keyword("JOIN"), Keyword("LEFT"), Str("join")))
  }

  test("quoted strings with both quote styles and escapes") {
    assert(Lexer.lex("'abc' \"d e\"") == List(Str("abc"), Str("d e")))
    assert(Lexer.lex("""'a\'b'""") == List(Str("a'b")))
  }

  test("bare words lex as strings, TRUE/FALSE as booleans") {
    assert(Lexer.lex("users true FALSE") ==
      List(Str("users"), BoolLit(true), BoolLit(false)))
  }

  test("numbers: ints, negatives, floats, scientific notation") {
    assert(Lexer.lex("42 -7 3.5 1e3 2.5E-2") == List(
      IntLit(42), IntLit(-7), FloatLit(3.5), FloatLit(1000.0), FloatLit(0.025)))
  }

  test("all ten operators, longest-match first") {
    assert(Lexer.lex("= == != > < >= <= &> &&> &&&>") == List(
      Op("="), Op("=="), Op("!="), Op(">"), Op("<"), Op(">="), Op("<="),
      Op("&>"), Op("&&>"), Op("&&&>")))
  }

  test("groups split on top-level commas, recursively lexed") {
    assert(Lexer.lex("[a, 'b c', 3]") ==
      List(Group(List(Str("a"), Str("b c"), IntLit(3)))))
  }

  test("nested subcommand inside a group") {
    val List(Group(items)) = Lexer.lex("[users, (SEARCH [id] ON admins)]"): @unchecked
    assert(items.head == Str("users"))
    assert(items(1).asInstanceOf[SubCommand].items.head == Keyword("SEARCH"))
  }

  test("byte literal §base64 (reference lexer_functions.rs:429-456)") {
    val List(Bytes(b)) = Lexer.lex("§aGVsbG8="): @unchecked
    assert(new String(b, "UTF-8") == "hello")
  }

  test("argument placeholders and comments") {
    assert(Lexer.lex("? /* noise */ ?") == List(Argument, Argument))
  }

  test("group with string containing comma is not split") {
    assert(Lexer.lex("['a,b', c]") == List(Group(List(Str("a,b"), Str("c")))))
  }

  test("digit-leading identifiers stay one token (regression: cursor ids)") {
    assert(Lexer.lex("617f33943b1b") == List(Str("617f33943b1b")))
    assert(Lexer.lex("1e3x") == List(Str("1e3x")))
    assert(Lexer.lex("1e3") == List(FloatLit(1000.0)))
  }

  test("blank input rejected") {
    intercept[LexException](Lexer.lex("   "))
  }

  test("unterminated string / unbalanced group rejected") {
    intercept[LexException](Lexer.lex("'abc"))
    intercept[LexException](Lexer.lex("[a, b"))
  }
}
