package graft.aql

/** AQL token model — same surface as the reference language
  * (`/root/reference/src/lexer_functions.rs:8-19`: Keyword/String/Bytes/
  * Int/Float/Bool/Operator/Group/SubCommand/Argument), lexed by a clean
  * hand-rolled scanner rather than the reference's accumulate-and-probe
  * loop.
  */
sealed trait Token
object Token {
  final case class Keyword(value: String) extends Token
  final case class Str(value: String) extends Token
  final case class Bytes(value: Array[Byte]) extends Token {
    override def equals(o: Any): Boolean = o match {
      case Bytes(b) => java.util.Arrays.equals(value, b)
      case _ => false
    }
    override def hashCode: Int = java.util.Arrays.hashCode(value)
  }
  final case class IntLit(value: Long) extends Token
  final case class FloatLit(value: Double) extends Token
  final case class BoolLit(value: Boolean) extends Token
  final case class Op(value: String) extends Token
  final case class Group(items: List[Token]) extends Token
  final case class SubCommand(items: List[Token]) extends Token
  case object Argument extends Token

  /** Keyword set of the reference (`src/lexer_functions.rs:21-54`). */
  val Keywords: Set[String] = Set(
    "CREATE", "COMMIT", "ROLLBACK", "DELETE", "EDIT", "SEARCH", "WHERE",
    "ROW", "CONTAINER", "ON", "USING",
    "INT", "BIGINT", "TEXT", "BOOL", "FLOAT", "CHAR", "NONE",
    "AND", "OR",
    "NANO-STRING", "SMALL-STRING", "MEDIUM-STRING", "BIG-STRING", "LARGE-STRING",
    "NANO-BYTES", "SMALL-BYTES", "MEDIUM-BYTES", "BIG-BYTES", "LARGE-BYTES",
    "QYCNPVS", "QYCNNXT", "QYCNEXT",
    // graft extensions beyond the reference keyword set
    "EXPLAIN", "VACUUM", "AT", "VERSION", "IN", "NOT", "HAVING",
    "ORDER", "BY", "LIMIT", "ASC", "DESC", "DISTINCT", "JOIN", "LEFT",
    "ALTER", "ADD", "COLUMN", "OPTIMIZE", "MERGE", "DROP", "RENAME", "INDEX",
    "CHANGES", "SHOW", "CONTAINERS", "INDEXES", "VERSIONS", "DESCRIBE",
    "VIEW", "VIEWS", "REFRESH", "MATCH", "ROWS", "SIMILAR", "CLONE", "EXPORT", "IMPORT", "TO", "INTO",
    "RESTORE")

  /** Multi-char first: `&&&>` regex-match, `&&>` icontains, `&>` contains,
    * `>=`, `<=`, `==`, `!=`, then single-char (reference
    * `src/lexer_functions.rs:290-395`).
    */
  val Operators: List[String] =
    List("&&&>", "&&>", "&>", ">=", "<=", "==", "!=", "=", ">", "<")
}

final class LexException(msg: String) extends RuntimeException(msg)

/** Hand-rolled scanner producing the reference token set: quoted strings
  * with escapes, `[a, b, c]` groups (recursively lexed), `( … )`
  * subcommands, ints/floats incl. scientific notation, `/*…*/` comments,
  * `§base64` byte literals, `?` prepared-statement placeholders, bare
  * words as strings, keywords case-insensitive.
  */
object Lexer {
  import Token._

  def lex(input: String): List[Token] = {
    if (input.trim.isEmpty) throw new LexException("Input cannot be blank")
    val out = List.newBuilder[Token]
    val s = input
    var i = 0
    val n = s.length

    def skipWs(): Unit = { while (i < n && s(i).isWhitespace) i += 1 }

    def readUntilBalanced(open: Char, close: Char): String = {
      // i points at `open`; returns inner text, i lands past `close`
      var depth = 0
      var inStr = false
      var quote = ' '
      var escaped = false
      val start = i + 1
      while (i < n) {
        val c = s(i)
        if (inStr) {
          if (escaped) escaped = false
          else if (c == '\\') escaped = true
          else if (c == quote) inStr = false
        } else c match {
          case '\'' | '"' => inStr = true; quote = c
          case `open` => depth += 1
          case `close` =>
            depth -= 1
            if (depth == 0) { i += 1; return s.substring(start, i - 1) }
          case _ =>
        }
        i += 1
      }
      throw new LexException(s"Unbalanced '$open…$close' starting near ${s.substring(math.max(0, start - 1), math.min(n, start + 20))}")
    }

    /** Split group body on top-level commas (strings and parens respected). */
    def splitTopLevel(body: String): List[String] = {
      val parts = List.newBuilder[String]
      val cur = new StringBuilder
      var depthP = 0; var depthB = 0
      var inStr = false; var quote = ' '; var escaped = false
      body.foreach { c =>
        if (inStr) {
          cur.append(c)
          if (escaped) escaped = false
          else if (c == '\\') escaped = true
          else if (c == quote) inStr = false
        } else c match {
          case '\'' | '"' => inStr = true; quote = c; cur.append(c)
          case '(' => depthP += 1; cur.append(c)
          case ')' => depthP -= 1; cur.append(c)
          case '[' => depthB += 1; cur.append(c)
          case ']' => depthB -= 1; cur.append(c)
          case ',' if depthP == 0 && depthB == 0 =>
            if (cur.toString.trim.nonEmpty) parts += cur.toString.trim
            cur.clear()
          case _ => cur.append(c)
        }
      }
      if (cur.toString.trim.nonEmpty) parts += cur.toString.trim
      parts.result()
    }

    while ({ skipWs(); i < n }) {
      val c = s(i)
      c match {
        case '/' if i + 1 < n && s(i + 1) == '*' =>
          val end = s.indexOf("*/", i + 2)
          if (end < 0) throw new LexException("Unterminated comment")
          i = end + 2

        case '?' =>
          out += Argument; i += 1

        case '\'' | '"' =>
          val quote = c
          val sb = new StringBuilder
          i += 1
          var closed = false
          var escaped = false
          while (i < n && !closed) {
            val ch = s(i)
            if (escaped) { sb.append(ch); escaped = false }
            else if (ch == '\\') escaped = true
            else if (ch == quote) closed = true
            else sb.append(ch)
            i += 1
          }
          if (!closed) throw new LexException("Unterminated string literal")
          out += Str(sb.toString)

        case '[' =>
          val body = readUntilBalanced('[', ']')
          val items = splitTopLevel(body).flatMap(part => lex(part))
          out += Group(items)

        case '(' =>
          val body = readUntilBalanced('(', ')')
          out += SubCommand(lex(body))

        case '§' =>
          // §base64 byte literal (reference src/lexer_functions.rs:429-456)
          val start = i + 1
          i += 1
          while (i < n && !s(i).isWhitespace && s(i) != ',' && s(i) != ']' && s(i) != ')') i += 1
          val b64 = s.substring(start, i)
          try out += Bytes(java.util.Base64.getDecoder.decode(b64))
          catch { case _: IllegalArgumentException =>
            throw new LexException(s"Invalid base64 byte literal: §$b64")
          }

        case _ if c.isDigit || (c == '-' && i + 1 < n && s(i + 1).isDigit) =>
          val start = i
          if (c == '-') i += 1
          while (i < n && s(i).isDigit) i += 1
          var isFloat = false
          if (i < n && s(i) == '.') {
            isFloat = true; i += 1
            while (i < n && s(i).isDigit) i += 1
          }
          if (i < n && (s(i) == 'e' || s(i) == 'E')) {
            // exponent needs at least one digit — otherwise '1e' is a
            // bare word, not a malformed float that would throw NFE
            val expStart = i
            i += 1
            if (i < n && (s(i) == '+' || s(i) == '-')) i += 1
            if (i < n && s(i).isDigit) {
              isFloat = true
              while (i < n && s(i).isDigit) i += 1
            } else i = expStart
          }
          // a "number" followed directly by identifier chars is a bare
          // word (e.g. hex-ish ids like `617f39…`), not Int+Str
          if (i < n && (s(i).isLetterOrDigit || s(i) == '_')) {
            while (i < n && !s(i).isWhitespace && !"[](),'\"".contains(s(i))
              && !Token.Operators.exists(op => s.startsWith(op, i))) i += 1
            out += Str(s.substring(start, i))
          } else {
            val text = s.substring(start, i)
            out += (if (isFloat) FloatLit(text.toDouble) else IntLit(text.toLong))
          }

        case _ if Token.Operators.exists(op => s.startsWith(op, i)) =>
          val op = Token.Operators.find(op => s.startsWith(op, i)).get
          out += Op(op); i += op.length

        case _ =>
          // bare word: keyword / boolean / identifier-as-string
          val start = i
          while (i < n && !s(i).isWhitespace && !"[](),'\"".contains(s(i))
            && !Token.Operators.exists(op => s.startsWith(op, i))) i += 1
          if (i == start) throw new LexException(s"Unexpected character '${s(i)}'")
          val word = s.substring(start, i)
          val up = word.toUpperCase
          if (Token.Keywords.contains(up)) out += Keyword(up)
          else if (up == "TRUE") out += BoolLit(true)
          else if (up == "FALSE") out += BoolLit(false)
          else out += Str(word)
      }
    }
    val r = out.result()
    if (r.isEmpty) throw new LexException("The given input did not produce tokens")
    r
  }
}
