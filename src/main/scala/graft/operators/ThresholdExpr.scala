package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
import org.apache.spark.sql.functions.{bitwise_not, coalesce, lit, pow, regexp_like}
import org.apache.spark.sql.graftbridge.Bridge

/** The reference evaluates user-configured threshold math ("value * 2",
  * "value + 200") with the govaluate interpreter, once per aggregated row
  * on the driver (/root/reference/main.go:352-435). Here the same strings
  * parse into Catalyst `Column` trees instead, so threshold math executes
  * inside whole-stage codegen, distributed, and constant-folds — a row
  * interpreter would be the non-Spark way.
  *
  * Grammar — govaluate's expression language, precedence mirrored from
  * its planner (tightest first: prefix, **, * / %, + -, << >>, & | ^,
  * comparators incl. =~ !~, &&, ||, ?: / ??):
  *   expr   := or (('?' expr ':' expr) | ('??' expr))?
  *   or     := and ('||' and)*
  *   and    := cmp ('&&' cmp)*
  *   cmp    := bit (('=='|'!='|'<='|'>='|'<'|'>'|'=~'|'!~') bit)?
  *   bit    := shift (('&'|'|'|'^') shift)*
  *   shift  := sum (('<<'|'>>') sum)*
  *   sum    := term (('+'|'-') term)*
  *   term   := power (('*'|'/'|'%') power)*
  *   power  := unary ('**' unary)*
  *   unary  := ('-'|'!'|'~') unary | atom
  *   atom   := number | string | identifier | 'true' | 'false' | '(' expr ')'
  * Strings are single- or double-quoted with backslash escapes; =~ / !~
  * are regex match (Spark regexp_like). Unsupported govaluate tails —
  * date-string coercion, arrays and the 'in' operator, function calls —
  * fail the parse with a position-carrying error rather than
  * misevaluating.
  */
object ThresholdExpr {

  def parse(s: String, vars: Map[String, Column]): Column =
    new Parser(s, vars).parseAll()

  /** Convenience matching the reference's single-variable form where the
    * aggregate is bound to `value` (main.go:356).
    */
  def withValue(s: String, value: Column): Column =
    parse(s, Map("value" -> value))

  private final class Parser(input: String, vars: Map[String, Column]) {
    private var pos = 0

    def parseAll(): Column = {
      val c = expr()
      skipWs()
      require(pos == input.length,
        s"trailing input at $pos in threshold expression '$input'")
      c
    }

    private def peek2: String =
      if (pos + 1 < input.length) input.substring(pos, pos + 2)
      else if (pos < input.length) input.substring(pos, pos + 1)
      else ""

    private def expr(): Column = {
      val cond = orExpr()
      skipWs()
      if (peek2 == "??") { // govaluate nil-coalescing
        pos += 2
        coalesce(cond, expr())
      } else if (peek == '?') {
        pos += 1
        val thenC = expr()
        skipWs()
        require(peek == ':', s"expected ':' at $pos in '$input'")
        pos += 1
        val elseC = expr()
        org.apache.spark.sql.functions.when(cond, thenC).otherwise(elseC)
      } else cond
    }

    private def orExpr(): Column = {
      var left = andExpr()
      var done = false
      while (!done) {
        skipWs()
        if (peek2 == "||") { pos += 2; left = left || andExpr() }
        else done = true
      }
      left
    }

    private def andExpr(): Column = {
      var left = cmp()
      var done = false
      while (!done) {
        skipWs()
        if (peek2 == "&&") { pos += 2; left = left && cmp() }
        else done = true
      }
      left
    }

    private def cmp(): Column = {
      val left = bit()
      skipWs()
      peek2 match {
        case "==" => pos += 2; left === bit()
        case "!=" => pos += 2; left =!= bit()
        case "<=" => pos += 2; left <= bit()
        case ">=" => pos += 2; left >= bit()
        case "=~" => pos += 2; regexp_like(left, bit())
        case "!~" => pos += 2; !regexp_like(left, bit())
        case _ if peek == '<' => pos += 1; left < bit()
        case _ if peek == '>' => pos += 1; left > bit()
        case _ => left
      }
    }

    // one mixed level, left-assoc, as in govaluate's bitwise stage
    private def bit(): Column = {
      var left = shift()
      var done = false
      while (!done) {
        skipWs()
        if (peek2 == "&&" || peek2 == "||") done = true
        else peek match {
          case '&' => pos += 1; left = left.bitwiseAND(shift())
          case '|' => pos += 1; left = left.bitwiseOR(shift())
          case '^' => pos += 1; left = left.bitwiseXOR(shift())
          case _ => done = true
        }
      }
      left
    }

    private def shift(): Column = {
      var left = sum()
      var done = false
      while (!done) {
        skipWs()
        peek2 match {
          case "<<" =>
            pos += 2
            left = Bridge.column(
              ShiftLeft(Bridge.expression(left), Bridge.expression(sum())))
          case ">>" =>
            pos += 2
            left = Bridge.column(
              ShiftRight(Bridge.expression(left), Bridge.expression(sum())))
          case _ => done = true
        }
      }
      left
    }

    private def skipWs(): Unit =
      while (pos < input.length && input.charAt(pos).isWhitespace) pos += 1

    private def peek: Char = if (pos < input.length) input.charAt(pos) else '\u0000'

    private def sum(): Column = {
      var left = term()
      var done = false
      while (!done) {
        skipWs()
        peek match {
          case '+' => pos += 1; left = left + term()
          case '-' => pos += 1; left = left - term()
          case _ => done = true
        }
      }
      left
    }

    private def term(): Column = {
      var left = power()
      var done = false
      while (!done) {
        skipWs()
        peek match {
          case '*' => pos += 1; left = left * power()
          case '/' => pos += 1; left = left / power()
          case '%' => pos += 1; left = left % power()
          case _ => done = true
        }
      }
      left
    }

    private def power(): Column = {
      var left = unary()
      var done = false
      while (!done) {
        skipWs()
        // govaluate's ** is float math.Pow, left-assoc
        if (peek2 == "**") { pos += 2; left = pow(left, unary()) }
        else done = true
      }
      left
    }

    private def unary(): Column = {
      skipWs()
      if (peek == '-') { pos += 1; lit(0) - unary() }
      else if (peek == '!') { pos += 1; !unary() }
      else if (peek == '~') { pos += 1; bitwise_not(unary()) }
      else atom()
    }

    private def atom(): Column = {
      skipWs()
      peek match {
        case '(' =>
          pos += 1
          val c = expr()
          skipWs()
          require(peek == ')', s"expected ')' at $pos in '$input'")
          pos += 1
          c
        case '\'' | '"' =>
          val quote = peek
          pos += 1
          val sb = new StringBuilder
          while (pos < input.length && input.charAt(pos) != quote) {
            if (input.charAt(pos) == '\\' && pos + 1 < input.length) pos += 1
            sb += input.charAt(pos)
            pos += 1
          }
          require(pos < input.length,
            s"unterminated string literal in threshold expression '$input'")
          pos += 1
          lit(sb.toString)
        case ch if ch.isDigit || ch == '.' =>
          val start = pos
          while (pos < input.length &&
            (input.charAt(pos).isDigit || input.charAt(pos) == '.')) pos += 1
          val tok = input.substring(start, pos)
          if (tok.contains('.')) lit(tok.toDouble) else lit(tok.toLong)
        case ch if ch.isLetter || ch == '_' =>
          val start = pos
          while (pos < input.length &&
            (input.charAt(pos).isLetterOrDigit || input.charAt(pos) == '_')) pos += 1
          val name = input.substring(start, pos)
          if (name == "true") lit(true)
          else if (name == "false") lit(false)
          else vars.getOrElse(name,
            throw new IllegalArgumentException(
              s"unknown variable '$name' in threshold expression '$input'"))
        case other =>
          throw new IllegalArgumentException(
            s"unexpected '$other' at $pos in threshold expression '$input'")
      }
    }
  }
}
