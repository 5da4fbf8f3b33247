package graft.core

import graft.model.{MatchType, Matcher}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles label matchers into native Catalyst predicates over a
  * `map<string,string>` labels column — no UDFs, so the predicates fold
  * into whole-stage codegen and are eligible for pushdown/pruning.
  *
  * Semantics (reference: storages/base/base.go:90-138):
  *  - a missing label is equivalent to the empty string (`emptyLabel`);
  *  - `=~` / `!~` regexes are fully anchored (the reference compiles
  *    `^(?:value)$`, base.go:101-103);
  *  - the matcher list is a conjunction (AND);
  *  - an EMPTY matcher list matches everything — the reference's bulk-export
  *    extension beyond PromQL (base.go:100-138, storages_test.go:264-356).
  *
  * Dialect: the reference compiles Go RE2; the engine evaluates Java regex
  * (`rlike` on the Catalyst path). Two measures close the gap without an
  * RE2 engine on the classpath:
  *
  *  1. anchoring uses `\A(?:value)\z`, not `^...$` — Java's `$` (and `\Z`)
  *     also match just before a trailing newline, so `^(?:foo)$` matches
  *     "foo\n" under Java but not under RE2; `\z` is end-of-input in both
  *     dialects. The same pattern string is used on the Catalyst and
  *     driver paths, so they cannot diverge from each other.
  *  2. `validateRe2` rejects the Java-only constructs RE2 refuses to
  *     compile (backreferences, lookaround, atomic groups, possessive
  *     quantifiers, `\Z`/`\G`). The reference errors at matcher-compile
  *     time on these (base.go:101-103 regexp.Compile) — erroring loudly
  *     here mirrors that; accepting them would *silently* return different
  *     rows than the reference.
  *
  *  3. RE2's named-group syntax `(?P<name>…)` (Java spells it `(?<name>…)`
  *     and additionally forbids `_` in names) is rewritten to a plain
  *     group `(…)` before compiling — capture-group names cannot affect
  *     match/no-match, which is all a matcher evaluates. `(?P=name)`
  *     backreferences are rejected: RE2 itself has no backreferences, so
  *     erroring is reference-identical.
  *
  * Residual divergence (documented, not closable without re2j): `^`/`$`
  * *inside* the value still carry Java line semantics against values with
  * trailing newlines.
  */
object MatcherCompiler {

  /** Value of `labels[name]` with the missing≡"" rule applied. */
  def labelValue(labels: Column, name: String): Column =
    coalesce(labels.getItem(name), lit(""))

  /** Full-anchor wrapper, RE2-compatible end-of-input semantics. */
  private def anchored(value: String): String = "\\A(?:" + toJavaDialect(value) + ")\\z"

  /** Rewrite RE2-legal syntax Java refuses: `(?P<name>` named groups become
    * plain `(` groups (names never change what matches, and Java's own
    * `(?<name>` form forbids `_` in names, so renaming wouldn't suffice).
    * `(?P=name)` (a backreference in Python, INVALID in RE2) fails loudly.
    * Escape- and character-class-aware, same scan discipline as
    * [[validateRe2]]. */
  def toJavaDialect(pattern: String): String = {
    val out = new StringBuilder(pattern.length)
    var i = 0
    var inClass = false
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      c match {
        case '\\' if i + 1 < pattern.length =>
          out.append(c).append(pattern.charAt(i + 1)); i += 2
        case '[' if !inClass =>
          inClass = true; out.append(c); i += 1
        case ']' if inClass =>
          inClass = false; out.append(c); i += 1
        case '(' if !inClass && pattern.startsWith("(?P", i) =>
          if (pattern.startsWith("(?P<", i)) {
            val close = pattern.indexOf('>', i + 4)
            val name = if (close < 0) "" else pattern.substring(i + 4, close)
            if (close < 0 || name.isEmpty || !name.forall(ch =>
                ch.isLetterOrDigit && ch < 128 || ch == '_'))
              throw new IllegalArgumentException(
                s"malformed named group in matcher regex (RE2 requires (?P<[A-Za-z0-9_]+>): $pattern")
            out.append('('); i = close + 1
          } else
            throw new IllegalArgumentException(
              s"matcher regex uses (?P= / (?P' syntax, which RE2 (the reference dialect) does not support: $pattern")
        case _ =>
          out.append(c); i += 1
      }
    }
    out.toString
  }

  /** Reject constructs Java regex accepts but RE2 (the reference dialect)
    * rejects. Throws IllegalArgumentException naming the construct —
    * the analogue of the reference's compile-time matcher error. */
  def validateRe2(pattern: String): Unit = {
    var i = 0
    var inClass = false
    def fail(what: String): Nothing =
      throw new IllegalArgumentException(
        s"matcher regex uses $what, which RE2 (the reference dialect) does not support: $pattern")
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '\\' if i + 1 < pattern.length =>
          pattern.charAt(i + 1) match {
            case c if c >= '1' && c <= '9' && !inClass => fail(s"a backreference (\\$c)")
            case 'k' if !inClass => fail("a named backreference (\\k)")
            case 'Z' => fail("\\Z (Java: end-before-final-newline; RE2 has only \\z)")
            case 'G' => fail("\\G (end-of-previous-match)")
            case _ => ()
          }
          i += 2
        case '[' if !inClass =>
          inClass = true; i += 1
          if (i < pattern.length && pattern.charAt(i) == '^') i += 1
          if (i < pattern.length && pattern.charAt(i) == ']') i += 1 // leading ] is literal
        case ']' if inClass =>
          inClass = false; i += 1
        case '(' if !inClass && i + 1 < pattern.length && pattern.charAt(i + 1) == '?' =>
          val rest = pattern.substring(i + 2)
          if (rest.startsWith("=") || rest.startsWith("!")) fail("lookahead (?= / (?!")
          else if (rest.startsWith("<=") || rest.startsWith("<!")) fail("lookbehind (?<= / (?<!")
          else if (rest.startsWith(">")) fail("an atomic group (?>")
          i += 1
        case c if !inClass && (c == '*' || c == '+' || c == '?' || c == '}')
            && i + 1 < pattern.length && pattern.charAt(i + 1) == '+'
            // `}+` is only a quantifier if the `}` closes a repetition like
            // {2,3}; a bare `}` is a literal in both dialects. Cheap check:
            // there is a matching `{` before it.
            && (c != '}' || pattern.lastIndexOf('{', i) >= 0) =>
          fail(s"a possessive quantifier ($c+)")
        case _ => i += 1
      }
    }
  }

  def compileOne(labels: Column, m: Matcher): Column = {
    val v = labelValue(labels, m.name)
    m.matchType match {
      case MatchType.Eq  => v === m.value
      case MatchType.Neq => v =!= m.value
      case MatchType.Re  => validateRe2(m.value); v.rlike(anchored(m.value))
      case MatchType.Nre => validateRe2(m.value); !v.rlike(anchored(m.value))
    }
  }

  /** AND of all matchers; empty list => TRUE (match everything). */
  def compile(labels: Column, matchers: Seq[Matcher]): Column =
    matchers.map(compileOne(labels, _)).reduceOption(_ && _).getOrElse(lit(true))

  /** Driver-side evaluation against a plain label map — used by tests and
    * by the in-memory store variant (reference: storages/base/base.go:100-138).
    * Compiles the exact pattern string the Catalyst path uses. */
  def matches(labels: Map[String, String], matchers: Seq[Matcher]): Boolean =
    matchers.forall { m =>
      val v = labels.getOrElse(m.name, "")
      m.matchType match {
        case MatchType.Eq  => v == m.value
        case MatchType.Neq => v != m.value
        case MatchType.Re  => validateRe2(m.value); anchored(m.value).r.findFirstIn(v).isDefined
        case MatchType.Nre => validateRe2(m.value); anchored(m.value).r.findFirstIn(v).isEmpty
      }
    }
}
