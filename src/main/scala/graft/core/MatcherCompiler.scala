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
  *  - `=~` / `!~` regexes are fully anchored: `^(?:value)$`;
  *  - the matcher list is a conjunction (AND);
  *  - an EMPTY matcher list matches everything — the reference's bulk-export
  *    extension beyond PromQL (base.go:100-138, storages_test.go:264-356).
  *
  * Dialect note: the reference compiles Go RE2; we use Java regex via
  * `rlike`. The corpora in the test suite pin the common subset; RE2-only
  * constructs (e.g. no backrefs) do not arise in matcher values.
  */
object MatcherCompiler {

  /** Value of `labels[name]` with the missing≡"" rule applied. */
  def labelValue(labels: Column, name: String): Column =
    coalesce(labels.getItem(name), lit(""))

  def compileOne(labels: Column, m: Matcher): Column = {
    val v = labelValue(labels, m.name)
    m.matchType match {
      case MatchType.Eq  => v === m.value
      case MatchType.Neq => v =!= m.value
      case MatchType.Re  => v.rlike("^(?:" + m.value + ")$")
      case MatchType.Nre => !v.rlike("^(?:" + m.value + ")$")
    }
  }

  /** AND of all matchers; empty list => TRUE (match everything). */
  def compile(labels: Column, matchers: Seq[Matcher]): Column =
    matchers.map(compileOne(labels, _)).reduceOption(_ && _).getOrElse(lit(true))

  /** Driver-side evaluation against a plain label map — used by tests and
    * by the in-memory store variant (reference: storages/base/base.go:100-138). */
  def matches(labels: Map[String, String], matchers: Seq[Matcher]): Boolean =
    matchers.forall { m =>
      val v = labels.getOrElse(m.name, "")
      m.matchType match {
        case MatchType.Eq  => v == m.value
        case MatchType.Neq => v != m.value
        case MatchType.Re  => ("^(?:" + m.value + ")$").r.findFirstIn(v).isDefined
        case MatchType.Nre => ("^(?:" + m.value + ")$").r.findFirstIn(v).isEmpty
      }
    }
}
