package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Raw-web text cleaning — the step-zero operators of a training-data
  * pipeline (HTML → text before any quality/dedup signal runs). Pure
  * codegen'd `regexp_replace`/`replace` compositions: no UDFs, map-side,
  * linear in the scan.
  *
  * Every pattern is written in the Java/RE2 COMMON dialect — `(?is)`
  * flags, non-greedy `.*?`, explicit char classes, NO backreferences or
  * lookarounds (RE2 has neither) — so the DuckDB oracles run the same
  * regexes verbatim ([[graft.queries.TextQueries]] precedent).
  *
  * Scope (documented subset, like the gjson filter scope):
  *  - `<script>`/`<style>` elements drop WITH their content (one pass
  *    per element name — a backreference `</\1>` would not be RE2-safe);
  *  - comments and tags drop; a tag must open with `[a-zA-Z/!]`, so a
  *    bare `<` in prose ("a < b") survives;
  *  - the named entities `&lt; &gt; &quot; &#39; &apos; &nbsp;` decode,
  *    and `&amp;` decodes LAST — `&amp;lt;` yields the literal `&lt;`,
  *    never `<` (the standard double-decode guard). Other numeric
  *    entities pass through untouched.
  */
object TextClean {

  /** C0 control chars (minus the whitespace ones) + DEL. */
  val ControlPattern = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"

  def removeControlChars(text: Column): Column =
    regexp_replace(text, ControlPattern, "")

  /** Collapse whitespace runs to one space and trim the ends. */
  def normalizeWhitespace(text: Column): Column =
    regexp_replace(
      regexp_replace(text, TextHash.WsRegex, " "),
      "^ +| +$", "")

  private val DropWithContent = Seq("script", "style")

  def stripHtml(text: Column): Column = {
    val noElems = DropWithContent.foldLeft(text)((c, el) =>
      regexp_replace(c, s"(?is)<$el\\b[^>]*>.*?</$el>", ""))
    val noComments = regexp_replace(noElems, "(?s)<!--.*?-->", "")
    val noTags = regexp_replace(noComments, "(?s)<[a-zA-Z/!][^>]*>", "")
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
  }

  /** The composed step-zero cleaner: drop script/style/comments/tags,
    * decode the entity subset, strip control chars, normalize
    * whitespace. */
  def cleanText(text: Column): Column =
    normalizeWhitespace(removeControlChars(stripHtml(text)))
}
