package graft.functions

import graft.SparkTestBase

/** [[TextClean]] scope rules, each pinned on a targeted input: elements
  * dropped WITH content, bare `<` in prose surviving, the entity subset
  * with the `&amp;lt;` double-decode guard, control-char stripping, and
  * whitespace normalization. */
class TextCleanSpec extends SparkTestBase {

  import spark.implicits._

  private def clean(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextClean.cleanText($"t")).head.getString(0)

  test("script and style drop with their content, even with a bare <") {
    assert(clean("a<script>if (1 < 2) x()</script>b") === "ab")
    assert(clean("a<style type=\"x\">p < q { }</style>b") === "ab")
    assert(clean("a<SCRIPT>\nmulti\nline\n</SCRIPT>b") === "ab")
  }

  test("comments and tags drop; prose < survives") {
    assert(clean("<p>a</p><!-- no -->b<br/>") === "ab")
    assert(clean("1 < 2 and 3 > 2") === "1 < 2 and 3 > 2")
    assert(clean("<a href=\"x>y\">link</a>") === "y\">link")
  }

  test("entity subset decodes; &amp;lt; is the literal &lt;") {
    assert(clean("x &lt; y &gt; z &quot;q&quot; &#39;a&apos; b&nbsp;c") ===
      "x < y > z \"q\" 'a' b c")
    assert(clean("&amp;lt; &amp; &amp;amp;") === "&lt; & &amp;")
    assert(clean("&#169; stays") === "&#169; stays")
  }

  test("control chars strip; whitespace normalizes and trims") {
    assert(clean("  a\u0007b \t\n c\u0000d  ") === "ab cd")
    assert(clean("") === "")
    assert(clean("   ") === "")
  }
}
