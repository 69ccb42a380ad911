package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(s: String): String =
    Seq(Tuple1(s)).toDF("h").select(Html.extractText(col("h"))).head().getString(0)

  test("script/style payloads are dropped WITH their content") {
    assert(extract("<p>keep</p><script>var x = '<b>not text</b>';</script><p>also</p>")
      == "keep also")
    assert(extract("a<style media=\"x\">.c { color: red }</style>b") == "a b")
    // multiline payloads (dot-all)
    assert(extract("x<script>\nline1\nline2\n</script>y") == "x y")
  }

  test("tags strip, entities decode once, whitespace collapses") {
    assert(extract("<div class=\"x\"><b>Tom</b> &amp; co</div>") == "Tom & co")
    assert(extract("a &lt;tag&gt; b&nbsp;c &quot;d&quot; &#39;e&apos;")
      == "a <tag> b c \"d\" 'e'")
    // one decode level: &amp;lt; is the literal string "&lt;", not "<"
    assert(extract("x &amp;lt; y") == "x &lt; y")
    assert(extract("a\n\n  b\t c") == "a b c")
  }

  test("plain text passes through; malformed markup degrades to stripped-as-seen") {
    assert(extract("no markup here") == "no markup here")
    assert(extract("<p>unclosed") == "unclosed")
    // an unpaired "<" never closes, so TagPattern can't fire on it — bare
    // comparisons survive (leftmost "<" with a later ">" WOULD be eaten;
    // that's the stripped-as-seen boundary, pinned here)
    assert(extract("stray bracket and a < b comparison") ==
      "stray bracket and a < b comparison")
    assert(extract("a < b but c > d") == "a d")
  }
}
