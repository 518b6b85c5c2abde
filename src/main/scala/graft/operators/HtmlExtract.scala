package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Main-content extraction from raw HTML — the WARC→WET stage every
  * web-scale training corpus runs BEFORE the text-quality family
  * (tx1-tx10): strip script/style/comments, break the markup into
  * block-level lines, then keep only lines that look like prose by the
  * jusText/Arc90-style density heuristics (enough text, low link
  * density). Boilerplate chrome — navigation, link lists, footers — is
  * exactly the text whose characters live inside anchors, so a per-line
  * link-density gate removes it without any DOM build.
  *
  * Everything here is native Spark SQL expressions (regexp + the
  * higher-order array functions): per row it is one codegen'd map — no
  * UDF, no shuffle, no driver state — so the operator rides inside the
  * scan's own pipeline at any corpus size, exactly like the tx family
  * it feeds.
  *
  * This is a HEURISTIC extractor (as the production ones are): no DOM,
  * no CSS visibility, no charset sniffing (input is already a decoded
  * string column). The planted-fixture oracle (tx11) pins the
  * contract: scripts/styles/comments never leak, block tags split
  * lines, entities decode, link-farm lines drop, prose survives
  * verbatim.
  */
object HtmlExtract {

  /** Tags removed WITH their content: what they wrap is never prose. */
  private val ContainerRe =
    "(?is)<(script|style|noscript|svg|iframe)\\b[^>]*>.*?</\\1\\s*>"

  private val CommentRe = "(?s)<!--.*?-->"

  /** Block-level (and document-structure) tags: each occurrence is a
    * line boundary, mirroring how a renderer breaks the text flow.
    * Inline tags (a, b, i, em, span, …) stay inside their line. */
  private val BlockRe =
    "(?i)</?(html|head|body|title|p|div|br|hr|h[1-6]|li|ul|ol|dl|dt|dd|" +
      "tr|td|th|table|thead|tbody|caption|section|article|aside|main|" +
      "header|footer|nav|blockquote|pre|form|fieldset|figure|figcaption)\\b[^>]*/?>"

  /** Anchor inner text (group 1) — the numerator of link density. */
  private val AnchorRe = "(?is)<a\\b[^>]*>(.*?)</a\\s*>"

  /** The entities that dominate real pages. `&amp;` decodes LAST so
    * `&amp;lt;` yields the literal `&lt;` (never double-decodes), and
    * decode runs AFTER tag stripping so a decoded `<` can never form a
    * fake tag. */
  private def decodeEntities(c: Column): Column =
    Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (ent, ch)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(ent),
          java.util.regex.Matcher.quoteReplacement(ch))
      }

  /** Rendered text of a markup fragment: tags → space, entities
    * decoded, whitespace collapsed, trimmed. */
  private def rendered(c: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_replace(c, "<[^>]*>", " ")), "\\s+", " "))

  /** The content lines of `html` as an array, in document order. A
    * line survives when its rendered text has at least `minLineChars`
    * characters AND at most `maxLinkDensity` of them came from inside
    * anchors. */
  def contentLines(html: Column, minLineChars: Int = 20,
                   maxLinkDensity: Double = 0.5): Column = {
    require(minLineChars >= 1, s"minLineChars must be >= 1: $minLineChars")
    require(maxLinkDensity >= 0 && maxLinkDensity <= 1,
      s"maxLinkDensity must be in [0,1]: $maxLinkDensity")
    val noContainers = regexp_replace(
      regexp_replace(html, ContainerRe, " "), CommentRe, " ")
    // SOURCE whitespace (the line-wrapping of the markup file) renders
    // as plain spaces — only BLOCK TAGS break the text flow, exactly
    // like a renderer. Collapse it BEFORE the block split, or a
    // paragraph wrapped across source lines shreds into fragments that
    // fail minLineChars one by one (review r17 #1). Heuristic cost:
    // <pre> content loses its hard newlines, like the production
    // line-density extractors.
    val unwrapped = regexp_replace(noContainers, "[\\r\\n\\t]+", " ")
    val rawLines = split(regexp_replace(unwrapped, BlockRe, "\n"), "\n")
    val scored = transform(rawLines, l =>
      struct(
        rendered(l).as("text"),
        length(rendered(array_join(
          regexp_extract_all(l, lit(AnchorRe), lit(1)), " "))).as("link_chars")))
    val kept = filter(scored, s =>
      length(s.getField("text")) >= minLineChars &&
        // link chars are counted over the joined anchor texts (one
        // separating space per extra anchor), so pure link lists hit
        // density ~1 even when rendered with spaces between links
        s.getField("link_chars") <=
          lit(maxLinkDensity) * length(s.getField("text")))
    transform(kept, _.getField("text"))
  }

  /** Extracted main text: surviving lines joined by newline. Empty
    * string (never null for non-null input) when every line was
    * boilerplate — same contract as Dedup.dropRepeatedLines. */
  def extractText(html: Column, minLineChars: Int = 20,
                  maxLinkDensity: Double = 0.5): Column =
    array_join(contentLines(html, minLineChars, maxLinkDensity), "\n")
}
