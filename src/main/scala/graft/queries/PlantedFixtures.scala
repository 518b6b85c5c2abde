package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Planted deterministic fixtures for the hash-heuristic pipeline
  * operators (MinHash/SimHash/hyperplane-LSH, rolling hash,
  * multimodal) — the corpora behind their VALUES oracles.
  *
  * The design rule: every cluster's EXACT ground truth is computable
  * by hand, so the pinned oracle rows are independently checkable
  * rather than self-fulfilling. Word counts and edit positions are
  * chosen so the 3-shingle Jaccard values are exact small fractions:
  *
  *  - docs 1/2/3 ("cluster A"): 30 distinct words; doc2 edits the LAST
  *    word (kills 1 shingle → j(1,2) = 27/29 = 0.931); doc3 edits word
  *    10 (kills 3 shingles → j(1,3) = 25/31 ≈ 0.8065; j(2,3) = 24/32
  *    = 0.75). All ≥ 0.7 → three near-dup pairs.
  *  - docs 4/5 ("cluster B"): byte-identical → j = 1.0, SimHash
  *    hamming = 0, rolling hash equal.
  *  - docs 6/7 ("cluster C"): 40 words, 4 isolated edits → j = 26/50
  *    = 0.52 — inside a 0.5 threshold, outside 0.7.
  *  - doc 8: a word-level PERMUTATION of doc 4 — same token bag
  *    (sorted-token fingerprint equal) but different order (rolling
  *    hash differs): the order-sensitivity witness.
  *  - docs 100+ : unique-vocabulary fillers (no cross shingles).
  */
object PlantedFixtures {

  private val aWords = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
    "kilo lima mike november oscar papa quebec romeo sierra tango " +
    "uniform victor whiskey xray yankee zulu one two three four").split(" ").toSeq

  private val a1 = aWords.mkString(" ")
  private val a2 = (aWords.init :+ "edited").mkString(" ")
  private val a3 = aWords.updated(9, "changed").mkString(" ")

  private val bText = "pack my box with five dozen liquor jugs while the " +
    "quick onyx goblin jumps over a lazy dwarf tonight"
  // permutation of bText's tokens (same bag, different order)
  private val bPerm = bText.split(" ").sorted.mkString(" ")

  private val cWords = ("c01 c02 c03 c04 c05 c06 c07 c08 c09 c10 " +
    "c11 c12 c13 c14 c15 c16 c17 c18 c19 c20 " +
    "c21 c22 c23 c24 c25 c26 c27 c28 c29 c30 " +
    "c31 c32 c33 c34 c35 c36 c37 c38 c39 c40").split(" ").toSeq
  private val c1 = cWords.mkString(" ")
  private val c2 = cWords.updated(4, "x1").updated(14, "x2")
    .updated(24, "x3").updated(34, "x4").mkString(" ")

  private val corpusRows: Seq[(Long, String)] =
    Seq(
      1L -> a1, 2L -> a2, 3L -> a3,
      4L -> bText, 5L -> bText,
      6L -> c1, 7L -> c2,
      8L -> bPerm) ++
      (0 until 12).map(i => (100L + i) ->
        s"filler f${i}a f${i}b f${i}c f${i}d f${i}e f${i}f f${i}g f${i}h f${i}i f${i}j")

  /** (doc_id, text) corpus — see object scaladoc for the planted truth. */
  def docs(s: SparkSession): DataFrame = {
    import s.implicits._
    corpusRows.toDF("doc_id", "text")
  }

  /** The SAME corpus as a DuckDB `(VALUES ...) AS docs(doc_id, text)`
    * clause, so full re-derivation oracles (dd18's all-pairs Jaccard)
    * run against byte-identical inputs without a second copy of the
    * fixture to drift. Texts contain no quotes — plain '' inlining. */
  def docsValuesSql: String =
    corpusRows.map { case (id, t) =>
      require(!t.contains("'"), s"fixture text must be quote-free: $t")
      s"(CAST($id AS BIGINT), '$t')"
    }.mkString("(VALUES\n           ", ",\n           ", ") AS docs(doc_id, text)")

  /** Benchmark fixture for the contamination sweep: re-keyed copies of
    * cluster representatives 1/4/6 (bench ids 901/904/906), so every
    * cross-table Jaccard in the contamination report is one of the
    * hand-derived in-corpus values from the object scaladoc. */
  def benchDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(901L -> a1, 904L -> bText, 906L -> c1).toDF("bench_id", "text")
  }

  /** Repetition fixture — every metric value is a hand-derivable small
    * fraction (non-space chars are the denominators):
    *
    *  - doc 1 (24 chars, 3 lines, one line twice): dup-line 1 - 2/3 =
    *    0.3333; dup-line chars 16/24 = 0.6667; top bigram "aa bb" ×2 ×
    *    4 chars = 8/24 = 0.3333; dup trigrams ("aa bb cc", "bb cc dd")
    *    ×2 × 6 = 24/24 = 1.0.
    *  - doc 2 (21 chars, "foo bar" ×3 interleaved): no line repeats;
    *    top bigram 3 × 6 = 18/21 = 0.8571; dup trigrams 45/21 caps at
    *    1.0 (overlapping occurrences).
    *  - doc 3 (20 chars, five distinct 4-char words): zero repetition;
    *    top bigram is any single occurrence = 8/20 = 0.4; dup trigram 0.
    */
  def repetitionDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      1L -> "aa bb cc dd\naa bb cc dd\nee ff gg hh",
      2L -> "foo bar foo bar foo bar foo",
      3L -> "abcd efgh ijkl mnop qrst")
      .toDF("doc_id", "text")
  }

  /** Gopher-rule fixture: doc 1 passes every gate; docs 2-8 each sit on
    * the failing side of EXACTLY one rule (flag arithmetic in the
    * tx7 query's comment):
    *
    *  - 1: 62 six/three-char words incl. "the and" — all gates green.
    *  - 2: 10 words — word-count floor (50).
    *  - 3: fifty 2-char words + "the and" — mean word length 106/52 ≈
    *    2.04 < 3.
    *  - 4: the 60 base words without stopwords — < 2 distinct stopwords.
    *  - 5: doc 1's words in 8 "- "-prefixed lines — bullet fraction 1.
    *  - 6: doc 1's words in 8 lines, 3 ending "..." — ellipsis 3/8 >
    *    0.3 (symbol ratio 3/62 stays ≤ 0.1).
    *  - 7: doc 1 + 8 "#" tokens — symbol ratio 8/70 > 0.1.
    *  - 8: doc 1 + 16 numeric tokens — alpha-word 62/78 ≈ 0.795 < 0.8.
    */
  def gopherDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    val base = (1 to 60).map(i => f"word$i%02d")
    val cleanWords = base ++ Seq("the", "and")
    val clean = cleanWords.mkString(" ")
    val twoChar = (0 until 50).map(i =>
      s"${(97 + i % 26).toChar}${(97 + i / 26).toChar}")
    val lines8 = cleanWords.grouped(8).map(_.mkString(" ")).toSeq
    Seq(
      1L -> clean,
      2L -> "short doc with the and only ten words here now",
      3L -> (twoChar ++ Seq("the", "and")).mkString(" "),
      4L -> base.mkString(" "),
      5L -> lines8.map("- " + _).mkString("\n"),
      6L -> lines8.zipWithIndex.map { case (l, i) =>
        if (i < 3) l + "..." else l }.mkString("\n"),
      7L -> (clean + " " + Seq.fill(8)("#").mkString(" ")),
      8L -> (clean + " " + (100 until 116).map(_.toString).mkString(" ")))
      .toDF("doc_id", "text")
  }

  /** Embedding fixture, dim 8 (vec_id, embedding: Array[Float], label).
    *
    *  - ids 0/1/2 (label 0): positive scalar multiples of (2,1,0…) —
    *    pairwise cosine exactly 1.0, hyperplane signatures IDENTICAL
    *    by construction (signs of Σ±v_j are scale-invariant), so LSH
    *    bucketing can never separate them.
    *  - ids 3/4 (label 1): (0,0,9,10,0…) vs (0,0,10,9,0…) — cosine
    *    180/181 ≈ 0.9945: the near-dup that must survive a 0.95 gate.
    *  - ids 5/6 (label 2): cosine 1/√2 ≈ 0.7071 — below the gate.
    *  - ids 7-11 (label 3): scattered fillers, all pairwise cosines
    *    far from 1 (hand-checked ≤ 0.64 against every cluster).
    */
  val EmbFixtureDim = 8

  /** PQ fixture (ann9, PqSpec): dim 4 = 2 subspaces × 2, every vector
    * a combination of 4 INTEGER subvalues per subspace (16 vectors,
    * vec_id = a·4 + b → S(a) ++ T(b)). Integer components make the
    * whole chain bit-exact across engines: k-means centroids are
    * integer sums over identical points divided by their count (exact
    * in double, any partition order), so training recovers S and T
    * exactly, PQ reconstruction is lossless, and the ADC cosine equals
    * the true cosine double-for-double — which is what lets the ann9
    * oracle be DuckDB's EXACT cosine top-k over the same values. */
  val PqFixtureDim = 4
  val PqSubvaluesA: Seq[Seq[Double]] =
    Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(3.0, 4.0), Seq(2.0, 2.0))
  val PqSubvaluesB: Seq[Seq[Double]] =
    Seq(Seq(5.0, 0.0), Seq(0.0, 7.0), Seq(1.0, 1.0), Seq(4.0, 3.0))

  def pqVectors(s: SparkSession): DataFrame = {
    import s.implicits._
    (for (a <- 0 until 4; b <- 0 until 4) yield
      ((a * 4 + b).toLong,
        (PqSubvaluesA(a) ++ PqSubvaluesB(b)).map(_.toFloat)))
      .toDF("vec_id", "embedding")
  }

  /** RESIDUAL-PQ fixture (AnnSpec, ivfpq_adc_recall gauges): 16 vectors
    * in 4 planted clusters over dim 8 = 2 subspaces of 4. Member t of
    * cluster c is `40·e_c + 5·e_{(c+t) mod 4}` — cluster placement and
    * within-cluster offsets SHARE subspace 0, which is exactly where
    * raw-code PQ breaks: a k=4 subspace-0 codebook must spend all its
    * entries on the four 40-magnitude cluster directions, so every
    * member of a cluster collapses to one code and ADC cannot rank
    * within or across clusters by offset. The RESIDUALS, though, are
    * the SAME four vectors for every cluster (member − cluster mean =
    * 5·e_d − 1.25·(1,1,1,1) padded with zeros; the 40·e_c cancels), so
    * a k=4 residual codebook represents them exactly and residual ADC
    * equals true cosine. This is the anisotropic/clustered geometry the
    * IVFADC residual refinement exists for, planted so the lift is
    * deterministic. */
  val ResidualFixtureDim = 8
  def residualClusters(s: SparkSession): DataFrame = {
    import s.implicits._
    (for (c <- 0 until 4; t <- 0 until 4) yield {
      val v = Array.fill(ResidualFixtureDim)(0.0f)
      v(c) += 40.0f
      v((c + t) % 4) += 5.0f
      ((c * 4 + t).toLong, v.toSeq)
    }).toDF("vec_id", "embedding")
  }

  /** Anisotropic cross-subspace-correlated grid (OpqSpec's geometry,
    * shared here so the OPQ-rotated IVF-PQ spec + gauges measure the
    * same planted lift): x = (u, 0.6·v, u, 0.6·v) for u, v on an 8×8
    * grid with a deterministic jitter keeping rankings strict. An
    * axis-aligned m=2 split must describe a 2-D 64-point grid with 8
    * codes per subspace; the rotation OPQ learns maps the (x0+x2)/√2
    * and (x1+x3)/√2 directions into separate subspaces, making each
    * effectively 1-D with exactly 8 levels. The 0.6 scale keeps the
    * covariance spectrum non-degenerate (OpqSpec scaladoc). Shifted
    * +1 off the origin: the (0,0) corner would otherwise be the zero
    * vector, which cosine cell assignment can't place (a zero Lloyd
    * seed empties its cell) — the shift changes no covariance, so the
    * rotation geometry is identical. */
  val AnisotropicGridDim = 4
  def anisotropicGrid(s: SparkSession): DataFrame = {
    import s.implicits._
    val rows = for (u <- 0 until 8; v <- 0 until 8) yield {
      val id = (u * 8 + v).toLong
      val ju = (u + 1) + 0.013 * ((id * 7) % 5)
      val jv = 0.6 * ((v + 1) + 0.017 * ((id * 11) % 3))
      (id, Seq(ju, jv, ju, jv).map(_.toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  def embs(s: SparkSession): DataFrame = {
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    Seq(
      (0L, v(2, 1, 0, 0, 0, 0, 0, 0), 0),
      (1L, v(4, 2, 0, 0, 0, 0, 0, 0), 0),
      (2L, v(6, 3, 0, 0, 0, 0, 0, 0), 0),
      (3L, v(0, 0, 9, 10, 0, 0, 0, 0), 1),
      (4L, v(0, 0, 10, 9, 0, 0, 0, 0), 1),
      (5L, v(0, 0, 0, 0, 1, 1, 0, 0), 2),
      (6L, v(0, 0, 0, 0, 1, 0, 0, 0), 2),
      (7L, v(0, 0, 0, 0, 0, 0, 1, 0), 3),
      (8L, v(0, 0, 0, 0, 0, 0, 0, 1), 3),
      (9L, v(1, 0, 0, 0, 0, 0, 0, 1), 3),
      (10L, v(0, 1, 1, 0, 0, 0, 0, 0), 3),
      (11L, v(1, 1, 1, 1, 1, 1, 1, 1), 3))
      .toDF("vec_id", "embedding", "label")
  }

  /** Media fixture for the multimodal queries: ids 0-8, kind = id mod 3
    * (0→image, 1→audio, 2→video). Image payloads are REAL PNGs with
    * width 16+id, height 20+2·id (ids 0/3/6 → 16×20, 19×26, 22×32);
    * audio/video payloads are utf8 text whose LENGTHS are pinned
    * (video ids 2/5/8 → 20/45/100 bytes → stub frame counts 50/75/130
    * → 5/8/13 sampled frames at stride 10). */
  /** Multi-paragraph docs for ch2 (the real `documents` text is
    * single-line, so paragraph structure must be planted): known
    * per-paragraph token counts → hand-derivable chunk boundaries at
    * budget 8. Doc 2 is ONE oversize paragraph (kept whole), doc 3
    * leads with whitespace-only paragraphs (dropped), doc 4 is null
    * (no rows), doc 5's paragraphs are separated by a 4-newline gap
    * (one separator, not two). */
  def paraDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (1L, "a1 a2 a3 a4\n\nb1 b2 b3 b4 b5\n\nc1 c2 c3"),
      (2L, (1 to 20).map(i => s"t$i").mkString(" ")),
      (3L, "  \n\n\t\n\np31 p32"),
      (5L, "x1 x2\n\n\n\ny1 y2 y3"))
      .toDF("doc_id", "text")
      .union(Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text"))
  }

  /** Labeled quality-classifier fixture (qc1): 12 "good" docs (ids
    * 1-12, label 1 — prose built from a shared scholarly core vocab:
    * study/analysis/method/results/evidence/…) and 12 "bad" docs (ids
    * 13-24, label 0 — spam built from buy/cheap/click/free/bonus/
    * casino/…). The two core vocabularies are disjoint, so the classes
    * are linearly separable in hashed-BoW space; function words
    * ("the", "now", "for") deliberately appear in BOTH classes so
    * training has something to learn to ignore. The declared query
    * trains on the EVEN ids only and predicts ALL 24 — every odd doc
    * shares ≥8 core tokens with its class's training half, so the
    * pinned oracle (pred == true label) is a genuine held-out
    * generalization gate, not train-set recall. */
  def labeledDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    val good = Seq(
      "the study shows that the method works well and the analysis explains the results clearly",
      "careful analysis of the data shows the approach holds up in every measured detail",
      "the results are consistent with the evidence and the findings are explained clearly",
      "we measured the method against strong baselines and the study reports the findings in detail",
      "the approach is simple and the evidence shows it works well on real data",
      "this section explains the analysis carefully and presents the measured results",
      "the findings of the study are clear because the method was evaluated carefully",
      "strong evidence supports the approach and the results hold across the data",
      "the analysis shows the method scales well and the study explains why",
      "detailed results and careful evidence make the findings of this study convincing",
      "the data supports the approach and the measured results are explained in detail",
      "clear analysis and strong evidence show that the method performs well")
    val bad = Seq(
      "buy cheap deals now click here for free bonus money and fast prizes",
      "win big money fast at the casino click now for your free bonus offer",
      "limited offer buy now cheap prices free shipping click here to win",
      "free money guaranteed click here now to claim your casino bonus prize",
      "cheap cheap deals buy now win money fast free offer click here",
      "claim your prize now free bonus guaranteed win money at the casino",
      "click here buy cheap win fast money free bonus limited casino deals",
      "fast cash now free prize guaranteed cheap offer click to win big",
      "big casino bonus free money click now buy cheap win guaranteed offer",
      "now now now click here free money cheap deals win fast bonus",
      "guaranteed prize offer buy cheap click here fast free casino money",
      "win free money now cheap bonus click here guaranteed fast deals offer")
    (good.zipWithIndex.map { case (t, i) => (i + 1L, t, 1) } ++
      bad.zipWithIndex.map { case (t, i) => (i + 13L, t, 0) })
      .toDF("doc_id", "text", "label")
  }

  def mediaDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    def text(n: Int): String = ("x" * (n - 1)) + "y"
    Seq(
      (0L, "png"), (3L, "png"), (6L, "png"),
      (1L, text(10)), (4L, text(15)), (7L, text(25)),
      (2L, text(20)), (5L, text(45)), (8L, text(100)))
      .toDF("doc_id", "text")
  }

  /** HTML-extraction fixture (tx11) — each doc exercises exactly one
    * contract of HtmlExtract, and every expected output is derivable by
    * reading the markup (defaults: minLineChars 20, maxLinkDensity 0.5):
    *
    *  - 1: full page. Script (containing a bare `<`), style, title
    *    ("My Site", 7 chars < 20), nav ("Home About Contact", 18 < 20)
    *    and the footer link list ("Terms of Service Privacy Policy",
    *    31 chars but ALL from anchors → density 1.0) all drop; the one
    *    prose div (64 chars, 0 link chars) survives; "OK" (2 < 20)
    *    drops.
    *  - 2: two paragraphs with inline markup + entities — both kept,
    *    `<b>` unwrapped, `&amp;`→`&`, `&quot;`→`"`, `&nbsp;`→space.
    *  - 3: an HTML comment hiding a fake paragraph (must never leak)
    *    + one prose paragraph with an inline link ("full guide" = 10
    *    link chars of 53 → density 0.19, kept).
    *  - 4: pure link farm — both `li` lines are 100% anchor text →
    *    empty extraction (empty string, not null; 0 lines).
    *  - 5: plain text, no markup — passes through verbatim.
    */
  def htmlDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      1L -> ("""<html><head><title>My Site</title><script type="text/javascript">""" +
        """var x = 1; if (x < 2) { x = 3; }</script><style>.a { color: red; }</style>""" +
        """</head><body><nav><a href="/">Home</a> <a href="/about">About</a> """ +
        """<a href="/contact">Contact</a></nav><div>The quick brown fox jumps over """ +
        """the lazy dog near the river bank.</div><p>OK</p><footer>""" +
        """<a href="/tos">Terms of Service</a> <a href="/privacy">Privacy Policy</a>""" +
        """</footer></body></html>"""),
      2L -> ("""<body><p>Fish &amp; chips cost seven pounds at the <b>old corner """ +
        """shop</b> today.</p><p>She said &quot;hello there&quot; and """ +
        """waved&nbsp;goodbye from the train platform.</p></body>"""),
      3L -> ("""<div><!-- <p>Buy cheap pills online now at our pharmacy store</p> -->""" +
        """<p>Read the <a href="/guide">full guide</a> for details on the setup """ +
        """process.</p></div>"""),
      4L -> ("""<ul><li><a href="/a">first category page with many words</a></li>""" +
        """<li><a href="/b">second category page with many words</a></li></ul>"""),
      5L -> "Plain text documents pass through the extractor completely unchanged.")
      .toDF("doc_id", "html")
  }
}
