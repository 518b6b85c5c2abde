package graft

import graft.operators.Drift

/** Hand-derived divergence arithmetic behind the pf3 oracle: PSI and
  * JSD on tiny frames where every fraction is an exact quarter, plus
  * the smoothing/empty/binning edges a re-derivation oracle shares
  * with the implementation and therefore cannot catch alone. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def cat1(vals: String*) = vals.map(Tuple1(_)).toDF("k")

  private def report(ref: org.apache.spark.sql.DataFrame,
      cur: org.apache.spark.sql.DataFrame) =
    Drift.driftReport(ref, cur, numeric = Nil, categorical = Seq("k"))
      .select("col_name", "n_ref", "n_cur", "psi", "jsd", "verdict")
      .as[(String, Long, Long, Double, Double, String)].collect().toSeq

  test("identical snapshots: psi = jsd = 0, stable") {
    val d = cat1("A", "A", "B")
    report(d, d) shouldBe Seq(("k", 3L, 3L, 0.0, 0.0, "stable"))
  }

  test("hand-derived quarter shift: p=(.5,.5) vs q=(.25,.75)") {
    // PSI = .25·ln2 − .25·ln(2/3) = 0.1732868 + 0.1013663 = 0.2746531
    // JSD = ((.5·ln(4/3) + .25·ln(2/3)) + (.5·ln(.8) + .75·ln(1.2)))/2
    //     = 0.0212374 + 0.0125847 = 0.0338221
    report(cat1("A", "A", "B", "B"), cat1("A", "B", "B", "B")) shouldBe
      Seq(("k", 4L, 4L, 0.2747, 0.0338, "shifted"))
  }

  test("disjoint supports: PSI = 2·(1−ε)·ln(1/ε) at ε=1e-6; JSD = ln 2") {
    // per key: (1 − 1e-6)·ln(1e6) = 13.815497; two keys → 27.630994
    report(cat1("A"), cat1("B")) shouldBe
      Seq(("k", 1L, 1L, 27.631, 0.6931, "shifted"))
  }

  test("moderate band: psi in [0.1, 0.25) verdicts 'moderate'") {
    // p=(.5,.5), q=(.35,.65): PSI = .15·ln(10/7) − .15·ln(10/13)
    //   = .15·(0.3566749 + 0.2623643) = 0.0928559 → stable (just under)
    // p=(.5,.5), q=(.3,.7):  PSI = .2·ln(5/3) − .2·ln(5/7)
    //   = .2·(0.5108256 + 0.3364722) = 0.1694596 → moderate
    val ref = cat1(Seq.fill(10)("A") ++ Seq.fill(10)("B"): _*)
    val curStable = cat1(Seq.fill(7)("A") ++ Seq.fill(13)("B"): _*)
    val curMod = cat1(Seq.fill(6)("A") ++ Seq.fill(14)("B"): _*)
    report(ref, curStable).head._6 shouldBe "stable"
    val mod = report(ref, curMod).head
    mod._4 shouldBe 0.1695
    mod._6 shouldBe "moderate"
  }

  test("numeric floor-binning groups like Profile.histogram; nulls dropped") {
    val ref = Seq(Some(0L), Some(9L), Some(10L), None).toDF("v")
    val cur = Seq(Some(5L), Some(19L), Some(12L), Some(3L)).toDF("v")
    // bins ref: {0:2, 1:1} p=(2/3,1/3); cur: {0:2, 1:2} q=(.5,.5)
    // PSI = (2/3−.5)·ln(4/3) + (1/3−.5)·ln(2/3)
    //     = 0.1666667·0.2876821 + 0.1666667·0.4054651 = 0.1155245
    val out = Drift.driftReport(ref, cur, numeric = Seq("v" -> 10L),
        categorical = Nil)
      .select("col_name", "n_ref", "n_cur", "psi", "verdict")
      .as[(String, Long, Long, Double, String)].collect().toSeq
    out shouldBe Seq(("v", 3L, 4L, 0.1155, "moderate"))
  }

  test("multi-column one-pass report: each column rows independently") {
    val ref = Seq((1L, "x"), (2L, "x")).toDF("v", "k")
    val cur = Seq((1L, "x"), (2L, "x")).toDF("v", "k")
    val out = Drift.driftReport(ref, cur, numeric = Seq("v" -> 1L),
        categorical = Seq("k"))
      .orderBy("col_name")
      .select("col_name", "psi", "verdict")
      .as[(String, Double, String)].collect().toSeq
    out shouldBe Seq(("k", 0.0, "stable"), ("v", 0.0, "stable"))
  }

  test("duplicate column spec fails loudly") {
    val d = cat1("A")
    an[IllegalArgumentException] should be thrownBy
      Drift.driftReport(d, d, numeric = Seq("k" -> 1L), categorical = Seq("k"))
  }
}
