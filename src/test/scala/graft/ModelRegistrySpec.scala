package graft

import graft.operators.{ModelRegistry, Snapshot}

class ModelRegistrySpec extends SparkSpec {

  private def fresh() =
    TempDirs.path(s"registry-spec/${java.util.UUID.randomUUID()}")

  test("register → latest → history → pinned time travel") {
    val path = fresh()
    ModelRegistry.register(spark, path, "clf", "logreg", "spec-v1", 0L) shouldBe true
    val v1 = Snapshot.latestVersion(spark, path).get
    ModelRegistry.register(spark, path, "clf", "logreg", "spec-v2", 1L) shouldBe true
    // a second, unrelated model shares the registry
    ModelRegistry.register(spark, path, "tok", "bpe", "merges-v1", 2L) shouldBe true

    ModelRegistry.latestSpec(spark, path, "clf") shouldBe "spec-v2"
    ModelRegistry.latestSpec(spark, path, "tok") shouldBe "merges-v1"
    ModelRegistry.specAt(spark, path, "clf", v1) shouldBe "spec-v1"
    ModelRegistry.history(spark, path, "clf")
      .select("spec").collect().map(_.getString(0)).toSeq shouldBe
      Seq("spec-v2", "spec-v1")
  }

  test("a retried run id never replaces the committed model") {
    val path = fresh()
    ModelRegistry.register(spark, path, "m", "k", "good", 0L) shouldBe true
    ModelRegistry.register(spark, path, "m", "k", "corrupt-retry", 0L) shouldBe false
    ModelRegistry.latestSpec(spark, path, "m") shouldBe "good"
  }

  test("missing models fail loudly; retention retires old runs", Slow) {
    val path = fresh()
    ModelRegistry.register(spark, path, "m", "k", "v0", 0L)
    intercept[IllegalStateException] {
      ModelRegistry.latestSpec(spark, path, "ghost")
    }.getMessage should include("ghost")
    ModelRegistry.register(spark, path, "m", "k", "v1", 1L)
    ModelRegistry.register(spark, path, "m", "k", "v2", 2L)
    Snapshot.keepLast(spark, path, n = 1) shouldBe Seq(0L, 1L)
    ModelRegistry.history(spark, path, "m").count() shouldBe 1L
    ModelRegistry.latestSpec(spark, path, "m") shouldBe "v2"
  }
}
