package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic laws over the operator surface (SURVEY.md §5.3). Uses
  * scalacheck generators with fixed seeds (scalatestplus isn't in the
  * offline cache, so sampling is driven by hand); bounded sizes keep each
  * property sub-second.
  */
class PropertySpec extends GraftSuite {

  import TestSpark.spark.implicits._

  /** Deterministic samples from a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val smallLists = Gen.listOfN(30, Gen.chooseNum(0, 9))

  test("union_all count additivity; except/intersect partition the left side") {
    for ((a, b) <- samples(smallLists, 5).zip(samples(smallLists, 5).reverse)) {
      val da = a.toDF("x"); val db = b.toDF("x")
      assert(da.unionAll(db).count() == a.size + b.size)
      // |A| = |A except_all B| + |A intersect_all B| (multiset identity)
      val ex = da.exceptAll(db).count()
      val in = da.intersectAll(db).count()
      assert(ex + in == a.size.toLong)
    }
  }

  test("exact dedup is idempotent and keeps one row per key") {
    for (a <- samples(smallLists, 5)) {
      val d = a.toDF("x")
      val once = d.dropDuplicates("x")
      assert(once.count() == a.distinct.size.toLong)
      assert(once.dropDuplicates("x").count() == once.count())
    }
  }

  test("windowed running sum totals the groupBy sum") {
    val gen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0, 4), Gen.chooseNum(-50, 50)))
    for (rows <- samples(gen, 3) if rows.nonEmpty) {
      val df = rows.zipWithIndex.map { case ((k, v), i) => (k, v, i) }.toDF("k", "v", "seq")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"k").orderBy($"seq")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val lastRunning = df.withColumn("rs", sum($"v").over(w))
        .groupBy($"k").agg(max(struct($"seq", $"rs")).getField("rs").as("total"))
      val direct = df.groupBy($"k").agg(sum($"v").as("total2"))
      assert(lastRunning.join(direct, "k")
        .where(col("total") =!= col("total2")).count() == 0)
    }
  }

  test("minhash Jaccard estimate concentrates around the true value") {
    // signature agreement fraction ≈ Jaccard; k=128 ⇒ sd ≈ 0.044
    val pairs = Seq(
      ("aaaabbbbccccddddeeee", "aaaabbbbccccddddeeee"), // J = 1
      ("aaaabbbbccccddddeeee", "aaaabbbbccccddddzzzz"),
      ("abcdefghijklmnopqrst", "zzzzzzzzzzzzzzzzzzzz")) // J ≈ 0
    val df = pairs.toDF("ta", "tb")
      .withColumn("ga", expr("array_distinct(transform(sequence(1, greatest(length(ta)-4, 1)), i -> substring(ta, i, 5)))"))
      .withColumn("gb", expr("array_distinct(transform(sequence(1, greatest(length(tb)-4, 1)), i -> substring(tb, i, 5)))"))
      .withColumn("trueJ",
        size(array_intersect($"ga", $"gb")).cast("double") / size(array_union($"ga", $"gb")))
      .withColumn("sa", expr("transform(sequence(0, 127), h -> array_min(transform(ga, s -> xxhash64(s, h))))"))
      .withColumn("sb", expr("transform(sequence(0, 127), h -> array_min(transform(gb, s -> xxhash64(s, h))))"))
      .withColumn("estJ",
        expr("aggregate(zip_with(sa, sb, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), 0, (a, v) -> a + v)") / 128.0)
    for (r <- df.select($"trueJ", $"estJ").collect()) {
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.2,
             s"estimate ${r.getDouble(1)} far from true ${r.getDouble(0)}")
    }
  }

  test("asof-join emulation picks the latest quote at or before each trade") {
    // hand-computed fixture incl. an exact-tie (quote ts == trade ts → taken)
    val events = Seq(
      (1L, "2024-01-01 10:00:00", 9L, "view", 1.0),
      (2L, "2024-01-01 10:05:00", 9L, "click", 2.0),
      (3L, "2024-01-01 10:05:00", 9L, "purchase", 0.0), // tie with quote 2
      (4L, "2024-01-01 10:10:00", 9L, "purchase", 0.0),
      (5L, "2024-01-01 09:00:00", 8L, "purchase", 0.0)  // user with no quote
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val tmp = java.nio.file.Files.createTempDirectory("graft_asof").toString
    events.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("join_asof")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(out == Map(3L -> 2.0, 4L -> 2.0), s"got $out") // trade 5 has no quote → excluded
  }
}
