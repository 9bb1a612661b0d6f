package graft

import org.apache.spark.sql.functions._

/** End-to-end invariants of the training-corpus pipeline unit
  * (plans.CorpusCurationJob): dedup really removes the planted near-dups,
  * nothing is silently dropped (soft weights conserve the corpus mass),
  * the split is leakage-safe by construction, shards balance, and the
  * whole run is deterministic under re-execution — the reproducibility
  * property a 100 TB corpus rebuild depends on.
  */
class CorpusCurationJobSpec extends GraftSuite {
  import plans.CorpusCurationJob._

  private def runStages() = {
    val raw = normalize(T.documents(spark, sf))
    val kept = raw.where(qualityGate)
    val exact = dedupExact(kept).cache()
    val comps = nearDupComponents(exact)
    val weights = comps.groupBy(col("rep")).agg(count(lit(1)).as("sample_weight"))
    val unique = exact
      .join(weights.withColumnRenamed("rep", "doc_id"), Seq("doc_id"))
      .withColumn("split", splitOf(col("doc_id")))
    (raw, kept, exact, comps, shardSequences(packSequences(unique)))
  }

  test("curation pipeline: accounting, dedup completeness, determinism") {
    val (raw, kept, exact, comps, packed) = runStages()
    val nRaw = raw.count()
    val nKept = kept.count()
    val nExact = exact.count()
    val nOut = packed.count()
    // accounting: each stage only removes rows, none lost to bugs
    assert(nRaw >= nKept && nKept >= nExact && nExact >= nOut)
    assert(nOut > 0)
    // exact dedup: normalized text is unique afterwards
    assert(exact.select(col("norm_text")).distinct().count() == nExact)
    // soft dedup conserves mass: cluster weights partition the corpus
    assert(packed.agg(sum(col("sample_weight"))).head.getLong(0) == nExact,
      "sample weights must sum to the pre-near-dedup doc count")
    // near-dup completeness: no surviving pair with word-3-gram J >= 0.8
    val grams = packed.select(col("doc_id"),
      expr("""array_distinct(transform(
             |  sequence(1, greatest(size(split(norm_text, ' ')) - 2, 1)),
             |  i -> array_join(slice(split(norm_text, ' '), i, 3), ' ')))""".stripMargin).as("g"))
    val survivors = grams.as("a")
      .join(grams.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("common", size(array_intersect(col("a.g"), col("b.g"))))
      .where(col("common").cast("double") /
             (size(col("a.g")) + size(col("b.g")) - col("common")) >= 0.8)
    assert(survivors.count() == 0, "near-duplicate pair survived curation")
    // leakage safety: every member of a component inherits its rep's
    // split, so no >= tau pair can straddle a boundary by construction
    val straddle = comps.withColumn("member_split", splitOf(col("rep")))
      .join(packed.select(col("doc_id").as("rep"), col("split")), Seq("rep"))
      .where(col("member_split") =!= col("split"))
    assert(straddle.count() == 0, "component member split diverged from its representative")
    // packs respect the budget for multi-doc packs (a single oversized doc
    // may exceed it; it still gets its own pack)
    val over = packed.groupBy(col("lang"), col("pack_id"))
      .agg(sum(col("n_tokens")).as("t"), count(lit(1)).as("n"))
      .where(col("n") > 1 && col("t") > 2048 + 600) // one doc of slack
    assert(over.count() == 0, "multi-doc pack blew the token budget")
    // split purity (ADVICE r15): a pack is the loader's training-sequence
    // unit and a shard is what a trainer mounts — neither may span two
    // splits, or test docs leak into training despite correct per-doc
    // split labels. Asserted at the (lang, id) grain: the id ALONE must
    // name a pure unit (the split index is folded into it), so purity
    // cannot be lost by a consumer that ignores the split column.
    val packSplits = packed.groupBy(col("lang"), col("pack_id"))
      .agg(countDistinct(col("split")).as("ns")).where(col("ns") > 1)
    assert(packSplits.count() == 0, "a 2048-token pack mixed train/val/test docs")
    val shardMix = packed.groupBy(col("lang"), col("shard"))
      .agg(countDistinct(col("split")).as("ns")).where(col("ns") > 1)
    assert(shardMix.count() == 0, "a loader shard mixed train/val/test docs")
    // serpentine balance holds within each (lang, split) deal
    val shards = packed.groupBy(col("lang"), col("split"), col("shard"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("lang"), col("split")).agg((max(col("n")) - min(col("n"))).as("spread"))
    assert(shards.where(col("spread") > 1).count() == 0,
      "serpentine deal must keep per-(lang, split) shard doc counts within 1")
    // determinism: a full re-run reproduces the same curated rows
    val (_, _, _, _, packed2) = runStages()
    assert(packed.select("doc_id", "pack_id", "shard", "split", "sample_weight").exceptAll(
             packed2.select("doc_id", "pack_id", "shard", "split", "sample_weight")).isEmpty,
           "re-run diverged — curation must be content-keyed, not random")
  }
}
