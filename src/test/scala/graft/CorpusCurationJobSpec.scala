package graft

import org.apache.spark.sql.functions._

/** End-to-end invariants of the training-corpus pipeline unit
  * (plans.CorpusCurationJob): dedup really removes the planted near-dups,
  * nothing is silently dropped, and the whole run is deterministic under
  * re-execution — the reproducibility property a 100 TB corpus rebuild
  * depends on.
  */
class CorpusCurationJobSpec extends GraftSuite {
  import plans.CorpusCurationJob._

  private def runStages() = {
    val raw = normalize(T.documents(spark, sf))
    val kept = raw.where(qualityGate)
    val exact = dedupExact(kept).cache()
    val victims = nearDupVictims(exact)
    val unique = exact.join(victims, Seq("doc_id"), "left_anti")
    (raw, kept, exact, packSequences(unique))
  }

  test("curation pipeline: accounting, dedup completeness, determinism") {
    val (raw, kept, exact, packed) = runStages()
    val nRaw = raw.count()
    val nKept = kept.count()
    val nExact = exact.count()
    val nOut = packed.count()
    // accounting: each stage only removes rows, none lost to bugs
    assert(nRaw >= nKept && nKept >= nExact && nExact >= nOut)
    assert(nOut > 0)
    // exact dedup: normalized text is unique afterwards
    assert(exact.select(col("norm_text")).distinct().count() == nExact)
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
    // packs respect the budget for multi-doc packs (a single oversized doc
    // may exceed it; it still gets its own pack)
    val over = packed.groupBy(col("lang"), col("pack_id"))
      .agg(sum(col("n_tokens")).as("t"), count(lit(1)).as("n"))
      .where(col("n") > 1 && col("t") > 2048 + 600) // one doc of slack
    assert(over.count() == 0, "multi-doc pack blew the token budget")
    // determinism: a full re-run reproduces the same (doc_id, pack_id) set
    val (_, _, _, packed2) = runStages()
    assert(packed.select("doc_id", "pack_id").exceptAll(
             packed2.select("doc_id", "pack_id")).isEmpty,
           "re-run diverged — curation must be content-keyed, not random")
  }
}
