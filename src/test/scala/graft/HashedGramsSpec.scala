package graft

import org.apache.spark.sql.functions._

/** Pins `functions.HashedShingles` / `HashedWordGrams` (the fused
  * byte-scan gram hashers the dedup family runs) set-equal to the SQL
  * template chain they replaced —
  * `array_distinct(transform(..., xxhash64(substring/array_join...)))` —
  * on the real documents table AND on hand-built degenerates: multi-byte
  * UTF-8 (the byte-offset walk must split on code points exactly like
  * `substring`), repeated/leading/trailing spaces (regex `split(' ')`
  * keeps empty tokens), texts shorter than the gram width, and the empty
  * string. Hash values must be BIT-identical to `xxhash64` (seed 42 over
  * the gram's UTF-8 bytes) — a same-set-different-hash regression would
  * silently re-randomize the MinHash LSH geometry whose miss probability
  * the dedup_minhash exactness claim is computed from.
  * Also pins IntersectCountSorted ≡ size(array_intersect) on the sorted
  * arrays the hashers emit.
  */
class HashedGramsSpec extends GraftSuite {

  private val shingleTemplate =
    "array_sort(array_distinct(transform(sequence(1, greatest(length(text) - 4, 1)), " +
      "i -> xxhash64(substring(text, i, 5)))))"

  private def wordTemplate(n: Int) =
    s"array_sort(array_distinct(transform(sequence(1, size(split(text, ' ')) - ${n - 1}), " +
      s"i -> xxhash64(array_join(slice(split(text, ' '), i, $n), ' ')))))"

  private val degenerates = Seq(
    "",                      // empty: one shingle gram (empty substring); 1 token
    "ab",                    // shorter than 5 chars: one whole-text gram
    "héllo wörld déjà vu",   // multi-byte code points inside grams
    "日本語のテキスト断片",        // 3-byte code points only
    "a  b   c d",            // repeated spaces → empty tokens preserved
    " leading and trailing ", // boundary empty tokens
    "one two three four five six",
    "aaaaa aaaaa aaaaa",     // heavy gram duplication → distinct collapses
    "tab\tand\nnewline are not separators"
  )

  private def docsPlus = {
    val real = spark.read.parquet(s"$sf/documents.parquet").select(col("text")).limit(400)
    val extra = spark.createDataFrame(
      spark.sparkContext.parallelize(degenerates.map(org.apache.spark.sql.Row(_))),
      new org.apache.spark.sql.types.StructType()
        .add("text", org.apache.spark.sql.types.StringType))
    real.unionByName(extra)
  }

  test("HashedShingles ≡ template, bit-identical hashes, sorted distinct") {
    val rows = docsPlus
      .select(graft.functions.HashedShingles(col("text"), 5).as("native"),
              expr(shingleTemplate).as("template"))
      .where(not(col("native") === col("template")))
      .count()
    assert(rows === 0L)
  }

  test("HashedWordGrams ≡ template for docs with ≥ n tokens; empty below") {
    val df = docsPlus
      .withColumn("ntok", size(split(col("text"), " ")))
      .withColumn("native", graft.functions.HashedWordGrams(col("text"), 3))
    val longDocs = df.where(col("ntok") >= 3)
      .where(not(col("native") === expr(wordTemplate(3))))
      .count()
    assert(longDocs === 0L)
    val shortDocs = df.where(col("ntok") < 3).where(size(col("native")) =!= 0).count()
    assert(shortDocs === 0L)
  }

  test("HashedWordGramsSeq ≡ ordered template, multiplicity kept") {
    val seqTemplate =
      "transform(sequence(1, size(split(text, ' ')) - 9), " +
        "i -> xxhash64(array_join(slice(split(text, ' '), i, 10), ' ')))"
    val df = docsPlus
      .withColumn("ntok", size(split(col("text"), " ")))
      .withColumn("native", graft.functions.HashedWordGramsSeq(col("text"), 10))
    val longDocs = df.where(col("ntok") >= 10)
      .where(not(col("native") === expr(seqTemplate)))
      .count()
    assert(longDocs === 0L)
    val shortDocs = df.where(col("ntok") < 10).where(size(col("native")) =!= 0).count()
    assert(shortDocs === 0L)
  }

  test("HashedBigramPairs ≡ zipped unigram/bigram template") {
    val pairTemplate =
      "transform(sequence(1, size(split(text, ' ')) - 1), i -> named_struct(" +
        "'h1', xxhash64(element_at(split(text, ' '), i)), " +
        "'h2', xxhash64(array_join(slice(split(text, ' '), i, 2), ' '))))"
    val df = docsPlus
      .withColumn("ntok", size(split(col("text"), " ")))
      .withColumn("native", graft.functions.HashedBigramPairs(col("text")))
    val longDocs = df.where(col("ntok") >= 2)
      .where(not(col("native") === expr(pairTemplate)))
      .count()
    assert(longDocs === 0L)
    val shortDocs = df.where(col("ntok") < 2).where(size(col("native")) =!= 0).count()
    assert(shortDocs === 0L)
  }

  test("PgTrigrams ≡ padded-word trigram template") {
    val tpl =
      "array_sort(array_distinct(transform(flatten(transform(" +
        "filter(split(lower(text), ' '), w -> length(w) > 0), " +
        "w -> transform(sequence(1, length(w) + 1), " +
        "i -> substring(concat('  ', w, ' '), i, 3)))), g -> xxhash64(g))))"
    val names = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_name").as("text")).limit(400)
    val rows = names.unionByName(docsPlus.select(substring(col("text"), 1, 60).as("text")))
      .select(graft.functions.PgTrigrams(col("text")).as("native"), expr(tpl).as("template"))
      .where(not(col("native") === col("template")))
      .count()
    assert(rows === 0L)
  }

  test("IntersectCountSorted ≡ size(array_intersect) on hasher output") {
    val g = docsPlus.select(graft.functions.HashedShingles(col("text"), 5).as("grams"))
      .withColumn("rn", monotonically_increasing_id())
    val pairs = g.select(col("grams").as("ga"), (col("rn") % 7).as("k"))
      .join(g.select(col("grams").as("gb"), (col("rn") % 7).as("k")), "k")
    val bad = pairs
      .where(graft.functions.IntersectCountSorted(col("ga"), col("gb"))
        =!= size(array_intersect(col("ga"), col("gb"))))
      .count()
    assert(bad === 0L)
  }
}
