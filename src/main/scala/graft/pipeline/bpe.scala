package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer induction — the tokenizer-training face of the
  * training-data pipeline (Sennrich et al. 2016's corpus algorithm,
  * greedy variant). Learns merge rules from corpus statistics; encoding
  * applies them back. Deterministic: ties in pair frequency break
  * lexicographically.
  *
  * 100 TB shape: after ONE corpus pass builds the WORD TABLE (distinct
  * words + frequencies — vocabulary-bounded, Zipf-small next to the
  * corpus), every training round runs on that table alone: pair counting
  * explodes the per-word symbol arrays (≤ vocab × max word length rows),
  * one hash aggregate + a 1-row argmax collect picks the merge, and a
  * fold rewrite updates the arrays. The table persists between rounds
  * (iterative-algorithm caching, the MLlib convention) so round N never
  * re-reads the corpus; per-round cost SHRINKS as symbols merge. The
  * driver holds only the learned (rank, pair) list.
  */
object Bpe {

  /** Learn `numMerges` merge rules. Returns (rank, left, right, merged,
    * pair_count) — rank 1 is the first (most frequent) merge; pair_count
    * is the word-frequency-weighted occurrence count at learn time. */
  def train(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1 && numMerges <= 10000,
      s"numMerges must be in [1, 10000], got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(filter(split(lower(trim(col(textCol))), "\\s+"),
        x => length(x) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      // symbol arrays start as characters (no end-of-word marker —
      // declared simplification; the marker changes nothing structural)
      .select(filter(split(col("w"), ""), c => length(c) > 0).as("syms"),
        col("n"))
    var table = words.persist()
    table.count() // materialize: rounds must not re-scan the corpus
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    try {
      for (rank <- 1 to numMerges) {
        val top = pairCounts(table).orderBy(desc("c"), asc("l"), asc("r"))
          .limit(1).collect()
        if (top.nonEmpty) {
          val row = top.head
          val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += ((rank, l, r, l + r, c))
          val next = table
            .withColumn("syms", mergePair(col("syms"), l, r)).persist()
          next.count()
          table.unpersist()
          table = next
        }
      }
    } finally table.unpersist()
    merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Word-frequency-weighted adjacent-pair counts of the current symbol
    * arrays — one explode + one hash aggregate, vocabulary-bounded. */
  private def pairCounts(table: DataFrame): DataFrame =
    table
      .where(size(col("syms")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("l"),
          element_at(col("syms"), i + lit(1)).as("r")))).as("p"),
        col("n"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("n")).as("c"))

  /** Greedy left-to-right non-overlapping merge of one adjacent pair
    * inside a symbol array — a fold with the array as accumulator
    * (interpreted HOF, but it only ever runs on the vocabulary-bounded
    * word table, never the corpus). */
  private def mergePair(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Encode text with a learned merge list: per word, apply every merge
    * in rank order (the BPE encode rule). Returns (original word, final
    * symbol array) per distinct word — join it back to token streams as
    * needed. `merges` is collected to the driver (numMerges rows). */
  def encode(df: DataFrame, textCol: String, merges: DataFrame): DataFrame = {
    val rules = merges.select("rank", "left", "right")
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    val words = df
      .select(explode(filter(split(lower(trim(col(textCol))), "\\s+"),
        x => length(x) > 0)).as("w"))
      .distinct()
    val start = filter(split(col("w"), ""), c => length(c) > 0)
    val enc = rules.foldLeft(start: Column) { case (c, (l, r)) =>
      mergePair(c, l, r)
    }
    words.select(col("w"), enc.as("tokens"))
  }

  /** Tokenize documents to dense `input_ids` — the array-of-int export a
    * training loop actually consumes. Ids are the vocabulary's
    * sorted-token ranks (deterministic, seedless, stable across runs on
    * the same merges). Scale shape: the per-WORD encoding table and the
    * vocabulary are both bounded by construction (≤ distinct words /
    * ≤ alphabet + merges) and broadcast; the corpus explodes to (doc,
    * word-pos, token-pos) rows, joins the two small tables, and
    * re-assembles per doc ordered by (word pos, token pos) — one
    * corpus-keyed aggregate, no corpus-side windows. The vocab's global
    * rank window runs on the BOUNDED vocab relation only. */
  def encodeToIds(df: DataFrame, idCol: String, textCol: String,
                  merges: DataFrame): DataFrame = {
    val wordEnc = encode(df, textCol, merges) // (w, tokens) — distinct words
    val vocab = wordEnc
      .select(explode(col("tokens")).as("tok")).distinct()
      .withColumn("tid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("tok")) - 1)
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      x => length(x) > 0)
    val exploded = df.select(col(idCol), posexplode(toks).as(Seq("pos", "w")))
    val assembled = exploded
      .join(broadcast(wordEnc), "w")
      .select(col(idCol), col("pos"),
        posexplode(col("tokens")).as(Seq("tpos", "tok")))
      .join(broadcast(vocab), "tok")
      .groupBy(col(idCol))
      .agg(transform(
        sort_array(collect_list(struct(col("pos"), col("tpos"), col("tid")))),
        s => s.getField("tid")).as("input_ids"))
    df.select(col(idCol))
      .join(assembled, Seq(idCol), "left")
      .withColumn("input_ids",
        coalesce(col("input_ids"), array().cast("array<int>")))
      .withColumn("n_tokens", size(col("input_ids")))
  }
}
