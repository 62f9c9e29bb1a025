package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.count()
    val merges = graft.pipeline.Bpe.train(d, "text", 8)
    merges.count()
    val idCol = "doc_id"; val textCol = "text"
    val wordEnc = t("wordEnc") { val e = graft.pipeline.Bpe.encode(d, textCol, merges); e.count(); e }
    val vocab = t("vocab") {
      val v = graft.Search.globalRank(
        wordEnc.select(explode(col("tokens")).as("tok")).distinct(),
        Seq(asc("tok")), "_vrank")
        .select(col("tok"), (col("_vrank") - 1).cast("int").as("tid"))
      v.count(); v
    }
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"), x => length(x) > 0)
    val exploded = t("exploded") {
      val e = d.select(col(idCol), posexplode(toks).as(Seq("pos", "w"))); e.count(); e }
    val joined1 = t("join1") {
      val j = exploded.join(broadcast(wordEnc), "w")
        .select(col(idCol), col("pos"), posexplode(col("tokens")).as(Seq("tpos", "tok")))
      j.count(); j }
    val joined2 = t("join2") {
      val j = joined1.join(broadcast(vocab), "tok"); j.count(); j }
    val assembled = t("agg") {
      val a = joined2.groupBy(col(idCol))
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("tpos"), col("tid")))),
          s => s.getField("tid")).as("input_ids"))
      a.count(); a }
    t("final") {
      d.select(col(idCol)).join(assembled, Seq(idCol), "left")
        .withColumn("input_ids", coalesce(col("input_ids"), array().cast("array<int>")))
        .withColumn("n_tokens", size(col("input_ids")))
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
