package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the p2 pipeline's stage costs. */
object DebugP2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang")
    val w = filter(split(col("text"), " "), x => x =!= "")
    val corpus = docs.unionByName(docs.select((col("doc_id") + 1000000L).as("doc_id"),
      array_join(slice(w, lit(1), greatest(size(w) - 3, lit(1))), " ").as("text"),
      col("lang")))
    time("corpus count")(corpus.count())
    val grams = corpus.select(col("doc_id"),
      pipeline.Dedup.wordNgrams(col("text"), 2).as("g"))
    time("shingle+count")(grams.select(sum(size(col("g")))).collect())
    time("shingle again")(grams.select(sum(size(col("g")))).collect())
    val full = pipeline.Dedup.ngramJaccardPairs(corpus, "doc_id", "text", "lang", 2, 0.8)
    time("full p2")(full.count())

    // isolate: same join, no jaccard — how expensive is bare enumeration?
    graft.functions.SortedIntersectSize.register(spark)
    val raw2 = corpus.select(col("doc_id").as("id"), col("lang").as("bucket"),
      pipeline.Dedup.wordNgrams(col("text"), 2).as("sgrams"))
    val dict = raw2.select(explode(col("sgrams")).as("gram")).distinct()
      .withColumn("gram_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("gram")).cast("int"))
    val g2 = raw2.select(col("id"), col("bucket"), explode(col("sgrams")).as("gram"))
      .join(broadcast(dict), "gram")
      .groupBy("id", "bucket")
      .agg(array_sort(collect_list("gram_id")).as("grams"))
      .withColumn("sz", size(col("grams")))
      .withColumn("band", floor(log(col("sz").cast("double")) / math.log(1.25)).cast("int"))
      .cache()
    time("g2 materialize")(g2.count())
    val probe = g2.select(col("id").as("a_id"), col("grams").as("a_grams"),
      col("sz").as("a_sz"), col("bucket"),
      explode(array(col("band"), col("band") + 1, col("band") + 2)).as("band"))
    val build = g2.select(col("id").as("b_id"), col("grams").as("b_grams"),
      col("sz").as("b_sz"), col("bucket"), col("band"))
    val joined = probe.join(build, Seq("bucket", "band"))
      .where(col("a_id") =!= col("b_id"))
    time("enumerate only")(joined.count())
    time("enumerate+intersect")(
      joined.select(expr("sorted_intersect_size(a_grams, b_grams)").as("i"))
        .agg(sum("i")).collect())
    spark.stop()
  }
}
