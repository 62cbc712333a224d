// throwaway isolation probe for the ppjoin chain (r17 measurement)
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScratchPpjoin {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/data/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCH $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // substrate (untimed here)
    val docs = Tables.documents(spark, dir)
    val sh = time("shingles_explode") {
      val f = docs.select(col("doc_id"),
          split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ").as("__t"))
        .select(col("doc_id"), explode(dedup.Dedup.ngramsOfToks(col("__t"), 3)).as("s"))
        .filter(col("s") =!= "")
        .select(col("doc_id"), xxhash64(col("s")).as("sh"))
        .localCheckpoint(true)
      println("sh rows " + f.count()); f
    }
    // old chain: df agg + join + doc-grain collect
    val hot = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > 100).select("sh")
    val rare = sh.join(hot, Seq("sh"), "left_anti")
    val oldArr = time("old_docArr") {
      val dfs = rare.groupBy("sh").agg(count(lit(1)).as("df"))
      val a = rare.join(dfs, "sh")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("arr0"))
        .select(col("doc_id"),
          transform(col("arr0"), s => s.getField("sh")).as("arr"),
          size(col("arr0")).cast("long").as("sz"))
        .localCheckpoint(true)
      println("docArr rows " + a.count()); a
    }
    // new chain: postings-derived
    val post = time("postings_build") {
      val p = rare.groupBy("doc_id").agg(collect_set(col("sh")).as("shs"))
        .select(explode(col("shs")).as("sh2"),
          (shiftleft(col("doc_id"), 20) + size(col("shs")).cast("long")).as("e"))
        .groupBy("sh2").agg(sort_array(collect_list(col("e"))).as("ids"))
        .select(col("sh2").as("sh"), col("ids"))
        .localCheckpoint(true)
      println("post rows " + p.count()); p
    }
    val newArr = time("new_docArr") {
      val a = post
        .select(col("sh"), size(col("ids")).cast("long").as("df"),
          explode(col("ids")).as("e"))
        .groupBy(shiftright(col("e"), 20).as("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("arr0"))
        .select(col("doc_id"),
          transform(col("arr0"), s => s.getField("sh")).as("arr"),
          size(col("arr0")).cast("long").as("sz"))
        .localCheckpoint(true)
      println("docArr rows " + a.count()); a
    }
    def candVerify(label: String, docArr: org.apache.spark.sql.DataFrame): Unit = {
      val out = time(s"cand_verify_$label") {
        val tSlack = 0.5 - 1e-4
        val prefixLen = (col("sz") - ceil(col("sz") * lit(tSlack)) + 1).cast("int")
        val cand = docArr
          .select((shiftleft(col("doc_id"), 20) + col("sz")).as("e"),
            explode(slice(col("arr"), lit(1), prefixLen)).as("sh"))
          .groupBy("sh").agg(sort_array(collect_list(col("e"))).as("ids"))
          .filter(size(col("ids")) >= 2)
          .select(explode(dedup.Dedup.postingPairs(col("ids"))).as("p"))
          .filter(least(shiftright(col("p.id_a"), 20) * 0 + col("p.id_a").bitwiseAND(lit((1L << 20) - 1)),
              col("p.id_b").bitwiseAND(lit((1L << 20) - 1))) >=
            (greatest(col("p.id_a").bitwiseAND(lit((1L << 20) - 1)),
              col("p.id_b").bitwiseAND(lit((1L << 20) - 1))) * lit(tSlack)))
          .select(col("p.id_a").as("a"), col("p.id_b").as("b"))
          .distinct()
        val candM = time(s"candgen_$label") {
          val c = cand.localCheckpoint(true); println(s"cand_$label " + c.count()); c }
        val docSets = docArr.select(col("doc_id"), col("arr").as("shs"))
        val n = candM
          .select(shiftright(col("a"), 20).as("id_a"), col("a").bitwiseAND(lit((1L << 20) - 1)).as("sza"),
            shiftright(col("b"), 20).as("id_b"), col("b").bitwiseAND(lit((1L << 20) - 1)).as("szb"))
          .join(docSets.select(col("doc_id").as("id_a"), col("shs").as("sa")), "id_a")
          .join(docSets.select(col("doc_id").as("id_b"), col("shs").as("sb")), "id_b")
          .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
          .withColumn("jaccard", round(col("inter").cast("double") /
            (col("sza") + col("szb") - col("inter")), 4))
          .filter(col("jaccard") >= 0.5)
          .count()
        println(s"pairs_$label " + n)
      }
      out
    }
    candVerify("new", newArr)
    candVerify("new2", newArr)
    spark.stop()
  }
}
