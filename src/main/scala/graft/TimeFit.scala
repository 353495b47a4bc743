package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY round-16 diagnostic (deleted before round close): times the
  * ivfpq fit stages in isolation under the exact Bench session config. */
object TimeFit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val e = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("ed"))
    graft.functions.GraftFunctions.register(spark)
    t("warm count")(e.count())
    val seeds = t("seedById")(ops.KMeans.seedById(e, "vec_id", "ed", 16, 64))
    t("kmeans.train x3 iters (cold)")(ops.KMeans.train(e, "ed", seeds, maxIters = 3))
    t("kmeans.train x3 iters (warm)")(ops.KMeans.train(e, "ed", seeds, maxIters = 3))
    t("full ivfpqFit")(queries.Similarity.ivfpqFit(e))
    t("full ivfpqFit again")(queries.Similarity.ivfpqFit(e))
    val sample = e.select(col("ed").as("v")).filter(col("v").isNotNull).localCheckpoint()
    val bookLit = typedLit(seeds.map(_.toSeq).toSeq)
    // plan evidence for plans/r16/kmeans_means_{before,after}.txt: the
    // r15 one-select shape (generator extraction leaves pq_encode ABOVE
    // the Generate) vs the current two-select shape (codes computed
    // below, carried as an attribute)
    def fmt(df: org.apache.spark.sql.DataFrame): String = df.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .replaceAll("\\[\\[-?0\\.0[^\\]]*+\\]\\]?", "[..codebook literal..]")
      .replaceAll("\\[-?[0-9]\\.[0-9E-]{6,}[^\\]]*+\\]", "[..codebook literal..]")
    val beforeShape = sample
      .select(call_udf("pq_encode", col("v"), bookLit, lit(64), lit(16)).as("codes"),
        posexplode(col("v")))
      .filter(col("codes").isNotNull)
      .withColumn("j", (col("pos") / 64).cast("int"))
      .select(col("j"), element_at(col("codes"), col("j") + 1).as("code"),
        (col("pos") % 64).as("spos"), col("col"))
      .groupBy("j", "code", "spos").agg(avg("col").as("m"))
    val jj = (col("pos") / 64).cast("int")
    val afterShape = sample
      .select(call_udf("pq_encode", col("v"), bookLit, lit(64), lit(16)).as("codes"), col("v"))
      .filter(col("codes").isNotNull)
      .select(col("codes"), posexplode(col("v")))
      .select(jj.as("j"), element_at(col("codes"), jj + 1).as("code"),
        (col("pos") % 64).as("spos"), col("col"))
      .groupBy("j", "code", "spos").agg(avg("col").as("m"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      "plans/r16/kmeans_means_before.txt"), fmt(beforeShape))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      "plans/r16/kmeans_means_after.txt"), fmt(afterShape))
    println("[t] wrote kmeans means plan pair")
    for (i <- 1 to 3) {
      t(s"means NEW shape (64 avg cols) $i") {
        sample.select(call_udf("pq_encode", col("v"), bookLit, lit(64), lit(16)).as("codes"),
            col("v"))
          .filter(col("codes").isNotNull)
          .select(posexplode(col("codes")), col("v"))
          .select(col("pos").as("j"), col("col").as("code"),
            slice(col("v"), col("pos") * 64 + lit(1), lit(64)).as("sub"))
          .groupBy("j", "code")
          .agg(avg(col("sub")(0)).as("m0"),
            (1 until 64).map(k => avg(col("sub")(k)).as(s"m$k")): _*)
          .collect()
      }
      t(s"means ALT shape (elem explode, codes attr) $i") {
        sample.select(call_udf("pq_encode", col("v"), bookLit, lit(64), lit(16)).as("codes"),
            col("v"))
          .filter(col("codes").isNotNull)
          .select(col("codes"), posexplode(col("v")))
          .select((col("pos") / 64).cast("int").as("j"),
            element_at(col("codes"), (col("pos") / 64).cast("int") + 1).as("code"),
            (col("pos") % 64).as("spos"), col("col"))
          .groupBy("j", "code", "spos").agg(avg("col").as("m"))
          .collect()
      }
    }
  }
}
