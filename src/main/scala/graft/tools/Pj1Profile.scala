package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Stage-level attribution for pj1_prefix_jaccard (round 16): times the
  * pipeline's pieces in isolation — set materialization, prefix build,
  * candidate generation, verify — so the optimization targets the real
  * cost center instead of the plan's loudest node.
  *
  * Usage: runMain graft.tools.Pj1Profile <sfDir>
  */
object Pj1Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.load(spark, sfDir, "documents").count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pj1] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val threshold = 0.9
    val t = threshold - 1e-6
    val docs = graft.Tables.load(spark, sfDir, "documents")
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val sets = time("sets checkpoint") {
        Dedup.spreadForCompute(
            docs.select(col("doc_id").as("id"), col("text").as("__t")), col("id"))
          .select(col("id"),
            graft.functions.ArrayHashes.shingle_hash_set(
              TextAnalysis.tokens(col("__t")), 1).as("wh"))
          .localCheckpoint(true)
      }
      val toks = sets.select(col("id"), explode(col("wh")).as("tok"))
      val freqs = toks.groupBy(col("tok")).agg(count(lit(1)).as("doc_freq"))
      val ordered = toks.join(freqs, Seq("tok"))
        .groupBy(col("id"))
        .agg(array_sort(collect_list(struct(col("doc_freq"), col("tok")))).as("o"))
        .select(col("id"), transform(col("o"), x => x.getField("tok")).as("ord"),
          size(col("o")).as("n"))
      val pref = ordered.select(col("id"), col("n"),
        slice(col("ord"), lit(1),
          (col("n") - ceil(col("n") * t) + 1).cast("int")).as("prefix"))
      val ex = time("prefix postings checkpoint") {
        pref.select(col("id"), col("n"),
            posexplode(col("prefix")).as(Seq("pos", "tok")))
          .localCheckpoint(true)
      }
      println(s"[pj1] postings rows: ${ex.count()}")
      val a = ex.select(col("tok"), col("id").as("id_a"), col("n").as("na"),
        col("pos").as("posa"))
      val b = ex.select(col("tok"), col("id").as("id_b"), col("n").as("nb"),
        col("pos").as("posb"))
      val joined = a.join(b, Seq("tok"))
        .filter(col("id_a") < col("id_b"))
        .filter(least(col("na"), col("nb")).cast("double") >=
          greatest(col("na"), col("nb")) * t)
      time("raw join row count") { println(s"[pj1] join rows: ${joined.count()}") }
      val cands = joined
        .groupBy(col("id_a"), col("id_b"))
        .agg(min(col("na")).as("na"), min(col("nb")).as("nb"),
          min(col("posa")).as("posa"), min(col("posb")).as("posb"))
        .filter((lit(1) + least(col("na") - col("posa"), col("nb") - col("posb")) - 1)
          .cast("double") >= (col("na") + col("nb")) * (t / (1 + t)))
        .select(col("id_a"), col("id_b"))
      val candsCp = time("candidates agg+filter") { cands.localCheckpoint(true) }
      println(s"[pj1] candidates: ${candsCp.count()}")
      // per-row first-common arm (the shipped one)
      val exArr = time("postings+prefix checkpoint") {
        pref.select(col("id"), col("n"), col("prefix"),
            posexplode(col("prefix")).as(Seq("pos", "tok")))
          .localCheckpoint(true)
      }
      val aa = exArr.select(col("tok"), col("id").as("id_a"), col("n").as("na"),
        col("pos").as("posa"), col("prefix").as("pa"))
      val bb = exArr.select(col("tok"), col("id").as("id_b"), col("n").as("nb"),
        col("pos").as("posb"), col("prefix").as("pb"))
      val candsRow = aa.join(bb, Seq("tok"))
        .filter(col("id_a") < col("id_b"))
        .filter(least(col("na"), col("nb")).cast("double") >=
          greatest(col("na"), col("nb")) * t)
        .filter((lit(1) + least(col("na") - col("posa"), col("nb") - col("posb")) - 1)
          .cast("double") >= (col("na") + col("nb")) * (t / (1 + t)))
        .filter(graft.functions.ArrayHashes.first_common_equals(
          col("pa"), col("pb"), col("tok")))
        .select(col("id_a"), col("id_b"))
      val candsRowCp = time("per-row cands checkpoint") { candsRow.localCheckpoint(true) }
      println(s"[pj1] per-row candidates: ${candsRowCp.count()}")
      val wa = sets.select(col("id").as("id_a"), col("wh").as("wa"))
      val wb = sets.select(col("id").as("id_b"), col("wh").as("wb"))
      val verified = candsRowCp.join(wa, Seq("id_a")).join(wb, Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          Dedup.jaccardSorted(col("wa"), col("wb")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
      val vcp = time("verify join + jaccard") { verified.localCheckpoint(true) }
      println(s"[pj1] verified pairs: ${vcp.count()}")
      time("final orderBy + noop of verified") {
        noop(vcp.orderBy(col("id_a"), col("id_b")))
      }
      time("full query end-to-end") {
        noop(graft.SparkEntry.queries("pj1_prefix_jaccard")(spark, sfDir))
      }
    }
    spark.stop()
  }
}
