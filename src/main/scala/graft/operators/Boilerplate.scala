package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Corpus-wide boilerplate removal (the C4 / RefinedWeb rule): a
  * token chunk appearing in at least `minDf` DISTINCT documents is
  * template text (nav bars, license headers, cookie banners) and is
  * dropped from EVERY document — unlike first-occurrence exact dedup
  * (dd13), boilerplate keeps no copy at all.
  *
  * Scale shape: the chunk document-frequency table is corpus-sized
  * (NOT broadcastable at 100 TB), so membership is an equi-join on
  * the chunk key — the same key the DF aggregation just shuffled on,
  * so the exchange is reused — then one keyed shuffle on doc_id
  * reassembles survivors in chunk order. Chunks materialize once
  * (tracked persist) feeding both the DF side and the probe side.
  */
object Boilerplate {

  /** `docs`: (doc_id, text). Returns (doc_id, text_clean, n_chunks,
    * n_boiler) — text_clean is the space-joined concatenation of the
    * surviving non-overlapping `n`-token chunks in document order.
    */
  def remove(docs: DataFrame, n: Int, minDf: Long): DataFrame = {
    val d = docs
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .withColumn("nt", size(col("toks")))
      .filter(col("nt") > 0)
    val chunks = ManagedCache.persist(d.select(col("doc_id"),
        explode(transform(
          sequence(lit(0), floor((col("nt") - 1) / n).cast("int")),
          i => struct(i.as("i"),
            array_join(slice(col("toks"), i * n + 1, lit(n)), " ")
              .as("t")))).as("c"))
      .select(col("doc_id"), col("c.i").as("ci"),
        col("c.t").as("chunk")))
    val boiler = chunks.groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("chunk"), lit(1).as("isb"))
    chunks.join(boiler, Seq("chunk"), "left")
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("isb").isNull,
            struct(col("ci").as("i"), col("chunk").as("t"))))),
          x => x.getField("t"))).as("text_clean"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("isb").isNotNull, 1L).otherwise(0L))
          .as("n_boiler"))
  }
}
