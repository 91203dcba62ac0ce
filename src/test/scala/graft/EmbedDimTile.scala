package graft

import org.apache.spark.sql.functions._

/** Deterministic dimension tiler: writes `<dst>/embeddings.parquet`
  * whose embedding column tiles the source vectors to `<dim>` with a
  * fixed per-index ±1 sign pattern and 1/√tiles scaling. Each block is
  * the source vector under a diagonal ±1 matrix (orthogonal), so every
  * pairwise cosine and every norm of the source corpus is preserved
  * exactly in real arithmetic (stored as float32, like production
  * embeddings — the rounding is shared by both sides of any recall
  * comparison because the exact oracle reads the SAME stored vectors).
  *
  * Exists for the r17 verdict's item 4: the 256 MB centroid byte gate
  * and the hierarchical coarse fit had only ever executed end-to-end at
  * the testdata's dim 64 (the dim-768 arithmetic was documented and
  * unit-spec'd, never run at scale). IvfDedupProfile pointed at the
  * tiled corpus exercises both at production width with unchanged
  * planted-dup semantics.
  *
  * Test/runMain graft.EmbedDimTile <srcDir> <dstDir> [dim=768]
  */
object EmbedDimTile {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft_sf10")
    val dst = args.lift(1).getOrElse("/tmp/graft_dim768")
    val dim = args.lift(2).map(_.toInt).getOrElse(768)
    val spark = Sessions.local()
    val emb = Tables.embeddings(spark, src)
    val srcDim = graft.operators.Similarity.dimOf(emb)
    // a partial trailing block would weight its coordinates differently
    // and cosine preservation would only be approximate — refuse
    require(dim % srcDim == 0,
      s"target dim $dim must be a multiple of the source dim $srcDim")
    val tiles = dim / srcDim
    emb.select(
        col("vec_id"),
        expr(
          s"""transform(sequence(0, $dim - 1), i ->
             |  CAST(element_at(embedding, CAST(i % $srcDim AS INT) + 1)
             |    * IF(pmod(xxhash64(CAST(i AS BIGINT)), 2) = 0, 1.0D, -1.0D)
             |    / sqrt(CAST($tiles AS DOUBLE)) AS FLOAT))""".stripMargin)
          .as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    val n = spark.read.parquet(s"$dst/embeddings.parquet").count()
    println(s"[dimtile] wrote $dst/embeddings.parquet n=$n dim=$dim (tiles=$tiles of $srcDim)")
    spark.stop()
  }
}
