package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native kernels via
  * SparkSessionExtensions (own session — extensions bind at build time).
  */
class ExtensionsSpec extends AnyFunSuite {
  test("dot_product / simhash64 / decode_chunk callable from SQL") {
    // shared test session (extensions bind at build time; registerAll
    // covers the already-running-session path — same function builders)
    val spark = SparkTestBase.spark
    graft.functions.GraftExtensions.registerAll(spark)
    try {
      val dot = spark.sql(
        "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))")
        .head().getDouble(0)
      assert(dot == 32.0)
      val sh = spark.sql(
        "SELECT simhash64(array(1L, 2L, 3L)) = simhash64(array(3L, 2L, 1L))")
        .head().getBoolean(0)
      assert(sh) // order-independent
      val bytes = graft.functions.ChunkCodec.encodeLongs(
        Array(7L, 8L, 9L), "int64")
      spark.createDataFrame(Seq(Tuple1(bytes))).toDF("b")
        .createOrReplaceTempView("chunks")
      val decoded = spark.sql(
        "SELECT decode_chunk(b, 'int64') FROM chunks")
        .head().getSeq[Long](0)
      assert(decoded == Seq(7L, 8L, 9L))
      val stats = spark.sql(
        "SELECT chunk_stats(b, 'int64').sum FROM chunks").head().getDouble(0)
      assert(stats == 24.0)
      // cosine_sim: parallel vectors -> 1.0 (dot kernel + catalyst math)
      val cos = spark.sql(
        "SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d))")
        .head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      // word_shingles: default n=3 over a 4-token string -> 2 shingles
      val sh3 = spark.sql(
        "SELECT word_shingles('a b c d')").head().getSeq[String](0)
      assert(sh3 == Seq("a b c", "b c d"))
      // char_shingles: k=4 positions over 6 chars -> 3 (pos, sub) rows
      val cs = spark.sql(
        "SELECT size(char_shingles('abcdef', 4))").head().getInt(0)
      assert(cs == 3)
    } finally ()
  }
}
