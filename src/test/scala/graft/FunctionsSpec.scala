package graft

import graft.functions.GraftFunctions
import graft.similarity.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("native graft_cosine is bit-identical to the portable fold") {
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        col("vec_id"),
        expr("graft_cosine(embedding, qe)").as("native"),
        Ann.cosineFold(col("embedding"), col("qe")).as("folded"))
    val mismatches = both.where(col("native") =!= col("folded")).count()
    assert(mismatches === 0)
  }

  test("graft_cosine works from plain SQL after registration") {
    GraftFunctions.register(spark)
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("emb_v")
    val self = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM emb_v LIMIT 5").collect()
    assert(self.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("native graft_l2sq is bit-identical to the portable fold") {
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val folded = aggregate(
      transform(sequence(lit(1), lit(64)), i => {
        val d = element_at(col("embedding"), i).cast("double") -
          element_at(col("qe"), i).cast("double")
        d * d
      }), lit(0.0), (acc, x) => acc + x)
    val both = emb.crossJoin(broadcast(q))
      .select(col("vec_id"), expr("graft_l2sq(embedding, qe)").as("native"), folded.as("folded"))
    assert(both.where(col("native") =!= col("folded")).count() === 0)
    // self-distance is exactly zero
    val self = emb.limit(5).select(expr("graft_l2sq(embedding, embedding)").as("z")).collect()
    assert(self.forall(_.getDouble(0) === 0.0))
  }

  test("native graft_norm2 is bit-identical to the portable fold, on float AND double arrays") {
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    def folded(c: org.apache.spark.sql.Column) = aggregate(
      transform(sequence(lit(1), size(c)),
        i => element_at(c, i).cast("double") * element_at(c, i).cast("double")),
      lit(0.0), (acc, x) => acc + x)
    // float input (the stored embedding column)
    val f = emb.select(expr("graft_norm2(embedding)").as("native"),
      folded(col("embedding")).as("folded"))
    assert(f.where(col("native") =!= col("folded")).count() === 0)
    // double input (a computed vector, the whitening path's shape)
    val d = emb.select(transform(col("embedding"), x => x.cast("double") * 2.0).as("w"))
      .select(expr("graft_norm2(w)").as("native"), folded(col("w")).as("folded"))
    assert(d.where(col("native") =!= col("folded")).count() === 0)
    // wrong element type rejected
    intercept[Exception] {
      emb.select(expr("graft_norm2(array(vec_id))")).collect()
    }
    // a null ELEMENT nulls the result — exactly like the fold, whose
    // acc + x*x step nulls the whole accumulation (r13 advisory: the
    // native form used to read the null slot as 0.0 and return non-null)
    val withNull = emb.limit(3).select(
      concat(col("embedding").cast("array<double>"),
        array(lit(null).cast("double"))).as("w"))
    val nf = withNull.select(expr("graft_norm2(w)").as("native"), folded(col("w")).as("folded"))
    assert(nf.where(col("native").isNotNull || col("folded").isNotNull).count() === 0,
      "null element must null both the native and the folded norm")
  }

  test("graft_cosine rejects wrong argument types") {
    GraftFunctions.register(spark)
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("emb_v")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_cosine(vec_id, embedding) FROM emb_v").collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_cosine") ||
      e.getMessage.toLowerCase.contains("data type"))
  }

  test("graft_dbits is order-isomorphic on non-negative doubles and matches JVM bits") {
    GraftFunctions.register(spark)
    // distances as they occur in the PQ argmin: non-negative l2sq values
    val q = Tables.load(spark, dir, "embeddings").where(col("vec_id") === 0)
      .limit(1).select(col("embedding").as("qe"))
    val d = Tables.load(spark, dir, "embeddings").crossJoin(broadcast(q))
      .select(col("vec_id"), expr("graft_l2sq(embedding, qe)").as("d"))
      .withColumn("bits", expr("graft_dbits(d)"))
      .collect()
    d.foreach { r =>
      assert(r.getAs[Long]("bits") ==
        java.lang.Double.doubleToRawLongBits(r.getAs[Double]("d")))
    }
    // order isomorphism: sorting by bits equals sorting by value
    val byVal = d.sortBy(_.getAs[Double]("d")).map(_.getAs[Long]("vec_id"))
    val byBits = d.sortBy(_.getAs[Long]("bits")).map(_.getAs[Long]("vec_id"))
    assert(byVal.sameElements(byBits))
  }
  test("graft_hamming64 is bit-identical to bit_count(xor) on random longs") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // deterministic pseudo-random 64-bit pairs incl. sign-bit and edge cases
    val rng = new scala.util.Random(42)
    val pairs = Seq((0L, 0L), (-1L, 0L), (-1L, -1L), (Long.MinValue, Long.MaxValue)) ++
      Seq.fill(500)((rng.nextLong(), rng.nextLong()))
    val df = pairs.toDF("a", "b")
    val mism = df.select(
        expr("graft_hamming64(a, b)").as("native"),
        bit_count(col("a").bitwiseXOR(col("b"))).as("builtin"),
        col("a"), col("b"))
      .where(col("native") =!= col("builtin")).count()
    assert(mism === 0)
    // JVM ground truth on a sample
    val r = df.limit(50).select(col("a"), col("b"), expr("graft_hamming64(a, b)").as("h"))
      .collect()
    r.foreach(row => assert(row.getAs[Int]("h") ==
      java.lang.Long.bitCount(row.getLong(0) ^ row.getLong(1))))
  }

  test("graft_hamming64 rejects non-long arguments") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1, 2L)).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(expr("graft_hamming64(a, b)")).collect()
    }
    assert(e.getMessage.contains("graft_hamming64") || e.getMessage.contains("long"))
  }

  test("graft_sorted_common64 matches size(array_intersect) on sorted distinct arrays") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(300) {
      val a = Seq.fill(rng.nextInt(40))(rng.nextLong() % 1000).distinct.sorted
      val b = Seq.fill(rng.nextInt(40))(rng.nextLong() % 1000).distinct.sorted
      (a, b)
    } ++ Seq((Seq.empty[Long], Seq(1L, 2L)), (Seq.empty[Long], Seq.empty[Long]),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)))
    val df = rows.toDF("a", "b")
    val mism = df.select(
        expr("graft_sorted_common64(a, b)").as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .where(col("native") =!= col("builtin")).count()
    assert(mism === 0)
  }

}
