package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-similarity operators over `array<float>` embedding columns.
  *
  * All arithmetic is done in double via higher-order functions
  * (`zip_with` + `aggregate`) — codegen'd Catalyst expressions, no UDF.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** cos(a,b) = dot / (‖a‖·‖b‖) — factored exactly as sqrt(na)*sqrt(nb) to
    * bit-match the DuckDB oracle's list_cosine_similarity formula.
    *
    * HOF composition kept as the portable reference; the hot paths below
    * use [[CosineSimilarity.cosineNative]], a codegen'd Catalyst expression
    * with the identical arithmetic (bit-equal results, ~10× faster).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors of each query vector.
    *
    * Scale design: `queries` is small (a probe set) and is broadcast — the
    * plan is a BroadcastNestedLoopJoin against the full corpus, i.e. one pass
    * over the big side with no shuffle of it; then a per-query top-k via
    * window over (query) keys, which shuffles only (nQueries × corpus)
    * score rows. For corpus-×-corpus joins use [[lshBuckets]] first to cut
    * the candidate space.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val scored = corpus
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("sim", CosineSimilarity.cosineNative(col("query_vec"), col("embedding")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), round(col("sim"), 4).as("sim"), col("rank"))
  }

  /** IVF-style ANN: coarse-quantize the corpus into `nCells` inverted
    * lists, probe the `nProbe` closest cells per query, exact-rank only
    * those candidates. Centroids are deterministic exemplars (the first
    * `nCells` vectors) rather than trained k-means, so results are exactly
    * reproducible in the SQL oracle; swap the `cents` relation for trained
    * centroids and nothing else changes.
    *
    * Scale shape: assignment is corpus × broadcast(centroids) — one linear
    * pass, no corpus shuffle; search touches only nProbe/nCells of the
    * corpus per query (the IVF speedup), then a per-query top-k via
    * WindowGroupLimit.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, nCells: Int, nProbe: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = corpus.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell_id"), col("embedding").as("cell_vec"))
    val wAssign = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cell_id"))
    val assigned = corpus
      .crossJoin(broadcast(cents))
      .withColumn("csim", CosineSimilarity.cosineNative(col("embedding"), col("cell_vec")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cell_id"))
    val probes = queries
      .crossJoin(broadcast(cents))
      .withColumn("csim", CosineSimilarity.cosineNative(col("embedding"), col("cell_vec")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") <= nProbe)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"), col("cell_id"))
    val scored = probes
      .join(assigned, Seq("cell_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", CosineSimilarity.cosineNative(col("query_vec"), col("embedding")))
    val wTop = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), round(col("sim"), 4).as("sim"), col("rank"))
  }

  /** Deterministic random-hyperplane (SimHash) LSH bucket id: `nBits` sign
    * bits of projections onto pseudo-random hyperplanes derived from a seed.
    *
    * The hyperplane coefficients come from a splitmix-ish integer hash of
    * (seed, bit, dim) — computed as literal arrays on the driver, broadcast
    * in the plan as constants. Same-bucket vectors are ANN candidates: the
    * corpus-×-corpus join becomes a per-bucket equi-join (shuffle on bucket
    * id) instead of a full cross join — the 100 TB-safe path.
    */
  def lshBucket(vec: Column, dims: Int, nBits: Int, seed: Long): Column = {
    def coeff(bit: Int, d: Int): Double = {
      var z = seed + bit * 0x9E3779B97F4A7C15L + d * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      // map to [-1, 1)
      (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }
    val bits = (0 until nBits).map { b =>
      val plane = array((0 until dims).map(d => lit(coeff(b, d))): _*)
      when(dot(vec, plane) >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Bucketed ANN self-join: candidates = pairs sharing an LSH bucket. */
  def lshCandidatePairs(corpus: DataFrame, dims: Int, nBits: Int, seed: Long): DataFrame = {
    val withBucket = corpus.withColumn("bucket", lshBucket(col("embedding"), dims, nBits, seed))
    val a = withBucket.select(col("bucket"), col("vec_id").as("a_id"), col("embedding").as("a_vec"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("b_id"), col("embedding").as("b_vec"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", CosineSimilarity.cosineNative(col("a_vec"), col("b_vec")))
      .select(col("a_id"), col("b_id"), round(col("sim"), 4).as("sim"))
  }
}
