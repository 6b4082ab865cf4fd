package graft

import org.apache.spark.sql.functions._

import graft.operators.{Components, Packing}
import graft.sources.ZOrder

/** Randomized (seeded, deterministic) differential properties for the
  * round-2 primitives: each batch of random cases is evaluated in ONE
  * Spark job and compared against an independent driver-side
  * reference implementation. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  test("zkey2 matches the reference interleave and is injective on 16-bit domains") {
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)).distinct
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zkey2(col("x"), col("y")).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (x, y) => assert(got((x, y)) === ref(x, y), s"($x,$y)") }
    // injective: distinct (x, y) pairs map to distinct keys
    assert(got.values.toSet.size === cases.size)
  }

  test("packByPrefix equals the sequential reference on random sparse corpora") {
    for (seed <- 1 to 3) {
      val r = new scala.util.Random(seed)
      val docs = Seq.fill(200)((r.nextInt(100000).toLong, (r.nextInt(400) + 1).toLong))
        .distinctBy(_._1)
      val budget = 128L
      val bucketSize = Seq(3L, 97L, 10000L)(seed % 3)
      val got = Packing.packByPrefix(
          docs.toDF("doc_id", "tokens").repartition(7), "doc_id", "tokens", budget, bucketSize)
        .select("doc_id", "start_offset", "seq_id", "offset_in_seq")
        .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
      var running = 0L
      docs.sortBy(_._1).foreach { case (id, toks) =>
        assert(got(id) === ((running, running / budget, running % budget)),
          s"seed $seed doc $id")
        running += toks
      }
    }
  }

  test("minLabel equals brute-force union-find on random graphs (multi-seed)") {
    for (seed <- 1 to 3) {
      val r = new scala.util.Random(seed * 7919)
      val n = 60
      val edges = Seq.fill(70) {
        val a = r.nextInt(n).toLong; val b = r.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val parent = scala.collection.mutable.Map((0L until n.toLong).map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val root = find(parent(x)); parent(x) = root; root }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).toSet.map((i: Long) => i -> find(i)).toMap
      val got = Components.minLabel(edges.toDF("da", "db"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got === expected, s"seed $seed")
    }
  }
}
