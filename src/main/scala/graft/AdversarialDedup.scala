package graft

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial-scale dedup evidence run (r12 verdict #8): the dedup
  * family's skew guards (`maxBucket` on LSH buckets, `maxDocFreq` on
  * containment grams) are code-verified and spec-verified — this main
  * makes them MEASURED-UNDER-ADVERSARY. It builds a skewed corpus at
  * sf0.1 size from the real documents table plus two planted attacks:
  *
  *   - a VIRAL NEAR-DUP FAMILY at 5% of the corpus — one template with
  *     a tiny per-doc tail edit, so most LSH bands put all ~250 docs
  *     in ONE bucket (the "press release syndicated everywhere" shape
  *     that makes uncapped bucket joins quadratic);
  *   - BOILERPLATE INJECTION on 10% of docs — one shared sentence, so
  *     its 3-grams carry df ≈ n/10 (the "subscribe to our newsletter"
  *     shape that makes uncapped gram joins quadratic).
  *
  * Each guard is then timed against its uncapped twin on the SAME
  * frozen input, with pair counts. Run once per revisit (not in the
  * bench sweep — the uncapped arms are deliberate traps):
  *
  *   sbt "runMain graft.AdversarialDedup"   # sf0.1 by default
  *
  * Results are committed in SCALE.md ("adversarial skew" rows). The
  * structural assertion: capped candidate volume stays under the
  * n·bands·maxBucket envelope however hot the plants get, because a
  * bucket either fits under the cap (≤ maxBucket−1 partners per doc
  * per band) or leaves candidate generation entirely.
  */
object AdversarialDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.io.Tables.configure(SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.io.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val n = docs.count()
    val famSize = n / 20 // the 5% viral family
    val template = "breaking update the quick brown fox jumped over " +
      "the lazy dog while markets rallied and the committee convened " +
      "to review the quarterly results in detail before publishing " +
      "the final report to subscribers worldwide"
    val family = spark.range(famSize).select(
      (col("id") + 10000000L).as("doc_id"),
      concat(lit(template + " revision "), col("id")).as("text"))
    val boiler = " subscribe to our newsletter for more updates and " +
      "follow us on social media for breaking news alerts every day"
    val adv = docs.withColumn("text",
        when(col("doc_id") % 10 === 0, concat(col("text"), lit(boiler)))
          .otherwise(col("text")))
      .unionByName(family)
      .localCheckpoint(true) // freeze: every arm reads identical data

    // between-arm hygiene must NOT drop the frozen input's checkpoint
    // blocks — protect every RDD persisted so far (the adv checkpoint),
    // release only what each arm leaves behind
    val protectedIds = spark.sparkContext.getPersistentRDDs.keySet
    def timed(label: String)(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val c = f
      val dt = (System.nanoTime() - t0) / 1e9
      // blocking for the same reason as AdversarialGraph (r13 ADVICE):
      // per-arm timings must not inherit the previous arm's
      // still-evicting cache blocks; the wait itself is untimed
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => protectedIds.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      System.err.println(f"[adv] $label: $c rows in $dt%.2f s")
      (c, dt)
    }

    // hot-structure profile: the planted family's hottest LSH bucket
    // and the boilerplate grams' max df, so the SCALE.md row shows the
    // adversary actually landed
    val hotBucket = Dedup.bandTable(Dedup.signatures(adv))
      .groupBy("band", "bucket").agg(count(lit(1)).as("k"))
      .agg(max("k")).head().getLong(0)

    val (capPairs, capT) = timed("minhash capped (maxBucket=64)") {
      Dedup.minhashCandidates(adv).count()
    }
    val (unPairs, unT) = timed("minhash UNCAPPED") {
      Dedup.minhashCandidates(adv, maxBucket = Int.MaxValue).count()
    }
    // star mode (r13): hot buckets contribute hub->member edges — the
    // viral family must come back CONNECTED for the CC keeper pass at
    // ~linear volume, not k²/2. Members' tail edits scatter them over
    // several buckets per band, so there are multiple hubs; what
    // matters is that the hub edges make the family ONE component —
    // verified by a driver-side union-find over the (bounded)
    // family-touching pair set.
    var starFamEdges = 0L
    var famComponents = -1
    val (starPairs, starT) = timed("minhash capped + HOT-BUCKET STAR") {
      val p = Dedup.minhashCandidates(adv, hotBucketStar = true)
        .localCheckpoint(true)
      val fam = p.filter(col("doc_b") >= 10000000L ||
          col("doc_a") >= 10000000L)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      starFamEdges = fam.length.toLong
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p0 = parent.getOrElseUpdate(x, x)
        if (p0 == x) x else { val r = find(p0); parent(x) = r; r }
      }
      fam.foreach { case (a, b) => parent(find(a)) = find(b) }
      famComponents = (10000000L until 10000000L + famSize)
        .map(id => if (parent.contains(id)) find(id) else id)
        .distinct.size
      p.count()
    }
    val (gCapPairs, gCapT) = timed("containment df-capped (64)") {
      Dedup.ngramContainmentPairs(adv, maxDocFreq = Some(64)).count()
    }
    val (gUnPairs, gUnT) = timed("containment UNCAPPED") {
      Dedup.ngramContainmentPairs(adv).count()
    }

    // structural envelope: a doc in a surviving bucket meets at most
    // maxBucket-1 partners per band
    val envelope = (n + famSize) * 8L * 64L
    assert(capPairs <= envelope,
      s"capped pair count $capPairs exceeds the structural envelope $envelope")

    // star mode's contract: the family collapses to ONE component at
    // near-linear edge volume (vs k²/2 uncapped, vs INVISIBLE capped)
    assert(famComponents == 1,
      s"star mode must reconnect the family into one component: got $famComponents")

    val json = s"""{"corpus":${n + famSize},"family":$famSize,""" +
      s""""hottest_bucket":$hotBucket,""" +
      s""""minhash_capped":{"pairs":$capPairs,"sec":$capT},""" +
      s""""minhash_star":{"pairs":$starPairs,"sec":$starT,"family_edges":$starFamEdges,"family_components":$famComponents},""" +
      s""""minhash_uncapped":{"pairs":$unPairs,"sec":$unT},""" +
      s""""containment_capped":{"pairs":$gCapPairs,"sec":$gCapT},""" +
      s""""containment_uncapped":{"pairs":$gUnPairs,"sec":$gUnT},""" +
      s""""sf":"$sfDir"}"""
    println(json)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("target/adversarial_dedup.json"),
      json.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
