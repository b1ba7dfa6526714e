package graft

import graft.streaming.StreamQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Adversarial streaming evidence run (r14 verdict #8 — the fourth leg
  * of the adversarial series next to [[AdversarialDedup]],
  * [[AdversarialGraph]] and [[AdversarialAnn]]): a planted KEY-SKEW
  * BURST against the two stateful shapes the streaming suite ships —
  * the stream-stream interval join (`st_outer_join`) and the merging
  * session window (`st_session_window`) — under the same AvailableNow
  * replay the oracle-checked entries use.
  *
  * The adversary: one user_id owning 30% of all events, all inside a
  * single 30-minute burst (the "one instrumented client goes into a
  * retry loop" / bot-traffic pathology). What it does to each shape:
  *
  *   - INTERVAL JOIN: state is keyed by join key, so salting is not
  *     available the way it is for batch skew joins — every hot-key
  *     error must meet every hot-key click inside the interval, and
  *     the e×c product is emitted through the one state-store
  *     partition that owns the key. The trap arm MEASURES that
  *     product (asserted equal to the batch twin's count — the
  *     quadratic is structural, not a defect) and its cost.
  *   - SESSION WINDOW: the burst's ≤1 s gaps merge into ONE session,
  *     so state stays bounded (one (user, session) row however many
  *     events the burst holds) — the session operator is the arm that
  *     survives skew by construction; asserted: exactly one hot
  *     session, state rows ≈ baseline + 1.
  *
  * The production lever for the join is MATCH BOUNDING, not salting:
  * dedup the click side to one representative per (user, minute)
  * before the join (`dropDuplicatesWithinWatermark` — bounded dedup
  * state, then bounded ≤31 matches per error whatever the burst
  * volume). The mitigated arm runs that exact chain and the evidence
  * JSON prices all three: baseline / trap / mitigation.
  *
  * SIZE IS DELIBERATE (the AdversarialAnn doctrine): at sf0.01 the
  * trap COMPLETES (~0.7M-pair hot product) and the counts make the
  * 100 TB argument — at production scale the same shape is a dead
  * state-store partition, which is the point the numbers carry.
  *
  *   sbt "runMain graft.AdversarialStream"   # sf0.01 events (10k rows)
  *
  * Results → target/adversarial_stream.json + SCALE.md row.
  */
object AdversarialStream {

  /** AvailableNow replay with state-metric capture: returns (sink
    * table, seconds, max state rows across operators and batches).
    */
  private def runTimed(df: DataFrame, mode: String, name: String)
      : (DataFrame, Double, Long) = {
    val t0 = System.nanoTime()
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val dt = (System.nanoTime() - t0) / 1e9
    val maxState = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq.map(_.numRowsTotal))
      .maxOption.getOrElse(0L)
    (df.sparkSession.table(name), dt, maxState)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.io.Tables.configure(SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- plant the burst ------------------------------------------
    val raw = spark.read.parquet(graft.io.Tables.path(sfDir, "events"))
    val n = raw.count()
    val hotUser = 99999999L
    // burst = 3n/7 rows (hot user owns 30% of the planted corpus),
    // deterministic subset, re-keyed and time-compressed into one
    // 30-minute window placed after the corpus span (so the baseline
    // rows' watermark behavior is unchanged); ≤1 s gaps merge the
    // whole burst into one session
    // 2024-06-01T00:00:00Z = epoch 1717200000 — integer second math,
    // no interval arithmetic to diverge between engines
    val rn = row_number().over(Window.orderBy("event_id")) // burst-sized
    val burst = raw.filter(pmod(xxhash64(col("event_id")), lit(7)) < 3)
      .withColumn("rn", rn)
      .select(
        (col("event_id") + lit(2000000000L)).as("event_id"),
        timestamp_seconds(lit(1717200000L) + pmod(col("rn"), lit(1800)))
          .as("ts"),
        lit(hotUser).as("user_id"),
        col("event_type"), col("value"), col("props"))
    val adv = raw.unionByName(burst)
    val burstN = burst.count()
    val advDir = "target/advstream"
    adv.coalesce(1).write.mode("overwrite")
      .parquet(graft.io.Tables.path(advDir, "events"))

    // batch twins of the join predicate — the EXPECTED match counts
    // (the assertion that the trap arm materialized exactly the
    // structural product, and nothing was late-dropped in the replay)
    def matchedPairs(dir: String, hotOnly: Boolean): Long = {
      val ev = graft.io.Tables.load(spark, dir, "events")
      val er = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      val cl = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      er.join(cl, expr(
          """c_user = e_user AND
            |c_ts >= e_ts - interval 30 minutes AND
            |c_ts <= e_ts""".stripMargin))
        .filter(if (hotOnly) col("e_user") === hotUser else lit(true))
        .count()
    }
    val expectedHotPairs = matchedPairs(advDir, hotOnly = true)

    // ---- interval join: baseline / trap / mitigation --------------
    val (bJoin, tJoinBase, stJoinBase) = runTimed(
      StreamQueries.outerIntervalJoin(
        StreamQueries.eventStream(spark, sfDir)), "append", "adv_jb")
    val joinRowsBase = bJoin.count()

    val (pJoin, tJoinPlanted, stJoinPlanted) = runTimed(
      StreamQueries.outerIntervalJoin(
        StreamQueries.eventStream(spark, advDir)), "append", "adv_jp")
    val joinRowsPlanted = pJoin.count()
    val hotPairs = pJoin.filter(col("user_id") === hotUser &&
      col("click_id").isNotNull).count()
    assert(hotPairs == expectedHotPairs,
      s"trap arm lost matches: $hotPairs vs batch twin $expectedHotPairs")
    assert(hotPairs > burstN * 10,
      s"trap did not land: hot product $hotPairs not superlinear in " +
        s"burst $burstN")

    // mitigation: bound matches per error by deduping the click side
    // to one representative per (user, minute) BEFORE the join —
    // bounded dedup state (distinct (user, minute) keys), then each
    // error meets ≤31 clicks whatever the burst volume. Salting is
    // unavailable here (state is keyed by the join key), so match
    // bounding is the production lever.
    def mitigatedJoin(ev: DataFrame): DataFrame = {
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("tsu").as("e_ts"),
          col("event_id").as("error_id"))
        .withWatermark("e_ts", "0 seconds")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("tsu").as("c_ts"),
          (unix_micros(col("tsu")) / lit(60000000L)).cast("long")
            .as("c_min"),
          col("event_id").as("click_id"))
        .withWatermark("c_ts", "0 seconds")
        .dropDuplicatesWithinWatermark("c_user", "c_min")
      errors.join(clicks, expr(
        """c_user = e_user AND
          |c_ts >= e_ts - interval 30 minutes AND
          |c_ts <= e_ts""".stripMargin), "left_outer")
        .select(col("error_id"), col("click_id"),
          col("e_user").as("user_id"))
    }
    val (mJoin, tJoinMit, stJoinMit) = runTimed(
      mitigatedJoin(StreamQueries.eventStream(spark, advDir)),
      "append", "adv_jm")
    val hotPairsMit = mJoin.filter(col("user_id") === hotUser &&
      col("click_id").isNotNull).count()
    val hotErrors = spark.read.parquet(
        graft.io.Tables.path(advDir, "events"))
      .filter(col("user_id") === hotUser && col("event_type") === "error")
      .count()
    assert(hotPairsMit <= hotErrors * 31L,
      s"mitigation bound violated: $hotPairsMit > ${hotErrors * 31L}")

    // ---- session window: skew-proof by construction ----------------
    val (bSess, tSessBase, stSessBase) = runTimed(
      StreamQueries.sessionWindows(
        StreamQueries.eventStream(spark, sfDir)), "complete", "adv_sb")
    val sessBase = bSess.count()
    val (pSess, tSessPlanted, stSessPlanted) = runTimed(
      StreamQueries.sessionWindows(
        StreamQueries.eventStream(spark, advDir)), "complete", "adv_sp")
    val sessPlanted = pSess.count()
    val hotSessions = pSess.filter(col("user_id") === hotUser).count()
    assert(hotSessions == 1L,
      s"burst should merge into ONE session, got $hotSessions")
    assert(sessPlanted <= sessBase + 2,
      s"session state grew superlinearly: $sessPlanted vs base $sessBase")

    val json =
      s"""{"corpus":$n,"burst":$burstN,"hot_user":$hotUser,""" +
      s""""join":{"baseline_sec":$tJoinBase,"baseline_rows":$joinRowsBase,"baseline_state":$stJoinBase,""" +
      s""""planted_sec":$tJoinPlanted,"planted_rows":$joinRowsPlanted,"planted_state":$stJoinPlanted,""" +
      s""""hot_pairs":$hotPairs,"expected_hot_pairs":$expectedHotPairs,""" +
      s""""mitigated_sec":$tJoinMit,"mitigated_state":$stJoinMit,"mitigated_hot_pairs":$hotPairsMit,"hot_errors":$hotErrors},""" +
      s""""session":{"baseline_sec":$tSessBase,"baseline_state":$stSessBase,"baseline_sessions":$sessBase,""" +
      s""""planted_sec":$tSessPlanted,"planted_state":$stSessPlanted,"planted_sessions":$sessPlanted,"hot_sessions":$hotSessions},""" +
      s""""sf":"$sfDir"}"""
    println(json)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("target/adversarial_stream.json"),
      json.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
