package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-curation operators a training-data pipeline needs beyond dedup and
  * similarity: PII redaction over raw text, a Deequ-style data-quality
  * audit, 2-D skyline extraction, and fuzzy (edit-distance) entity
  * resolution. All pure column-expression plans — no UDFs — so they stay
  * inside whole-stage codegen.
  */
object CurationOps {

  /** Erasure keys for [[forgetCascade]]: every 97th customer, standing in
    * for a batch of right-to-be-forgotten requests. */
  val ForgetModulus = 97

  /** Order-independent table checksum — the cross-cluster reconciliation
    * primitive: did a migration / backfill / replica produce EXACTLY this
    * table? Per status group: row count + a 60-bit digest that is the
    * BIT-XOR of per-row md5 prefixes. XOR is commutative, associative and
    * self-inverse, so the aggregate is partition-order-independent (any
    * engine, any parallelism, same digest), map-side combinable, and
    * O(1) state — at 100 TB this is one map-only pass and an 8-byte
    * shuffle per task, and two clusters can compare tables by exchanging
    * 3 rows instead of 3 billion. 15 hex chars (60 bits) keeps the value
    * inside ANSI BIGINT on both engines; a row edit flips the group
    * digest with probability 1 − 2⁻⁶⁰ per pair. Typed columns are
    * rendered through EXPLICIT formats (dates via `date_format`) because
    * a reconciliation digest must pin the byte representation, not
    * inherit an engine's default cast — the docstring contract for
    * production use is "format every column explicitly, especially
    * floats". */
  def tableChecksum(spark: SparkSession, sf: String): DataFrame =
    tableChecksumFrom(Tables.load(spark, sf, "orders"))

  /** The digest over any orders-shaped frame — split out so the
    * partition-order-invariance and single-row-sensitivity contracts are
    * testable. */
  /** The 60-bit md5-prefix ROW digest over the orders reconciliation
    * payload — shared by [[tableChecksumFrom]] and the audit-sink write
    * path (`SourceOps.auditSink`), so both publish the same cross-engine
    * format. Every field is explicitly NULL-sentineled BEFORE
    * concatenation: concat_ws silently skips NULLs (so (a,NULL,b) and
    * (a,b,NULL) would collide) and DuckDB's `||` propagates them (so the
    * engines would disagree on any NULL-bearing table); the \u0001
    * sentinel cannot appear in the fixture's printable columns. */
  private[graft] def orderDigest: Column = {
    def f(c: Column): Column = coalesce(c.cast("string"), lit("\u0001"))
    val payload = concat_ws("|",
      f(col("o_orderkey")), f(col("o_custkey")), f(col("o_orderstatus")),
      f(date_format(col("o_orderdate"), "yyyy-MM-dd")),
      f(col("o_orderpriority")))
    conv(substring(md5(payload), 1, 15), 16, 10).cast("long")
  }

  private[graft] def tableChecksumFrom(orders: DataFrame): DataFrame = {
    orders
      .select(col("o_orderstatus"), orderDigest.as("digest"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(digest)").as("xor_digest"))
      .orderBy("o_orderstatus")
  }

  /** GDPR erasure-cascade audit — given a batch of customer keys to
    * forget, measure the blast radius down the foreign-key chain
    * (customer → orders → lineitem) BEFORE running the deletes: per
    * table, rows before / deleted / after. The cascade is two LEFT SEMI
    * joins (each table's doomed rows are the ones whose parent is
    * doomed). Only the REQUEST batch (doomed custkeys) is hint-broadcast
    * — it's bounded by the erasure request, not the data. The derived
    * doomed-ORDER set scales with the fact (~1% of all orderkeys), so
    * its semi join onto lineitem carries no hint: AQE broadcasts while
    * it fits and falls back to a shuffle semi join beyond that — the
    * same no-unbounded-broadcast rule as brandRevenue's dims. The
    * actual delete is then the anti-join twin of each semi (same plan,
    * inverted), which [[graft.ops.Relational.upsert]]-style sinks apply;
    * auditing first is the discipline: erasure is irreversible. */
  def forgetCascade(spark: SparkSession, sf: String): DataFrame = {
    val c = Tables.load(spark, sf, "customer")
    val o = Tables.load(spark, sf, "orders")
    val l = Tables.load(spark, sf, "lineitem")
    val doomedC = c.filter(col("c_custkey") % ForgetModulus === 0)
      .select("c_custkey")
    val doomedO = o.join(broadcast(doomedC),
      col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey")
    def census(name: String, table: DataFrame, doomed: DataFrame) = {
      val before = table.agg(count(lit(1)).as("rows_before"))
      val del = doomed.agg(count(lit(1)).as("rows_deleted"))
      before.join(del)
        .select(lit(name).as("table_name"), col("rows_before"),
          col("rows_deleted"),
          (col("rows_before") - col("rows_deleted")).as("rows_after"))
    }
    val doomedL = l.join(doomedO,
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    census("customer", c, doomedC)
      .unionAll(census("orders", o, doomedO))
      .unionAll(census("lineitem", l, doomedL.select("l_orderkey")))
      .orderBy("table_name")
  }

  /** URL-canonicalization dedup — the web-crawl dedup that runs BEFORE
    * any content hashing: the same page arrives as `HTTP://Example.com/a/`,
    * `http://example.com:80/a?utm_source=feed`, … and only canonical-form
    * grouping sees them as one fetch. The fixture has no URL column, so
    * deterministic raw URLs are synthesized per doc (casing / default
    * port / tracking params / trailing slash vary by doc_id — the
    * [[piiRedact]] inject-then-process discipline) and then canonicalized
    * with the pure-expression chain: lowercase scheme+host, strip default
    * ports, drop `utm_*`/`ref` params (normalizing the separator debris
    * they leave, so real params that follow survive intact), trim the
    * trailing separator and slash. Every step is `regexp_replace` in the Java∩RE2
    * subset, so the plan is map-only codegen until the final group —
    * which shuffles the CANONICAL key, the whole point at 100 TB (the
    * raw variants never co-locate). */
  /** The canonicalization chain of [[urlDedup]] over any URL column —
    * split out so arbitrary inputs (tracking + real params mixed, etc.)
    * are testable. */
  def canonicalizeUrl(raw: Column): Column = {
    // scheme+host lowercase: split head (scheme://host) from the rest,
    // lower() the head — regex engines can't lowercase a capture, an
    // expression can.
    val head = regexp_extract(raw, "^([A-Za-z]+://[^/:?]+)", 1)
    val rest = regexp_replace(raw, "^[A-Za-z]+://[^/:?]+", "")
    val rejoined = concat(lower(head), rest)
    // default-port strip, capture-free (Java $1 vs RE2 \1 replacement
    // syntax differs — plain patterns sidestep it; ':NN' cannot occur
    // elsewhere in a path, where '/' or '?' always precedes) and
    // SCHEME-AWARE: :80 is default only for http, :443 only for https —
    // stripping the wrong one would merge distinct origins
    def stripPort(u: Column, port: String): Column =
      regexp_replace(regexp_replace(
        regexp_replace(u, s":$port/", "/"), s":$port\\?", "?"), s":$port$$", "")
    val noPort = when(rejoined.startsWith("http://"), stripPort(rejoined, "80"))
      .when(rejoined.startsWith("https://"), stripPort(rejoined, "443"))
      .otherwise(rejoined)
    // tracking-param strip that stays correct when real params follow AND
    // is anchored on the param-name boundary (a bare '(utm_…|ref)=' would
    // also fire inside 'href=x'/'aref=x', corrupting real params): the
    // pattern consumes the leading separator and re-emits it as a literal
    // — capture-free, so the Java-vs-RE2 '$1'/'\1' replacement divergence
    // never applies — then the debris passes below normalize what's left:
    // collapse '&' runs, collapse '?[?&]+' to '?', strip a trailing
    // separator. '?utm_a=1&page=2' → '?&page=2' → '?page=2';
    // '?utm_a=1&utm_b=2' → '?&' → '?' → ''.
    val noTrack = regexp_replace(
      regexp_replace(noPort, "\\?(utm_[a-z]+|ref)=[^&?]*", "?"),
      "&(utm_[a-z]+|ref)=[^&?]*", "&")
    val ampRuns = regexp_replace(noTrack, "&+", "&")
    val qRuns = regexp_replace(ampRuns, "\\?[?&]+", "?")
    val noDangle = regexp_replace(qRuns, "[?&]$", "")
    regexp_replace(noDangle, "/$", "")
  }

  def urlDedup(spark: SparkSession, sf: String): DataFrame = {
    val docs = Tables.load(spark, sf, "documents")
    // raw variant per doc: path collides every 40 ids, decoration varies
    val raw = concat(
      when(col("doc_id") % 3 === 0, "HTTP://").otherwise("http://"),
      when(col("doc_id") % 2 === 0, "WWW.Example.COM").otherwise("www.example.com"),
      when(col("doc_id") % 5 === 0, ":80").otherwise(""),
      lit("/page/"), (col("doc_id") % 40).cast("string"),
      when(col("doc_id") % 4 === 0, "/").otherwise(""),
      when(col("doc_id") % 7 === 0, "?utm_source=mail&utm_campaign=x")
        .otherwise(""),
      when(col("doc_id") % 11 === 0, "?ref=home").otherwise(""))
    docs.select(col("doc_id"), canonicalizeUrl(raw).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_raw"), min("doc_id").as("keep_doc"))
      .orderBy("canonical_url")
  }

  /** Per-source language-distribution entropy — the corpus-composition
    * audit run before fixing a training mix (a source whose language
    * entropy collapses between crawls is a scraper bug; one whose entropy
    * explodes got contaminated). Shannon entropy in bits via the
    * single-pass identity H = log2(T) − (Σ c·log2 c)/T over the per-
    * (source, lang) counts, so the plan is two cascaded aggregates — the
    * second over ~|sources|×|langs| rows — with NO join-back for the
    * total; at 100 TB both shuffles are map-side combined and the second
    * input is tiny. `top_share` (heaviest language's fraction) reads the
    * same rows — concentration and entropy from one pass. */
  def langEntropy(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "documents")
      .groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(
        sum("c").as("n_docs"),
        count(lit(1)).as("n_langs"),
        round(log2(sum("c")) -
          sum(col("c") * log2(col("c"))) / sum("c"), 4).as("entropy_bits"),
        round(max("c") * lit(1.0) / sum("c"), 4).as("top_share"))
      .orderBy("source")

  /** Email / IPv4 / long-number redaction over document text — the
    * compliance pass every web-scale corpus runs before training. The
    * fixture text is synthetic and PII-free, so deterministic PII is
    * INJECTED first (an email, an IP and a numeric id derived from doc_id)
    * and then redacted; match counts and the redacted tail prove every
    * pattern fired. All three patterns use the regex subset Java and RE2
    * agree on (char classes, bounded repetition, `\b`, `\d` — no
    * backrefs/lookaround), which is also what keeps the plan
    * codegen-friendly: `regexp_replace`/`regexp_count` are built-in
    * expressions, applied innermost-first so a replaced `<EMAIL>` token
    * can't partially re-match the IP or number patterns. At 100 TB this is
    * a map-only scan — no shuffle at all — and the ORDER BY exists only for
    * the oracle hash. */
  def piiRedact(spark: SparkSession, sf: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val longNum = "\\d{4,}"
    val raw = concat(
      col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com from 10."), (col("doc_id") % 200).cast("string"),
      lit(".0."), (col("doc_id") % 250).cast("string"),
      lit(" ref="), (col("doc_id") * 7919).cast("string"))
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"), raw.as("raw"))
      .select(
        col("doc_id"),
        regexp_count(col("raw"), lit(email)).cast("long").as("n_emails"),
        regexp_count(col("raw"), lit(ipv4)).cast("long").as("n_ips"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("raw"), email, "<EMAIL>"),
            ipv4, "<IP>"),
          longNum, "<NUM>").as("redacted"))
      .select(
        col("doc_id"), col("n_emails"), col("n_ips"),
        length(col("redacted")).cast("long").as("red_len"),
        expr("right(redacted, 60)").as("red_tail"))
      .orderBy("doc_id")
  }

  /** Data-quality audit (the Deequ/expectations pattern): a fixed suite of
    * constraint checks, each one violation COUNT so a pipeline can gate on
    * `violations == 0` per check. Checks chosen to exercise the distinct
    * check *shapes*, not just columns: referential integrity (anti-join),
    * key uniqueness (count vs distinct), domain bounds, null rate, and
    * cross-column consistency. Every check is a scan→agg (or anti-join→agg)
    * over ONE table with map-side partial aggregation; the union of 1-row
    * frames is driver-free. At 100 TB each check shuffles at most its
    * group-by key (the FK anti-join co-partitions on the key it validates);
    * checks over the same table could share one scan via a single
    * multi-aggregate pass — kept separate here so each check names its own
    * plan, the way an expectations suite composes incrementally. */
  def dataQuality(spark: SparkSession, sf: String): DataFrame = {
    val li = Tables.load(spark, sf, "lineitem")
    val orders = Tables.load(spark, sf, "orders")
    val cust = Tables.load(spark, sf, "customer")
    def check(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("check_name"), col("violations"))
    val orphanLineitem = li.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"),
        "left_anti")
      .agg(count(lit(1)).as("violations"))
    val dupCustkey = cust.agg(
      (count(lit(1)) - count_distinct(col("c_custkey"))).as("violations"))
    val negQty = li.filter(col("l_quantity") <= 0).agg(count(lit(1)).as("violations"))
    val badDiscount = li.filter(col("l_discount") < 0 || col("l_discount") > 1)
      .agg(count(lit(1)).as("violations"))
    val nullSegment = cust.filter(col("c_mktsegment").isNull)
      .agg(count(lit(1)).as("violations"))
    val shipBeforeOrder = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") < col("o_orderdate"))
      .agg(count(lit(1)).as("violations"))
    check("fk_lineitem_order", orphanLineitem)
      .unionAll(check("unique_custkey", dupCustkey))
      .unionAll(check("qty_positive", negQty))
      .unionAll(check("discount_in_unit_range", badDiscount))
      .unionAll(check("mktsegment_not_null", nullSegment))
      .unionAll(check("ship_after_order", shipBeforeOrder))
      .orderBy("check_name")
  }

  /** 2-D skyline (Pareto frontier): parts no other part dominates on
    * (smaller-or-equal size, higher-or-equal price, one strict) — the
    * frontier-extraction op a curation pipeline runs on quality-vs-cost
    * trade-offs. NOT the naive all-pairs anti-join: the dominance test
    * reduces to per-size maxima (a map-side-combinable aggregate, ≤
    * |distinct sizes| rows) + one window over that tiny frame for the
    * best-price-at-any-smaller-size, + a broadcast join back to tag
    * frontier rows. The global window therefore runs on dimension-sized
    * data no matter how many parts exist — the general distributed-skyline
    * identity (skyline of locals = skyline) specialized to a
    * low-cardinality axis. */
  def skyline(spark: SparkSession, sf: String): DataFrame =
    skylineFrom(Tables.load(spark, sf, "part")
      .select(col("p_partkey"), col("p_size"), round(col("p_retailprice"), 2).as("price")))

  /** Skyline over any (p_partkey, p_size, price) frame — the form the
    * property test drives with generated inputs. */
  def skylineFrom(part: DataFrame): DataFrame = {
    val bySize = part.groupBy("p_size").agg(max(col("price")).as("best_same"))
    val wSmaller = org.apache.spark.sql.expressions.Window
      .orderBy(col("p_size")).rangeBetween(Long.MinValue, -1)
    val frontierSizes = bySize
      .withColumn("best_smaller", max(col("best_same")).over(wSmaller))
      .filter(col("best_smaller").isNull || col("best_smaller") < col("best_same"))
    part.join(broadcast(frontierSizes), Seq("p_size"))
      .filter(col("price") === col("best_same"))
      .select(col("p_partkey"), col("p_size"), col("price"))
      .orderBy("p_partkey")
  }

  /** Fuzzy entity resolution via SymSpell-style deletion blocking: dirty
    * strings (each nation name with one character deterministically
    * deleted at position key % length) are matched back to the clean
    * dimension WITHOUT an all-pairs levenshtein scan. The clean side
    * pre-expands into its single-deletion variants (L+1 rows per name,
    * including the identity), candidates come from an exact equi-join on
    * the variant string, and levenshtein runs only on candidates to rank
    * them; `min_by` on a (distance, name) lexicographic key picks a
    * deterministic best match per dirty string. This is the LSH-banding
    * idea transplanted to edit distance: blocking bounds candidates, exact
    * verify ranks them. At 100 TB the variant index of a dimension stays
    * dimension-sized (× avg length) and broadcasts, so the dirty side
    * streams map-only through a hash lookup; deeper edit radii expand
    * deletion-k variants on both sides (SymSpell), still equi-join shaped.
    */
  def fuzzyJoin(spark: SparkSession, sf: String): DataFrame = {
    val nation = Tables.load(spark, sf, "nation").select("n_nationkey", "n_name")
    val dirty = nation.select(
      col("n_nationkey").as("dirty_key"),
      expr("""concat(substring(n_name, 1, CAST(n_nationkey % length(n_name) AS INT)),
                     substring(n_name, CAST(n_nationkey % length(n_name) AS INT) + 2, 100))""")
        .as("dirty_name"))
    fuzzyResolve(nation.select(col("n_name")), dirty)
  }

  /** Resolve a (dirty_key, dirty_name) frame against a clean (n_name)
    * dimension via the deletion-variant index — the form the property test
    * drives with generated corruptions. */
  def fuzzyResolve(clean: DataFrame, dirty: DataFrame): DataFrame = {
    val variants = clean.select(
      col("n_name"),
      explode(expr(
        """transform(sequence(1, length(n_name) + 1),
                     i -> concat(substring(n_name, 1, i - 1), substring(n_name, i + 1, 100)))"""))
        .as("variant"))
      .distinct()
    val dist = levenshtein(col("dirty_name"), col("n_name"))
    dirty.join(broadcast(variants), col("dirty_name") === col("variant"))
      .select(col("dirty_key"), col("dirty_name"), col("n_name"), dist.as("dist"))
      .groupBy("dirty_key", "dirty_name")
      .agg(
        min_by(col("n_name"), concat(col("dist").cast("string"), lit("|"), col("n_name")))
          .as("matched_name"),
        min(col("dist")).cast("long").as("dist"))
      .orderBy("dirty_key")
  }

  /** Zero-extra-pass pipeline health metrics via the Observation API: row
    * count, null count and an HLL distinct estimate for a key column ride
    * the SAME physical pass as whatever the caller computes downstream —
    * `observe` plants a CollectMetrics node whose accumulators the action
    * fills as a side effect. At 100 TB this is the difference between
    * monitored and unmonitored pipelines: the [[dataQuality]] audit is a
    * standalone (re-)scan you schedule, while these counters are free on
    * every production job that already runs. Returns the instrumented
    * frame plus the Observation handle; metrics are available after the
    * first action on the frame. */
  def withHealthMetrics(df: DataFrame, keyCol: String)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("n_key_null"),
      approx_count_distinct(col(keyCol)).as("n_key_approx_distinct"))
    (observed, obs)
  }

  /** Jaro-Winkler record-linkage scoring over the [[fuzzyJoin]] corruption
    * fixture — the SIMILARITY-graded tier of entity resolution next to
    * fuzzyJoin's edit-distance verify: every (corrupted name, clean name)
    * pair scoring ≥ 0.8 under the native codegen'd
    * [[graft.functions.JaroWinkler]] expression, so near-misses rank by
    * transposition-tolerant, prefix-boosted similarity instead of a hard
    * edit radius. The clean side here is a 25-row dimension and broadcasts
    * — all-pairs is dim × dim, the deliberate exact baseline; at 100 TB
    * the pair stream comes from a blocking stage (deletion-variant index /
    * sorted neighborhood / LSH, all implemented in this engine) and this
    * expression is the verify, inside whole-stage codegen either way. The
    * filter is on the ROUNDED score in both engines (the r10 prune
    * lesson: never threshold on unrounded floats the oracle rounds). */
  def jaroRank(spark: SparkSession, sf: String): DataFrame = {
    val nation = Tables.load(spark, sf, "nation").select("n_nationkey", "n_name")
    val dirty = nation.select(
      col("n_nationkey").as("dirty_key"),
      expr("""concat(substring(n_name, 1, CAST(n_nationkey % length(n_name) AS INT)),
                     substring(n_name, CAST(n_nationkey % length(n_name) AS INT) + 2, 100))""")
        .as("dirty_name"))
    val jw = round(graft.functions.StringSimilarityFunctions
      .jaro_winkler(col("dirty_name"), col("n_name")), 4)
    dirty.join(broadcast(nation.select("n_name")))
      .withColumn("jw", jw)
      .filter(col("jw") >= 0.8)
      .select(col("dirty_key"), col("dirty_name"), col("n_name"), col("jw"))
      .orderBy("dirty_key", "n_name")
  }

  /** Minimum class size for [[kAnonymity]] — the release bar: an
    * equivalence class smaller than this is re-identifiable. */
  val KAnonThreshold = 5L

  /** k-anonymity / l-diversity release audit — the privacy dual of the
    * [[forgetCascade]] erasure audit: BEFORE a table leaves the warehouse,
    * group it by its quasi-identifiers (here segment × nation — the
    * attributes an attacker can link from public data) and measure each
    * equivalence class. A class of size < k means its members are
    * re-identifiable by QI linkage alone; a class whose SENSITIVE
    * attribute (account-balance band) takes < l distinct values leaks the
    * sensitive value even when k holds (homogeneity attack), so both
    * numbers are reported per class with the release verdicts. At 100 TB
    * this is one map-side-combined aggregate over the QI key — the same
    * shuffle as any census; the remediation ladder (suppress failing
    * classes, or generalize a QI — nation → region — and re-audit) just
    * re-runs the same plan one level up, which is why the audit must be
    * this cheap. Sensitive-band cuts are constants, so both engines bin
    * identically; counts cast to BIGINT on both sides. */
  def kAnonymity(spark: SparkSession, sf: String): DataFrame = {
    val banded = Tables.load(spark, sf, "customer")
      .withColumn("bal_band",
        when(col("c_acctbal") < 0.0, "debt")
          .when(col("c_acctbal") < 3000.0, "low")
          .when(col("c_acctbal") < 7000.0, "mid")
          .otherwise("high"))
    banded
      .groupBy(col("c_mktsegment").as("segment"),
        col("c_nationkey").cast("bigint").as("nation"))
      .agg(
        count(lit(1)).as("class_size"),
        countDistinct(col("bal_band")).as("l_diversity"))
      .withColumn("k_anonymous", col("class_size") >= KAnonThreshold)
      .withColumn("l_diverse", col("l_diversity") >= 2L)
      .orderBy("segment", "nation")
  }

  /** Privacy budget ε for [[dpRelease]] (per released statistic). */
  val DpEpsilon = 1.0

  /** Per-record contribution clamp for [[dpRelease]]'s noisy sum — bounds
    * the sum's sensitivity to this value (the contribution-bounding step
    * every DP aggregate needs BEFORE noise is calibrated). */
  val DpClampHi = 5000.0

  /** Differentially-private release (Dwork et al. 2006, the Laplace
    * mechanism) — the third rung of the privacy ladder after the
    * [[kAnonymity]] audit and [[piiRedact]]: per-segment COUNT (sensitivity
    * 1) and clamped SUM of balances (sensitivity [[DpClampHi]], enforced by
    * clamping each record's contribution to [0, clamp] first) each released
    * with additive Laplace(Δ/ε) noise via the exact inverse-CDF sampler
    * −b·sign(u−½)·ln(1−2|u−½|). The uniform draw u is derived from the md5
    * of (tag, release key) — DETERMINISTIC here so the whole mechanism
    * (clamp → aggregate → calibrate b → sample → add) is value-checked by
    * the oracle; a production release swaps in calibrated randomness and
    * nothing else changes (the [[TextOps.weightedSampleFrom]] discipline).
    * True aggregates never appear in the output. At 100 TB: one
    * map-combined aggregate per QI key; noise is O(1) per released row. */
  def dpRelease(spark: SparkSession, sf: String): DataFrame = {
    def unif(tag: String): Column =
      (conv(substring(md5(concat_ws("|", lit(tag), col("segment"))), 1, 8),
        16, 10).cast("double") + 0.5) / lit(4294967296.0)
    def laplace(u: Column, b: Double): Column =
      lit(-b) * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    Tables.load(spark, sf, "customer")
      .select(col("c_mktsegment").as("segment"),
        greatest(lit(0.0), least(col("c_acctbal"), lit(DpClampHi))).as("bal"))
      .groupBy("segment")
      .agg(count(lit(1)).cast("double").as("n"), sum("bal").as("s"))
      .select(col("segment"),
        round(col("n") + laplace(unif("cnt"), 1.0 / DpEpsilon), 4)
          .as("n_released"),
        round(col("s") + laplace(unif("sum"), DpClampHi / DpEpsilon), 4)
          .as("bal_released"))
      .orderBy("segment")
  }
}
