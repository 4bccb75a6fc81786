package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-stop hygiene for the in-JVM memo maps (r17 verdict #5 + advisor
  * #2). The chain/token/projection memos key on applicationId so a
  * recreated session never READS frames bound to a dead context (the r16
  * fix), but entries for stopped contexts still accreted for the JVM's
  * lifetime — and the tokenRelations / embProjections entries hold
  * PERSISTED corpus-sized data. Every memo owner registers one clearer
  * here at object init; the first memo lookup in a session installs (once
  * per context) a SparkListener whose `onApplicationEnd` runs every
  * clearer for the stopping context. All in-repo mains stop their session
  * on exit, and a long-lived multi-session JVM — the advisor's scenario —
  * now sheds each context's entries the moment that context ends instead
  * of accreting them until process death. [[clearAll]] is also directly
  * callable (the spec's seam, and an explicit teardown for hosts that
  * keep a context alive but want the memos dropped). */
object MemoHygiene {

  private val clearers =
    new java.util.concurrent.CopyOnWriteArrayList[String => Unit]()

  private val installedApps =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register a clearer, called with the stopping context's applicationId.
    * Owners register ONCE, from their object initializer — the clearer
    * must therefore tolerate running with empty maps. */
  private[graft] def register(clear: String => Unit): Unit = {
    clearers.add(clear); ()
  }

  /** Idempotently arm the application-end hook for `spark`'s context —
    * called by every memo getter, so any session that populates a memo
    * has its teardown installed before the first entry exists.
    *
    * The first install for a NEW context also re-runs every clearer
    * defensively (r18 advisor #3): `clearAll` runs on the listener-bus
    * thread with no lock against concurrent getters, so a
    * computeIfAbsent racing the application-end teardown can insert an
    * entry keyed to the stopping context AFTER its clearer ran, leaving
    * a dead-context entry for the JVM's lifetime. Only one SparkContext
    * is ever live per JVM, and every getter installs BEFORE inserting,
    * so at this point every surviving map entry is dead-context garbage
    * by construction — the sweep drops them (no unpersist fires: their
    * key prefixes name the dead context, whose blocks died with it). */
  private[graft] def install(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    val appId = sc.applicationId
    if (installedApps.add(appId)) {
      clearAll(appId)
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          // the installed mark drops only when the context actually ends —
          // an explicit mid-life clearAll must NOT drop it, or the next
          // memo lookup would register a SECOND listener for the same
          // context (harmless but accreting: the exact class this object
          // exists to close)
          installedApps.remove(appId)
          clearAll(appId)
        }
      })
    }
  }

  /** Whether the hook is armed for `spark`'s context (spec seam). */
  private[graft] def installedFor(spark: SparkSession): Boolean =
    installedApps.contains(spark.sparkContext.applicationId)

  /** Run every registered clearer for `appId`. */
  private[graft] def clearAll(appId: String): Unit =
    clearers.forEach(c => c(appId))

  /** Persist `df` only if its plan is not already in the CacheManager.
    * Several queries persist plan-identical intermediates (the unigram
    * count table of pmiCollocations and lmPerplexity, the minhash banded
    * rows of the LSH cluster path and dedupMinhash itself); CacheManager
    * already no-ops the second persist of a cached plan, but it logs
    * "Asked to cache already cached data" each time. This guard makes the
    * reuse deliberate and silent. Callers must NOT later unpersist the
    * returned frame — the cache entry may be owned by an earlier query
    * (the repo convention is caller-side clearCache between queries, so
    * these intra-session shares are bounded by one query run in prod). */
  private[graft] def persistOnce(df: DataFrame): DataFrame =
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.persist() else df

  /** `.persistOnce()` postfix syntax for [[persistOnce]], so call sites
    * read like the `.persist()` they replace. */
  private[graft] object PersistSyntax {
    implicit class PersistOnceOps(private val df: DataFrame) extends AnyVal {
      def persistOnce(): DataFrame = MemoHygiene.persistOnce(df)
    }
  }

  /** Shared eviction shape for DataFrame memos keyed `appId|…`: drop EVERY
    * entry (at application end no other context in the JVM is live, so any
    * survivor is garbage by construction), unpersisting only the stopping
    * context's frames — an earlier dead context's cache died with its
    * executors, and unpersist against it would throw. Try-guarded: the
    * listener runs while the context is mid-stop. */
  private[graft] def evictByApp(
      m: java.util.concurrent.ConcurrentHashMap[String, DataFrame],
      appId: String): Unit = {
    import scala.jdk.CollectionConverters._
    m.keySet.asScala.toList.foreach { k =>
      Option(m.remove(k)).foreach { df =>
        if (k.startsWith(appId + "|")) { scala.util.Try(df.unpersist()); () }
      }
    }
  }
}
