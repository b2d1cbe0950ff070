package graft.core

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** A per-(session, key) memo cache that does not outlive its sessions.
  *
  * Query modules memoize expensive artifacts (persisted row-id indexes,
  * checkpointed near-dup pair sets) per (SparkSession, data dir) — like one
  * open per file in the reference. A plain static map would pin those
  * DataFrames and the SparkSession itself for the JVM lifetime; here the
  * first insert for a session registers a listener that drops every entry of
  * that session when its application ends (the persisted/checkpointed blocks
  * themselves die with the context).
  */
final class SessionCache[V] {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), V]
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  def getOrElseUpdate(s: SparkSession, key: String)(mk: => V): V = {
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = {
          cache.keys.filter(_._1 eq s).foreach(cache.remove)
          hooked.remove(s)
        }
      })
    }
    cache.getOrElseUpdate((s, key), mk)
  }
}
