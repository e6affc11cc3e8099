package graft

import graft.config.ReindexConfig
import graft.operators.ReindexJob
import graft.sinks.{BatchedUpsertSink, HttpUpdateTransport, NdjsonDirSink}
import graft.sources.{AuthorityStore, DocSource, JdbcDocSource, KvAuthorityStore,
  NdjsonDocSource, ParquetDocSource, RespKvTransport}
import graft.util.{ErrorCollector, Lockfile}

/** CLI entry point — the analog of the reference binary's
  * `reindex [config.json]` contract (reference driver.go:119-220,
  * README.md:48-51):
  *
  *   config load+validate → source/sink selection → preflight →
  *   lockfile → pipeline → result report → meaningful exit code.
  *
  * Exit codes (fixes reference B10, whose exit code never reflected
  * ingest failures): 0 success, 1 preflight/lock refusal, 2 config
  * error, 3 completed with soft errors.
  *
  * Source: `sourcePath` (parquet/NDJSON, test/zero-egress path) or the
  * partitioned JDBC scan.  Sink: `solrUrl` with a `file:` scheme
  * becomes the chunked NDJSON directory sink; anything else is the
  * batched HTTP upsert sink.
  */
object ReindexMain {

  def main(args: Array[String]): Unit = sys.exit(run(args.toSeq))

  def run(args: Seq[String]): Int =
    ReindexConfig.load(args) match {
      case Left(err) =>
        System.err.println(s"[reindex] config error: $err")
        2
      case Right(conf) =>
        val spark = GraftSession.get(conf.workers.toString)
        val source: DocSource =
          if (conf.sourcePath.isEmpty) new JdbcDocSource(conf, numPartitions = conf.workers)
          else if (conf.sourcePath.endsWith(".parquet")) new ParquetDocSource(conf.sourcePath, conf.startId)
          else new NdjsonDocSource(conf.sourcePath, conf.startId)
        val errors = ErrorCollector(spark.sparkContext)
        val sink =
          if (conf.solrUrl.startsWith("file:"))
            new NdjsonDirSink(conf.solrUrl.stripPrefix("file:"), conf.chunkSize)
          else
            new BatchedUpsertSink(new HttpUpdateTransport(conf.solrUrl), conf.chunkSize, Some(errors))
        // authorities=true (the reference default): a dependency-free
        // RESP client against conf.redisUrl; preflight PINGs it and
        // refuses to start when unreachable (reference driver.go:133-145)
        val store: Option[AuthorityStore] =
          if (conf.authorities) Some(new KvAuthorityStore(new RespKvTransport(conf.redisUrl)))
          else None
        ReindexJob.run(spark, conf, source, sink, Lockfile.default(), Some(errors), store) match {
          case Left(reasons) =>
            reasons.foreach(r => System.err.println(s"[reindex] abort: $r"))
            1
          case Right(res) =>
            println(s"[reindex] wrote ${res.docsWritten} docs, softErrors=${res.softErrors}, " +
              s"checkpoint=${res.checkpoint.getOrElse("-")}")
            res.errorSamples.take(5).foreach(s => System.err.println(s"[reindex] error sample: $s"))
            if (res.softErrors > 0) 3 else 0
        }
    }
}
