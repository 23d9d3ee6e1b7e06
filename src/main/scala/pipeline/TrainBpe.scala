package pipeline

import org.apache.spark.sql.functions._

/**
 * Tokenizer-training CLI — the corpus→tokenizer leg of the training-data
 * story (the corpus→ids leg is `CorpusRefine.writeTokenShards` /
 * `writeSequenceShards`, which consume what this emits):
 *
 *   sbt 'runMain pipeline.TrainBpe --input /data/docs.parquet \
 *     --text-col text --merges 32000 --mode byte --out /data/tokenizer'
 *
 * Runs the distributed word-frequency pass + driver-side merge learning
 * (`pipeline.expr.Bpe.train` — the HF/SentencePiece two-phase shape),
 * then writes the standard artifacts: `merges.txt` (GPT-2 format,
 * loadable by `Bpe.load` and any GPT-2-compatible tokenizer) and
 * `vocab.json` (the table's derived symbol→id map). Prints one JSON
 * summary line.
 */
object TrainBpe {

  def main(args: Array[String]): Unit = {
    val conf = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val input = conf.getOrElse("--input",
      throw new IllegalArgumentException("--input <parquet path> is required"))
    val textCol = conf.getOrElse("--text-col", "text")
    val numMerges = conf.getOrElse("--merges", "1000").toInt
    val mode = conf.getOrElse("--mode", "byte")
    require(mode == "byte" || mode == "char", s"--mode must be byte|char, got $mode")
    val out = conf.getOrElse("--out", "/tmp/graft-tokenizer")
    val maxWords = conf.getOrElse("--max-words", (1 << 22).toString).toInt
    val cores = conf.getOrElse("--cores", "8").toInt

    val spark = Sessions.local(cores)
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(input).filter(col(textCol).isNotNull)
    val t0 = System.nanoTime()
    val table = pipeline.expr.Bpe.train(docs, textCol, numMerges,
      byteLevel = mode == "byte", maxWords = maxWords)
    val sec = (System.nanoTime() - t0) / 1e9

    val dir = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("merges.txt"),
      pipeline.expr.Bpe.renderMerges(table.merges))
    java.nio.file.Files.writeString(dir.resolve("vocab.json"),
      pipeline.expr.Bpe.renderVocab(table.vocab))

    // self-check: the artifacts load back to the identical table, and a
    // corpus sample round-trips (byte mode is lossless by construction)
    val loaded = pipeline.expr.Bpe.load(s"$out/merges.txt",
      byteLevel = mode == "byte", vocabPath = s"$out/vocab.json")
    require(loaded.merges == table.merges, "merges.txt round-trip mismatch")
    val sample = docs.limit(100).select(col(textCol).cast("string").as("t"),
      pipeline.expr.Bpe.bpeDecode(
        pipeline.expr.Bpe.bpeEncode(col(textCol), loaded), loaded).as("back"))
    val bad = sample.filter(
      if (mode == "byte") col("t") =!= col("back") else col("back").isNull).count()
    require(bad == 0, s"$bad sample docs failed the encode/decode self-check")

    println(f"""{"bench":"train_bpe","mode":"$mode","merges":${table.merges.size},"vocab":${table.vocab.size},"sec":$sec%.2f,"out":"$out"}""")
    spark.stop()
  }
}
