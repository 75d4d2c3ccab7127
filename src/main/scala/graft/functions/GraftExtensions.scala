package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * Session extensions for the graft engine: registers the native expressions with the
 * Catalyst function registry. Usable both programmatically
 * (`SparkSession.builder.withExtensions(new GraftExtensions)`) and via
 * `--conf spark.sql.extensions=graft.functions.GraftExtensions` on spark-submit.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("ahocorasick_matches"),
      new ExpressionInfo(classOf[AhoCorasickMatches].getName, "ahocorasick_matches"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        AhoCorasickMatches.create(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordShingles.create(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_md5"),
      new ExpressionInfo(classOf[MinhashMd5].getName, "minhash_md5"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinhashMd5.create(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("simhash_md5"),
      new ExpressionInfo(classOf[SimhashMd5].getName, "simhash_md5"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimhashMd5.create(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("quantize_i64"),
      new ExpressionInfo(classOf[QuantizeI64].getName, "quantize_i64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        QuantizeI64.create(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("qdot_i64"),
      new ExpressionInfo(classOf[QdotI64].getName, "qdot_i64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        QdotI64.create(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RepetitionStats.create(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucketExpr].getName, "lsh_bucket"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LshBucketExpr.create(exprs)))
  }
}
