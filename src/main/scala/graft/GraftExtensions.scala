package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, CountTokensIn, HammingBits, LexiconScore, MinMd5, ScaledDot, ShingleJoin, SimHashSig, TopKStruct, ZOrderBits}

/** Registers graft's native expressions as SQL functions so both the
  * Column API and `spark.sql("... graft_cosine(a,b) ...")` can use them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[HammingBits].getName, "graft_hamming"),
      (children: Seq[Expression]) => HammingBits(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_lexicon_score"),
      new ExpressionInfo(classOf[LexiconScore].getName, "graft_lexicon_score"),
      (children: Seq[Expression]) => LexiconScore(
        children(0), children(1), children(2), children(3),
        children(4), children(5), children(6))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleJoin].getName, "graft_shingles"),
      (children: Seq[Expression]) => ShingleJoin(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashSig].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHashSig(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_count_in"),
      new ExpressionInfo(classOf[CountTokensIn].getName, "graft_count_in"),
      (children: Seq[Expression]) => CountTokensIn(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_min_md5"),
      new ExpressionInfo(classOf[MinMd5].getName, "graft_min_md5"),
      (children: Seq[Expression]) => MinMd5(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_sdot"),
      new ExpressionInfo(classOf[ScaledDot].getName, "graft_sdot"),
      (children: Seq[Expression]) => ScaledDot(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKStruct].getName, "graft_topk"),
      (children: Seq[Expression]) => TopKStruct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZOrderBits].getName, "graft_zorder"),
      (children: Seq[Expression]) => ZOrderBits(children(0), children(1))))
  }
}
