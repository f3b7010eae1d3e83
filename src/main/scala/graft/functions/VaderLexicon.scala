package graft.functions

/** The sentiment data asset: a curated subset of the public-domain VADER
  * lexicon (Hutto & Gilbert, "VADER: A Parsimonious Rule-based Model for
  * Sentiment Analysis of Social Media Text", ICWSM 2014 — MIT-licensed
  * data, the exact list the reference scores with:
  * spark-ml-sentiment/spark_ml_sentiment.py:88-145), plus the corpus
  * stand-in entries the synthetic test corpus needs to exercise every
  * code path.
  *
  * Layout: `word -> valence in TENTHS` (VADER publishes mean ratings on
  * a [-4, +4] scale with one decimal; "good" = 1.9 is stored as 19).
  * The scoring machinery works on `valence × 1e4` = a 1e5-scaled
  * integer, so per-token contributions stay exact integers through the
  * booster (+0.293 sign-aligned, VADER's B_INCR) and negation (×-0.74,
  * VADER's N_SCALAR) modifiers — see [[LexiconScore]].
  *
  * This is a ~180-entry transcription of the most frequent entries of
  * the ~7,500-entry published list — enough to carry the rule model and
  * the real data shape; the full file drops in by extending [[Real]]
  * (same format as vader_lexicon.txt's first two columns).
  *
  * The corpus [[StandIns]] map the synthetic vocabulary (SURVEY §3:
  * "fast", "slow", "merge"…) onto the same valence scale so the driver
  * corpus — which contains none of the English sentiment vocabulary —
  * still produces a non-trivial label distribution. They are appended
  * AFTER the real entries and documented as stand-ins, not VADER data.
  */
object VaderLexicon {

  /** Transcribed VADER entries (word, valence in tenths). */
  val Real: Seq[(String, Int)] = Seq(
    // positive
    "good" -> 19, "great" -> 31, "greatest" -> 34, "best" -> 32,
    "better" -> 19, "love" -> 32, "loved" -> 29, "loves" -> 27,
    "lovely" -> 28, "like" -> 15, "liked" -> 16, "likes" -> 15,
    "awesome" -> 31, "amazing" -> 28, "excellent" -> 27,
    "fantastic" -> 26, "wonderful" -> 27, "happy" -> 27,
    "happiness" -> 29, "joy" -> 28, "glad" -> 20, "nice" -> 18,
    "cool" -> 13, "fun" -> 23, "funny" -> 19, "beautiful" -> 27,
    "brilliant" -> 28, "perfect" -> 27, "win" -> 28, "winner" -> 28,
    "winning" -> 26, "wins" -> 27, "super" -> 29, "superb" -> 30,
    "thank" -> 15, "thanks" -> 19, "thankful" -> 23, "pleased" -> 19,
    "impressive" -> 23, "positive" -> 23, "success" -> 27,
    "successful" -> 27, "smile" -> 20, "smiles" -> 17, "strong" -> 23,
    "free" -> 23, "freedom" -> 23, "hope" -> 19, "hopeful" -> 21,
    "kind" -> 24, "friendly" -> 22, "delight" -> 29, "delighted" -> 27,
    "enjoy" -> 22, "enjoyed" -> 23, "satisfied" -> 20, "relief" -> 19,
    "excited" -> 23, "exciting" -> 23, "interesting" -> 17,
    "helpful" -> 18, "improve" -> 19, "improved" -> 21,
    "improvement" -> 17, "safe" -> 19, "trust" -> 21, "worthy" -> 19,
    "yes" -> 17, "ok" -> 9, "okay" -> 9, "fine" -> 8, "easy" -> 19,
    "comfort" -> 21, "comfortable" -> 19, "advantage" -> 20,
    "benefit" -> 20, "reward" -> 24, "valuable" -> 21, "victory" -> 28,
    "celebrate" -> 27, "charming" -> 25, "clever" -> 21, "care" -> 21,
    "cares" -> 21, "caring" -> 25, "calm" -> 13, "brave" -> 24,
    "beloved" -> 29, "appreciate" -> 20, "appreciated" -> 21,
    "admire" -> 23, "adore" -> 29, "agree" -> 15, "agreeable" -> 18,
    // negative
    "bad" -> -25, "worse" -> -21, "worst" -> -31, "terrible" -> -21,
    "horrible" -> -25, "awful" -> -20, "hate" -> -27, "hated" -> -29,
    "hates" -> -18, "dislike" -> -16, "sad" -> -21, "sadness" -> -24,
    "unhappy" -> -18, "angry" -> -23, "anger" -> -17, "mad" -> -17,
    "fear" -> -18, "afraid" -> -20, "scared" -> -19, "scary" -> -22,
    "ugly" -> -21, "stupid" -> -24, "dumb" -> -23, "fail" -> -25,
    "failed" -> -23, "failure" -> -25, "fails" -> -21, "lose" -> -13,
    "loser" -> -24, "losing" -> -13, "lost" -> -13, "wrong" -> -21,
    "problem" -> -17, "problems" -> -17, "trouble" -> -20,
    "pain" -> -25, "painful" -> -19, "hurt" -> -24, "broken" -> -19,
    "crash" -> -15, "crisis" -> -31, "danger" -> -24,
    "dangerous" -> -25, "dead" -> -33, "death" -> -29, "die" -> -29,
    "died" -> -26, "kill" -> -37, "killed" -> -30, "war" -> -29,
    "fight" -> -16, "fraud" -> -28, "scam" -> -26, "dirty" -> -20,
    "disappointed" -> -22, "disappointing" -> -22, "disaster" -> -31,
    "disgusting" -> -23, "annoying" -> -18, "boring" -> -13,
    "worthless" -> -26, "useless" -> -18, "weak" -> -19, "poor" -> -21,
    "cry" -> -21, "crying" -> -22, "cruel" -> -28, "damage" -> -22,
    "damaged" -> -19, "desperate" -> -17, "difficult" -> -15,
    "doubt" -> -15, "dread" -> -24, "evil" -> -33, "guilt" -> -23,
    "guilty" -> -22, "harm" -> -24, "harmful" -> -25, "hell" -> -27,
    "hopeless" -> -25, "ignore" -> -15, "ignored" -> -18,
    "insult" -> -22, "insulted" -> -23, "jealous" -> -20,
    "lonely" -> -18, "miss" -> -12, "missed" -> -12, "mistake" -> -18,
    "mistakes" -> -17, "negative" -> -22, "nightmare" -> -26,
    "panic" -> -22, "pathetic" -> -24, "regret" -> -20,
    "rejected" -> -22, "ruin" -> -24, "ruined" -> -24, "shame" -> -21,
    "sick" -> -21, "sorry" -> -5, "steal" -> -25, "stolen" -> -22,
    "stress" -> -20, "stressed" -> -18, "suffer" -> -25,
    "suffering" -> -25, "threat" -> -22, "tired" -> -12, "toxic" -> -24,
    "tragedy" -> -31, "unfair" -> -21, "upset" -> -19, "victim" -> -22,
    "violence" -> -30, "violent" -> -29, "warning" -> -14)

  /** Synthetic-corpus stand-ins on the same tenths scale (the r10 lists'
    * polarities, now with graded valences). NOT VADER data.
    */
  val StandIns: Seq[(String, Int)] = Seq(
    "fast" -> 19, "small" -> 12, "merge" -> 15, "key" -> 8,
    "spark" -> 23, "slow" -> -19, "big" -> -11, "dup" -> -21)

  val Entries: Seq[(String, Int)] = Real ++ StandIns

  /** Narrow second labeler: only high-valence entries (|v| ≥ 1.9) — the
    * "strong words only" twin the agreement matrix compares against the
    * full lexicon (standing in for the reference's VADER-vs-trained-ML
    * comparison, as in r10, now on graded valences).
    */
  val NarrowTenths = 19
  val EntriesNarrow: Seq[(String, Int)] =
    Entries.filter { case (_, v) => math.abs(v) >= NarrowTenths }

  /** word → valence ×1e5 (exact long) — the single scaling used by the
    * native expression and the spec's HOF twin (one derivation, so the
    * test oracle can never desynchronize from the data asset).
    */
  def scaled(entries: Seq[(String, Int)]): Map[String, Long] =
    entries.map { case (w, v) => w -> v * LexiconScore.TenthScale }.toMap

  val Valence: Map[String, Long] = scaled(Entries)

  /** The `'word:tenths word:tenths …'` literal [[LexiconScore]] parses. */
  def lexArg(entries: Seq[(String, Int)]): String =
    entries.map { case (w, v) => s"$w:$v" }.mkString(" ")

  /** Words with positive / negative valence — the count-feature lists
    * (pos_n / neg_n panels, ml.SentimentPipeline weak-label features).
    */
  val PosWords: Seq[String] = Entries.collect { case (w, v) if v > 0 => w }
  val NegWords: Seq[String] = Entries.collect { case (w, v) if v < 0 => w }
  val PosWordsNarrow: Seq[String] =
    EntriesNarrow.collect { case (w, v) if v > 0 => w }
  val NegWordsNarrow: Seq[String] =
    EntriesNarrow.collect { case (w, v) if v < 0 => w }

  /** Negation markers: VADER's NEGATE list (the apostrophe-less forms —
    * the clean_text stage strips punctuation, so "don't" reaches the
    * scorer as "dont") plus the two corpus stand-ins.
    */
  val Negators: Seq[String] = Seq(
    "not", "no", "never", "none", "neither", "nor", "nothing", "nobody",
    "cannot", "cant", "dont", "didnt", "doesnt", "isnt", "wasnt",
    "werent", "wont", "wouldnt", "couldnt", "shouldnt", "aint",
    "without", "hardly", "rarely", "seldom",
    // corpus stand-ins (synthetic vocabulary)
    "order", "query")

  /** Intensity boosters: VADER's BOOSTER_DICT increment subset (our
    * simplified rule model applies the full B_INCR anywhere in the
    * 3-token lookback; VADER's distance damping and decrement boosters
    * — "slightly", "somewhat" — are out of scope) plus the two corpus
    * stand-ins.
    */
  val Boosters: Seq[String] = Seq(
    "very", "really", "extremely", "absolutely", "completely",
    "entirely", "especially", "exceptionally", "incredibly",
    "remarkably", "so", "totally", "utterly", "deeply", "hugely",
    "tremendously", "unbelievably", "amazingly", "extraordinarily",
    // corpus stand-ins (synthetic vocabulary)
    "hash", "batch")

  /** Emoji sentiment tables: the reference counts positive/negative
    * emoji occurrences and derives emoji_score = pos − neg
    * (spark_ml_sentiment.py:92-101; VADER ships the UTF-8 emoji table
    * these classes come from). Real emoji first; the two marker-token
    * stand-ins stay appended so the emoji-free synthetic corpus still
    * exercises the counting path.
    */
  val PosEmoji: Seq[String] = Seq(
    "😀", "😃", "😄", "😁", "😊", "🙂", "😍", "🥰", "❤", "❤️",
    "👍", "🎉", "😂", "🤣", "✨", "💯", "🙌", "😎",
    // corpus stand-ins
    "vector", "window")
  val NegEmoji: Seq[String] = Seq(
    "😠", "😡", "😢", "😭", "👎", "💔", "😞", "😟", "😨", "😱",
    "🤬", "😤", "😒", "🙁",
    // corpus stand-ins
    "scan", "filter")

  // data-asset invariants, checked at class-load so a bad edit fails the
  // first test instead of silently desynchronizing the engines: no
  // duplicate words (the SQL CASE would shadow, the map would drop), no
  // zero valences (the scorer treats 0 as "not in lexicon"), and no word
  // doing double duty as a negator/booster (the modifier would apply to
  // its own valence)
  require(Entries.map(_._1).distinct.size == Entries.size,
    "VaderLexicon: duplicate lexicon entry")
  require(Entries.forall(_._2 != 0), "VaderLexicon: zero-valence entry")
  require(Valence.keySet.intersect((Negators ++ Boosters).toSet).isEmpty,
    "VaderLexicon: a lexicon word is also a negator/booster")
}
