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
  * The scoring machinery works on `valence × 1e6` = a 1e7-scaled
  * integer, so per-token contributions stay exact integers through the
  * booster (+0.293 sign-aligned, VADER's B_INCR) and negation (×-0.74,
  * VADER's N_SCALAR) modifiers — see [[LexiconScore]].
  *
  * Coverage (r13): [[Real]] is a ~190-entry exact-valence transcription
  * of the most frequent entries of the ~7,500-entry published list;
  * [[RealTier2]] widens it by ~230 further published-list words whose
  * MEMBERSHIP and POLARITY are from the published data but whose tenths
  * here are approximate (within a few tenths of the published means —
  * declared honestly: this sandbox has no copy of vader_lexicon.txt to
  * transcribe from). Both engines score with the identical table (the
  * lexicon is shared expression text), so approximate valences cannot
  * desynchronize the oracle — they only make the labels closer to the
  * reference's full-lexicon behavior than the r11 subset was. The full
  * file drops in by extending these lists (same format as
  * vader_lexicon.txt's first two columns).
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

  /** Second transcription tier (r13): further words of the published
    * VADER list. Membership and sign are the published data; the tenths
    * are APPROXIMATE (see the class doc) — close to, not bit-equal to,
    * the published means.
    */
  val RealTier2: Seq[(String, Int)] = Seq(
    // positive
    "accomplish" -> 19, "accomplished" -> 18, "achievement" -> 21,
    "active" -> 14, "admirable" -> 26, "adorable" -> 26,
    "adventure" -> 16, "affection" -> 24, "agreement" -> 18,
    "alive" -> 15, "ambitious" -> 17, "angel" -> 21, "attract" -> 15,
    "attractive" -> 19, "award" -> 25, "awarded" -> 22, "bargain" -> 14,
    "bless" -> 19, "blessed" -> 26, "bliss" -> 27, "bold" -> 14,
    "bonus" -> 22, "boost" -> 17, "bright" -> 19, "capable" -> 16,
    "celebrated" -> 24, "champion" -> 27, "cheer" -> 23,
    "cheerful" -> 25, "clean" -> 17, "compassion" -> 23,
    "confident" -> 22, "congrats" -> 26, "congratulations" -> 29,
    "courage" -> 22, "creative" -> 19, "cute" -> 20, "dear" -> 16,
    "decent" -> 12, "dedicated" -> 17, "determined" -> 17,
    "devoted" -> 21, "eager" -> 15, "ecstatic" -> 31, "efficient" -> 17,
    "elegant" -> 21, "encourage" -> 19, "energetic" -> 19,
    "enthusiastic" -> 23, "faith" -> 19, "faithful" -> 21,
    "favorite" -> 20, "fearless" -> 18, "festive" -> 21,
    "flawless" -> 25, "forgive" -> 16, "fortunate" -> 20,
    "friend" -> 22, "friends" -> 19, "generous" -> 22, "genius" -> 25,
    "gentle" -> 19, "gift" -> 18, "gifted" -> 21, "glorious" -> 27,
    "glory" -> 22, "grace" -> 16, "graceful" -> 20, "grateful" -> 23,
    "greet" -> 13, "happily" -> 24, "harmony" -> 19, "heal" -> 16,
    "healthy" -> 17, "heaven" -> 24, "hero" -> 25, "honest" -> 22,
    "honor" -> 22, "honored" -> 24, "hug" -> 19, "hugs" -> 20,
    "humor" -> 15, "ideal" -> 17, "impress" -> 20, "impressed" -> 21,
    "innovative" -> 17, "inspire" -> 22, "inspired" -> 21,
    "inspiring" -> 23, "intelligent" -> 22, "interested" -> 15,
    "joke" -> 11, "joyful" -> 28, "keen" -> 13, "laugh" -> 21,
    "laughed" -> 18, "laughing" -> 23, "laughter" -> 24,
    "legendary" -> 20, "lucky" -> 21, "magnificent" -> 28,
    "marvelous" -> 27, "masterpiece" -> 25, "mercy" -> 15,
    "miracle" -> 25, "motivated" -> 17, "noble" -> 19, "optimism" -> 20,
    "optimistic" -> 21, "outstanding" -> 27, "paradise" -> 26,
    "passion" -> 20, "passionate" -> 22, "peace" -> 22,
    "peaceful" -> 23, "playful" -> 18, "pleasant" -> 19,
    "pleasure" -> 23, "popular" -> 17, "praise" -> 22, "praised" -> 21,
    "precious" -> 22, "pretty" -> 18, "proud" -> 21, "radiant" -> 22,
    "recommend" -> 15, "recommended" -> 16, "relaxed" -> 18,
    "reliable" -> 18, "rescue" -> 14, "respect" -> 19,
    "respected" -> 21, "rich" -> 22, "romantic" -> 20,
    "satisfying" -> 19, "secure" -> 14, "sensational" -> 24,
    "shine" -> 17, "smart" -> 19, "smiling" -> 23, "special" -> 16,
    "splendid" -> 26, "stunning" -> 24, "sunny" -> 17, "support" -> 16,
    "supported" -> 17, "supportive" -> 20, "sweet" -> 20,
    "talent" -> 17, "talented" -> 20, "terrific" -> 26,
    "treasure" -> 21, "triumph" -> 24, "truthful" -> 20, "useful" -> 18,
    "vibrant" -> 21, "warm" -> 16, "wealth" -> 19, "welcome" -> 20,
    "wise" -> 19, "wish" -> 13, "wow" -> 26, "yay" -> 27,
    // negative
    "abandon" -> -19, "abandoned" -> -20, "abuse" -> -30,
    "abused" -> -25, "accident" -> -17, "accuse" -> -17,
    "accused" -> -19, "ache" -> -17, "aggressive" -> -11,
    "alarm" -> -14, "anxiety" -> -18, "anxious" -> -15, "argue" -> -16,
    "argument" -> -16, "arrogant" -> -21, "ashamed" -> -21,
    "attack" -> -21, "attacked" -> -20, "awkward" -> -13, "ban" -> -20,
    "banned" -> -20, "betray" -> -28, "betrayed" -> -25,
    "bitter" -> -18, "blame" -> -17, "blamed" -> -17, "bleak" -> -16,
    "bored" -> -12, "bother" -> -14, "brutal" -> -26, "burden" -> -15,
    "careless" -> -15, "chaos" -> -22, "cheat" -> -21,
    "cheated" -> -22, "collapse" -> -18, "complain" -> -15,
    "complained" -> -16, "conflict" -> -16, "confused" -> -13,
    "corrupt" -> -25, "coward" -> -20, "crashed" -> -16,
    "crime" -> -25, "criminal" -> -24, "cruelty" -> -29,
    "curse" -> -19, "cursed" -> -21, "deceive" -> -21, "defeat" -> -17,
    "defeated" -> -20, "delay" -> -13, "delayed" -> -14,
    "denied" -> -18, "deny" -> -15, "depressed" -> -23,
    "depression" -> -26, "destroy" -> -25, "destroyed" -> -26,
    "devastating" -> -28, "disease" -> -23, "disgrace" -> -22,
    "dishonest" -> -24, "dismal" -> -19, "distress" -> -21,
    "disturbing" -> -21, "doom" -> -21, "doubtful" -> -14,
    "dull" -> -14, "enemy" -> -23, "error" -> -16, "errors" -> -15,
    "exhausted" -> -16, "fake" -> -18, "fatal" -> -25, "fault" -> -16,
    "fearful" -> -21, "foolish" -> -18, "frantic" -> -16,
    "frustrated" -> -21, "frustrating" -> -20, "furious" -> -27,
    "greed" -> -23, "grief" -> -24, "gross" -> -17, "harsh" -> -18,
    "hatred" -> -31, "heartbreaking" -> -25, "hostile" -> -22,
    "humiliate" -> -24, "hurts" -> -21, "illegal" -> -23,
    "illness" -> -21, "inferior" -> -17, "injury" -> -17,
    "insane" -> -17, "jerk" -> -19, "junk" -> -16, "lazy" -> -16,
    "liar" -> -25, "lie" -> -18, "lied" -> -19, "lies" -> -17,
    "mess" -> -15, "miserable" -> -25, "misery" -> -26,
    "mourn" -> -22, "nasty" -> -24, "nervous" -> -14, "offend" -> -19,
    "offended" -> -19, "outrage" -> -23, "punish" -> -21,
    "punished" -> -22, "rage" -> -24, "reject" -> -19,
    "rejection" -> -21, "resent" -> -19, "risky" -> -14, "rude" -> -20,
    "sabotage" -> -23, "savage" -> -19, "selfish" -> -20,
    "severe" -> -16, "shock" -> -14, "shocked" -> -15,
    "shocking" -> -16, "sin" -> -19, "skeptical" -> -13,
    "sorrow" -> -23, "struggle" -> -16, "struggling" -> -17,
    "stuck" -> -13, "suck" -> -19, "sucks" -> -19, "suspicious" -> -15,
    "terror" -> -28, "terrorist" -> -31, "tragic" -> -25,
    "trauma" -> -23, "unacceptable" -> -20, "uncertain" -> -12,
    "uncomfortable" -> -15, "unfortunate" -> -18,
    "unfortunately" -> -14, "unreliable" -> -17, "unstable" -> -15,
    "waste" -> -18, "wasted" -> -19, "worried" -> -16, "worry" -> -17,
    "wreck" -> -19)

  /** Synthetic-corpus stand-ins on the same tenths scale (the r10 lists'
    * polarities, now with graded valences). NOT VADER data.
    */
  val StandIns: Seq[(String, Int)] = Seq(
    "fast" -> 19, "small" -> 12, "merge" -> 15, "key" -> 8,
    "spark" -> 23, "slow" -> -19, "big" -> -11, "dup" -> -21)

  val Entries: Seq[(String, Int)] = Real ++ RealTier2 ++ StandIns

  /** Narrow second labeler: only high-valence entries (|v| ≥ 1.9) — the
    * "strong words only" twin the agreement matrix compares against the
    * full lexicon (standing in for the reference's VADER-vs-trained-ML
    * comparison, as in r10, now on graded valences).
    */
  val NarrowTenths = 19
  val EntriesNarrow: Seq[(String, Int)] =
    Entries.filter { case (_, v) => math.abs(v) >= NarrowTenths }

  /** word → valence ×1e7 (exact long) — the single scaling used by the
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

  /** Intensity boosters: VADER's BOOSTER_DICT increment subset, applied
    * per lookback position with VADER's distance damping (×1 / ×0.95 /
    * ×0.9 — [[LexiconScore.BoostAtO]], r15; the decrement entries live
    * in [[Dampeners]]) plus the two corpus stand-ins.
    */
  val Boosters: Seq[String] = Seq(
    "very", "really", "extremely", "absolutely", "completely",
    "entirely", "especially", "exceptionally", "incredibly",
    "remarkably", "so", "totally", "utterly", "deeply", "hugely",
    "tremendously", "unbelievably", "amazingly", "extraordinarily",
    // corpus stand-ins (synthetic vocabulary)
    "hash", "batch")

  /** Intensity DAMPENERS (r15): VADER BOOSTER_DICT's decrement entries
    * (B_DECR −0.293 — "kind of", "sort of", "slightly"…), the multi-word
    * degree modifiers the r14 verdict flagged as absent. Applied as
    * −B_INCR sign-aligned (toward zero) anywhere in the same 3-token
    * lookback the boosters use. VADER words that are ALSO in its NEGATE
    * list ("hardly", "rarely", "seldom") stay negators here — the
    * data-asset invariant forbids double duty. Plus corpus stand-ins.
    */
  val Dampeners: Seq[String] = Seq(
    "almost", "barely", "kinda", "sorta", "less", "little",
    "marginally", "occasionally", "partly", "scarcely", "slightly",
    "somewhat",
    // corpus stand-ins (synthetic vocabulary)
    "line", "row")

  /** Multi-word dampeners, matched as ADJACENT token bigrams whose
    * second word falls inside the 3-token lookback (first word directly
    * precedes it). VADER's published "kind of" / "sort of" entries; the
    * corpus stand-in keeps the bigram path oracled on the synthetic
    * corpus. A bigram's FIRST word may itself be a lexicon entry
    * ("kind" → 2.4) — VADER scores the single word independently of the
    * bigram modifier, and so does graft.
    */
  val DampenerBigrams: Seq[(String, String)] = Seq(
    "kind" -> "of", "sort" -> "of",
    // corpus stand-in (synthetic vocabulary)
    "data" -> "table")

  /** The dampener literal [[LexiconScore]] parses: singles plus
    * underscore-joined bigrams.
    */
  def dampArg: String =
    (Dampeners ++ DampenerBigrams.map { case (a, b) => s"${a}_$b" })
      .mkString(" ")

  /** The _negation_check idiom vocabulary (r16): at lookback offsets 2
    * and 3, "never so/this …" scales ×1.25 instead of negating and
    * "without doubt …" passes unmodified (vaderSentiment's
    * _negation_check special cases, start_i 1 and 2). Each list pairs
    * the published VADER word with a corpus stand-in so the branches
    * stay oracled on the synthetic corpus: "order"/"query" are ALREADY
    * the negator stand-ins, mirroring VADER's structure where "never"
    * and "without" are themselves NEGATE entries whose idiom forms
    * REDIRECT the negation; "agg"/"join" are free synthetic-vocabulary
    * words standing in for the (ungated) neighbor words.
    */
  val NeverWords: Seq[String] = Seq("never",
    // corpus stand-in (already the first negator stand-in)
    "order")
  val SoThisWords: Seq[String] = Seq("so", "this",
    // corpus stand-in (synthetic vocabulary)
    "agg")
  val WithoutWords: Seq[String] = Seq("without",
    // corpus stand-in (already the second negator stand-in)
    "query")
  val DoubtWords: Seq[String] = Seq("doubt",
    // corpus stand-in (synthetic vocabulary)
    "join")

  /** The _least_check vocabulary (r16): "least X" dampens X by N_SCALAR
    * unless preceded by "at"/"very" (vaderSentiment's _least_check,
    * applied AFTER the lookback loop). The published word plus a corpus
    * stand-in keeps the MAIN branch oracled on the synthetic corpus;
    * the at/very exception words are the published pair (no synthetic
    * "at" analog exists — the exception branch is exercised by the
    * planted English specs and the fuzz model).
    */
  val LeastWords: Seq[String] = Seq("least",
    // corpus stand-in (synthetic vocabulary)
    "column")
  val AtVeryWords: Seq[String] = Seq("at", "very")

  /** The idiom literal [[LexiconScore]] parses: the six lists joined
    * with '|' (space-separated within).
    */
  def idiomArg: String = Seq(NeverWords, SoThisWords, WithoutWords,
    DoubtWords, LeastWords, AtVeryWords)
    .map(_.mkString(" ")).mkString("|")

  /** Contrastive-conjunction pivots — VADER's _but_check (r15): token
    * valences BEFORE the first pivot halve (×1/2), those AFTER scale
    * ×3/2, applied as the LAST per-token step (after caps, boosters,
    * dampeners, negation — VADER modifies the finished sentiments
    * list). Every reachable pre-pivot value is even (all terms are
    * multiples of 100; the −74/100 negation leaves an even value), so
    * both scalings are exact integer arithmetic in both engines. The
    * published rule is the single word "but"; the corpus stand-in keeps
    * the path oracled on the synthetic corpus.
    */
  val ButWords: Seq[String] = Seq("but",
    // corpus stand-in (synthetic vocabulary)
    "group")

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
  // r15 modifier invariants: a single-word dampener or a but-pivot doing
  // double duty as lexicon/negator/booster would self-modify or
  // double-count inside one lookback window (bigram FIRST words are
  // exempt — VADER's "kind" is both a lexicon entry and half of
  // "kind of", scored independently)
  require(Dampeners.toSet
      .intersect(Valence.keySet ++ Negators ++ Boosters).isEmpty,
    "VaderLexicon: a dampener is also a lexicon/negator/booster word")
  require(ButWords.toSet.intersect(Valence.keySet ++ Negators ++ Boosters
      ++ Dampeners ++ DampenerBigrams.map(_._2)).isEmpty,
    "VaderLexicon: a but-pivot word is also a modifier/lexicon word")
}
