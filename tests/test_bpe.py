"""BPE vocabulary induction (Sennrich ACL'16) — merge-table contract."""

from collections import Counter

from pydata_vector_search_spark.operators.bpe import (LearnedBpeTokenizer,
                                                      bpe_train,
                                                      word_frequencies)
from pydata_vector_search_spark.operators.tokenize import tokenize_counts


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")


def _naive(texts, num_merges, min_pair_count=2):
    """Independent brute-force reference: recount everything each step."""
    words = Counter()
    import re

    from pydata_vector_search_spark.functions.text import BPE_ISH_PATTERN
    for t in texts:
        words.update(re.findall(BPE_ISH_PATTERN, t.lower()))
    seqs = {w: list(w) for w in words}
    merges = []
    for step in range(1, num_merges + 1):
        pc = Counter()
        for w, c in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (left, right), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((step, left, right, cnt))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges, seqs, words


def test_classic_sennrich_corpus(spark):
    texts = ["low low low low low", "lower lower",
             "newest newest newest newest newest newest", "widest widest"]
    got = [tuple(r) for r in
           bpe_train(_docs(spark, texts), "text", num_merges=4)
           .orderBy("step").collect()]
    want, _, _ = _naive(texts, 4)
    assert got == want
    # first merge must be the most frequent adjacent pair: 'es' (8 =
    # 6 newest + 2 widest) ties with 'st','we' — 'es' < 'st' < 'we'
    assert got[0][1:] == ("e", "s", 8)


def test_greedy_left_to_right_overlap(spark):
    # 'aaa' under merge a+a -> [aa, a], never [a, aa]
    df = _docs(spark, ["aaa aaa"])
    got = [tuple(r) for r in bpe_train(df, "text", num_merges=2)
           .orderBy("step").collect()]
    assert got == [(1, "a", "a", 4), (2, "aa", "a", 2)]


def test_tie_breaks_lexicographic(spark):
    got = [tuple(r) for r in
           bpe_train(_docs(spark, ["ab cd", "ab cd", "ab cd"]), "text",
                     num_merges=1).collect()]
    assert got == [(1, "a", "b", 3)]


def test_min_pair_count_stops_early(spark):
    df = _docs(spark, ["abc abc", "xyz"])
    got = [tuple(r) for r in
           bpe_train(df, "text", num_merges=10, min_pair_count=2)
           .orderBy("step").collect()]
    # abc merges twice at count 2; everything after is hapax
    assert [g[3] for g in got] == [2, 2]


def test_zero_merges_and_empty_corpus(spark):
    assert bpe_train(_docs(spark, ["some text"]), "text",
                     num_merges=0).count() == 0
    assert bpe_train(_docs(spark, [""]), "text", num_merges=5).count() == 0


def test_random_corpus_matches_naive(spark):
    import random
    rng = random.Random(91)
    vocab = ["the", "cat", "cats", "concatenate", "dog", "dogma", "a",
             "ab", "abab", "ba", "2023", "don't", "e-mail"]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(1, 12)))
             for _ in range(30)]
    got = [tuple(r) for r in
           bpe_train(_docs(spark, texts), "text", num_merges=12,
                     min_pair_count=1).orderBy("step").collect()]
    want, _, _ = _naive(texts, 12, min_pair_count=1)
    assert got == want


def test_word_frequencies_cap_is_deterministic(spark):
    df = _docs(spark, ["b a d c", "d c b a"])  # all counts tie at 2
    got = [r["word"] for r in
           word_frequencies(df, "text", max_word_types=2).collect()]
    assert sorted(got) == ["a", "b"]  # count desc, then word asc


def test_learned_tokenizer_reproduces_training_segmentation(spark):
    texts = ["low low low lower lowest", "newest newest new"]
    df = _docs(spark, texts)
    merges_df = bpe_train(df, "text", num_merges=6, min_pair_count=1)
    merges = [(r["left"], r["right"])
              for r in merges_df.orderBy("step").collect()]
    tok = LearnedBpeTokenizer(merges)
    _, seqs, words = _naive(texts, 6, min_pair_count=1)
    for w in words:
        assert tok.encode_len(w) == len(seqs[w]), w
    # corpus-level: counts via the executor-side hook match the
    # training-state lengths exactly
    counted = {r["doc_id"]: r["n_tok"]
               for r in tokenize_counts(df, "text",
                                        tokenizer=tok).collect()}
    import re

    from pydata_vector_search_spark.functions.text import BPE_ISH_PATTERN
    for i, t in enumerate(texts):
        want = sum(len(seqs[w])
                   for w in re.findall(BPE_ISH_PATTERN, t.lower()))
        assert counted[i] == want


def test_heavy_fuzz_matches_naive_incremental(spark):
    # r10: the merge loop is incremental (inverted index + lazy heap);
    # this fuzz is built to force decrement-then-reselect — merges that
    # lower a rival pair's count before that pair later wins — and pins
    # bit-exact parity with the full-recount reference over 40 merges.
    import random
    rng = random.Random(1007)
    alphabet = "abcde"
    vocab = ["".join(rng.choices(alphabet, k=rng.randint(2, 9)))
             for _ in range(60)]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(3, 15)))
             for _ in range(50)]
    got = [tuple(r) for r in
           bpe_train(_docs(spark, texts), "text", num_merges=40,
                     min_pair_count=1).orderBy("step").collect()]
    want, _, _ = _naive(texts, 40, min_pair_count=1)
    assert got == want
    assert len(got) > 20  # the corpus actually sustains deep merging


def test_deep_fuzz_incremental_matches_recount_200_merges():
    # r10 verdict watch item: the incremental loop's lazy-heap /
    # inverted-index invariants (push-on-every-update, where-set
    # add/discard symmetry) previously had their deep fuzz only in
    # tools/bpe_deep_bench.py. This is the default-path version:
    # driver-only (no Spark session), a 400-type Zipf-ish random
    # vocabulary fuzzed through 200 merges against the full-recount
    # reference, bit-exact on the entire merge table. Runs in ~1 s.
    import random

    from pydata_vector_search_spark.operators.bpe import (_learn_merges,
                                                          _merge_word)

    def recount(freq, num_merges, min_pair_count):
        seqs = [(list(w), c) for w, c in freq]
        merges = []
        for step in range(1, num_merges + 1):
            counts = {}
            for syms, c in seqs:
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + c
            if not counts:
                break
            (left, right), best = min(counts.items(),
                                      key=lambda kv: (-kv[1], kv[0]))
            if best < min_pair_count:
                break
            merges.append((step, left, right, best))
            seqs = [(_merge_word(s, left, right) if left in s else s, c)
                    for s, c in seqs]
        return merges

    for seed in (3, 1009):
        rng = random.Random(seed)
        best = {}
        for r in range(1, 401):
            w = "".join(rng.choices("abcdefg", k=rng.randint(2, 12)))
            best[w] = max(best.get(w, 0), max(1, 100_000 // r))
        freq = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))
        got = _learn_merges(freq, 200, 1)
        want = recount(freq, 200, 1)
        assert got == want, seed
        assert len(got) == 200, seed  # the vocab sustains all 200


def test_tokenizer_cache_is_bounded():
    # r09 ADVICE: the per-task word memo must not grow without limit on
    # high-cardinality streams. Shrink the cap and overflow it.
    tok = LearnedBpeTokenizer([("a", "b")])
    tok._CACHE_CAP = 8
    for i in range(100):
        tok.encode_len(f"word{i}ab")
    assert len(tok._cache) <= 8
    # correctness unaffected by eviction: 'ab' merges to one symbol
    assert tok.encode_len("abab") == 2
