"""q247 BPE trainer semantics: the marker-rendered SQL-replace merge
must agree with a reference Python BPE trainer (greedy left-to-right
non-overlapping merge, argmax by (freq DESC, pair) per round) on
corpora built to hit the two failure modes the rendering exists for:

- greedy RUNS ('aaaa' under merge (a,a) -> ['aa','aa'], which a
  space-delimited pattern under-merges because consecutive matches
  share the delimiter);
- boundary false-positives (after 'xa' becomes one symbol, merge
  (a,b) must NOT fire inside 'xa b', which the unmarked rendering
  gets wrong from round 2 on).
"""

from __future__ import annotations

from collections import Counter


def _ref_bpe(words: dict[str, int], rounds: int):
    """Reference trainer: symbol sequences as Python lists."""
    seqs = {w: [list(w), f] for w, f in words.items()}
    merges = []
    for _ in range(rounds):
        counts: Counter = Counter()
        for syms, f in seqs.values():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (a, b), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, freq))
        for entry in seqs.values():
            syms = entry[0]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2  # greedy non-overlapping
                else:
                    out.append(syms[i])
                    i += 1
            entry[0] = out
    return merges


def _spark_bpe(spark, words: dict[str, int], rounds: int):
    """The q247 round block, driven directly on a word-frequency frame
    (same expressions as the registered query)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    wf = spark.createDataFrame(
        list(words.items()), "w string, freq long"
    )
    seqs = wf.select(
        F.expr(
            "array_join(transform(sequence(1, length(w)),"
            " i -> concat('|', substr(w, i, 1), '|')), ' ')"
        ).alias("seq"),
        "freq",
    ).localCheckpoint(eager=True)
    merges = []
    for _ in range(rounds):
        pairs = (
            seqs.select(F.split("seq", " ").alias("s"), "freq")
            .filter(F.size("s") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1),"
                        " i -> struct("
                        "replace(element_at(s, i), '|', '') AS a,"
                        " replace(element_at(s, i + 1), '|', '') AS b))"
                    )
                ).alias("p"),
            )
            .select("p.a", "p.b", "freq")
        )
        w_top = Window.orderBy(F.col("pair_freq").desc(), "a", "b")
        m = (
            pairs.groupBy("a", "b")
            .agg(F.sum("freq").alias("pair_freq"))
            .withColumn("rn", F.row_number().over(w_top))
            .filter(F.col("rn") == 1)
            .select("a", "b", "pair_freq")
            .localCheckpoint(eager=True)
        )
        rows = m.collect()
        if not rows:
            break
        merges.append((rows[0].a, rows[0].b, rows[0].pair_freq))
        seqs = (
            seqs.crossJoin(F.broadcast(m.select("a", "b")))
            .select(
                F.expr(
                    "replace(seq, concat('|', a, '| |', b, '|'),"
                    " concat('|', a, b, '|'))"
                ).alias("seq"),
                "freq",
            )
            .localCheckpoint(eager=True)
        )
    return merges


def test_bpe_greedy_runs(spark):
    """'aaaa' must merge to ['aa','aa'] (two (a,a) pairs in round 1's
    count is 3 occurrences weighted, but application is greedy
    non-overlapping) — the shared-delimiter failure mode."""
    words = {"aaaa": 2, "aab": 1}
    assert _spark_bpe(spark, words, 3) == _ref_bpe(words, 3)


def test_bpe_no_cross_symbol_match(spark):
    """Once 'x'+'a' merges, a later (a, b) merge must not fire inside
    'xa b' — the boundary false-positive the markers prevent."""
    # round 1 merges (x, a) (freq 6); round 2's (a, b) pair exists
    # only in 'ab' (freq 3) — NOT in 'xab' where 'a' is inside 'xa'
    words = {"xa": 6, "xab": 2, "ab": 3}
    got = _spark_bpe(spark, words, 2)
    exp = _ref_bpe(words, 2)
    assert got == exp
    assert exp[0][:2] == ("x", "a")


def test_bpe_multichar_symbol_merges(spark):
    """Later rounds merge multi-character symbols; the pattern and
    replacement must handle arbitrary symbol lengths."""
    words = {"the": 10, "then": 4, "den": 3}
    assert _spark_bpe(spark, words, 4) == _ref_bpe(words, 4)


def test_bpe_random_corpora_match_reference(spark):
    """Randomized cross-check over small alphabets (high collision
    pressure) — the full merge table must match the reference trainer
    exactly for every seed."""
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        words = {
            "".join(
                rng.choice("abc") for _ in range(rng.randint(1, 6))
            ): rng.randint(1, 9)
            for _ in range(12)
        }
        assert _spark_bpe(spark, words, 5) == _ref_bpe(words, 5), seed
