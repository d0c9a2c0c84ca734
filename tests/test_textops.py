

def test_bpe_pair_counts_hand_computed(spark):
    """'abab' x2 + 'Xb.' -> vocab {abab:2, xb:1}; pairs ab,ba,ab per
    'abab' (weighted 2) and xb (1): ab=4, ba=2, xb=1. 1-char words and
    NULL text contribute nothing."""
    from webxtract.textops import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "abab Xb."), (2, "abab a"), (3, None)],
        "doc_id long, text string",
    )
    got = [(r.pair, r.pair_count) for r in bpe_pair_counts(df).collect()]
    assert got == [("ab", 4), ("ba", 2), ("xb", 1)]
