"""T1/T2 tokenization + context-window arithmetic (pure python, no Spark)."""

import pytest

from text2nkg_spark.tokenization import (
    FakeWordpieceTokenizer, IdentityTokenizer, context_window, subword_maps)


def test_identity_maps():
    m = subword_maps([["a", "b"], ["c"]], IdentityTokenizer())
    assert m["subwords"] == ["a", "b", "c"]
    assert m["token2subword"] == [0, 1, 2, 3]
    assert m["subword_sentence_boundaries"] == [0, 2, 3]


def test_fake_wordpiece_prefix_sums():
    tok = FakeWordpieceTokenizer(piece_len=3)
    m = subword_maps([["abcdef", "gh"], ["ijklm"]], tok)
    assert m["subwords"] == ["abc", "##def", "gh", "ijk", "##lm"]
    assert m["token2subword"] == [0, 2, 3, 5]
    assert m["subword_sentence_boundaries"] == [0, 3, 5]


@pytest.mark.parametrize(
    "start,end,n,maxn,expect",
    [
        # plenty of room both sides: half context each way
        (10, 14, 30, 12, (6, 18)),
        # short left side: borrow the deficit from the right
        (2, 6, 30, 12, (0, 12)),
        # short right side: borrow the deficit from the left
        (24, 28, 30, 12, (18, 30)),
        # sentence fills the budget exactly: no context
        (5, 17, 30, 12, (5, 17)),
    ],
)
def test_context_window(start, end, n, maxn, expect):
    assert context_window(start, end, n, maxn) == expect


def test_context_window_reference_trace():
    """Re-derive the reference arithmetic literally and compare on a grid."""
    for n in (20, 37, 64):
        for maxn in (8, 12, 16):
            for start in range(0, n - 1, 3):
                for ln in (1, 3, 7):
                    end = min(start + ln, n)
                    left_length = start
                    right_length = n - end
                    sentence_length = end - start
                    half = int((maxn - sentence_length) / 2)
                    lcl = rcl = 0
                    if sentence_length < maxn:
                        if left_length < right_length:
                            lcl = min(left_length, half)
                            rcl = min(right_length, maxn - lcl - sentence_length)
                        else:
                            rcl = min(right_length, half)
                            lcl = min(left_length, maxn - rcl - sentence_length)
                    want = (start - lcl, end + rcl)
                    assert context_window(start, end, n, maxn) == want
