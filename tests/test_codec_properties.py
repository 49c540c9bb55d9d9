"""Property tests for the round-5 pure twins: AVI container, BPE
segmentation, expectation algebra. (Hypothesis over the pure functions —
no Spark session needed, so these run in milliseconds.)"""

from hypothesis import given, settings
from hypothesis import strategies as st

from blockchaintoavro_spark.functions.video import decode_avi, encode_avi
from blockchaintoavro_spark.operators.bpe import END_OF_WORD, segment_word

_frame = st.binary(min_size=0, max_size=64)


@given(
    st.integers(min_value=1, max_value=512),
    st.integers(min_value=1, max_value=512),
    st.lists(_frame, min_size=1, max_size=8),
    st.integers(min_value=1, max_value=10**6),
)
@settings(max_examples=60)
def test_avi_roundtrip_any_payloads(w, h, frames, usec):
    """The container is codec-agnostic: ANY byte payloads survive the
    encode→decode round trip exactly, in order, with header intact —
    including empty frames and frames containing RIFF magic bytes."""
    d = decode_avi(encode_avi(w, h, frames, usec))
    assert d["frames"] == frames
    assert (d["width"], d["height"], d["usec_per_frame"]) == (w, h, usec)
    assert d["n_frames"] == len(frames)


_word = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
    min_size=1,
    max_size=12,
)
_merges = st.lists(
    st.tuples(
        st.text("ab", min_size=1, max_size=2),
        st.text("ab", min_size=1, max_size=2),
    ),
    max_size=6,
)


@given(_word, _merges)
@settings(max_examples=200)
def test_segment_word_concat_invariant(word, merges):
    """Segmentation never loses or reorders characters: joining the
    symbols reproduces the marked word, under ANY merge list."""
    marked = word + END_OF_WORD
    assert "".join(segment_word(marked, merges)) == marked


@given(_word, _merges)
@settings(max_examples=100)
def test_segment_word_last_merge_is_exhausted(word, merges):
    """The final merge's pair never survives as an adjacency — its pass
    is exhaustive and nothing runs after it. (Earlier merges' pairs CAN
    legitimately reappear when a later merge constructs their second
    element, e.g. merges [(a,ab),(a,b)] on 'aab' ends as [a, ab] —
    that's correct BPE order-dependence, not a bug.)"""
    if not merges:
        return
    marked = word + END_OF_WORD
    once = segment_word(marked, merges)
    a, b = merges[-1]
    assert not any(x == a and y == b for x, y in zip(once, once[1:])), once
