"""Property-based tests (hypothesis) for the pure-integer arithmetic that
round-9 operators stake correctness claims on. These run WITHOUT Spark —
they pin the algebraic invariants the SQL/DataFrame twins rely on, over a
much wider input space than the fixture corpora reach."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from projet_pipeline_bigdata_org_spark.operators.multimodal import (
    RESIZE_MAX_EDGE,
    resize_plan,
)

dims = st.integers(min_value=1, max_value=1_000_000)


@given(dims, dims)
@settings(max_examples=300)
def test_resize_plan_invariants(w, h):
    tw, th = resize_plan(w, h)
    # never below 1, never above the cap (when resizing) or original
    assert tw >= 1 and th >= 1
    assert max(tw, th) <= max(RESIZE_MAX_EDGE, 1) or (tw, th) == (w, h)
    if max(w, h) <= RESIZE_MAX_EDGE:
        assert (tw, th) == (w, h)  # pass-through branch
    else:
        assert max(tw, th) == RESIZE_MAX_EDGE  # longest edge lands exactly
        # aspect ratio preserved within truncation error of one unit on
        # the scaled short edge
        m = max(w, h)
        assert abs(tw - w * RESIZE_MAX_EDGE / m) < 1 or tw == 1
        assert abs(th - h * RESIZE_MAX_EDGE / m) < 1 or th == 1


@given(dims, dims)
@settings(max_examples=300)
def test_resize_plan_idempotent(w, h):
    """Applying the plan to its own output is a no-op — the property that
    makes replayed/resumed resize jobs safe."""
    tw, th = resize_plan(w, h)
    assert resize_plan(tw, th) == (tw, th)


def _bits(x: int) -> int:
    """The LENGTH(BIN(x)) floor-log2+1 both engines compute (x >= 1)."""
    return x.bit_length()


counts = st.integers(min_value=0, max_value=10**15)
vocab = st.integers(min_value=1, max_value=10**9)


@given(counts, counts, vocab)
@settings(max_examples=500)
def test_surprisal_bits_nonnegative_and_within_one_bit(c3, c2, v):
    """curate_perplexity_filter's per-position surprisal bits(c2+V) -
    bits(c3+1): (a) never negative whenever c3 <= c2 (guaranteed — a
    trigram count cannot exceed its context count), and (b) within 1 bit
    of the real log2 Laplace ratio on either side — the approximation
    bound the docstring claims."""
    c3 = min(c3, c2)  # enforce the structural invariant c3 <= c2
    surp = _bits(c2 + v) - _bits(c3 + 1)
    assert surp >= 0
    true_bits = math.log2((c2 + v) / (c3 + 1))
    assert abs(surp - true_bits) < 1.0


@given(st.integers(min_value=1, max_value=2**62))
@settings(max_examples=300)
def test_bits_matches_bin_length_semantics(x):
    """bit_length == LENGTH(BIN(x)) == floor(log2 x) + 1 for x >= 1 — the
    cross-engine identity both twins assume."""
    assert _bits(x) == len(bin(x)) - 2
    assert 2 ** (_bits(x) - 1) <= x < 2 ** _bits(x)
