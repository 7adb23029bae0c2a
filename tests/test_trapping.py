"""Trapping-set census tests (codes/trapping.py; VERDICT r4 #4)."""

import numpy as np
import pytest

from tpu_ldpc.codes import LdpcCode, make_base_graph
from tpu_ldpc.codes.trapping import census, classify, harvest_failures


@pytest.fixture(scope="module")
def code():
    return LdpcCode.from_base_graph(
        make_base_graph(4, 8, 4, seed=7), 8, "trap_toy")  # n=64, k=32


def test_classify_known_supports(code):
    """Hand-built error patterns: a == |support|, b == unsatisfied
    checks computed independently, codewords give b == 0."""
    from tpu_ldpc.golden import encode as golden_encode

    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (3, code.k)).astype(np.uint8)
    c = golden_encode(code.H, u)
    H = np.asarray(code.H.todense())
    bits = c.copy()
    bits[0, [3, 17]] ^= 1                 # 2-bit error
    bits[1] ^= c[1] ^ c[0]                # decoded ANOTHER codeword
    # lane 2 left correct
    fails = classify(code.H, c, bits, code.k)
    assert len(fails) == 2
    f0 = next(f for f in fails if f.lane == 0)
    assert f0.a == 2 and f0.support == (3, 17)
    assert f0.b == int(H[:, [3, 17]].sum(axis=1).astype(int).__mod__(2).sum())
    f1 = next(f for f in fails if f.lane == 1)
    diff = int((c[1] ^ c[0]).sum())
    assert f1.a == diff and f1.b == 0     # codeword-difference support
    assert f1.info_wrong == int((c[1] ^ c[0])[: code.k].sum())


def test_harvest_reproducible_and_classified(code):
    fails, frames = harvest_failures(
        code, 2.0, iters=15, target=20, max_frames=4096, chunk=256)
    assert len(fails) >= 20 and frames <= 4096
    again, _ = harvest_failures(
        code, 2.0, iters=15, target=20, max_frames=4096, chunk=256)
    assert [(f.a, f.b, f.support) for f in fails] == [
        (f.a, f.b, f.support) for f in again]
    # every failure's (a,b) is self-consistent
    H = np.asarray(code.H.todense())
    for f in fails[:10]:
        e = np.zeros(code.n, np.uint8)
        e[list(f.support)] = 1
        assert f.a == len(f.support)
        assert f.b == int((H @ e % 2).sum())


def test_census_aggregation(code):
    fails, _ = harvest_failures(
        code, 1.0, iters=15, target=40, max_frames=8192, chunk=256)
    rep = census(fails)
    assert rep["n_failures"] == len(fails)
    assert sum(c["count"] for c in rep["classes"]) <= len(fails)
    # classes sorted by multiplicity, counts consistent
    counts = [c["count"] for c in rep["classes"]]
    assert counts == sorted(counts, reverse=True)
    for c in rep["classes"]:
        assert c["distinct_supports"] <= c["count"]
        assert len(c["example_support"]) <= min(c["a"], 64)
    assert rep["undetected"]["count"] == sum(1 for f in fails if f.b == 0)
    assert 0.0 <= rep["small_ab_frac"] <= 1.0


def test_harvest_punctured_erasures(code):
    """n_punct erases leading LLRs and re-references the rate: the
    punctured channel at equal Eb/N0 must fail at least as often."""
    plain, fp = harvest_failures(
        code, 2.0, iters=15, target=10, max_frames=4096, chunk=256)
    punct, fq = harvest_failures(
        code, 2.0, iters=15, target=10, max_frames=4096, chunk=256,
        n_punct=8)
    # same frame budget reached target for both, punctured no easier
    assert len(punct) / fq >= len(plain) / fp * 0.5  # sanity, not tight
