"""Unit tests for the numpy/Spark operator cores (SURVEY.md §5.4)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from dedup.config import DedupConfig
from dedup.minhash import minhash_batch, perm_params
from dedup.shingle import token_hashes, _shingles_one
from dedup.simhash import simhash_batch
from dedup.suffix import window_fingerprints
from dedup.verify import longest_shared_run


# --- config ---

def test_config_fingerprint_stable_and_sensitive():
    c1, c2 = DedupConfig(), DedupConfig()
    assert c1.fingerprint == c2.fingerprint
    assert DedupConfig(k_shingle=4).fingerprint != c1.fingerprint


def test_config_validation():
    with pytest.raises(ValueError):
        DedupConfig(num_perm=100, lsh_bands=32)


# --- shingles ---

def test_shingle_counts_and_determinism():
    t = token_hashes("a b c d e")
    s = _shingles_one(t, 3)
    assert len(s) == 3  # abc bcd cde
    assert np.array_equal(s, _shingles_one(token_hashes("a b c d e"), 3))


def test_shingle_short_doc_gets_one_shingle():
    s = _shingles_one(token_hashes("a b"), 3)
    assert len(s) == 1
    assert len(_shingles_one(token_hashes(""), 3)) == 0


def test_shingle_overlap_matches_token_overlap():
    s1 = _shingles_one(token_hashes("a b c d e"), 3)
    s2 = _shingles_one(token_hashes("x a b c d e"), 3)
    assert len(np.intersect1d(s1, s2)) == 3


def test_shingle_non_ascii():
    s = _shingles_one(token_hashes("你好 世界 🌍 测试"), 3)
    assert len(s) == 2


# --- minhash ---

def test_minhash_lane_min_property():
    """sig(A ∪ B) == elementwise min(sig(A), sig(B)) — the defining MinHash
    identity, exact for any permutation family."""
    a, b = perm_params(64, 7)
    s1 = _shingles_one(token_hashes("a b c d e f g h"), 3)
    s2 = _shingles_one(token_hashes("q r s t u v w x"), 3)
    union = np.unique(np.concatenate([s1, s2]))
    sig1, sig2, sigu = minhash_batch([s1, s2, union], a, b)
    assert np.array_equal(
        sigu.view(np.uint64),
        np.minimum(sig1.view(np.uint64), sig2.view(np.uint64)),
    )


def test_minhash_empty_is_none():
    a, b = perm_params(16, 7)
    assert minhash_batch([np.empty(0, np.int64)], a, b) == [None]


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31))
def test_minhash_agreement_tracks_jaccard(seed):
    """E[sig agreement] == Jaccard; with 256 lanes the observed agreement
    must fall within ±0.2 of truth (>> 6 sigma)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 200))
    base = rng.integers(0, 2**62, n).astype(np.int64)
    keep = int(rng.integers(1, n + 1))
    other = np.concatenate(
        [base[:keep], rng.integers(0, 2**62, n - keep).astype(np.int64)]
    )
    sa, sb = np.unique(base), np.unique(other)
    true_j = len(np.intersect1d(sa, sb)) / len(np.union1d(sa, sb))
    a, b = perm_params(256, 42)
    s1, s2 = minhash_batch([sa, sb], a, b)
    agree = float((s1 == s2).mean())
    assert abs(agree - true_j) < 0.2


# --- simhash ---

def test_simhash_identical_and_empty():
    s = _shingles_one(token_hashes("a b c d e f"), 3)
    h1, h2, h3 = simhash_batch([s, s.copy(), np.empty(0, np.int64)])
    assert h1 == h2
    assert h3 is None


def test_simhash_small_change_small_distance():
    base = " ".join(f"t{i}" for i in range(300))
    pert = " ".join(("zz" if i == 150 else f"t{i}") for i in range(300))
    s1 = _shingles_one(token_hashes(base), 3)
    s2 = _shingles_one(token_hashes(pert), 3)
    h1, h2 = simhash_batch([s1, s2])
    d = bin((h1 ^ h2) & (2**64 - 1)).count("1")
    assert d <= 10
    # unrelated docs are far apart
    s3 = _shingles_one(token_hashes(" ".join(f"q{i}" for i in range(300))), 3)
    (h3,) = simhash_batch([s3])
    assert bin((h1 ^ h3) & (2**64 - 1)).count("1") > 15


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 2**64 - 1), st.sets(st.integers(0, 63), min_size=0, max_size=3))
def test_pigeonhole_chunks_cover(h, flip_bits):
    """Any two hashes within Hamming distance d=3 share at least one of the
    4 chunk values (soundness of the balanced chunk split)."""
    g = h
    for bit in flip_bits:
        g ^= 1 << bit
    n_chunks = 4
    shared = False
    for i in range(n_chunks):
        start = i * 64 // n_chunks
        width = (i + 1) * 64 // n_chunks - start
        mask = (1 << width) - 1
        if (h >> start) & mask == (g >> start) & mask:
            shared = True
    assert shared


# --- suffix / winnowing ---

def test_winnowing_guarantee_shared_run():
    """Any shared run >= window + winnow - 1 tokens yields a common anchored
    fingerprint, regardless of offset (Schleimer et al. guarantee)."""
    window, winnow = 32, 16
    run = [f"r{i}" for i in range(window + winnow - 1)]
    a = [f"a{i}" for i in range(37)] + run + [f"a{i}" for i in range(37, 60)]
    b = [f"b{i}" for i in range(11)] + run + [f"b{i}" for i in range(11, 80)]
    fa = window_fingerprints(token_hashes(" ".join(a)).astype(np.uint64), window, winnow)
    fb = window_fingerprints(token_hashes(" ".join(b)).astype(np.uint64), window, winnow)
    assert len(np.intersect1d(fa, fb)) >= 1


def test_winnowing_no_shared_run_no_match():
    window, winnow = 32, 16
    a = token_hashes(" ".join(f"a{i}" for i in range(200))).astype(np.uint64)
    b = token_hashes(" ".join(f"b{i}" for i in range(200))).astype(np.uint64)
    fa = window_fingerprints(a, window, winnow)
    fb = window_fingerprints(b, window, winnow)
    assert len(np.intersect1d(fa, fb)) == 0


def test_window_fingerprints_position_invariant():
    window, winnow = 8, 4
    toks = [f"x{i}" for i in range(30)]
    t1 = token_hashes(" ".join(toks)).astype(np.uint64)
    t2 = token_hashes(" ".join(["pre1", "pre2", "pre3"] + toks)).astype(np.uint64)
    f1 = window_fingerprints(t1, window, winnow)
    f2 = window_fingerprints(t2, window, winnow)
    # every anchored fp of the un-shifted doc that lies fully inside the
    # shared suffix must appear in the shifted doc's stride-1 fp set; at
    # minimum the winnowed sets intersect heavily
    assert len(np.intersect1d(f1, f2)) >= len(f1) // 2


def test_longest_shared_run_exact():
    run = " ".join(f"r{i}" for i in range(70))
    a = " ".join(f"a{i}" for i in range(40)) + " " + run
    b = run + " " + " ".join(f"b{i}" for i in range(50))
    assert longest_shared_run(a, b, 32) == 70
    assert longest_shared_run(a, " ".join(f"c{i}" for i in range(100)), 32) == 0


def test_longest_shared_run_periodic_text_not_inflated():
    # 48 tokens of period-2 text vs a 33-token contiguous copy: every
    # 32-window of the copy matches *somewhere* in the periodic text, which
    # inflated the old position-run scan to 48; the true shared run is 33.
    a = "x y " * 24
    b = " ".join(a.split()[:33])
    assert longest_shared_run(a, b, 32) == 33
    # identical periodic texts: run = full length
    assert longest_shared_run(a, a, 32) == 48
    # shared run below the window length reports 0
    assert longest_shared_run("p q " * 8, "p q " * 8, 32) == 0  # 16 tokens < window
