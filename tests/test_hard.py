"""Hard-decision decoder tests: golden/jnp bit-exactness, BSC channel,
error-correction sanity, MC-harness integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ldpc.channel import awgn_llrs, bsc_llr_magnitude, bsc_llrs
from tpu_ldpc.codes import LdpcCode, make_base_graph
from tpu_ldpc.decode.hard import build_hard_decoder
from tpu_ldpc.golden import encode as golden_encode
from tpu_ldpc.golden.hard import decode_hard
from tpu_ldpc.sim import DecodeCfg, run_ber


def toy_code():
    return LdpcCode.from_base_graph(make_base_graph(4, 8, 8, seed=7), 8, "toy8")


@pytest.mark.parametrize("algo,code_fn,iters", [
    ("bitflip", toy_code, 20),
    ("bitflip", LdpcCode.judged, 10),
    ("wbf", toy_code, 20),
    ("wbf", LdpcCode.judged, 8),
])
def test_jnp_matches_golden_bit_exact(algo, code_fn, iters, rng):
    code = code_fn()
    # mid-SNR LLRs so flipping genuinely happens
    u = rng.integers(0, 2, (24, code.k)).astype(np.uint8)
    c = golden_encode(code.H, u)
    llr = np.asarray(awgn_llrs(jax.random.key(3), jnp.asarray(c), 4.0,
                               code.rate))
    dec = build_hard_decoder(code, algo=algo, iters=iters)
    bj, okj, iuj = map(np.asarray, dec(jnp.asarray(llr)))
    bg, okg, iug = decode_hard(code.H, llr, algo=algo, iters=iters)
    np.testing.assert_array_equal(bj, bg)
    np.testing.assert_array_equal(okj, okg)
    np.testing.assert_array_equal(iuj, iug)


def test_bitflip_corrects_single_error(rng):
    code = LdpcCode.judged()
    u = rng.integers(0, 2, (8, code.k)).astype(np.uint8)
    c = golden_encode(code.H, u).astype(np.float32)
    llr = 1.0 - 2.0 * c
    pos = rng.integers(0, code.n, 8)
    llr[np.arange(8), pos] *= -1.0  # one hard error per codeword
    dec = build_hard_decoder(code, algo="bitflip", iters=10)
    bits, ok, iu = map(np.asarray, dec(jnp.asarray(llr)))
    assert ok.all()
    np.testing.assert_array_equal(bits, c.astype(np.uint8))
    assert (iu == 1).all()  # all incident checks fail -> majority flip


def test_bsc_channel_and_bitflip_decode(rng):
    code = LdpcCode.judged()
    u = rng.integers(0, 2, (64, code.k)).astype(np.uint8)
    c = jnp.asarray(golden_encode(code.H, u))
    llr = bsc_llrs(jax.random.key(1), c, 0.002)
    # constant magnitude, sign = received bit
    mags = np.unique(np.abs(np.asarray(llr)))
    assert mags.size == 1
    assert mags[0] == pytest.approx(bsc_llr_magnitude(0.002), rel=1e-6)
    dec = build_hard_decoder(code, algo="bitflip", iters=30)
    bits, ok, _ = map(np.asarray, dec(llr))
    frame_ok = (bits == np.asarray(c)).all(axis=1)
    assert frame_ok.mean() >= 0.9  # ~2 flips/frame: majority BF fixes


def test_bsc_validation():
    with pytest.raises(ValueError):
        bsc_llr_magnitude(0.0)
    with pytest.raises(ValueError):
        bsc_llr_magnitude(0.6)


def test_wbf_flips_one_bit_per_iteration(rng):
    code = toy_code()
    u = rng.integers(0, 2, (4, code.k)).astype(np.uint8)
    c = golden_encode(code.H, u).astype(np.float32)
    llr = 1.0 - 2.0 * c
    pos = rng.integers(0, code.n, 4)
    llr[np.arange(4), pos] *= -1.0
    dec = build_hard_decoder(code, algo="wbf", iters=5)
    bits, ok, iu = map(np.asarray, dec(jnp.asarray(llr)))
    assert ok.all()
    assert (iu == 1).all()  # single error -> exactly one flip


@pytest.mark.deep
def test_run_ber_with_hard_decoders():
    code = toy_code()
    kw = dict(batch=128, target_frame_errors=30, max_frames=4096, seed=1)
    soft = run_ber(code, [4.0], cfg=DecodeCfg(algo="minsum", iters=20,
                                              impl="jnp"), **kw)[0]
    hard = run_ber(code, [4.0], cfg=DecodeCfg(algo="bitflip", iters=20),
                   **kw)[0]
    assert hard.frames > 0
    # hard-decision decoding is strictly weaker than BP on AWGN
    assert hard.fer > soft.fer
