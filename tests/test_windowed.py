"""Windowed SC-LDPC decoder tests (decode/windowed.py).

The strongest pin: a window covering the whole chain with one slide is
the reference flooding decoder, bit-exactly — same two-min contract,
same accumulation order.  Sliding-window behavior is checked for
boundary handling, streaming-commit equivalence, and decode success.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ldpc.channel import awgn_llrs
from tpu_ldpc.codes import LdpcCode
from tpu_ldpc.codes.base_graphs import make_sc_base_graph
from tpu_ldpc.decode.reference import build_decoder
from tpu_ldpc.decode.windowed import banded_tables, build_windowed_decoder


def sc_code(L=8, Z=8, seed=3):
    return LdpcCode.from_base_graph(
        make_sc_base_graph(L, Z, seed=seed), Z, f"sc_l{L}_z{Z}"
    )


def noisy_zero_llrs(code, ebn0_db, batch, seed=0):
    c = jnp.zeros((batch, code.n), jnp.uint8)  # all-zero codeword
    return awgn_llrs(jax.random.key(seed), c, ebn0_db, code.rate)


def test_banded_tables_shape_and_rejection():
    code = sc_code()
    S, M = banded_tables(code)
    assert S.shape == (code.mb, 6) and M.shape == (code.mb, 6)
    assert M.sum() == (np.asarray(code.B) >= 0).sum()
    # interior rows are full-degree
    assert M[3].all() and M[code.mb - 3].all()
    with pytest.raises(ValueError):
        banded_tables(LdpcCode.judged())


@pytest.mark.parametrize("algo", [
    "minsum",
    # the equality contract is algo-independent plumbing; minsum is the
    # cheap representative, the SP variants re-cover it at 2x cost
    pytest.param("sumproduct", marks=pytest.mark.deep),
    pytest.param("sumproduct-fast", marks=pytest.mark.deep),
])
def test_full_window_equals_reference_flooding(algo):
    """W = mb, one slide, I iterations == reference flooding-I."""
    code = sc_code(L=8, Z=8)
    iters = 12
    llr = noisy_zero_llrs(code, 1.0, batch=16)  # noisy: messages exercised
    win = build_windowed_decoder(
        code, window=code.mb, iters_per_window=iters, algo=algo
    )
    ref = build_decoder(
        code, algo=algo, iters=iters, early_stop=False, schedule="flooding"
    )
    bw, okw, _ = map(np.asarray, win(llr))
    br, okr, _ = map(np.asarray, ref(llr))
    np.testing.assert_array_equal(bw, br)
    np.testing.assert_array_equal(okw, okr)


def test_full_window_posterior_bit_exact_minsum():
    """Min-sum arithmetic is exact in fp32: decoded bits must agree with
    the reference on EVERY frame of a mid-SNR batch (no tolerance)."""
    code = sc_code(L=6, Z=16, seed=5)
    llr = noisy_zero_llrs(code, 2.0, batch=32, seed=9)
    win = build_windowed_decoder(code, window=code.mb, iters_per_window=30)
    ref = build_decoder(code, algo="minsum", iters=30, early_stop=False)
    bw, _, _ = map(np.asarray, win(llr))
    br, _, _ = map(np.asarray, ref(llr))
    np.testing.assert_array_equal(bw, br)


def test_sliding_window_decodes_high_snr():
    code = sc_code(L=16, Z=16, seed=1)
    llr = noisy_zero_llrs(code, 6.0, batch=16)
    win = build_windowed_decoder(code, window=6, iters_per_window=2)
    bits, ok, iu = map(np.asarray, win(llr))
    assert ok.all()
    assert (bits == 0).all()
    n_windows = code.mb - 6 + 1
    assert (iu == 2 * n_windows).all()


@pytest.mark.deep
def test_window_quality_monotone_in_width():
    """Windowed decoding approaches full-BP quality from above as the
    window widens (measured property frozen here; deterministic: fixed
    key + deterministic decoders, so this is not an MC-flaky assert)."""
    code = sc_code(L=32, Z=8, seed=1)
    llr = noisy_zero_llrs(code, 2.5, batch=64, seed=4)
    narrow = build_windowed_decoder(code, window=6, iters_per_window=3)
    wide = build_windowed_decoder(code, window=10, iters_per_window=3)
    full = build_decoder(code, algo="minsum", iters=50, early_stop=False)
    e = {}
    for name, dec in (("narrow", narrow), ("wide", wide), ("full", full)):
        b, _, _ = map(np.asarray, dec(llr))
        e[name] = int((b != 0).any(axis=1).sum())
    assert e["full"] <= e["wide"] <= e["narrow"]
    assert e["wide"] < e["narrow"]  # widening visibly helps


def test_sliding_window_decodes_random_codewords():
    """Real encoded frames (general pivot encoder for the
    rank-deficient terminated chain) through the sliding window: the
    recovered bits equal the transmitted codeword (VERDICT r1 #5 — the
    all-zero shortcut alone cannot catch encoder/decoder coordinate
    mismatches)."""
    from tpu_ldpc.encode.encoder import select_encoder

    code = sc_code(L=16, Z=16, seed=1)
    enc, k_true, _ = select_encoder(code)
    rng = np.random.default_rng(2)
    u = rng.integers(0, 2, (16, k_true)).astype(np.uint8)
    c = np.asarray(enc(jnp.asarray(u)))
    llr = awgn_llrs(jax.random.key(3), jnp.asarray(c), 6.0, code.rate)
    win = build_windowed_decoder(code, window=6, iters_per_window=2)
    bits, ok, _ = map(np.asarray, win(llr))
    assert ok.mean() > 0.9
    assert (bits[ok] == c[ok]).all()


def test_window_validation():
    code = sc_code()
    with pytest.raises(ValueError):
        build_windowed_decoder(code, window=0)
    with pytest.raises(ValueError):
        build_windowed_decoder(code, window=code.mb + 1)
    with pytest.raises(ValueError):
        build_windowed_decoder(code, window=4, algo="nope")


def test_windowed_schedule_in_mc_harness():
    """DecodeCfg(schedule='windowed') runs through run_ber (pivot
    encoder fallback for the rank-deficient terminated chain)."""
    from tpu_ldpc.sim import DecodeCfg, run_ber

    code = sc_code(L=8, Z=8)
    cfg = DecodeCfg(algo="minsum", iters=2, schedule="windowed", window=5)
    res = run_ber(code, [7.0], cfg=cfg, batch=32,
                  target_frame_errors=5, max_frames=64, seed=0)[0]
    assert res.frames > 0
    assert res.fer < 0.5  # high SNR: mostly decodes


def test_full_window_layered_equals_reference_layered():
    """r5 layered sweep pin: W = mb, one slide, I layered iterations
    == reference layered-I bit-exactly (same per-edge arithmetic:
    p_new = (p_rot - R_old) + r_out, set back in variable coords)."""
    code = sc_code(L=8, Z=8)
    iters = 10
    llr = noisy_zero_llrs(code, 1.0, batch=16)
    win = build_windowed_decoder(
        code, window=code.mb, iters_per_window=iters, sweep="layered")
    ref = build_decoder(
        code, algo="minsum", iters=iters, early_stop=False,
        schedule="layered")
    bw, okw, _ = map(np.asarray, win(llr))
    br, okr, _ = map(np.asarray, ref(llr))
    np.testing.assert_array_equal(bw, br)
    np.testing.assert_array_equal(okw, okr)


def test_layered_sweep_beats_flooding_sweep():
    """The layered sweep rides the slide direction: at equal
    (W, iters/slide) it must decode at least as many frames on a
    fixed noisy batch (the r2 directional-wave result, inside the
    window)."""
    code = sc_code(L=16, Z=8)
    llr = noisy_zero_llrs(code, 1.6, batch=96)
    flood = build_windowed_decoder(code, window=6, iters_per_window=2)
    lay = build_windowed_decoder(code, window=6, iters_per_window=2,
                                 sweep="layered")
    bf = np.asarray(flood(llr)[0])
    bl = np.asarray(lay(llr)[0])
    wrong_f = int((bf.any(axis=1)).sum())
    wrong_l = int((bl.any(axis=1)).sum())
    assert wrong_l <= wrong_f
    # and via the MC-config path (DecodeCfg plumbing)
    from tpu_ldpc.decode.api import build_decode_fn
    from tpu_ldpc.sim.mc import DecodeCfg

    dec = build_decode_fn(code, DecodeCfg(
        schedule="windowed", window=6, iters=2, window_sweep="layered",
        impl="jnp"))
    np.testing.assert_array_equal(np.asarray(dec(llr)[0]), bl)


def test_layered_sweep_invalid_rejected():
    code = sc_code(L=8, Z=8)
    with pytest.raises(ValueError, match="sweep"):
        build_windowed_decoder(code, window=4, sweep="nope")


@pytest.mark.deep
@pytest.mark.parametrize("algo", ["sumproduct", "sumproduct-fast"])
def test_full_window_layered_equals_reference_layered_sp(algo):
    """Layered-sweep pin extends to the SP algorithms (same plumbing,
    2x cost — deep set like the flooding SP pins)."""
    code = sc_code(L=8, Z=8)
    iters = 8
    llr = noisy_zero_llrs(code, 1.0, batch=8)
    win = build_windowed_decoder(
        code, window=code.mb, iters_per_window=iters, algo=algo,
        sweep="layered")
    ref = build_decoder(code, algo=algo, iters=iters, early_stop=False,
                        schedule="layered")
    bw, okw, _ = map(np.asarray, win(llr))
    br, okr, _ = map(np.asarray, ref(llr))
    np.testing.assert_array_equal(bw, br)
    np.testing.assert_array_equal(okw, okr)


def test_window_sweep_rejected_outside_windowed_schedule():
    """window_sweep on a non-windowed schedule is an ignored knob —
    reject (same policy as quant_bits, review r5)."""
    from tpu_ldpc.decode.api import build_decode_fn
    from tpu_ldpc.sim.mc import DecodeCfg

    code = sc_code(L=8, Z=8)
    with pytest.raises(ValueError, match="window_sweep"):
        build_decode_fn(code, DecodeCfg(schedule="flooding",
                                        window_sweep="layered"))
