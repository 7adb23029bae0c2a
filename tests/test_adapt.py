"""Rate-compatible puncturing/shortening tests (channel.adapt).

Decoders/layouts are untouched by adaptation (it is a pure channel +
harness transform), so these tests pin: the dimension/rate math, the
mask construction, BP's recovery of punctured positions, the MC step's
counting over effective info bits, and the sharded path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ldpc.channel.adapt import SHORT_LLR, RateAdapt, adapted_awgn_llrs
from tpu_ldpc.codes import LdpcCode
from tpu_ldpc.decode.reference import build_decoder
from tpu_ldpc.golden import encode as golden_encode
from tpu_ldpc.sim import DecodeCfg, build_mc_step, run_ber


@pytest.fixture(scope="module")
def code():
    return LdpcCode.judged()  # nb=16, mb=8, Z=64: kb=8 info blocks


def test_dims_and_rate(code):
    Z = code.Z
    a = RateAdapt.from_blocks(code, puncture_blocks=(15,))
    k_eff, n_tx = a.dims(code.n, code.k)
    assert (k_eff, n_tx) == (code.k, code.n - Z)
    assert a.rate(code.n, code.k) == pytest.approx(512 / 960)

    a = RateAdapt.from_blocks(code, shorten_blocks=(0,))
    k_eff, n_tx = a.dims(code.n, code.k)
    assert (k_eff, n_tx) == (code.k - Z, code.n - Z)
    # shortening LOWERS the rate: (k-s)/(n-s) < k/n for R < 1
    assert a.rate(code.n, code.k) == pytest.approx(448 / 960)

    a = RateAdapt.from_blocks(code, puncture_blocks=(14, 15),
                              shorten_blocks=(0,))
    k_eff, n_tx = a.dims(code.n, code.k)
    assert (k_eff, n_tx) == (code.k - Z, code.n - 3 * Z)


def test_from_blocks_validation(code):
    with pytest.raises(ValueError):  # parity block cannot be shortened
        RateAdapt.from_blocks(code, shorten_blocks=(8,))
    with pytest.raises(ValueError):  # out of range
        RateAdapt.from_blocks(code, puncture_blocks=(16,))
    with pytest.raises(ValueError):  # overlap
        RateAdapt.from_blocks(code, puncture_blocks=(3,), shorten_blocks=(3,))
    with pytest.raises(ValueError):  # rate >= 1 (caught at dims time)
        RateAdapt.from_blocks(
            code, puncture_blocks=tuple(range(8, 16))
        ).dims(code.n, code.k)


def test_masks(code):
    Z = code.Z
    a = RateAdapt.from_blocks(code, puncture_blocks=(15,), shorten_blocks=(1,))
    tx, known, active = a.masks(code.n, code.k)
    assert tx.shape == (code.n,) and known.shape == (code.n,)
    assert active.shape == (code.k,)
    assert tx.sum() == code.n - 2 * Z
    assert (tx[15 * Z:] == 0).all() and (tx[Z:2 * Z] == 0).all()
    assert (known[Z:2 * Z] == SHORT_LLR).all() and known.sum() == Z * SHORT_LLR
    assert active.sum() == code.k - Z and (active[Z:2 * Z] == 0).all()


def test_masks_info_cols_remap(code):
    # with a pivot-style info map, shorten positions land on info_cols
    a = RateAdapt(shorten=(0, 1))
    info_cols = np.arange(code.n - code.k, code.n)  # info bits at the tail
    tx, known, active = a.masks(code.n, code.k, info_cols)
    assert (known[code.n - code.k:][:2] == SHORT_LLR).all()
    assert tx[code.n - code.k] == 0 and active[0] == 0


def test_bp_recovers_punctured_bits(code, rng):
    """Near-noiseless channel: BP must fill in the erased (LLR=0)
    punctured block from parity alone."""
    a = RateAdapt.from_blocks(code, puncture_blocks=(15,))
    tx, known, _ = a.masks(code.n, code.k)
    u = rng.integers(0, 2, (16, code.k)).astype(np.uint8)
    c = golden_encode(code.H, u)
    llr = adapted_awgn_llrs(
        jax.random.key(0), jnp.asarray(c), 12.0, a.rate(code.n, code.k),
        jnp.asarray(tx), jnp.asarray(known),
    )
    dec = build_decoder(code, algo="minsum", iters=50)
    bits, ok, _ = map(np.asarray, dec(llr))
    assert ok.all()
    np.testing.assert_array_equal(bits, c)  # punctured bits recovered too


def test_mc_step_shortened_counting(code):
    a = RateAdapt.from_blocks(code, shorten_blocks=(0, 1))
    cfg = DecodeCfg(algo="minsum", iters=30, impl="jnp")
    step = build_mc_step(code, cfg, 32, 1, a)
    assert step.k == code.k - 2 * code.Z
    counters = np.asarray(step(
        jnp.asarray(5, jnp.int32), jnp.asarray(0, jnp.int32),
        jnp.asarray(8.0, jnp.float32), jnp.asarray(0, jnp.int32),
    ))
    assert counters[0] == 32          # frames
    assert counters[2] == 0           # no frame errors at 8 dB
    assert counters[1] == 0


@pytest.mark.deep
def test_run_ber_adapted_rates_order(code):
    """At a fixed mid-SNR the punctured (higher-rate) code must be worse
    than the mother code, and shortening must not be wildly off."""
    cfg = DecodeCfg(algo="minsum", iters=20, impl="jnp")
    kw = dict(cfg=cfg, batch=128, target_frame_errors=40,
              max_frames=4096, seed=2)
    base = run_ber(code, [2.0], **kw)[0]
    punct = run_ber(code, [2.0],
                    adapt=RateAdapt.from_blocks(code, puncture_blocks=(14, 15)),
                    **kw)[0]
    assert punct.fer > base.fer
    assert punct.bits == punct.frames * code.k  # puncturing keeps k


def test_sharded_adapted_step(code):
    from tpu_ldpc.dist.mesh import build_sharded_mc_step, make_mesh

    a = RateAdapt.from_blocks(code, shorten_blocks=(0,))
    mesh = make_mesh(jax.devices()[:4])
    cfg = DecodeCfg(algo="minsum", iters=20, impl="jnp")
    step = build_sharded_mc_step(code, cfg, 16, mesh, "mc", 1, a)
    assert step.k == code.k - code.Z
    counters = np.asarray(jax.device_get(step(
        jnp.asarray([7], jnp.int32), jnp.asarray([0], jnp.int32),
        jnp.asarray([8.0], jnp.float32), jnp.asarray([0], jnp.int32),
    )))
    assert counters[0] == 16 * 4 and counters[2] == 0
