"""CRC subsystem tests (codes/crc.py; SURVEY.md C5/C10, VERDICT r4 #1).

Contract chain: golden bit-serial LFSR == GF(2) matrix path == jnp
matmul checker, plus the detection guarantees a CRC owes (all single-
bit errors, all bursts <= width)."""

import numpy as np
import pytest

from tpu_ldpc.codes import crc


@pytest.mark.parametrize("name", sorted(crc.SPECS))
def test_matrix_matches_lfsr(name, rng):
    k = 67
    u = rng.integers(0, 2, (16, k)).astype(np.uint8)
    lfsr = crc.crc_remainder(u, name)
    mat = (u @ crc.crc_matrix(k, name).T) % 2
    np.testing.assert_array_equal(lfsr, mat.astype(np.uint8))


def test_known_value_crc16():
    # x^16 mod g(x) for a single leading 1 followed by zeros: feed the
    # LFSR '1' then 16 zeros -> register holds g's low part (0x1021)
    u = np.zeros(17, dtype=np.uint8)
    u[0] = 1
    rem = crc.crc_remainder(u[:1], "crc16")
    # message '1': remainder = x^16 mod g = poly low bits
    bits = [(0x1021 >> (15 - i)) & 1 for i in range(16)]
    np.testing.assert_array_equal(rem, np.asarray(bits, np.uint8))


def test_attach_check_roundtrip(rng):
    for name in ("crc8", "crc16", "crc24"):
        u = rng.integers(0, 2, (32, 101)).astype(np.uint8)
        frame = crc.attach(u, name)
        assert frame.shape == (32, 101 + crc.SPECS[name].width)
        assert crc.check(frame, name).all()


def test_single_bit_errors_all_detected(rng):
    # g(x) has >= 2 nonzero terms => every single-bit error detected
    name = "crc16"
    u = rng.integers(0, 2, 80).astype(np.uint8)
    frame = crc.attach(u, name)
    flips = np.eye(frame.size, dtype=np.uint8)
    assert not crc.check(frame[None, :] ^ flips, name).any()


def test_bursts_up_to_width_detected(rng):
    # remainder of a burst b(x)*x^s with deg(b) < r is never 0
    name = "crc8"
    u = rng.integers(0, 2, 64).astype(np.uint8)
    frame = crc.attach(u, name)
    bad = []
    for start in range(frame.size - 8):
        for pat in (0b1, 0b101, 0b11111111):
            e = np.zeros_like(frame)
            bits = [int(b) for b in f"{pat:b}"]
            e[start:start + len(bits)] = bits
            bad.append(frame ^ e)
    assert not crc.check(np.stack(bad), name).any()


def test_jnp_checker_matches_golden(rng):
    import jax

    name = "crc24"
    k_total = 150 + crc.SPECS[name].width
    good = crc.attach(rng.integers(0, 2, (64, 150)).astype(np.uint8), name)
    noisy = good.copy()
    noisy[::3] ^= (rng.random(noisy[::3].shape) < 0.02).astype(np.uint8)
    checker = jax.jit(crc.make_crc_checker(k_total, name))
    for frames in (good, noisy):
        np.testing.assert_array_equal(
            np.asarray(checker(frames)), crc.check(frames, name))


def test_jnp_attacher_matches_golden(rng):
    import jax

    u = rng.integers(0, 2, (32, 99)).astype(np.uint8)
    attach_fn = jax.jit(crc.make_crc_attacher(99, "crc16"))
    np.testing.assert_array_equal(
        np.asarray(attach_fn(u)), crc.attach(u, "crc16"))


def test_custom_spec_and_errors():
    spec = crc.CrcSpec("crc3", 3, 0b011)  # g = x^3 + x + 1
    u = np.asarray([1, 0, 1, 1, 0, 0, 1], np.uint8)
    frame = crc.attach(u, spec)
    assert crc.check(frame, spec)
    with pytest.raises(ValueError):
        crc.get_spec("nope")
    with pytest.raises(ValueError):
        crc.check_matrix(3, spec)  # frame shorter than CRC


# ---- MC-harness integration (sim/mc.py crc gating) ----

def _mc_code():
    from tpu_ldpc.codes import LdpcCode, make_base_graph

    return LdpcCode.from_base_graph(
        make_base_graph(4, 12, 4, seed=5), 8, "crc_toy")  # n=96, k=64


def test_run_ber_crc_gated_counters():
    from tpu_ldpc.sim import DecodeCfg, run_ber

    code = _mc_code()
    cfg = DecodeCfg(algo="minsum", iters=20, impl="jnp")
    kw = dict(cfg=cfg, batch=128, target_frame_errors=40,
              max_frames=4096, seed=2, crc="crc16")
    low, high = run_ber(code, [0.0, 8.0], **kw)
    # low SNR: plenty of decode failures, and the CRC catches them:
    # every genie frame error is either CRC-detected or a false ACK
    assert low.detected > 0
    assert low.undetected <= low.frame_errors
    assert low.frame_errors <= low.detected + low.undetected
    # bits are credited per PAYLOAD bit (CRC overhead excluded)
    assert low.bits == low.frames * (64 - 16)
    assert high.fer < low.fer
    # determinism under the PRNG discipline
    again = run_ber(code, [0.0], **kw)[0]
    assert (again.frames, again.detected, again.undetected) == (
        low.frames, low.detected, low.undetected)


def test_crc_gating_catches_injected_fault():
    """Flip one payload bit in every decoded frame: the outer CRC must
    report every frame as detected (no false ACKs)."""
    import jax.numpy as jnp

    from tpu_ldpc.sim import DecodeCfg
    from tpu_ldpc.sim import mc as mc_mod

    code = _mc_code()
    cfg = DecodeCfg(algo="minsum", iters=20, impl="jnp")

    def flip_hook(key, bits, ok, iters_used):
        return bits.at[:, 3].set(1 - bits[:, 3]), ok, iters_used

    mc_mod._FAULT_HOOK = flip_hook
    mc_mod.build_mc_step.cache_clear()
    try:
        step = mc_mod.build_mc_step(code, cfg, 64, 1, None, "crc16")
        counters = np.asarray(step(
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(8.0, jnp.float32), jnp.asarray(0, jnp.int32)))
    finally:
        mc_mod._FAULT_HOOK = None
        mc_mod.build_mc_step.cache_clear()
    frames, _, frame_errors, detected, undetected, _ = counters
    assert frame_errors == frames  # every payload genie-wrong
    assert detected == frames      # ...and every one CRC-detected
    assert undetected == 0


def test_crc_too_wide_rejected():
    from tpu_ldpc.codes import LdpcCode, make_base_graph
    from tpu_ldpc.sim import DecodeCfg, run_ber

    code = LdpcCode.from_base_graph(
        make_base_graph(4, 8, 4, seed=7), 4, "tiny")  # k=16
    with pytest.raises(ValueError, match="info length"):
        run_ber(code, [2.0], cfg=DecodeCfg(impl="jnp"), batch=32,
                target_frame_errors=1, max_frames=32, crc="crc16",
                seed=0)


def test_crc_sharded_matches_single_device():
    """CRC-gated counters agree between the single-device step and the
    8-fake-device sharded step at equal total frames (same totals is
    too strong — different PRNG fold — but semantics must match)."""
    from tpu_ldpc.dist.mesh import make_mesh
    from tpu_ldpc.sim import DecodeCfg, run_ber

    code = _mc_code()
    cfg = DecodeCfg(algo="minsum", iters=20, impl="jnp")
    kw = dict(cfg=cfg, target_frame_errors=30, max_frames=2048,
              seed=4, crc="crc8")
    single = run_ber(code, [2.0], batch=64, **kw)[0]
    mesh = make_mesh()
    shard = run_ber(code, [2.0], batch=8, mesh=mesh, **kw)[0]
    for r in (single, shard):
        assert r.detected > 0 or r.frame_errors == 0
        assert r.frame_errors <= r.detected + r.undetected
    # same operating point: FERs statistically close (paired tolerance)
    assert abs(single.fer - shard.fer) < 0.2


def test_random_polynomial_fuzz(rng):
    """Matrix == LFSR and attach/check round-trip over random
    generator polynomials of random widths (the contract is
    polynomial-independent)."""
    for _ in range(12):
        width = int(rng.integers(3, 33))
        poly = int(rng.integers(1, 1 << width))
        spec = crc.CrcSpec(f"f{width}", width, poly)
        k = int(rng.integers(width + 1, 200))
        u = rng.integers(0, 2, (8, k)).astype(np.uint8)
        lfsr = crc.crc_remainder(u, spec)
        mat = (u @ crc.crc_matrix(k, spec).T) % 2
        np.testing.assert_array_equal(lfsr, mat.astype(np.uint8))
        assert crc.check(crc.attach(u, spec), spec).all()
