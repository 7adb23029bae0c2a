"""Pallas kernel vs golden (SURVEY.md §4.2): interpret mode on CPU.

The fused kernel runs under interpret=True here (the TPU-native analog
of a sanitizer build, §5) and must be bit-exact against the golden
float32 min-sum on bits, ok flags, AND iters_used.
"""

import numpy as np
import pytest

from tpu_ldpc.codes import LdpcCode, make_base_graph
from tpu_ldpc.golden import decode as golden_decode, encode as golden_encode
from tpu_ldpc.decode.pallas_bp import build_pallas_decoder


def toy_code(Z=8):
    return LdpcCode.from_base_graph(
        make_base_graph(4, 8, Z, seed=7), Z, f"toy{Z}"
    )


def noisy_llrs(code, batch, ebn0_db, seed):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, 2, (batch, code.k)).astype(np.uint8)
    c = golden_encode(code.H, u)
    x = 1.0 - 2.0 * c
    sigma2 = 1.0 / (2 * code.rate * 10 ** (ebn0_db / 10))
    y = x + np.sqrt(sigma2) * rng.normal(size=x.shape)
    return (2.0 / sigma2 * y).astype(np.float32), u


@pytest.mark.parametrize("schedule", ["flooding", "layered"])
@pytest.mark.parametrize(
    "alpha,beta", [
        (0.75, 0.0), (1.0, 0.15),
        # joint alpha+beta: axis-redundant with the two cases above
        pytest.param(0.8, 0.1, marks=pytest.mark.deep),
    ]
)
def test_minsum_bitexact(schedule, alpha, beta):
    code = toy_code()
    llr, _ = noisy_llrs(code, 40, 3.0, seed=5)
    gb, gok, git = golden_decode(
        code.H, llr, algo="minsum", iters=12, alpha=alpha, beta=beta,
        schedule=schedule, dtype=np.float32,
    )
    fn = build_pallas_decoder(
        code, algo="minsum", iters=12, alpha=alpha, beta=beta,
        schedule=schedule, batch_tile=128, interpret=True,
    )
    pb, pok, pit = map(np.asarray, fn(llr))
    assert (pb == gb).all()
    assert (pok == gok).all()
    assert (pit == git).all()


@pytest.mark.parametrize("schedule", ["flooding", "layered"])
def test_minsum_no_early_stop(schedule):
    code = toy_code()
    llr, _ = noisy_llrs(code, 40, 3.0, seed=5)
    gb, gok, _ = golden_decode(
        code.H, llr, algo="minsum", iters=12, schedule=schedule,
        dtype=np.float32, early_stop=False,
    )
    fn = build_pallas_decoder(
        code, algo="minsum", iters=12, schedule=schedule,
        early_stop=False, interpret=True,
    )
    pb, pok, _ = map(np.asarray, fn(llr))
    assert (pb == gb).all()
    assert (pok == gok).all()


def test_sumproduct_agrees():
    code = toy_code()
    llr, _ = noisy_llrs(code, 40, 4.0, seed=6)
    gb, gok, git = golden_decode(code.H, llr, algo="sumproduct", iters=15)
    fn = build_pallas_decoder(code, algo="sumproduct", iters=15,
                              interpret=True)
    pb, pok, pit = map(np.asarray, fn(llr))
    assert (pb == gb).all(axis=1).mean() >= 0.97
    assert (pok == gok).mean() >= 0.97


def test_batch_padding():
    """Non-multiple-of-tile batches: padded lanes must not leak."""
    code = toy_code()
    llr, _ = noisy_llrs(code, 40, 3.0, seed=9)
    fn = build_pallas_decoder(code, algo="minsum", iters=10,
                              batch_tile=128, interpret=True)
    b40 = [np.asarray(v) for v in fn(llr)]
    b7 = [np.asarray(v) for v in fn(llr[:7])]
    for a, b in zip(b40, b7):
        assert (a[:7] == b).all()


def test_exit_block_invariance():
    """Early-exit granularity must not change any output."""
    code = toy_code()
    llr, _ = noisy_llrs(code, 40, 3.0, seed=11)
    outs = []
    for g in (1, 3, 50):
        fn = build_pallas_decoder(code, algo="minsum", iters=12,
                                  exit_block=g, interpret=True)
        outs.append([np.asarray(v) for v in fn(llr)])
    for o in outs[1:]:
        for a, b in zip(outs[0], o):
            assert (a == b).all()


def test_vmem_budget_rejects_huge_code():
    """Codes whose state exceeds VMEM must raise (api falls back to jnp)."""
    B = make_base_graph(12, 24, 512, seed=3)
    big = LdpcCode.from_base_graph(B, 512, "huge")
    with pytest.raises(NotImplementedError):
        build_pallas_decoder(big, batch_tile=128, interpret=True)


def test_wider_lift_bitexact():
    """Z=27-style odd lift (wifi family) through the kernel."""
    code = LdpcCode.from_family("wifi", "2/3", 27)
    llr, _ = noisy_llrs(code, 16, 3.0, seed=13)
    gb, gok, git = golden_decode(
        code.H, llr, algo="minsum", iters=6, dtype=np.float32
    )
    fn = build_pallas_decoder(code, algo="minsum", iters=6,
                              batch_tile=128, interpret=True)
    pb, pok, pit = map(np.asarray, fn(llr))
    assert (pb == gb).all()
    assert (pok == gok).all()
    assert (pit == git).all()


@pytest.mark.deep  # kept-negative path (bf16 measured slower, BASELINE.md)
def test_bf16_message_mode():
    """Quantized (bf16 R) mode: not bit-exact by contract, but decisions
    agree with f32 at operating SNR on this toy batch."""
    import jax.numpy as jnp

    code = toy_code()
    llr, _ = noisy_llrs(code, 64, 4.0, seed=31)
    f32 = build_pallas_decoder(code, algo="minsum", iters=15,
                               interpret=True)
    bf16 = build_pallas_decoder(code, algo="minsum", iters=15,
                                interpret=True, msg_dtype=jnp.bfloat16)
    b1, ok1, _ = map(np.asarray, f32(llr))
    b2, ok2, _ = map(np.asarray, bf16(llr))
    assert (b1 == b2).all(axis=1).mean() >= 0.97
    assert (ok1 == ok2).mean() >= 0.97


@pytest.mark.deep  # kept-negative path (compressed state measured slower)
def test_compressed_row_state_bitexact():
    """Compressed per-row message state reconstructs R exactly."""
    code = toy_code()
    llr, _ = noisy_llrs(code, 40, 3.0, seed=41)
    gb, gok, git = golden_decode(
        code.H, llr, algo="minsum", iters=12, dtype=np.float32
    )
    fn = build_pallas_decoder(code, algo="minsum", iters=12,
                              interpret=True, compressed=True)
    pb, pok, pit = map(np.asarray, fn(llr))
    assert (pb == gb).all()
    assert (pok == gok).all()
    assert (pit == git).all()


def test_sc_code_bitexact():
    """Banded SC-LDPC base graphs (codes/base_graphs.py::
    make_sc_base_graph) flow through the fused kernel unchanged — the
    layout contract covers them; bit-exact vs golden like every code."""
    from tpu_ldpc.codes import make_sc_base_graph

    B = make_sc_base_graph(8, 8, seed=5)
    code = LdpcCode.from_base_graph(B, 8, name="sc8k")
    # raw LLRs (golden_encode needs an invertible parity block; the SC
    # chain is rank-deficient — see the pivot encoder tests)
    rng = np.random.default_rng(7)
    llr = rng.normal(scale=4.0, size=(24, code.n)).astype(np.float32)
    gb, gok, git = golden_decode(code.H, llr, algo="minsum", iters=12,
                                 dtype=np.float32)
    fn = build_pallas_decoder(code, iters=12, interpret=True)
    pb, pok, pit = map(np.asarray, fn(llr))
    assert (pb == gb).all() and (pok == gok).all() and (pit == git).all()


@pytest.mark.parametrize(
    "early_stop", [pytest.param(True, marks=pytest.mark.deep), False])
def test_rescaled_bitexact(early_stop):
    """min-sum-rescaled contract (golden/decoder.py decode() docstring):
    kernel == golden rescaled on bits/ok/iters_used, and the rescaled
    outputs match the STANDARD contract on this batch (the fp-rounding
    differences the contract allows are statistically invisible)."""
    code = toy_code()
    llr, _ = noisy_llrs(code, 40, 3.0, seed=5)
    gb, gok, git = golden_decode(
        code.H, llr, algo="minsum", iters=17, alpha=0.75,
        early_stop=early_stop, dtype=np.float32, rescaled=True,
    )
    fn = build_pallas_decoder(code, algo="minsum", iters=17, alpha=0.75,
                              early_stop=early_stop, rescaled=True,
                              interpret=True)
    pb, pok, pit = map(np.asarray, fn(llr))
    assert (pb == gb).all()
    assert (pok == gok).all()
    assert (pit == git).all()
    sb, sok, sit = golden_decode(
        code.H, llr, algo="minsum", iters=17, alpha=0.75,
        early_stop=early_stop, dtype=np.float32,
    )
    assert (gb == sb).all(axis=1).mean() >= 0.97
    assert (gok == sok).mean() >= 0.97


@pytest.mark.deep  # redundant axis: generic rescaled contract covered above
def test_rescaled_judged_code_bitexact():
    """Full-size judged code through the rescaled kernel (kept-negative
    option, ~4% slower than the standard headline kernel — BASELINE.md
    r2): bit-exact vs golden rescaled at 50 iterations."""
    code = LdpcCode.judged()
    llr, _ = noisy_llrs(code, 8, 2.0, seed=17)
    gb, gok, git = golden_decode(
        code.H, llr, algo="minsum", iters=50, alpha=0.75,
        early_stop=False, dtype=np.float32, rescaled=True,
    )
    fn = build_pallas_decoder(code, algo="minsum", iters=50, alpha=0.75,
                              early_stop=False, rescaled=True,
                              interpret=True)
    pb, pok, _ = map(np.asarray, fn(llr))
    assert (pb == gb).all()
    assert (pok == gok).all()


def test_rescaled_rejects_unsupported():
    """The rescaled contract is flooding min-sum, beta=0, float only."""
    code = toy_code()
    for kw in (
        dict(algo="sumproduct"),
        dict(schedule="layered"),
        dict(beta=0.1),
        dict(compressed=True),
        dict(quant_bits=6),
        dict(iters=300),
    ):
        with pytest.raises(ValueError):
            build_pallas_decoder(code, rescaled=True, interpret=True,
                                 **{"iters": 10, **kw})
    with pytest.raises(ValueError):
        golden_decode(code.H, np.zeros((1, code.n), np.float32),
                      algo="minsum", schedule="layered", rescaled=True)


def test_rescaled_extreme_magnitude_stress():
    """The rescaled contract grows magnitudes by alpha^-k (~1e15 at
    iters=120): adversarially large finite LLRs through the full
    allowed iteration range stay bit-exact vs golden (no overflow, no
    precision surprise beyond the contract's own rounding)."""
    code = toy_code()
    rng = np.random.default_rng(3)
    llr = (rng.choice([-60.0, -1e-3, 1e-3, 60.0], size=(16, code.n))
           * rng.uniform(0.5, 1.0, size=(16, code.n))).astype(np.float32)
    gb, gok, git = golden_decode(
        code.H, llr, algo="minsum", iters=120, alpha=0.75,
        early_stop=True, dtype=np.float32, rescaled=True,
    )
    assert np.isfinite(gb).all()
    fn = build_pallas_decoder(code, algo="minsum", iters=120, alpha=0.75,
                              early_stop=True, rescaled=True,
                              interpret=True)
    pb, pok, pit = map(np.asarray, fn(llr))
    assert (pb == gb).all()
    assert (pok == gok).all()
    assert (pit == git).all()


def test_vmem_overrun_drops_normalization_first(monkeypatch):
    """When the normalization L scratch ALONE pushes a code over the
    VMEM budget, the builder drops normalization (bit-exact relabeling,
    ~5% perf) instead of rejecting — the nr1_r12_z64 case (r4)."""
    import tpu_ldpc.decode.pallas_bp as pb

    code = toy_code()
    base = code.layout.vmem_bytes(128)
    scratch = code.layout.nb * code.layout.Z * 4 * 128
    # budget admits the bare state but not state+scratch
    monkeypatch.setattr(pb, "VMEM_BUDGET_BYTES", base + scratch // 2)
    dec = pb.build_pallas_decoder(code, iters=3, interpret=True)
    llr, _ = noisy_llrs(code, 8, 3.0, seed=9)
    bits, ok, iu = dec(llr)
    assert np.asarray(bits).shape == (8, code.n)
    # a genuine overrun (bare state too big) still rejects
    monkeypatch.setattr(pb, "VMEM_BUDGET_BYTES", base - 1)
    with pytest.raises(NotImplementedError):
        pb.build_pallas_decoder(code, iters=4, interpret=True)


def test_layered_not_billed_for_flooding_scratch(monkeypatch):
    """The normalization L scratch exists only on the flooding path;
    layered builds near the budget must NOT drop normalization (or
    halve the tile) for memory that is never allocated (review r4:
    nr1_r12_z64 layered fits at 11.22 MB but was billed 12.73)."""
    import tpu_ldpc.decode.pallas_bp as pb

    code = toy_code()
    base = code.layout.vmem_bytes(128)
    monkeypatch.setattr(pb, "VMEM_BUDGET_BYTES", base)  # no scratch room
    called = {}
    real = pb._normalize_offsets

    def spy(lay):
        called["yes"] = True
        return real(lay)

    monkeypatch.setattr(pb, "_normalize_offsets", spy)
    pb.build_pallas_decoder(code, iters=3, schedule="layered",
                            interpret=True)
    assert called.get("yes"), (
        "layered build dropped normalization under a budget that its "
        "real footprint fits — the flooding-only scratch is being "
        "charged schedule-blind again")
